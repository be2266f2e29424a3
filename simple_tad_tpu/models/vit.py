"""VideoMAE-style Video Vision Transformer (fine-tuning / inference trunk).

Behavioral reference: VisionTransformer in
/root/reference/modeling_finetune.py:208-335 and the size registry at
:338-398.  TPU-first design choices:

  * channels-last video input (B, T, H, W, C),
  * blocks are lax.scan-ned over stacked params (one compiled block body
    regardless of depth; optional remat for gradient checkpointing, the
    equivalent of the reference's --use_checkpoint),
  * fixed sincos pos-embed is a trace-time constant (never a parameter),
  * bf16 compute / fp32 params by default on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from simple_tad_tpu.models.layers import (
    Block, LayerNormFp32, PatchEmbed, sincos_3d_pos_embed, sincos_pos_embed,
    trunc_normal_init, umt_pos_embed)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Mirrors the reference constructor args (modeling_finetune.py:211-234)."""
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 2
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    fc_drop_rate: float = 0.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    use_learnable_pos_emb: bool = False
    init_scale: float = 0.001
    all_frames: int = 16
    tubelet_size: int = 2
    final_reduction: str = "fc_norm"   # fc_norm | cls | none
    attn_impl: str = "auto"
    dtype: Any = jnp.float32
    scan_blocks: bool = True
    remat: bool = False
    # variant knobs: pos-embed family and optional CLS token
    #   sincos — VideoMAE (modeling_finetune.py:195-205)
    #   3d     — MVD (other_models/MVD/modeling_finetune.py:24-69)
    #   umt    — UMT (other_models/UMT/modeling_finetune.py:195-239)
    pos_embed_kind: str = "sincos"
    use_cls_token: bool = False
    # int8 GEMM inference path (ops/quant.py); params must come from
    # quantize_vit_params — training/init unsupported in quant mode.
    # quant_mode: 'dynamic' per-row act scales; 'static' calibrated
    # per-tensor act_amax params (faster); 'calib' sow absmax for
    # ops.quant.calibrate_act_amax
    quant: bool = False
    quant_mode: str = "dynamic"

    @property
    def num_patches(self) -> int:
        return ((self.img_size // self.patch_size) ** 2
                * (self.all_frames // self.tubelet_size))


class VisionTransformer(nn.Module):
    cfg: ViTConfig

    def _blocks(self, x, deterministic: bool):
        cfg = self.cfg
        dpr = jnp.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        block = Block(
            dim=cfg.embed_dim, num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
            qk_scale=cfg.qk_scale, drop=cfg.drop_rate,
            attn_drop=cfg.attn_drop_rate, init_values=cfg.init_values,
            attn_impl=cfg.attn_impl, quant=cfg.quant,
            quant_mode=cfg.quant_mode, dtype=cfg.dtype,
            name="blocks")

        def body(blk, carry, rate):
            return blk(carry, rate, deterministic), None

        if cfg.remat:
            from simple_tad_tpu.models.layers import remat_policy
            body = nn.remat(body, prevent_cse=False, policy=remat_policy())
        if cfg.scan_blocks:
            scan = nn.scan(
                body,
                variable_axes={"params": 0, "calib": 0},
                split_rngs={"params": True, "dropout": True, "droppath": True},
                in_axes=0, length=cfg.depth)
            import os
            from simple_tad_tpu.ops.ln import supports_fused_ln_quant
            if (cfg.quant and cfg.quant_mode == "static" and deterministic
                    and supports_fused_ln_quant(cfg.embed_dim)
                    and os.environ.get("SIMPLE_TAD_ADD_LNQ")):
                # deferred-residual carry (Block docstring): each block
                # returns (stream, un-added branch); the add runs inside
                # the NEXT block's norm1 LNQ kernel.  First block enters
                # with a zero pending branch; the last pending add folds
                # into the final pooling read here.
                (xs, pend), _ = scan(block, (x, jnp.zeros_like(x)), dpr)
                return xs + pend
            x, _ = scan(block, x, dpr)
            return x
        # Unrolled fallback (same stacked param layout is NOT kept here;
        # used only for debugging small models).
        for i in range(cfg.depth):
            blk_i = Block(
                dim=cfg.embed_dim, num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale, drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate, init_values=cfg.init_values,
                attn_impl=cfg.attn_impl, dtype=cfg.dtype, name=f"blocks_{i}")
            x = blk_i(x, dpr[i], deterministic)
        return x

    def _forward_features(self, x, deterministic: bool = True,
                          tokens_input: bool = False):
        cfg = self.cfg
        if tokens_input:
            # serving fast path: x is pre-embedded (B, num_patches, D)
            # tokens (eval/engine.py embeds each unique frame ONCE via the
            # half-kernel tubelet trick and gathers token embeddings
            # instead of pixels — sliding windows share 15/16 frames)
            tokens = x.astype(cfg.dtype)
        else:
            tokens = PatchEmbed(
                embed_dim=cfg.embed_dim, patch_size=cfg.patch_size,
                tubelet_size=cfg.tubelet_size, in_chans=cfg.in_chans,
                dtype=cfg.dtype, name="patch_embed")(x)

        if cfg.use_learnable_pos_emb:
            pos = self.param("pos_embed", trunc_normal_init(0.02),
                             (1, cfg.num_patches, cfg.embed_dim))
            tokens = tokens + pos.astype(cfg.dtype)
        else:
            if cfg.pos_embed_kind == "3d":
                pos = sincos_3d_pos_embed(
                    cfg.embed_dim, cfg.img_size // cfg.patch_size,
                    cfg.all_frames // cfg.tubelet_size)
            elif cfg.pos_embed_kind == "umt":
                pos = umt_pos_embed(cfg.num_patches, cfg.embed_dim,
                                    cfg.all_frames // cfg.tubelet_size,
                                    cfg.patch_size)
            else:
                pos = sincos_pos_embed(cfg.num_patches, cfg.embed_dim)
            tokens = tokens + jnp.asarray(pos, cfg.dtype)

        if cfg.use_cls_token:
            # cls prepended AFTER pos add: no pos embed on cls
            # (MVD modeling_finetune.py:432-436)
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, cfg.embed_dim))
            cls = jnp.broadcast_to(cls.astype(cfg.dtype),
                                   (tokens.shape[0], 1, cfg.embed_dim))
            tokens = jnp.concatenate([cls, tokens], axis=1)

        if cfg.drop_rate > 0.0:
            tokens = nn.Dropout(cfg.drop_rate)(tokens,
                                               deterministic=deterministic)

        tokens = self._blocks(tokens, deterministic)

        # final_reduction semantics (modeling_finetune.py:267-272, 323-330):
        # fc_norm  -> norm is Identity, LN applied after mean-pool
        # cls/none -> LN applied to the token sequence
        # with a CLS token the mean pool excludes it (MVD :446-451)
        if cfg.final_reduction == "fc_norm":
            pooled = jnp.mean(tokens[:, 1:] if cfg.use_cls_token else tokens,
                              axis=1)
            return LayerNormFp32(cfg.embed_dim, dtype=cfg.dtype,
                                 name="fc_norm")(pooled)
        tokens = LayerNormFp32(cfg.embed_dim, dtype=cfg.dtype,
                               name="norm")(tokens)
        if cfg.final_reduction == "cls":
            return tokens[:, 0]
        return tokens

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 features_only: bool = False, tokens_input: bool = False):
        """x: (B, T, H, W, C) normalized video -> (B, num_classes) logits.
        With tokens_input=True, x is pre-embedded (B, num_patches, D)."""
        feats = self._forward_features(x, deterministic, tokens_input)
        if features_only:
            return feats
        cfg = self.cfg
        if cfg.fc_drop_rate > 0.0:
            feats = nn.Dropout(cfg.fc_drop_rate)(feats,
                                                 deterministic=deterministic)
        if cfg.num_classes > 0:
            head_std = 0.02 * cfg.init_scale if cfg.init_scale > 0 else 0.02
            feats = nn.Dense(
                cfg.num_classes, dtype=jnp.float32,
                kernel_init=trunc_normal_init(head_std),
                bias_init=nn.initializers.zeros, name="head")(
                    feats.astype(jnp.float32))
        return feats

    def init_params(self, rng, batch_size: int = 1):
        cfg = self.cfg
        dummy = jnp.zeros((batch_size, cfg.all_frames, cfg.img_size,
                           cfg.img_size, cfg.in_chans), cfg.dtype)
        return self.init(rng, dummy, deterministic=True)["params"]
