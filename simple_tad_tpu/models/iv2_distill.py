"""Masked multi-layer feature-distillation student (InternVideo2 stage 2).

Behavioral reference: DistInternVideo2
(/root/reference/other_models/InternVideo2_single_modality/models/
internvideo2_distill.py:406-700) as driven by run_distill.py and the
scripts/distillation/*_dist_1B_stage2.sh recipes: the student runs its IV2
trunk (RMSNorm, QK-normalization, LayerScale, bias-free qkv) on the VISIBLE
tokens of a masked video (CLS always visible), returns K intermediate-layer
features each decoded by its own Linear/MLP decoder to the teacher's width
and l2-normalized, plus the attention-pooled final feature decoded to the
teacher's final width — aligned against a frozen teacher's features with
the 2-2cos loss (engines/engine_for_pretraining.py:127-143).

TPU-first notes:
  * The boolean mask always hides the same count per sample, so the
    visible gather is static-shaped (mask_partition argsort — the same
    trick as models/mae.py).
  * Trunk blocks are scanned (stacked params, leading depth axis); the K
    taps come out of the scan's ys stack, so no per-layer Python state.
  * Everything jits to one static program; the 'attention' mask type is
    sampled on-device in the distill step (Gumbel top-k == multinomial
    without replacement), not here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from simple_tad_tpu.models.internvideo2 import (
    AttentionPooling, IV2Block, LayerNormEps, sincos_3d_pos_embed,
    trunc_normal_init)
from simple_tad_tpu.models.layers import PatchEmbed, gelu_for
from simple_tad_tpu.models.mae import _gather_tokens, mask_partition


class FeatureDecoder(nn.Module):
    """Linear_Decoder / MLP_Decoder (internvideo2_distill.py:334-397):
    head -> LayerNorm(eps 1e-5) -> l2 normalize."""
    in_dim: int
    out_dim: int
    kind: str = "linear"          # 'linear' | 'mlp'
    norm_type: str = "l2"         # 'l2' | 'none'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        if self.kind == "mlp":
            x = nn.Dense(self.in_dim, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="fc1")(x)
            x = gelu_for(self.dtype)(x)
            x = nn.Dense(self.out_dim, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="fc2")(x)
        elif self.kind == "linear":
            x = nn.Dense(self.out_dim, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="head")(x)
        else:
            raise ValueError(f"unknown decoder kind {self.kind!r}")
        x = LayerNormEps(self.out_dim, eps=1e-5, dtype=self.dtype,
                         name="norm")(x)
        if self.norm_type == "l2":
            x = x.astype(jnp.float32)
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                                1e-6)
        elif self.norm_type != "none":
            raise ValueError(f"unknown norm_type {self.norm_type!r}")
        return x


@dataclasses.dataclass(frozen=True)
class DistillIV2Config:
    img_size: int = 224
    patch_size: int = 14
    in_chans: int = 3
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    init_values: float = 1e-5
    qk_normalization: bool = True
    attn_pool_num_heads: int = 16
    clip_embed_dim: int = 768
    num_frames: int = 8
    tubelet_size: int = 1
    drop_path_rate: float = 0.05
    # distillation surface (run_distill.py:70-95)
    clip_teacher_embed_dim: int = 1408   # stage-2: the IV2-1B trunk width
    clip_teacher_final_dim: int = 768    # 0 = no final alignment
    clip_return_layer: int = 6
    clip_student_return_interval: float = 1.0
    clip_return_index: Tuple[int, ...] = ()   # explicit override
    clip_norm_type: str = "l2"
    clip_student_decoder: str = "mlp"    # stage-2 scripts: MLP_Decoder
    attn_impl: str = "auto"
    dtype: Any = jnp.float32
    scan_blocks: bool = True
    remat: bool = False

    @property
    def grid_size(self):
        return (self.num_frames // self.tubelet_size,
                self.img_size // self.patch_size,
                self.img_size // self.patch_size)

    @property
    def num_patches(self):
        t, h, w = self.grid_size
        return t * h * w

    @property
    def return_index(self) -> Tuple[int, ...]:
        """Student tap indices, ascending (default: last K layers at
        clip_student_return_interval — internvideo2_distill.py:450-457)."""
        if self.clip_return_index:
            return tuple(sorted(self.clip_return_index))
        idx = [self.depth - int(i * self.clip_student_return_interval) - 1
               for i in range(self.clip_return_layer)]
        return tuple(sorted(idx))


class DistillInternVideo2(nn.Module):
    cfg: DistillIV2Config

    @nn.compact
    def __call__(self, x, mask, num_masked: int, deterministic: bool = True):
        """x: (B, T, H, W, C) normalized video; mask: (B, N+1) bool with
        the CLS slot FIRST (True = masked; CLS must be visible,
        internvideo2_distill.py:630 masks the cls-prefixed sequence);
        num_masked: static per-sample masked count.
        Returns (x_clip_align (K, B, N_vis, teacher_embed_dim),
                 x_align (B, teacher_final_dim) or None) — both
        l2-normalized when clip_norm_type == 'l2'."""
        cfg = self.cfg
        B = x.shape[0]
        nt, nh, nw = cfg.grid_size
        vis_idx, _ = mask_partition(mask, num_masked)

        tokens = PatchEmbed(
            embed_dim=cfg.embed_dim, patch_size=cfg.patch_size,
            tubelet_size=cfg.tubelet_size, in_chans=cfg.in_chans,
            dtype=cfg.dtype, name="patch_embed")(x)
        cls = self.param("cls_token", trunc_normal_init(0.02),
                         (1, 1, cfg.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype),
                              (B, 1, cfg.embed_dim)), tokens], axis=1)

        # learnable pos-embed, 3d-sincos-initialized with a zero CLS row
        # (init_pos_embed, internvideo2_distill.py:536-561 joint branch)
        def init_joint(key, shape, dtype=jnp.float32):
            tab = sincos_3d_pos_embed(cfg.embed_dim, nh, nt)
            zero = np.zeros((1, 1, cfg.embed_dim), np.float32)
            return jnp.asarray(np.concatenate([zero, tab], axis=1), dtype)
        pos = self.param("pos_embed", init_joint,
                         (1, cfg.num_patches + 1, cfg.embed_dim))
        tokens = tokens + pos.astype(cfg.dtype)

        # visible gather AFTER pos add (forward :630 x[~mask])
        x_vis = _gather_tokens(tokens, vis_idx)

        # trunk + taps (ascending layer order, :634-647)
        ret_idx = cfg.return_index
        dpr = jnp.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        block = IV2Block(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                         cfg.qkv_bias, cfg.init_values,
                         cfg.qk_normalization, cfg.attn_impl,
                         dtype=cfg.dtype, name="blocks")

        def body(blk, carry, rate):
            y = blk(carry, rate, deterministic)
            return y, y

        if cfg.remat:
            from simple_tad_tpu.models.layers import remat_policy
            body = nn.remat(body, prevent_cse=False, policy=remat_policy())
        if cfg.scan_blocks:
            scan = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True,
                                       "droppath": True},
                           in_axes=0, length=cfg.depth)
            x_vis, ys = scan(block, x_vis, dpr)
            taps = ys[np.asarray(ret_idx)]
        else:
            tap_list = []
            for i in range(cfg.depth):
                x_vis = IV2Block(
                    cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                    cfg.qkv_bias, cfg.init_values, cfg.qk_normalization,
                    cfg.attn_impl, dtype=cfg.dtype,
                    name=f"blocks_{i}")(x_vis, dpr[i], deterministic)
                if i in ret_idx:
                    tap_list.append(x_vis)
            taps = jnp.stack(tap_list)

        # tap positional re-encode: a SECOND learnable sincos table added
        # at the visible positions before the decoders (:658-678)
        clip_pos = self.param("clip_pos_embed", init_joint,
                              (1, cfg.num_patches + 1, cfg.embed_dim))
        clip_pos = jnp.broadcast_to(clip_pos.astype(cfg.dtype),
                                    (B, cfg.num_patches + 1, cfg.embed_dim))
        pos_vis = _gather_tokens(clip_pos, vis_idx)
        taps = taps + pos_vis[None]

        # per-tap decoder (one module per returned layer, :516-523 — the
        # reference builds clip_decoder with eval(clip_student_decoder))
        aligned = jnp.stack([
            FeatureDecoder(cfg.embed_dim, cfg.clip_teacher_embed_dim,
                           kind=cfg.clip_student_decoder,
                           norm_type=cfg.clip_norm_type, dtype=cfg.dtype,
                           name=f"clip_decoder_{k}")(taps[k])
            for k in range(len(ret_idx))])

        # final: attention pooling -> final decoder (:524-531, :687)
        x_align = None
        if cfg.clip_teacher_final_dim > 0:
            pooled = AttentionPooling(
                cfg.embed_dim, cfg.attn_pool_num_heads, cfg.clip_embed_dim,
                qkv_bias=True, dtype=cfg.dtype, name="clip_projector")(x_vis)
            x_align = FeatureDecoder(
                cfg.clip_embed_dim, cfg.clip_teacher_final_dim,
                kind=cfg.clip_student_decoder, norm_type=cfg.clip_norm_type,
                dtype=cfg.dtype, name="final_clip_decoder")(pooled)
        return aligned, x_align

    def init_params(self, rng, batch_size: int = 1):
        cfg = self.cfg
        n = cfg.num_patches
        num_masked = int(0.75 * n)
        mask = np.zeros((batch_size, n + 1), bool)
        mask[:, 1:num_masked + 1] = True
        dummy = jnp.zeros((batch_size, cfg.num_frames, cfg.img_size,
                           cfg.img_size, cfg.in_chans), cfg.dtype)
        return self.init(rng, dummy, jnp.asarray(mask), num_masked,
                         deterministic=True)["params"]
