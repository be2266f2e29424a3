"""Asymmetric encoder-decoder VideoMAE for masked-video-modeling pre-training.

Behavioral reference: /root/reference/modeling_pretrain.py
(PretrainVisionTransformerEncoder :26, Decoder :115, full model :182) and the
per-patch-normalized MSE target construction in
/root/reference/engine_for_pretraining.py:51-71.

TPU-first notes:
  * The boolean tube mask always masks the same count per sample
    (masking_generator.py:17-24), so the visible/masked gathers are
    static-shaped: a stable argsort of the mask yields visible indices first,
    preserving the reference's ``x[~mask]`` ordering.
  * Encoder and decoder blocks are scanned; everything jits to a single
    static-shape program.
  * Targets are computed channels-last: the reference target layout
    '(p0 p1 p2) c' (engine_for_pretraining.py:58) is exactly the natural
    flatten of (B, T, H, W, C) video, so the decoder head's 1536-dim output
    ordering matches released checkpoints with no permutation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from simple_tad_tpu.models.layers import (
    Block, LayerNormFp32, PatchEmbed, sincos_pos_embed, trunc_normal_init)


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    decoder_num_classes: int = 1536   # 3 * tubelet * patch^2
    decoder_embed_dim: int = 384
    decoder_depth: int = 4            # jobs use 4 (jobs/dapt/*.sh)
    decoder_num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    use_learnable_pos_emb: bool = False
    # encoder pos table: '1d' = interleaved sinusoid (VideoMAE,
    # modeling_pretrain.py:195); '3d' = MVD's temporal+spatial sincos
    # (other_models/MVD/modeling_pretrain.py:63-66).  Decoder always 1d.
    pos_embed_kind: str = "1d"
    all_frames: int = 16
    tubelet_size: int = 2
    attn_impl: str = "auto"
    dtype: Any = jnp.float32
    scan_blocks: bool = True
    remat: bool = False

    def __post_init__(self):
        assert self.decoder_num_classes == (
            self.in_chans * self.tubelet_size * self.patch_size ** 2)

    @property
    def num_patches(self) -> int:
        return ((self.img_size // self.patch_size) ** 2
                * (self.all_frames // self.tubelet_size))


def mask_partition(mask: jnp.ndarray, num_masked: int):
    """Split token indices into (visible, masked), preserving token order.

    mask: (B, N) bool, True = masked; every row has exactly ``num_masked``
    Trues (tube masking guarantees this).  Returns (vis_idx, mask_idx) of
    shapes (B, N - num_masked) and (B, num_masked).  A stable argsort of the
    boolean mask puts False (visible) first in original order — identical to
    the reference's boolean indexing x[~mask] / pos[mask]
    (modeling_pretrain.py:98, :286-287).
    """
    order = jnp.argsort(mask.astype(jnp.int32), axis=1, stable=True)
    n_vis = mask.shape[1] - num_masked
    return order[:, :n_vis], order[:, n_vis:]


def _gather_tokens(x, idx):
    """x: (B, N, C), idx: (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class _BlockStack(nn.Module):
    """Scanned stack of transformer blocks + final LN."""
    dim: int
    depth: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    attn_drop: float
    drop_path_rate: float
    init_values: float
    attn_impl: str
    dtype: Any
    scan_blocks: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dpr = jnp.linspace(0.0, self.drop_path_rate, self.depth)
        block = Block(
            dim=self.dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale, drop=self.drop,
            attn_drop=self.attn_drop, init_values=self.init_values,
            attn_impl=self.attn_impl, dtype=self.dtype, name="blocks")

        def body(blk, carry, rate):
            return blk(carry, rate, deterministic), None

        if self.remat:
            from simple_tad_tpu.models.layers import remat_policy
            body = nn.remat(body, prevent_cse=False, policy=remat_policy())
        if self.scan_blocks:
            scan = nn.scan(
                body, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True, "droppath": True},
                in_axes=0, length=self.depth)
            x, _ = scan(block, x, dpr)
        else:
            for i in range(self.depth):
                x = Block(
                    dim=self.dim, num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, drop=self.drop,
                    attn_drop=self.attn_drop, init_values=self.init_values,
                    attn_impl=self.attn_impl, dtype=self.dtype,
                    name=f"blocks_{i}")(x, dpr[i], deterministic)
        return LayerNormFp32(self.dim, dtype=self.dtype, name="norm")(x)


class PretrainVideoMAE(nn.Module):
    cfg: MAEConfig

    @nn.compact
    def __call__(self, x, mask, num_masked: int, deterministic: bool = True):
        """x: (B, T, H, W, C) normalized video; mask: (B, N) bool (True=masked);
        num_masked: static per-sample masked-token count.
        Returns (B, num_masked, decoder_num_classes) pixel predictions for the
        masked tokens, in mask order.
        """
        cfg = self.cfg
        B = x.shape[0]
        vis_idx, mask_idx = mask_partition(mask, num_masked)

        # ----- encoder on visible tokens only (modeling_pretrain.py:91-108)
        tokens = PatchEmbed(
            embed_dim=cfg.encoder_embed_dim, patch_size=cfg.patch_size,
            tubelet_size=cfg.tubelet_size, in_chans=cfg.in_chans,
            dtype=cfg.dtype, name="encoder_patch_embed")(x)
        if cfg.use_learnable_pos_emb:
            enc_pos = self.param(
                "encoder_pos_embed", trunc_normal_init(0.02),
                (1, cfg.num_patches, cfg.encoder_embed_dim))
            enc_pos = enc_pos.astype(cfg.dtype)
        elif cfg.pos_embed_kind == "3d":
            from simple_tad_tpu.models.layers import sincos_3d_pos_embed
            enc_pos = jnp.asarray(
                sincos_3d_pos_embed(cfg.encoder_embed_dim,
                                    cfg.img_size // cfg.patch_size,
                                    cfg.all_frames // cfg.tubelet_size),
                cfg.dtype)
        else:
            enc_pos = jnp.asarray(
                sincos_pos_embed(cfg.num_patches, cfg.encoder_embed_dim),
                cfg.dtype)
        tokens = tokens + enc_pos
        x_vis = _gather_tokens(tokens, vis_idx)

        x_vis = _BlockStack(
            dim=cfg.encoder_embed_dim, depth=cfg.encoder_depth,
            num_heads=cfg.encoder_num_heads, mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias, qk_scale=cfg.qk_scale,
            drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
            drop_path_rate=cfg.drop_path_rate, init_values=cfg.init_values,
            attn_impl=cfg.attn_impl, dtype=cfg.dtype,
            scan_blocks=cfg.scan_blocks, remat=cfg.remat,
            name="encoder")(x_vis, deterministic)

        # ----- encoder -> decoder projection (bias-free Linear, :253)
        x_vis = nn.Dense(cfg.decoder_embed_dim, use_bias=False,
                         dtype=cfg.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="encoder_to_decoder")(x_vis)

        # ----- assemble full sequence: [vis + pos_vis, mask_tok + pos_mask]
        dec_pos = jnp.asarray(
            sincos_pos_embed(cfg.num_patches, cfg.decoder_embed_dim),
            cfg.dtype)
        dec_pos = jnp.broadcast_to(
            dec_pos, (B, cfg.num_patches, cfg.decoder_embed_dim))
        pos_vis = _gather_tokens(dec_pos, vis_idx)
        pos_mask = _gather_tokens(dec_pos, mask_idx)
        mask_token = self.param("mask_token", trunc_normal_init(0.02),
                                (1, 1, cfg.decoder_embed_dim))
        full = jnp.concatenate(
            [x_vis + pos_vis,
             mask_token.astype(cfg.dtype) + pos_mask], axis=1)

        # ----- decoder + head on the trailing masked tokens (:167-180)
        full = _BlockStack(
            dim=cfg.decoder_embed_dim, depth=cfg.decoder_depth,
            num_heads=cfg.decoder_num_heads, mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias, qk_scale=cfg.qk_scale,
            drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
            drop_path_rate=cfg.drop_path_rate, init_values=cfg.init_values,
            attn_impl=cfg.attn_impl, dtype=cfg.dtype,
            scan_blocks=cfg.scan_blocks, remat=cfg.remat,
            name="decoder")(full, deterministic)
        masked_feats = full[:, -num_masked:]
        pred = nn.Dense(cfg.decoder_num_classes, dtype=jnp.float32,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="decoder_head")(masked_feats.astype(jnp.float32))
        return pred


@dataclasses.dataclass(frozen=True)
class IV2MAEConfig:
    """VideoMAE-style pixel-reconstruction DAPT for the InternVideo2 trunk.

    Mirrors PretrainVideoMAEInternVideo2
    (/root/reference/other_models/InternVideo2_single_modality/models/
    internvideo2_pretrain_videomae.py:234-353) as wired by
    iv2_run_mae_double_pretraining.py:167-185: IV2 encoder blocks (RMSNorm,
    QK-normalization, fp32 LayerScale init 1e-5, bias-free qkv) over
    visible tokens with a LEARNABLE sincos-initialized pos-embed and no
    CLS token, a plain VideoMAE decoder (LayerNorm blocks, 1D sincos
    table) at patch-14/tubelet-1 geometry, head predicting
    3*tubelet*patch^2 = 588 pixels/token.
    """
    img_size: int = 224
    patch_size: int = 14
    in_chans: int = 3
    encoder_embed_dim: int = 384
    encoder_depth: int = 12
    encoder_num_heads: int = 6
    decoder_num_classes: int = 588    # 3 * tubelet * patch^2
    decoder_embed_dim: int = 192
    decoder_depth: int = 4
    decoder_num_heads: int = 3
    mlp_ratio: float = 4.0
    qkv_bias: bool = False            # IV2 qkv is bias-free
    qk_normalization: bool = True
    init_values: float = 1e-5         # get_model forces 1e-5 (:182)
    sep_pos_embed: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    all_frames: int = 8
    tubelet_size: int = 1
    attn_impl: str = "auto"
    dtype: Any = jnp.float32
    scan_blocks: bool = True
    remat: bool = False

    def __post_init__(self):
        assert self.decoder_num_classes == (
            self.in_chans * self.tubelet_size * self.patch_size ** 2)

    @property
    def grid_size(self):
        return (self.all_frames // self.tubelet_size,
                self.img_size // self.patch_size,
                self.img_size // self.patch_size)

    @property
    def num_patches(self) -> int:
        t, h, w = self.grid_size
        return t * h * w


class PretrainIV2VideoMAE(nn.Module):
    cfg: IV2MAEConfig

    @nn.compact
    def __call__(self, x, mask, num_masked: int, deterministic: bool = True):
        """x: (B, T, H, W, C) normalized video; mask: (B, N) bool
        (True=masked, N = num_patches, no CLS slot — the pretrain encoder
        drops the CLS token, internvideo2_pretrain_videomae.py:74).
        Returns (B, num_masked, 588) pixel predictions in mask order."""
        from simple_tad_tpu.models.internvideo2 import IV2Block
        cfg = self.cfg
        B = x.shape[0]
        nt, nh, nw = cfg.grid_size
        vis_idx, mask_idx = mask_partition(mask, num_masked)

        # ----- IV2 patch embed (patch 14, tubelet 1; same reshape+matmul
        # layout as models/internvideo2.py so converters are shared)
        tokens = PatchEmbed(
            embed_dim=cfg.encoder_embed_dim, patch_size=cfg.patch_size,
            tubelet_size=cfg.tubelet_size, in_chans=cfg.in_chans,
            dtype=cfg.dtype, name="encoder_patch_embed")(x)

        # ----- learnable pos-embed, sincos-initialized (init_pos_embed,
        # internvideo2_pretrain_videomae.py:127-151); no CLS row
        if cfg.sep_pos_embed:
            from simple_tad_tpu.models.layers import sincos_1d_mae

            def init_sp(key, shape, dtype=jnp.float32):
                gw, gh = np.meshgrid(np.arange(nh, dtype=np.float64),
                                     np.arange(nh, dtype=np.float64))
                emb = np.concatenate(
                    [sincos_1d_mae(cfg.encoder_embed_dim // 2, gw),
                     sincos_1d_mae(cfg.encoder_embed_dim // 2, gh)], axis=1)
                return jnp.asarray(emb[None], dtype)

            def init_t(key, shape, dtype=jnp.float32):
                emb = sincos_1d_mae(cfg.encoder_embed_dim,
                                    np.arange(nt, dtype=np.float64))
                return jnp.asarray(emb[None], dtype)

            pos_sp = self.param("pos_embed_spatial", init_sp,
                                (1, nh * nw, cfg.encoder_embed_dim))
            pos_t = self.param("pos_embed_temporal", init_t,
                               (1, nt, cfg.encoder_embed_dim))
            enc_pos = (jnp.tile(pos_sp, (1, nt, 1))
                       + jnp.repeat(pos_t, nh * nw, axis=1))
        else:
            from simple_tad_tpu.models.layers import sincos_3d_pos_embed

            def init_joint(key, shape, dtype=jnp.float32):
                return jnp.asarray(
                    sincos_3d_pos_embed(cfg.encoder_embed_dim, nh, nt),
                    dtype)
            enc_pos = self.param("pos_embed", init_joint,
                                 (1, cfg.num_patches, cfg.encoder_embed_dim))
        tokens = tokens + enc_pos.astype(cfg.dtype)
        x_vis = _gather_tokens(tokens, vis_idx)

        # ----- IV2 encoder blocks on visible tokens + final LayerNorm
        # (norm_layer=LayerNorm(eps=1e-6), registry :362)
        dpr = jnp.linspace(0.0, cfg.drop_path_rate, cfg.encoder_depth)
        block = IV2Block(cfg.encoder_embed_dim, cfg.encoder_num_heads,
                         cfg.mlp_ratio, cfg.qkv_bias, cfg.init_values,
                         cfg.qk_normalization, cfg.attn_impl,
                         dtype=cfg.dtype, name="encoder_blocks")

        def body(blk, carry, rate):
            return blk(carry, rate, deterministic), None

        if cfg.remat:
            from simple_tad_tpu.models.layers import remat_policy
            body = nn.remat(body, prevent_cse=False, policy=remat_policy())
        if cfg.scan_blocks:
            scan = nn.scan(
                body, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True,
                            "droppath": True},
                in_axes=0, length=cfg.encoder_depth)
            x_vis, _ = scan(block, x_vis, dpr)
        else:
            for i in range(cfg.encoder_depth):
                x_vis = IV2Block(
                    cfg.encoder_embed_dim, cfg.encoder_num_heads,
                    cfg.mlp_ratio, cfg.qkv_bias, cfg.init_values,
                    cfg.qk_normalization, cfg.attn_impl, dtype=cfg.dtype,
                    name=f"encoder_blocks_{i}")(x_vis, dpr[i], deterministic)
        x_vis = LayerNormFp32(cfg.encoder_embed_dim, dtype=cfg.dtype,
                              name="encoder_norm")(x_vis)

        # ----- encoder -> decoder, mask tokens, VideoMAE decoder + head
        # (PretrainVideoMAEInternVideo2.forward :340-353 — identical
        # assembly to the VideoMAE pretrain model)
        x_vis = nn.Dense(cfg.decoder_embed_dim, use_bias=False,
                         dtype=cfg.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="encoder_to_decoder")(x_vis)
        dec_pos = jnp.asarray(
            sincos_pos_embed(cfg.num_patches, cfg.decoder_embed_dim),
            cfg.dtype)
        dec_pos = jnp.broadcast_to(
            dec_pos, (B, cfg.num_patches, cfg.decoder_embed_dim))
        pos_vis = _gather_tokens(dec_pos, vis_idx)
        pos_mask = _gather_tokens(dec_pos, mask_idx)
        mask_token = self.param("mask_token", trunc_normal_init(0.02),
                                (1, 1, cfg.decoder_embed_dim))
        full = jnp.concatenate(
            [x_vis + pos_vis,
             mask_token.astype(cfg.dtype) + pos_mask], axis=1)
        full = _BlockStack(
            dim=cfg.decoder_embed_dim, depth=cfg.decoder_depth,
            num_heads=cfg.decoder_num_heads, mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias, qk_scale=None,
            drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
            drop_path_rate=cfg.drop_path_rate, init_values=cfg.init_values,
            attn_impl=cfg.attn_impl, dtype=cfg.dtype,
            scan_blocks=cfg.scan_blocks, remat=cfg.remat,
            name="decoder")(full, deterministic)
        masked_feats = full[:, -num_masked:]
        pred = nn.Dense(cfg.decoder_num_classes, dtype=jnp.float32,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="decoder_head")(masked_feats.astype(jnp.float32))
        return pred


def mae_targets_fused(video, mask, num_masked: int, *, mean, std,
                      patch_size: int = 16, tubelet_size: int = 2,
                      normalize_target: bool = True):
    """Bit-identical restructuring of un-normalize + :func:`mae_targets`
    that the train step uses (r5 measured: the original order costs 25
    ms/step at MAE-B b24 — 20% of the whole step — because the fp32
    un-normalized video is materialized and then 8-D-transposed at 173
    MB).  Three order swaps, none changing any element's value or any
    reduction's operand set:

      1. the patchify reshape+transpose runs on the BF16 video (half the
         layout-move bytes) — a transpose does not change values;
      2. the masked-token gather runs BEFORE the fp32 math (only ~75%
         of tokens survive at mask 0.75);
      3. ``x*std + mean`` upcasts per element AFTER the gather — the
         same fp32 op on the same bf16 element values, and the
         per-patch mean/var reduce over exactly the same elements in
         the same axis order.

    video: (B, T, H, W, C) ImageNet-NORMALIZED (the train batch as-is);
    mean/std: (C,) de-normalization constants.
    """
    B, T, H, W, C = video.shape
    p, tb = patch_size, tubelet_size
    nt, nh, nw = T // tb, H // p, W // p
    v = video.reshape(B, nt, tb, nh, p, nw, p, C)
    v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    v = v.reshape(B, nt * nh * nw, tb * p * p, C)
    _, mask_idx = mask_partition(mask, num_masked)
    v = jnp.take_along_axis(v, mask_idx[:, :, None, None], axis=1)
    v = v.astype(jnp.float32) * std + mean
    if normalize_target:
        mu = jnp.mean(v, axis=2, keepdims=True)
        n = v.shape[2]
        var = jnp.sum(jnp.square(v - mu), axis=2, keepdims=True) / (n - 1)
        v = (v - mu) / (jnp.sqrt(var) + 1e-6)
    return v.reshape(B, num_masked, tb * p * p * C)


def mae_targets(unnorm_video, mask, num_masked: int, *, patch_size: int = 16,
                tubelet_size: int = 2, normalize_target: bool = True):
    """Per-patch(-normalized) pixel targets for the masked tokens.

    unnorm_video: (B, T, H, W, C) in [0, 1] (already de-normalized).
    Matches engine_for_pretraining.py:51-67: layout '(p0 p1 p2) c', mean/var
    over the pixel axis with unbiased variance, eps 1e-6 on the std.
    """
    B, T, H, W, C = unnorm_video.shape
    p, tb = patch_size, tubelet_size
    nt, nh, nw = T // tb, H // p, W // p
    v = unnorm_video.reshape(B, nt, tb, nh, p, nw, p, C)
    v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7)          # (B, nt, nh, nw, tb, p, p, C)
    v = v.reshape(B, nt * nh * nw, tb * p * p, C).astype(jnp.float32)
    if normalize_target:
        mean = jnp.mean(v, axis=2, keepdims=True)
        n = v.shape[2]
        var = jnp.sum(jnp.square(v - mean), axis=2, keepdims=True) / (n - 1)
        v = (v - mean) / (jnp.sqrt(var) + 1e-6)
    patches = v.reshape(B, nt * nh * nw, tb * p * p * C)
    _, mask_idx = mask_partition(mask, num_masked)
    return _gather_tokens(patches, mask_idx)
