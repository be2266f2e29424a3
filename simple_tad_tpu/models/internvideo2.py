"""InternVideo2 single-modality video transformer (S/B/L/1B/6B).

Behavioral reference:
/root/reference/other_models/InternVideo2_single_modality/models/internvideo2.py
(InternVideo2 :372, Block :249, Attention :151, CrossAttention :18,
AttentionPoolingBlock :109, RMSNorm :119, LayerScale :133, PatchEmbed :302).

Family differences vs VideoMAE: patch 14, tubelet 1, 8 frames; CLS token;
joint or separable LEARNABLE pos-embed initialized from MAE-style sincos
(a parameter — loaded from checkpoints, unlike VideoMAE's fixed buffer);
RMSNorm blocks with QK-normalization; LayerScale with fp32-forced gamma;
attention-pooling head projecting to clip_embed_dim -> fc_norm -> Linear.

TPU-first: scanned blocks, fused attention via ops/attention (the
reference's fused DropoutAddRMSNorm/FusedMLP flash-attn ops are just
kernel fusions of the same math — XLA fuses the RMSNorm chain on its own),
fp32 statistics everywhere bf16 runs.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from simple_tad_tpu.models.layers import (drop_path, gelu_for,
                                          sincos_3d_pos_embed,
                                          trunc_normal_init)
from simple_tad_tpu.ops.attention import dot_product_attention

Dtype = Any


class RMSNorm(nn.Module):
    """fp32-statistics RMSNorm (internvideo2.py:119-131).

    quant_inv: (C,) fp32 per-channel 127/amax — when given (static-quant
    serving), the norm EMITS int8 through the single-read fused kernel
    (ops/ln.py fused_rmsnorm_quant) instead of returning bf16 for a
    separate quantize pass.  Used by IV2Attention's qk-normalization,
    whose per-head scales feed the int8-storage attention kernel."""
    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, quant_inv=None):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        x32 = x.astype(jnp.float32)
        if os.environ.get("SIMPLE_TAD_ABLATE_LN"):
            # measurement knob (scripts/iv2_breakdown.py): statistics
            # removed, affine kept — same semantics as layers.py LN knob
            y = scale.astype(jnp.float32) * x32
            if quant_inv is not None:
                return jnp.clip(jnp.round(y * quant_inv),
                                -127, 127).astype(jnp.int8)
            return y.astype(self.dtype)
        if quant_inv is not None:
            from simple_tad_tpu.ops.ln import fused_rmsnorm_quant
            return fused_rmsnorm_quant(x, scale, quant_inv, eps=self.eps)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (scale.astype(jnp.float32) * y).astype(self.dtype)


class RMSNormQuant(nn.Module):
    """RMSNorm that EMITS the consumer GEMM's int8 activation — the IV2
    analogue of layers.LayerNormQuant.  MEASURED LOSS on v5e, OPT-IN via
    SIMPLE_TAD_FUSED_RMSQ (see ops.ln.supports_fused_rmsq for the A/B
    record: the IV2 norms' quantize already fuses XLA-side, so the kernel
    only trades a reduce read for 4 extra Pallas launches per layer).
    Param structure = RMSNorm + act_amax, so fp checkpoints load
    unchanged; calib mode runs the reference RMS math and sows the
    output absmax after the dtype cast (bit-matching what the downstream
    QuantDense's own calibration observes, so both scales are equal)."""
    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    mode: str = "static"     # static | calib

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        if self.mode == "static":
            amax = self.param("act_amax", nn.initializers.ones, ())
            if not os.environ.get("SIMPLE_TAD_ABLATE_LN"):
                from simple_tad_tpu.ops.ln import fused_rmsnorm_quant
                inv = (127.0 / jnp.maximum(amax, 1e-12)
                       ) * jnp.ones((self.dim,), jnp.float32)
                return fused_rmsnorm_quant(x, scale, inv, eps=self.eps)
            # ablated statistics (measurement knob): bf16 out, consumer
            # GEMM quantizes XLA-side against its own act_amax
            return (scale.astype(jnp.float32)
                    * x.astype(jnp.float32)).astype(self.dtype)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        y = (scale.astype(jnp.float32) * y).astype(self.dtype)
        self.sow("calib", "amax",
                 jnp.max(jnp.abs(y.astype(jnp.float32))),
                 reduce_fn=jnp.maximum, init_fn=lambda: jnp.zeros(()))
        return y


class LayerNormEps(nn.Module):
    dim: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class IV2Attention(nn.Module):
    """Packed-QKV attention with optional QK RMS-normalization over the
    flattened head dim (internvideo2.py:151-219)."""
    dim: int
    num_heads: int
    qkv_bias: bool = False
    qk_normalization: bool = True
    attn_impl: str = "auto"
    quant: bool = False
    quant_mode: str = "dynamic"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, n_valid=None):
        from simple_tad_tpu.models.layers import QuantDense
        B, N, C = x.shape
        head_dim = C // self.num_heads
        if self.quant:
            qkv = QuantDense(C, 3 * C, use_bias=self.qkv_bias,
                             mode=self.quant_mode,
                             name="qkv")(x).astype(self.dtype)
        else:
            qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                           kernel_init=trunc_normal_init(0.02),
                           bias_init=nn.initializers.zeros, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, C)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (B, N, C)
        from simple_tad_tpu.ops.attention import i8_storage_attn_sep_supported
        from simple_tad_tpu.ops.ln import supports_fused_rmsq
        use_i8d = (self.quant and self.quant_mode == "static"
                   and self.attn_impl == "auto" and deterministic
                   and i8_storage_attn_sep_supported(N, self.num_heads,
                                                     head_dim))
        inv3h = None
        if use_i8d:
            amax3h = self.param("qkv_amax", nn.initializers.ones,
                                (3, self.num_heads))
            inv3h = 127.0 / jnp.maximum(amax3h, 1e-12)
        if self.qk_normalization:
            # measurement knob (scripts/iv2_breakdown.py): the full-vs-
            # ablated delta prices the two per-layer (B,N,C) LayerNorm
            # passes; params still exist so checkpoints stay loadable.
            if not os.environ.get("SIMPLE_TAD_ABLATE_QKNORM"):
                # static i8d serving: the per-head quantize fuses INTO the
                # RMSNorm kernel (single read, int8 out) instead of a
                # separate pass over the normalized bf16 (ops/ln.py)
                fuse_q = use_i8d and supports_fused_rmsq(C)
                qi = (jnp.repeat(inv3h[0], head_dim) if fuse_q else None)
                ki = (jnp.repeat(inv3h[1], head_dim) if fuse_q else None)
                q = RMSNorm(C, dtype=self.dtype, name="q_norm")(q, qi)
                k = RMSNorm(C, dtype=self.dtype, name="k_norm")(k, ki)
        q = q.reshape(B, N, self.num_heads, head_dim)
        k = k.reshape(B, N, self.num_heads, head_dim)
        v = v.reshape(B, N, self.num_heads, head_dim)
        if self.quant and self.quant_mode == "calib":
            # per-head POST-NORM q/k (+ raw v) absmax for the int8-storage
            # separate-operand kernels (ops/flash_attention.py
            # flash_attention_i8d) — the ViT trunk calibrates these in the
            # qkv GEMM's output, but here qk_normalization re-normalizes
            # q and k between the GEMM and the kernel.
            qkv_abs = jnp.stack([
                jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(0, 1, 3))
                for t in (q, k, v)])
            self.sow("calib", "qkv_amax", qkv_abs, reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((3, self.num_heads)))
        out_amax = None
        if self.quant and self.quant_mode == "static" \
                and self.attn_impl == "auto" \
                and not os.environ.get("SIMPLE_TAD_NO_ATTN_OUT_Q8"):
            # int8 output epilogue against the proj GEMM's calibrated
            # absmax (sown below in calib mode) — same serving win as the
            # ViT trunk (models/layers.py): the quantize pass XLA cannot
            # fuse across the Pallas boundary disappears and the
            # attention output's HBM traffic halves.
            out_amax = self.param("out_amax", nn.initializers.ones, ())
        if use_i8d:
            # int8 STORAGE attention (round 4): q/k quantize against the
            # calibrated per-head scales in the RMSNorm kernel's epilogue
            # (v in the GEMM's), the kernel contracts QK as exact
            # s8xs8->s32 with the scales folded into the logit scale and
            # dequantizes v once in VMEM — bf16 q/k/v never cross HBM.
            from simple_tad_tpu.ops.flash_attention import flash_attention_i8d

            def q8(t, row):
                if t.dtype == jnp.int8:   # fused RMSNorm already emitted it
                    return t
                invs = inv3h[row].reshape(1, 1, self.num_heads, 1)
                return jnp.clip(jnp.round(t.astype(jnp.float32) * invs),
                                -127, 127).astype(jnp.int8)

            out = flash_attention_i8d(
                q8(q, 0), q8(k, 1), q8(v, 2), amax3h,
                num_heads=self.num_heads, scale=head_dim ** -0.5,
                out_amax=out_amax, n_valid=n_valid)
            if out_amax is None:
                out = out.astype(self.dtype)
        else:
            # model-level sequence padding is only exact through the
            # masking kernels — the model gates the pad on the i8 branch
            assert n_valid is None, \
                "n_valid requires the int8-storage attention path"
            out = dot_product_attention(q, k, v, scale=head_dim ** -0.5,
                                        impl=self.attn_impl,
                                        deterministic=deterministic,
                                        out_quant_amax=out_amax)
        out = out.reshape(B, N, C)
        if self.quant:
            if self.quant_mode == "calib":
                self.sow("calib", "out_amax",
                         jnp.max(jnp.abs(out.astype(jnp.float32))),
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros(()))
            return QuantDense(C, C, mode=self.quant_mode,
                              name="proj")(out).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype,
                        kernel_init=trunc_normal_init(0.02),
                        bias_init=nn.initializers.zeros, name="proj")(out)


class IV2Block(nn.Module):
    """x += dp(ls1 * attn(rms1(x))); x += dp(ls2 * mlp(rms2(x)))
    (internvideo2.py:249-295).  LayerScale multiplies in fp32."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    init_values: float = 1e-5
    qk_normalization: bool = True
    attn_impl: str = "auto"
    quant: bool = False
    quant_mode: str = "dynamic"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, drop_path_rate=0.0, deterministic: bool = True,
                 n_valid=None):
        from simple_tad_tpu.models.layers import QuantDense
        from simple_tad_tpu.ops.ln import supports_fused_rmsq
        use_dp = not deterministic
        rq = (self.quant and self.quant_mode in ("static", "calib")
              and supports_fused_rmsq(self.dim))

        def norm(name):
            # static-quant serving: norm1/norm2 EMIT the consumer GEMM's
            # int8 in one single-read kernel (the LayerNormQuant win of
            # the ViT trunk, docs/ROOFLINE.md) — QuantDense dequantizes
            # against its own identically-calibrated act_amax
            if rq:
                return RMSNormQuant(self.dim, dtype=self.dtype,
                                    mode=self.quant_mode, name=name)
            return RMSNorm(self.dim, dtype=self.dtype, name=name)

        def ls(name, h):
            gamma = self.param(name, nn.initializers.constant(
                self.init_values), (self.dim,))
            return (h.astype(jnp.float32)
                    * gamma.astype(jnp.float32)).astype(self.dtype)

        h = IV2Attention(self.dim, self.num_heads, self.qkv_bias,
                         self.qk_normalization, self.attn_impl,
                         self.quant, self.quant_mode, self.dtype,
                         name="attn")(
            norm("norm1")(x), deterministic, n_valid)
        h = ls("gamma_1", h)
        if use_dp:
            h = drop_path(h, drop_path_rate, deterministic,
                          self.make_rng("droppath"))
        x = x + h

        hid = int(self.dim * self.mlp_ratio)
        h = norm("norm2")(x)
        if os.environ.get("SIMPLE_TAD_ABLATE_MLP"):
            pass   # measurement knob: fc1+GELU+fc2 removed (layers.py Mlp)
        elif self.quant:
            fc1 = QuantDense(self.dim, hid, mode=self.quant_mode,
                             out_dtype=self.dtype, name="fc1")
            fc2 = QuantDense(hid, self.dim, mode=self.quant_mode,
                             out_dtype=self.dtype, name="fc2")
            from simple_tad_tpu.ops.int8_gemm import use_fused_mlp, w8a8_mlp
            if (self.quant_mode == "static"
                    and h.dtype != jnp.int8 and use_fused_mlp(self.dim, hid)):
                k1, s1, a1, b1 = fc1(None, params_only=True)
                k2, s2, a2, b2 = fc2(None, params_only=True)
                h = w8a8_mlp(h, k1, s1, a1, b1, k2, s2, a2, b2,
                             out_dtype=self.dtype)
            else:
                h = fc1(h)
                h = gelu_for(self.dtype)(h)
                h = fc2(h).astype(self.dtype)
        else:
            h = nn.Dense(hid, dtype=self.dtype,
                         kernel_init=trunc_normal_init(0.02), name="fc1")(h)
            h = gelu_for(self.dtype)(h)
            h = nn.Dense(self.dim, dtype=self.dtype,
                         kernel_init=trunc_normal_init(0.02), name="fc2")(h)
        h = ls("gamma_2", h)
        if use_dp:
            h = drop_path(h, drop_path_rate, deterministic,
                          self.make_rng("droppath"))
        return x + h


class AttentionPooling(nn.Module):
    """Mean-query cross-attention head -> out_dim
    (AttentiveBlock/AttentionPoolingBlock + CrossAttention,
    internvideo2.py:18-117).  Separate bias-free q/k/v projections with
    standalone bias params (all three biases exist, unlike VideoMAE)."""
    dim: int
    num_heads: int
    out_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_attn: bool = False):
        """return_attn=True additionally returns the head-mean pooling
        attention (B, N) of the mean query over all tokens (CrossAttention
        return_attn, internvideo2_teacher.py:85-88 attn.mean(1)) — the
        importance signal for the distillation 'attention' mask type."""
        B, N, C = x.shape
        head_dim = C // self.num_heads
        xq = LayerNormEps(C, dtype=self.dtype, name="norm_q")(
            jnp.mean(x, axis=1, keepdims=True))
        xk = LayerNormEps(C, dtype=self.dtype, name="norm_k")(x)
        xv = LayerNormEps(C, dtype=self.dtype, name="norm_v")(x)

        def proj(name, h):
            kernel = self.param(f"{name}_kernel", trunc_normal_init(0.02),
                                (C, C))
            out = jnp.dot(h, kernel.astype(self.dtype),
                          preferred_element_type=self.dtype)
            if self.qkv_bias:
                bias = self.param(f"{name}_bias", nn.initializers.zeros,
                                  (C,))
                out = out + bias.astype(self.dtype)
            return out

        q = proj("q", xq).reshape(B, 1, self.num_heads, head_dim)
        k = proj("k", xk).reshape(B, N, self.num_heads, head_dim)
        v = proj("v", xv).reshape(B, N, self.num_heads, head_dim)
        scale = head_dim ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(
            self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=self.dtype)
        out = out.reshape(B, 1, C)[:, 0]
        out = nn.Dense(self.out_dim, dtype=self.dtype,
                       kernel_init=trunc_normal_init(0.02),
                       name="proj")(out)
        if return_attn:
            return out, jnp.mean(probs.astype(jnp.float32), axis=1)[:, 0]
        return out


@dataclasses.dataclass(frozen=True)
class IV2Config:
    img_size: int = 224
    patch_size: int = 14
    in_chans: int = 3
    num_classes: int = 2
    embed_dim: int = 1408
    depth: int = 40
    num_heads: int = 16
    mlp_ratio: float = 48 / 11
    qkv_bias: bool = False
    init_values: float = 1e-5
    qk_normalization: bool = True
    attn_pool_num_heads: int = 16
    clip_embed_dim: int = 768
    num_frames: int = 8
    tubelet_size: int = 1
    sep_pos_embed: bool = False
    drop_path_rate: float = 0.25
    fc_drop_rate: float = 0.0
    init_scale: float = 0.001
    attn_impl: str = "auto"
    # int8 GEMM inference (see ops/quant.py; params via quantize_iv2_params)
    quant: bool = False
    quant_mode: str = "dynamic"   # dynamic | static | calib
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


class InternVideo2(nn.Module):
    cfg: IV2Config

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 tokens_input: bool = False, features_only: bool = False,
                 return_taps: tuple = ()):
        """x: (B, T, H, W, C) normalized video -> (B, num_classes).
        With tokens_input=True, x is pre-embedded (B, num_patches, D)
        (the evaluator's per-frame token precompute; cls + pos are still
        added here).  features_only=True returns the fc_norm'd
        clip-projector features (B, clip_embed_dim) instead of logits
        (the distillation / linear-probe feature surface).

        return_taps: static tuple of block indices — the stage-2
        DISTILLATION TEACHER surface (teacher_internvideo2_stage2_*,
        internvideo2_teacher.py:523-588): returns
        (z, final, attn) = (l2-normalized raw block outputs at those
        indices (K, B, N+1, C), the l2-normalized clip-projector feature
        (B, clip_embed_dim) WITHOUT fc_norm, and the head-mean pooling
        attention over non-CLS tokens (B, N) for the 'attention' mask
        type)."""
        cfg = self.cfg
        B = x.shape[0]
        nt, nh, nw = cfg.grid_size
        if tokens_input:
            tokens = x.astype(cfg.dtype)
        else:
            _, T, H, W, C = x.shape
            p, tb = cfg.patch_size, cfg.tubelet_size
            kernel = self.param("patch_kernel",
                                nn.initializers.lecun_normal(),
                                (tb * p * p * cfg.in_chans, cfg.embed_dim))
            pbias = self.param("patch_bias", nn.initializers.zeros,
                               (cfg.embed_dim,))
            xp = x.reshape(B, nt, tb, nh, p, nw, p, C)
            xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7)
            xp = xp.reshape(B, cfg.num_patches,
                            tb * p * p * C).astype(cfg.dtype)
            tokens = (jnp.dot(xp, kernel.astype(cfg.dtype),
                              preferred_element_type=jnp.float32)
                      + pbias.astype(jnp.float32)).astype(cfg.dtype)

        cls = self.param("cls_token", trunc_normal_init(0.02),
                         (1, 1, cfg.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype),
                              (B, 1, cfg.embed_dim)), tokens], axis=1)

        # learnable pos-embed, sincos-initialized (internvideo2.py:556-584).
        if cfg.sep_pos_embed:
            def init_sp(key, shape, dtype=jnp.float32):
                # MAE 2D sincos (pos_embed.py:63-80) — NOT the 3d util's
                # spatial slice, which uses a 3*dim/4 split
                from simple_tad_tpu.models.layers import sincos_1d_mae
                gw, gh = np.meshgrid(np.arange(nh, dtype=np.float64),
                                     np.arange(nh, dtype=np.float64))
                # first half encodes meshgrid[0] == the W mesh
                # (pos_embed.py:98-109, "here w goes first")
                emb = np.concatenate(
                    [sincos_1d_mae(cfg.embed_dim // 2, gw),
                     sincos_1d_mae(cfg.embed_dim // 2, gh)], axis=1)
                return jnp.asarray(emb[None], dtype)

            def init_t(key, shape, dtype=jnp.float32):
                from simple_tad_tpu.models.layers import sincos_1d_mae
                emb = sincos_1d_mae(cfg.embed_dim,
                                    np.arange(nt, dtype=np.float64))
                return jnp.asarray(emb[None], dtype)

            pos_sp = self.param("pos_embed_spatial", init_sp,
                                (1, nh * nw, cfg.embed_dim))
            pos_t = self.param("pos_embed_temporal", init_t,
                               (1, nt, cfg.embed_dim))
            pos_cls = self.param("pos_embed_cls", nn.initializers.zeros,
                                 (1, 1, cfg.embed_dim))
            pos = (jnp.tile(pos_sp, (1, nt, 1))
                   + jnp.repeat(pos_t, nh * nw, axis=1))
            pos = jnp.concatenate([pos_cls, pos], axis=1)
        else:
            def init_joint(key, shape, dtype=jnp.float32):
                tab = sincos_3d_pos_embed(cfg.embed_dim, nh, nt)
                zero = np.zeros((1, 1, cfg.embed_dim), np.float32)
                return jnp.asarray(np.concatenate([zero, tab], axis=1),
                                   dtype)
            pos = self.param("pos_embed", init_joint,
                             (1, cfg.num_patches + 1, cfg.embed_dim))
        tokens = tokens + pos.astype(cfg.dtype)

        # model-level sequence once-padding (round 4): the serving
        # kernels otherwise pad q/k/v rows and slice the output back in
        # EVERY layer — real HBM copies (2049 -> 2056 at IV2-B/1B
        # sliding-window geometry).  Pad the token sequence once here,
        # carry n_valid through the blocks, and the kernels mask the
        # garbage keys to -inf in the exp2 pass (padded rows are
        # row-local through LN/GEMM/MLP, so only attention needs care);
        # sliced back off before the pooling head.  Serving-only: the
        # gate requires the int8-storage separate-operand path that
        # implements the masking.
        n_valid = None
        n_tok = tokens.shape[1]
        if (cfg.quant and cfg.quant_mode == "static" and deterministic
                and cfg.attn_impl == "auto" and not return_taps):
            from simple_tad_tpu.ops.attention import (
                attn_seq_pad, i8_storage_attn_sep_supported)
            head_dim = cfg.embed_dim // cfg.num_heads
            np_seq = attn_seq_pad(n_tok, cfg.num_heads, head_dim)
            if np_seq is not None and i8_storage_attn_sep_supported(
                    np_seq, cfg.num_heads, head_dim):
                tokens = jnp.pad(tokens, ((0, 0), (0, np_seq - n_tok),
                                          (0, 0)))
                n_valid = n_tok

        dpr = jnp.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        block = IV2Block(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                         cfg.qkv_bias, cfg.init_values,
                         cfg.qk_normalization, cfg.attn_impl,
                         cfg.quant, cfg.quant_mode, cfg.dtype,
                         name="blocks")

        def body(blk, carry, rate):
            y = blk(carry, rate, deterministic, n_valid)
            # taps: emit every layer's output as a scan ys; the K selected
            # indices are gathered below (teacher runs grad-free, so the
            # (depth, B, N, C) stack is transient HBM, not saved residuals)
            return y, (y if return_taps else None)

        if cfg.remat:
            from simple_tad_tpu.models.layers import remat_policy
            body = nn.remat(body, prevent_cse=False, policy=remat_policy())
        taps = None
        if cfg.scan_blocks:
            scan = nn.scan(body, variable_axes={"params": 0, "calib": 0},
                           split_rngs={"params": True, "dropout": True,
                                       "droppath": True},
                           in_axes=0, length=cfg.depth)
            tokens, ys = scan(block, tokens, dpr)
            if return_taps:
                # ascending layer order — the reference appends taps in
                # block order regardless of return_index order
                # (internvideo2_teacher.py:558-565)
                taps = ys[np.sort(np.asarray(return_taps))]
        else:
            ys = []
            for i in range(cfg.depth):
                tokens = IV2Block(
                    cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                    cfg.qkv_bias, cfg.init_values, cfg.qk_normalization,
                    cfg.attn_impl, cfg.quant, cfg.quant_mode, cfg.dtype,
                    name=f"blocks_{i}")(tokens, dpr[i], deterministic,
                                        n_valid)
                if i in return_taps:
                    ys.append(tokens)   # loop order == ascending layers
            if return_taps:
                taps = jnp.stack(ys)

        if return_taps:
            # teacher surface (internvideo2_teacher.py:575-588): l2 the
            # middle features, l2 the projector output (no fc_norm), and
            # return the pooling attention over non-CLS tokens
            def l2n(t):
                t = t.astype(jnp.float32)
                return t / jnp.maximum(
                    jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-6)
            final, attn = AttentionPooling(
                cfg.embed_dim, cfg.attn_pool_num_heads, cfg.clip_embed_dim,
                qkv_bias=True, dtype=cfg.dtype,
                name="clip_projector")(tokens, return_attn=True)
            return l2n(taps), l2n(final), attn[:, 1:]

        if n_valid is not None:
            # drop the garbage pad rows before the pooling head (it
            # mean-reduces and cross-attends over every row)
            tokens = tokens[:, :n_valid]
        feats = AttentionPooling(cfg.embed_dim, cfg.attn_pool_num_heads,
                                 cfg.clip_embed_dim, qkv_bias=True,
                                 dtype=cfg.dtype,
                                 name="clip_projector")(tokens)
        feats = LayerNormEps(cfg.clip_embed_dim, eps=1e-5, dtype=cfg.dtype,
                             name="fc_norm")(feats)
        if features_only:
            return feats
        if cfg.fc_drop_rate > 0:
            feats = nn.Dropout(cfg.fc_drop_rate)(feats,
                                                 deterministic=deterministic)
        head_std = 0.02 * cfg.init_scale if cfg.init_scale > 0 else 0.02
        return nn.Dense(cfg.num_classes, dtype=jnp.float32,
                        kernel_init=trunc_normal_init(head_std),
                        name="head")(feats.astype(jnp.float32))

    def init_params(self, rng, batch_size: int = 1):
        cfg = self.cfg
        dummy = jnp.zeros((batch_size, cfg.num_frames, cfg.img_size,
                           cfg.img_size, cfg.in_chans), cfg.dtype)
        return self.init(rng, dummy, deterministic=True)["params"]
