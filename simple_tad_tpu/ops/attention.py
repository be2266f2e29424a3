"""Attention dispatch: Pallas flash kernel / XLA fused / naive reference.

Replaces the reference's flash-attn CUDA dependency
(/root/reference/flash_attention_class.py, modeling_finetune.py:86-130) with
TPU-native implementations.  All paths compute softmax in float32.

Shapes: q, k, v are (B, N, H, Dh); output (B, N, H, Dh).
"""

from __future__ import annotations


import os
from typing import Optional

import jax
import jax.numpy as jnp


def _naive_attention(q, k, v, scale, dropout_rate=0.0, dropout_rng=None,
                     deterministic=True, dropout_mask=None):
    """Reference-math attention: (q*scale) @ k^T -> softmax fp32 -> @ v."""
    dtype = q.dtype
    q = q * jnp.asarray(scale, q.dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_mask is not None:
        probs = probs * (dropout_mask.astype(jnp.float32)
                         / (1.0 - dropout_rate))
    elif dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=dtype)


def make_dropout_mask(rng, rate, B, H, N):
    """int8 (B, H, N, N) keep-mask for attention dropout — generated once
    in XLA and streamed through the Pallas kernels (1 byte per score
    element instead of the naive path's materialized fp32 probs)."""
    return jax.random.bernoulli(rng, 1.0 - rate,
                                (B, H, N, N)).astype(jnp.int8)


def _xla_attention(q, k, v, scale):
    """XLA fused attention (lowers to a well-tiled TPU program)."""
    return jax.nn.dot_product_attention(q, k, v, scale=scale,
                                        implementation="xla")


def i8_storage_attn_supported(N: int, C: int, num_heads: int) -> bool:
    """Can the int8-STORAGE attention kernel serve this geometry?

    Unlike the retired int8-COMPUTE path (int8_attn_supported below),
    this only quantizes what crosses HBM: the qkv GEMM's quantize
    epilogue fuses on the XLA side (bf16 qkv never materializes), the
    kernel contracts QK as exact s8xs8->s32 with the scales folded into
    the logit scale, dequantizes v once in VMEM, and keeps the bf16
    path's max-free softmax + transposed PV.  Opt-out via
    SIMPLE_TAD_QKV_I8=0; SIMPLE_TAD_FORCE_QKV_I8=1 enables off-TPU for
    interpret-mode tests.

    Geometry: head_dim divides 128 (not a multiple), channel axis
    128-aligned, N within the single-pass cap.
    """
    from simple_tad_tpu.ops.flash_attention import (MAX_SINGLE_PASS_N,
                                                    _packed_block_q,
                                                    _pad_rows)
    if os.environ.get("SIMPLE_TAD_QKV_I8", "1") == "0":
        return False
    if not (jax.default_backend() == "tpu"
            or os.environ.get("SIMPLE_TAD_FORCE_QKV_I8")):
        return False
    D = C // num_heads
    return (N <= MAX_SINGLE_PASS_N and D % 128 != 0
            and _packed_block_q(_pad_rows(N), C, D, 0) > 0)


def i8_storage_attn_sep_supported(N: int, num_heads: int,
                                  head_dim: int) -> bool:
    """Can the int8-STORAGE kernels serve SEPARATE q/k/v at this geometry?

    The IV2 analogue of i8_storage_attn_supported: qk_normalization sits
    between the qkv GEMM and the kernel, so q/k quantize in the RMSNorm
    fusion's epilogue (not the GEMM's) and arrive as separate operands.
    Covers both the single-pass packed kernel and the key-grid kernel
    (N > single-pass cap — IV2's 2049-token sliding windows), with head
    dims that only need 8-alignment (IV2-1B's 88 zero-pads to 128
    exactly).  Same opt-outs as the packed variant.
    """
    from simple_tad_tpu.ops.flash_attention import (_i8_head_pad,
                                                    _kv_grid_plan,
                                                    _packed_block_q,
                                                    _pad_rows)
    if os.environ.get("SIMPLE_TAD_QKV_I8", "1") == "0":
        return False
    if not (jax.default_backend() == "tpu"
            or os.environ.get("SIMPLE_TAD_FORCE_QKV_I8")):
        return False
    dp = _i8_head_pad(head_dim)
    if not dp or (num_heads * dp) % 128 != 0:
        return False       # channel axis must tile into 128-lane groups
    if not os.environ.get("SIMPLE_TAD_NO_ATTN_PV_T") \
            and _kv_grid_plan(N, 0) is not None:
        return True
    return _packed_block_q(_pad_rows(N), num_heads * dp, dp, 0) > 0


def attn_seq_pad(N: int, num_heads: int, head_dim: int):
    """Physical sequence length for MODEL-LEVEL once-padding, or None.

    The serving kernels otherwise pad q/k/v rows EVERY LAYER (and slice
    the output back), each a real HBM copy — at IV2-B's 2049-token
    windows that is 4 copies x 12 layers a batch.  Padding the token
    sequence ONCE after the embed (zeros) and carrying n_valid through
    the blocks removes all of them; padded rows flow through LN/GEMMs as
    bounded garbage (row-local ops), and the kernels mask garbage KEYS
    to -inf in the exp2 pass (measured free on v5e — docs/ROOFLINE.md
    round-3 falsification list) so valid rows stay exact.

    Returns the length the attention plans would pick themselves, so the
    per-layer pads become no-ops; None when padding buys nothing here.
    """
    from simple_tad_tpu.ops.flash_attention import (_i8_head_pad,
                                                    _kv_grid_plan,
                                                    _pad_rows_qk)
    if os.environ.get("SIMPLE_TAD_NO_SEQ_PAD"):
        return None
    if not (jax.default_backend() == "tpu"
            or os.environ.get("SIMPLE_TAD_FORCE_QKV_I8")):
        return None
    if os.environ.get("SIMPLE_TAD_NO_ATTN_PV_T"):
        return None
    dp = _i8_head_pad(head_dim)
    if not dp or (num_heads * dp) % 128 != 0:
        return None
    plan = _kv_grid_plan(N, 0)
    if plan is not None:
        Np_q = plan[0]
    else:
        Np_q, _ = _pad_rows_qk(N, num_heads * dp, dp, 0)
    # a key grid that overshoots Np_q (bk * n_kv > Nq) keeps a small
    # per-layer k/v pad — the driver masks those rows like the rest
    return Np_q if Np_q > N else None


def int8_attn_supported(N: int, C: int, num_heads: int) -> bool:
    """Can the static-calibrated int8 attention kernel serve this geometry?

    MEASURED LOSS ON v5e — OPT-IN ONLY (SIMPLE_TAD_INT8_ATTN=1 on TPU,
    SIMPLE_TAD_FORCE_INT8_ATTN=1 off-TPU for interpret tests).  Whole-model
    A/B at ViT-B int8 batch-96 eval (2026-08-17): bf16 kernel 429 w/s;
    int8 with ones-column denominator 404.9; int8 with fp32 row-sum
    denominator + unaugmented PV 358.8.  Why the static-scale hypothesis
    (VERDICT r2 #1a) failed: the int8 MXU 2x never materializes at this
    geometry — QK contracts over K=64 (half the array depth idle in bf16
    already, so halving K buys nothing) and PV produces 64 output columns
    (the 128-lane array is half idle regardless of dtype; the ones-column
    rides free in bf16 but doubles nothing int8 can halve) — while the
    probs quantization FORCES a max-subtracted softmax (+1 VPU pass) plus
    a fp32->int8 pack pass.  Same conclusion as the round-2 dynamic
    int8-QK experiment, now with the calibration cost at zero.

    Geometry requirements when enabled: head_dim divides 128, channel
    axis 128-aligned, N within the single-pass cap, head_dim % 128 != 0.
    """
    from simple_tad_tpu.ops.flash_attention import (MAX_SINGLE_PASS_N,
                                                    _pad_rows,
                                                    _packed_block_q)
    on_tpu = (jax.default_backend() == "tpu"
              and os.environ.get("SIMPLE_TAD_INT8_ATTN"))
    if not (on_tpu or os.environ.get("SIMPLE_TAD_FORCE_INT8_ATTN")):
        return False
    D = C // num_heads
    return (N <= MAX_SINGLE_PASS_N and D % 128 != 0
            and _packed_block_q(_pad_rows(N), C, D, 0) > 0)


def dot_product_attention_qkv(qkv, *, num_heads: int, scale: float,
                              impl: str = "auto", dropout_rate: float = 0.0,
                              dropout_rng=None, deterministic: bool = True,
                              out_quant_amax=None):
    """Attention straight off the packed qkv projection.

    qkv: (B, N, 3*C) in [q | k | v] column order (the reference's packed
    parameterization, modeling_finetune.py:100-104) -> (B, N, C).

    On the TPU fast path the kernel reads q/k/v through block specs into
    the ORIGINAL qkv array — XLA otherwise materializes the three column
    slices as real copies (~17 GB per ViT-B batch-96 eval batch) because
    Pallas operands cannot absorb fused producers.  Everything else falls
    back to slicing + dot_product_attention.
    """
    from simple_tad_tpu.ops.flash_attention import (MAX_SINGLE_PASS_N,
                                                    _pad_rows,
                                                    _packed_block_q,
                                                    flash_attention_qkv)
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    if os.environ.get("SIMPLE_TAD_ABLATE_ATTN"):
        # measurement knob: zero-FLOP stand-in that still reads every qkv
        # column (so XLA cannot narrow the producer GEMM) — the full-vs-
        # this delta is the attention-core cost in a whole-model A/B.
        third = jnp.asarray(1.0 / 3.0, qkv.dtype)
        return (qkv[:, :, :C] + qkv[:, :, C:2 * C]
                + qkv[:, :, 2 * C:]) * third
    dropping = dropout_rate > 0.0 and not deterministic
    if (impl == "auto" and not dropping
            and (jax.default_backend() == "tpu"
                 or os.environ.get("SIMPLE_TAD_FORCE_PACKED_ATTN"))
            and D % 64 == 0 and N <= MAX_SINGLE_PASS_N
            and not os.environ.get("SIMPLE_TAD_NO_PACKED_ATTN")
            and not os.environ.get("SIMPLE_TAD_SAFE_SOFTMAX")
            and _packed_block_q(_pad_rows(N), C, D, 0) > 0):
        return flash_attention_qkv(qkv, num_heads=num_heads, scale=scale,
                                   out_quant_amax=out_quant_amax)
    qkv4 = qkv.reshape(B, N, 3, num_heads, D)
    out = dot_product_attention(
        qkv4[:, :, 0], qkv4[:, :, 1], qkv4[:, :, 2], scale=scale,
        impl=impl, dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        deterministic=deterministic)
    return out.reshape(B, N, C)


def dot_product_attention(q, k, v, *, scale: float, impl: str = "auto",
                          dropout_rate: float = 0.0,
                          dropout_rng=None, deterministic: bool = True,
                          out_quant_amax=None):
    """Non-causal multi-head attention with selectable backend.

    impl:
      auto   — pallas flash kernel on TPU (no dropout), else XLA fused.
      pallas — force the Pallas flash kernel.
      xla    — jax.nn.dot_product_attention (XLA fused).
      naive  — explicit matmul+softmax (parity/debug; supports attn dropout).

    out_quant_amax: static-quant int8 output epilogue (see
    flash_attention); honored only on the Pallas no-dropout path —
    callers must handle a float return otherwise.
    """
    from simple_tad_tpu.ops.flash_attention import MAX_SINGLE_PASS_N
    if os.environ.get("SIMPLE_TAD_ABLATE_ATTN"):
        # measurement knob (see dot_product_attention_qkv): zero-FLOP
        # stand-in that still reads q/k/v so producers cannot narrow
        third = jnp.asarray(1.0 / 3.0, q.dtype)
        return (q + k + v) * third
    dropping = dropout_rate > 0.0 and not deterministic
    if impl == "auto":
        if jax.default_backend() == "tpu":
            # includes odd head dims (IV2-1B: 88 -> zero-padded to 128):
            # round 2 kept those on XLA from a measurement taken while
            # ugly sequence lengths collapsed the kernel's query block to
            # 8 rows (_pad_rows); re-measured whole-model after the fix,
            # the padded Pallas kernel WINS — IV2-1B b8 20.3 vs 14.6
            # clips/s.  Dropout rides the Pallas kernel via the in-kernel
            # hardware PRNG (round 1 fell back to naive here).
            impl = "pallas"
        elif dropping:
            impl = "naive"  # XLA fused attention has no dropout
        else:
            impl = "xla"

    mask = seed = None
    if dropping and impl == "pallas" and q.shape[1] > MAX_SINGLE_PASS_N:
        impl = "naive"   # pallas falls back to XLA above this N: no dropout
    if dropping and impl == "pallas" and jax.default_backend() == "tpu" \
            and not os.environ.get("SIMPLE_TAD_DROPOUT_MASK"):
        # production path: keep bits from the TPU hardware PRNG inside
        # the kernels — nothing materialized (see flash_attention.py).
        # Interpret mode has no PRNG, so off-TPU keeps the mask path.
        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(dropout_rng, (1, 2), jnp.uint32), jnp.int32)
    elif dropping and impl in ("pallas", "naive"):
        B, N, H, _ = q.shape
        mask = make_dropout_mask(dropout_rng, dropout_rate, B, H, N)

    if impl == "naive":
        return _naive_attention(q, k, v, scale, dropout_rate, dropout_rng,
                                deterministic, dropout_mask=mask)
    if impl == "xla":
        if dropping:
            return _naive_attention(q, k, v, scale, dropout_rate,
                                    dropout_rng, deterministic)
        return _xla_attention(q, k, v, scale)
    if impl == "pallas":
        from simple_tad_tpu.ops.flash_attention import flash_attention
        dh = q.shape[-1]
        keep = 1.0 - dropout_rate
        if dh % 64 == 0:
            return flash_attention(q, k, v, scale=scale,
                                   dropout_mask=mask, dropout_seed=seed,
                                   keep_prob=keep,
                                   out_quant_amax=out_quant_amax)
        # odd head dims (InternVideo2-1B: 88) — zero-pad to the next lane
        # multiple; padded q/k columns contribute 0 to every score and
        # padded v columns produce output columns we slice off, so the
        # result is exact.
        pad = (-dh) % 64
        cfg = [(0, 0)] * (q.ndim - 1) + [(0, pad)]
        out = flash_attention(jnp.pad(q, cfg), jnp.pad(k, cfg),
                              jnp.pad(v, cfg), scale=scale,
                              dropout_mask=mask, dropout_seed=seed,
                              keep_prob=keep,
                              out_quant_amax=out_quant_amax)
        return out[..., :dh]
    raise ValueError(f"unknown attention impl: {impl!r}")
