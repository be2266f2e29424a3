"""Single-read fused LayerNorm (Pallas, inference serving path).

Why: XLA lowers LayerNorm as a reduce kernel followed by an elementwise
kernel, so the activation streams from HBM twice (plus the write) — at
ViT-B batch-96 eval geometry each LN moves 3 x 232 MB and the 24 LNs cost
15.3 ms of the 224 ms program (scripts/perf_breakdown.py).  Computing the
row statistics on the VMEM-resident tile reads x once: 2 passes of HBM
traffic instead of 3.

Statistics match models/layers.py:LayerNormFp32 exactly: fp32 mean/var
(biased), rsqrt(var + eps), fp32 affine, cast to out dtype.  Parity gated
by tests/test_flash_attention.py (interpret mode).

Reference behavior: torch nn.LayerNorm inside the pre-LN blocks
(/root/reference/modeling_finetune.py:137-166).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)              # (rows, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_quant_kernel(inv_ref, x_ref, s_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.clip(jnp.round(y * inv_ref[0, 0]),
                          -127, 127).astype(jnp.int8)


def fused_layernorm_quant(x, scale, bias, amax, *, eps: float = 1e-6):
    """LayerNorm + static int8 quantize in ONE kernel -> int8 (..., C).

    The serving win at wide dims: the plain Pallas LN LOSES at C=768
    (481.1 -> 471.7 w/s) because the opaque kernel boundary breaks XLA's
    quantize-into-LN fusion; emitting the consumer GEMM's int8 activation
    directly restores it AND keeps the single-read statistics.  ``amax``
    is the calibrated absmax of the LN OUTPUT (the consumer GEMM's
    act_amax — numerically identical calibration site).  Quantization
    math is bit-identical to ops.quant.int8_matmul_static's input side
    (round-half-even, symmetric clip).
    """
    orig_shape = x.shape
    C = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, C)
    pad = (-rows) % 8
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    rp = rows + pad
    br = _pick_rows(rp)
    from jax.experimental.pallas import tpu as pltpu
    inv = (127.0 / jnp.maximum(jnp.asarray(amax, jnp.float32),
                               1e-12)).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps),
        grid=(rp // br,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, C), jnp.int8),
    )(inv, x2, scale.reshape(1, C), bias.reshape(1, C))
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape[:-1] + (C,))


def _add_ln_quant_kernel(inv_ref, a_ref, r_ref, s_ref, b_ref, sum_ref,
                         o_ref, *, eps):
    s = (a_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32))
    s = s.astype(sum_ref.dtype)
    sum_ref[...] = s
    x = s.astype(jnp.float32)           # stats on the STORED value: the
    mean = jnp.mean(x, axis=-1, keepdims=True)   # unfused path LNs the
    xc = x - mean                                # bf16 residual stream,
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)  # so round-trip first
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.clip(jnp.round(y * inv_ref[0, 0]),
                          -127, 127).astype(jnp.int8)


def fused_add_layernorm_quant(branch, residual, scale, bias, amax, *,
                              eps: float = 1e-6):
    """Residual add + LayerNorm + static int8 quantize in ONE kernel.

    Returns ``(residual + branch, int8(LN(residual + branch)))``.  The
    serving block chain otherwise runs the add as its own XLA pass whose
    bf16 sum the (opaque) LNQ kernel then re-reads from HBM — fusing the
    add into the LNQ read saves one full activation read per residual
    site (2 per block).  Bit-compatible with ``x + branch`` followed by
    :func:`fused_layernorm_quant`: the sum is rounded to the storage
    dtype BEFORE the fp32 statistics, exactly like the unfused path.
    """
    assert branch.shape == residual.shape
    orig_shape = branch.shape
    C = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    a2 = branch.reshape(rows, C)
    r2 = residual.reshape(rows, C)
    pad = (-rows) % 8
    if pad:
        a2 = jnp.pad(a2, ((0, pad), (0, 0)))
        r2 = jnp.pad(r2, ((0, pad), (0, 0)))
    rp = rows + pad
    br = _pick_rows(rp)
    from jax.experimental.pallas import tpu as pltpu
    inv = (127.0 / jnp.maximum(jnp.asarray(amax, jnp.float32),
                               1e-12)).reshape(1, 1)
    ssum, out = pl.pallas_call(
        functools.partial(_add_ln_quant_kernel, eps=eps),
        grid=(rp // br,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, C), lambda i: (i, 0)),
            pl.BlockSpec((br, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((br, C), lambda i: (i, 0)),
                   pl.BlockSpec((br, C), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((rp, C), branch.dtype),
                   jax.ShapeDtypeStruct((rp, C), jnp.int8)],
    )(inv, a2, r2, scale.reshape(1, C), bias.reshape(1, C))
    if pad:
        ssum, out = ssum[:rows], out[:rows]
    return (ssum.reshape(orig_shape), out.reshape(orig_shape))


def _rms_quant_kernel(x_ref, s_ref, inv_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.clip(jnp.round(y * inv_ref[...].astype(jnp.float32)),
                          -127, 127).astype(jnp.int8)


def fused_rmsnorm_quant(x, scale, inv_c, *, eps: float = 1e-6):
    """RMSNorm (fp32 statistics, no mean subtraction) + static int8
    quantize in ONE single-read kernel -> int8 (..., C).

    The InternVideo2 analogue of fused_layernorm_quant: the reference
    trunk RMS-normalizes norm1/norm2 AND the sliced q/k (qk_normalization,
    reference internvideo2.py:119-219), each an XLA reduce+elementwise
    pair that reads the activation twice.  OPT-IN (measured loss on v5e —
    see supports_fused_rmsq).  ``inv_c`` is a (C,) fp32
    per-CHANNEL 127/amax vector — a broadcast scalar for the per-tensor
    GEMM-input sites (norm1 -> qkv, norm2 -> fc1), a per-head repeat for
    the q/k sites feeding the int8-storage attention kernel's per-head
    scales (ops/flash_attention.flash_attention_i8d).  Quantizing the
    fp32 normalized value directly (the unfused path rounds through the
    model dtype first) only tightens the PTQ error; drift stays gated by
    tests/test_quant.py."""
    orig_shape = x.shape
    C = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, C)
    pad = (-rows) % 8
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    rp = rows + pad
    br = _pick_rows(rp)
    out = pl.pallas_call(
        functools.partial(_rms_quant_kernel, eps=eps),
        grid=(rp // br,),
        in_specs=[
            pl.BlockSpec((br, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, C), jnp.int8),
    )(x2, scale.reshape(1, C), inv_c.reshape(1, C).astype(jnp.float32))
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape[:-1] + (C,))


def supports_fused_rmsq(C: int) -> bool:
    """Gate for the RMSNorm->int8 fused output (IV2 static-quant serving).

    MEASURED LOSS ON v5e — OPT-IN ONLY.  Whole-model A/B, same session,
    fresh buffers (2026-08-19): IV2-B b48 201.3-201.8 ms fused vs 191.4
    unfused; IV2-1B b16 565.3 vs 545.4.  Unlike the ViT trunk's
    LayerNormQuant (a clear win at C=768), the IV2 block already feeds
    every norm output into a static-quant consumer whose round/clip XLA
    fuses into the norm's own elementwise pass — so the fused kernel only
    saves the reduce read, while costing 4 extra Pallas launches per
    layer (norm1, norm2, q-norm, k-norm) that break XLA's inter-op
    scheduling overlap.  SIMPLE_TAD_FUSED_RMSQ=1 re-enables on TPU,
    =force anywhere (interpret-mode tests)."""
    import os
    flag = os.environ.get("SIMPLE_TAD_FUSED_RMSQ", "")
    if os.environ.get("SIMPLE_TAD_NO_FUSED_RMSQ"):
        return False
    if C % 128 != 0:
        return False
    if flag == "force":
        return True
    return bool(flag) and jax.default_backend() == "tpu"


def supports_fused_ln_quant(C: int) -> bool:
    """Gate for the LN->int8 fused output (static-quant serving only).
    SIMPLE_TAD_NO_FUSED_LNQ=1 disables; 'force' enables off-TPU for
    interpret tests."""
    import os
    if os.environ.get("SIMPLE_TAD_NO_FUSED_LNQ"):
        return False
    if C % 128 != 0:
        return False
    return (jax.default_backend() == "tpu"
            or os.environ.get("SIMPLE_TAD_FUSED_LNQ") == "force")


def _pick_rows(n: int, target: int = 512) -> int:
    best = 8
    for d in range(8, min(n, target) + 1, 8):
        if n % d == 0:
            best = d
    return best


def fused_layernorm(x, scale, bias, *, eps: float = 1e-6, out_dtype=None):
    """LayerNorm over the last axis with fp32 statistics, one HBM read.

    x: (..., C) with C a multiple of 128 (full-lane rows); falls back to
    the caller's XLA path otherwise (use supports_fused_ln to gate).

    Differentiable: the Pallas kernel carries a custom VJP whose backward
    is the analytic LayerNorm gradient in plain XLA fp32 (the backward is
    matmul-adjacent elementwise work XLA fuses well; only the forward's
    extra HBM read was worth a kernel).  Without this, jax.grad through a
    pallas_call raises — and LayerNormFp32 routes through here for
    C <= 512 on TPU, i.e. every ViT-S training step.
    """
    out_dtype = out_dtype or x.dtype
    return _fused_ln_core(x, scale, bias, float(eps),
                          jnp.dtype(out_dtype).name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln_core(x, scale, bias, eps, out_dtype_name):
    return _fused_ln_impl(x, scale, bias, eps, out_dtype_name)


def _fused_ln_fwd(x, scale, bias, eps, out_dtype_name):
    return _fused_ln_impl(x, scale, bias, eps, out_dtype_name), (x, scale)


def _fused_ln_bwd(eps, out_dtype_name, res, dy):
    x, scale = res
    x32 = x.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = xc * r
    dxhat = dy32 * scale.astype(jnp.float32)
    dx = r * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
              - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    axes = tuple(range(dy.ndim - 1))
    dscale = jnp.sum(dy32 * xhat, axis=axes)
    dbias = jnp.sum(dy32, axis=axes)
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


_fused_ln_core.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def _fused_ln_impl(x, scale, bias, eps, out_dtype_name):
    out_dtype = jnp.dtype(out_dtype_name)
    orig_shape = x.shape
    C = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, C)
    pad = (-rows) % 8
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    rp = rows + pad
    br = _pick_rows(rp)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rp // br,),
        in_specs=[
            pl.BlockSpec((br, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, C), out_dtype),
    )(x2, scale.reshape(1, C), bias.reshape(1, C))
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape[:-1] + (C,))


def supports_fused_ln(C: int) -> bool:
    """Measured v5e (int8 serving, b96, whole-model): the kernel WINS at
    ViT-S width (1064.8 -> 1118.7 w/s, C=384) and LOSES at ViT-B (481.1 ->
    471.7, C=768) — at the wider dim XLA's quantize-into-LN-epilogue
    fusion, which the opaque Pallas boundary breaks, is worth more than
    the saved reduce pass.  Default: ON for C <= 512 on TPU.
    SIMPLE_TAD_FUSED_LN=1 forces all widths, =0 disables, =force enables
    off-TPU (interpret tests)."""
    import os
    flag = os.environ.get("SIMPLE_TAD_FUSED_LN", "")
    if flag == "0":
        return False
    if C % 128 != 0:
        return False
    if flag == "force":
        return True
    if jax.default_backend() != "tpu":
        return False
    return bool(flag) or C <= 512
