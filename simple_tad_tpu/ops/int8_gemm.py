"""Fused w8a8 Pallas GEMM kernels (quantize-in-kernel int8 matmul).

STATUS — measured on v5e and currently OPT-IN, not the production path.
The hypothesis (VERDICT r1 #1) was that the unfused XLA int8 path pays an
extra materialized quantize pass per GEMM.  Whole-model A/B on the real
chip falsified it: XLA already fuses the static scale+round+clip into the
producer epilogue (LN/GELU), and its int8 GEMM emitter sustains 267 TF/s
through a 12-block scan where this Mosaic kernel reaches 215 TF/s — swap
the fused kernels into ViT-B eval and throughput drops 298.7 -> 211.0
(per-GEMM) / 227.3 (with the whole-MLP kernel) windows/s.  Standalone
single-GEMM programs DO win (5.11 ms vs 5.39 ms at M=150528 K=768 N=2304
including the ~3 ms per-dispatch relay cost) because there is no producer
to fuse the quantize into.  Kept for that case and as the substrate for
epilogue fusions XLA cannot express; enable with SIMPLE_TAD_FUSED_W8A8=1 /
SIMPLE_TAD_FUSED_MLP=1.

Two kernels:

  * ``w8a8_gemm`` — y = act(q8(x) @ Wq) * (w_scale * a_amax/127) + b for a
    single GEMM; optional fused bias + GELU epilogue.
  * ``w8a8_mlp``  — the whole transformer MLP (fc1 -> GELU -> quantize ->
    fc2) in ONE pallas_call; the (tokens, 4*dim) hidden tensor never
    touches HBM.

Parity: the matmul work the reference does through torch/cuBLAS inside
/root/reference/modeling_finetune.py:37-54 (Mlp) and :57-134 (Attention
qkv/proj), for the opt-in int8 inference path; the quantization recipe
(per-output-channel weights, static per-tensor activation scales) is
unchanged from ops/quant.py.

Activation rounding matches ops/quant.py (jnp.round = round-half-even) so
the fused kernels are bit-identical in int space to the unfused XLA path
— gated by tests/test_int8_gemm.py in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget per kernel instance.  v5e has ~16 MB/core; leave
# headroom for double-buffered pipelining of the M-tiles.
_VMEM_BUDGET = 12 * 2 ** 20


def use_fused_w8a8(in_dim: int, out_dim: int) -> bool:
    """Route a static-quant GEMM through the fused Pallas kernel?

    DEFAULT OFF — measured v5e (ViT-B eval, whole-model A/B, quiet chip):
    XLA's int8 GEMM emitter sustains 267 TF/s through a 12-block scan and
    already fuses the static quantize into the producer epilogue; this
    Mosaic kernel reaches 215 TF/s on the same chain (298.7 -> 211.0
    windows/s when swapped in).  Kept as an opt-in building block (it DOES
    win when a GEMM stands alone with nothing to fuse into, and it is the
    substrate for future epilogue fusions XLA cannot express).
    SIMPLE_TAD_FUSED_W8A8: '1' enables on TPU, 'force' enables anywhere
    (interpret-mode tests).
    """
    import os
    flag = os.environ.get("SIMPLE_TAD_FUSED_W8A8", "")
    if flag not in ("1", "force"):
        return False
    if in_dim % 128 or out_dim % 128:
        return False
    return flag == "force" or jax.default_backend() == "tpu"


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _quantize_tile(x, inv):
    """bf16/f32 tile -> int8 tile with static scale (round-half-even,
    symmetric clip) — the exact math of ops/quant.py:int8_matmul_static."""
    xi = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127)
    return xi.astype(jnp.int8)


def _gelu_tanh(x):
    """tanh GELU at fp32 (the bf16-path activation; see
    models/layers.py:gelu_for — erf-vs-tanh is sub-quantum at bf16)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


# ------------------------------------------------------------------ GEMM ---

def _gemm_kernel(inv_ref, x_ref, w_ref, scale_ref, bias_ref, o_ref, *, act):
    xq = _quantize_tile(x_ref[:], inv_ref[0, 0])
    y = jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    y = y * scale_ref[:] + bias_ref[:]
    if act == "gelu":
        y = _gelu_tanh(y)
    o_ref[:] = y.astype(o_ref.dtype)


def w8a8_gemm(x, w_q, w_scale, a_amax, bias=None, act=None, *,
              block_m: int = 256, block_n: int = 0,
              out_dtype=jnp.bfloat16):
    """Fused quantize + int8 matmul: (..., K) x (K, N) -> (..., N).

    x        float (bf16/f32) activations
    w_q      (K, N) int8 per-output-channel quantized weight
    w_scale  (N,) f32 weight scales (absmax/127)
    a_amax   scalar calibrated activation absmax (static quantization)
    bias     optional (N,) f32
    act      None | 'gelu' fused epilogue
    """
    *lead, K = x.shape
    N = w_q.shape[1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)

    if block_n <= 0:
        # whole-N when the weight block fits the budget, else split
        block_n = N
        while block_n > 128 and _gemm_vmem(block_m, K, block_n) > _VMEM_BUDGET:
            block_n //= 2
    bm = min(block_m, _ceil_to(M, 32))
    Mp = _ceil_to(M, bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    inv = (127.0 / jnp.maximum(a_amax, 1e-12)).reshape(1, 1).astype(
        jnp.float32)
    comb = (w_scale * (jnp.maximum(a_amax, 1e-12) / 127.0)).astype(
        jnp.float32).reshape(1, N)
    b = (jnp.zeros((1, N), jnp.float32) if bias is None
         else bias.astype(jnp.float32).reshape(1, N))

    # the quantization scale rides SMEM as a plain input — scalar
    # *prefetch* would stall the launch on a value computed on-device
    # inside the block scan (measured: -30% whole-model)
    grid = (Mp // bm, N // block_n)
    out = pl.pallas_call(
        functools.partial(_gemm_kernel, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
    )(inv, x2, w_q, comb, b)
    return out[:M].reshape(*lead, N)


def _gemm_vmem(bm, K, bn):
    return (bm * K * 2          # x tile bf16
            + bm * K            # xq int8
            + K * bn            # weight block int8
            + bm * bn * 4       # fp32 accum tile
            + bm * bn * 2)      # out tile


# ------------------------------------------------------------- fused MLP ---

def _mlp_kernel(scalars_ref, x_ref, w1_ref, s1_ref, b1_ref,
                w2_ref, s2_ref, b2_ref, o_ref):
    inv1 = scalars_ref[0, 0]
    inv2 = scalars_ref[0, 1]
    xq = _quantize_tile(x_ref[:], inv1)
    h = jax.lax.dot_general(
        xq, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    h = _gelu_tanh(h * s1_ref[:] + b1_ref[:])
    hq = _quantize_tile(h, inv2)
    y = jax.lax.dot_general(
        hq, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    o_ref[:] = (y * s2_ref[:] + b2_ref[:]).astype(o_ref.dtype)


def _mlp_vmem(dim: int, hidden: int, block_m: int) -> int:
    return (dim * hidden * 2              # both weight stacks int8
            + block_m * (dim * 2 + dim)   # x bf16 + xq
            + block_m * hidden * 4        # h fp32
            + block_m * hidden            # hq int8
            + block_m * dim * 4)          # y accum


def mlp_block_m(dim: int, hidden: int) -> int:
    """Largest M-tile (256 down to 64) whose working set fits VMEM;
    0 if even 64 does not fit (caller must use per-GEMM kernels)."""
    for bm in (256, 128, 64):
        if _mlp_vmem(dim, hidden, bm) <= _VMEM_BUDGET:
            return bm
    return 0


def mlp_fits_vmem(dim: int, hidden: int) -> bool:
    return mlp_block_m(dim, hidden) > 0


def use_fused_mlp(dim: int, hidden: int) -> bool:
    """Gate for the whole-MLP kernel — same default-off rationale as
    use_fused_w8a8 (whole-model A/B: fused-MLP beat the fused per-GEMM
    config by +16 w/s but both lose to XLA's chain); SIMPLE_TAD_FUSED_MLP=1
    opts in on TPU, 'force' anywhere (interpret-mode tests)."""
    import os
    flag = os.environ.get("SIMPLE_TAD_FUSED_MLP", "")
    if flag not in ("1", "force"):
        return False
    if dim % 128 or hidden % 128 or not mlp_fits_vmem(dim, hidden):
        return False
    return flag == "force" or jax.default_backend() == "tpu"


def w8a8_mlp(x, w1_q, s1, amax1, b1, w2_q, s2, amax2, b2, *,
             block_m: int = 0, out_dtype=jnp.bfloat16):
    """Whole MLP in one kernel: y = q8(gelu(q8(x) @ W1 * c1 + b1)) @ W2 * c2 + b2.

    The (M, hidden) intermediate lives only in VMEM.  Falls back must be
    handled by the caller via ``mlp_fits_vmem`` (e.g. IV2-1B's 1408x6144
    weight pair exceeds the VMEM budget).
    """
    *lead, K = x.shape
    H = w1_q.shape[1]
    D = w2_q.shape[1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    if block_m <= 0:
        block_m = mlp_block_m(K, H) or 64
    bm = min(block_m, _ceil_to(M, 32))
    Mp = _ceil_to(M, bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    a1 = jnp.maximum(amax1, 1e-12)
    a2 = jnp.maximum(amax2, 1e-12)
    scalars = jnp.stack([127.0 / a1, 127.0 / a2]).astype(
        jnp.float32).reshape(1, 2)
    c1 = (s1 * (a1 / 127.0)).astype(jnp.float32).reshape(1, H)
    c2 = (s2 * (a2 / 127.0)).astype(jnp.float32).reshape(1, D)
    b1 = (jnp.zeros((1, H), jnp.float32) if b1 is None
          else b1.astype(jnp.float32).reshape(1, H))
    b2 = (jnp.zeros((1, D), jnp.float32) if b2 is None
          else b2.astype(jnp.float32).reshape(1, D))

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, K), lambda i: (i, 0)),
            pl.BlockSpec((K, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, D), out_dtype),
    )(scalars, x2, w1_q, c1, b1, w2_q, c2, b2)
    return out[:M].reshape(*lead, D)
