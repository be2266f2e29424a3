"""TPU microbench: fused w8a8 Pallas GEMM/MLP vs XLA bf16 and unfused int8.

ViT-B eval geometry: M = 96 windows x 1568 tokens, dim 768, hidden 3072.
Prints one line per variant; distinct input buffers per timed call (the
serving relay memoizes repeated identical executions).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from simple_tad_tpu.utils.cache import enable_persistent_cache
from simple_tad_tpu.ops.quant import quantize_weight, int8_matmul_static
from simple_tad_tpu.ops.int8_gemm import w8a8_gemm, w8a8_mlp, _gelu_tanh

enable_persistent_cache()

M, K, N, H = 96 * 1568, 768, 2304, 3072
rng = np.random.default_rng(0)
NBUF = 8
xs = [jnp.asarray(rng.normal(size=(M, K)).astype(np.float32),
                  jnp.bfloat16) for _ in range(NBUF)]

w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
wq, ws = quantize_weight(w)
wq, ws = jnp.asarray(wq), jnp.asarray(ws)
wb = jnp.asarray(w, jnp.bfloat16)
amax = jnp.float32(4.0)
bias = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

w1 = rng.normal(size=(K, H)).astype(np.float32) * 0.02
w2 = rng.normal(size=(H, K)).astype(np.float32) * 0.02
w1q, w1s = quantize_weight(w1)
w2q, w2s = quantize_weight(w2)
w1q, w1s, w2q, w2s = map(jnp.asarray, (w1q, w1s, w2q, w2s))
w1b, w2b = jnp.asarray(w1, jnp.bfloat16), jnp.asarray(w2, jnp.bfloat16)
b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
b2 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
amax2 = jnp.float32(10.0)

GF_GEMM = 2 * M * K * N / 1e9
GF_MLP = 4 * M * K * H / 1e9


def bench(name, fn, gflop):
    outs = [fn(x) for x in xs]          # compile + warm
    jax.block_until_ready(outs)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(x) for x in xs]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / NBUF)
    print(f"{name:28s} {best*1e3:8.2f} ms   {gflop/best/1e3:7.1f} TFLOP/s",
          flush=True)
    return best


@jax.jit
def g_bf16(x):
    return (jnp.dot(x, wb, preferred_element_type=jnp.float32)
            + bias).astype(jnp.bfloat16)


@jax.jit
def g_unfused(x):
    return (int8_matmul_static(x, wq, ws, amax) + bias).astype(jnp.bfloat16)


@jax.jit
def g_pallas(x):
    return w8a8_gemm(x, wq, ws, amax, bias=bias)


@jax.jit
def m_bf16(x):
    h = jnp.dot(x, w1b, preferred_element_type=jnp.float32) + b1
    h = _gelu_tanh(h).astype(jnp.bfloat16)
    return (jnp.dot(h, w2b, preferred_element_type=jnp.float32)
            + b2).astype(jnp.bfloat16)


@jax.jit
def m_unfused(x):
    h = int8_matmul_static(x, w1q, w1s, amax) + b1
    h = _gelu_tanh(h)
    return (int8_matmul_static(h, w2q, w2s, amax2)
            + b2).astype(jnp.bfloat16)


@jax.jit
def m_pallas(x):
    return w8a8_mlp(x, w1q, w1s, amax, b1, w2q, w2s, amax2, b2)


bench("gemm bf16 xla", g_bf16, GF_GEMM)
bench("gemm int8 unfused", g_unfused, GF_GEMM)
bench("gemm int8 pallas fused", g_pallas, GF_GEMM)
bench("mlp bf16 xla", m_bf16, GF_MLP)
bench("mlp int8 unfused", m_unfused, GF_MLP)
bench("mlp int8 pallas fused", m_pallas, GF_MLP)
