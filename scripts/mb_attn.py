"""TPU microbench: flash-attention kernel variants at ViT-B eval geometry.

Variants (selected per-trace via env vars read at trace time):
  base    — round-1 single-pass kernel (VPU softmax row-sum)
  fuse_l  — softmax denominator via ones-column in the PV matmul (MXU)
  int8qk  — fuse_l + dynamic int8 score matmul
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from simple_tad_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

B, N, Hh, D = 96, 1568, 12, 64
rng = np.random.default_rng(0)
NBUF = 8
qs = [jnp.asarray(rng.normal(size=(B, N, Hh, D)).astype(np.float32),
                  jnp.bfloat16) for _ in range(NBUF)]
k = jnp.asarray(rng.normal(size=(B, N, Hh, D)).astype(np.float32),
                jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, N, Hh, D)).astype(np.float32),
                jnp.bfloat16)
scale = D ** -0.5
GF = 4 * B * Hh * N * N * D / 1e9


def bench(name, env):
    for key in ("SIMPLE_TAD_NO_FUSED_L", "SIMPLE_TAD_INT8_QK"):
        os.environ.pop(key, None)
    os.environ.update(env)
    import simple_tad_tpu.ops.flash_attention as fa

    @jax.jit
    def run(q):
        return fa.flash_attention(q, k, v, scale=scale)

    outs = [run(q) for q in qs]
    jax.block_until_ready(outs)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run(q) for q in qs]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / NBUF)
    print(f"{name:12s} {best*1e3:8.2f} ms   {GF/best/1e3:7.1f} TFLOP/s",
          flush=True)


bench("base", {"SIMPLE_TAD_NO_FUSED_L": "1"})
bench("fuse_l", {})
bench("int8qk", {"SIMPLE_TAD_INT8_QK": "1"})
