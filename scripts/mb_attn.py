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
REPS, PER = 3, 4
# every timed call gets a NEVER-SEEN buffer (the relay memoizes repeated
# identical executions — reuse across reps reports fantasy numbers)
NBUF = REPS * PER + 1
qs = [jnp.asarray(rng.normal(size=(B, N, Hh, D)).astype(np.float32),
                  jnp.bfloat16) for _ in range(NBUF)]
k = jnp.asarray(rng.normal(size=(B, N, Hh, D)).astype(np.float32),
                jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, N, Hh, D)).astype(np.float32),
                jnp.bfloat16)
scale = D ** -0.5
GF = 4 * B * Hh * N * N * D / 1e9


def bench(name, env):
    for key in ("SIMPLE_TAD_NO_FUSED_L", "SIMPLE_TAD_INT8_QK",
                "SIMPLE_TAD_NO_PACKED_ATTN"):
        os.environ.pop(key, None)
    os.environ.update(env)
    import simple_tad_tpu.ops.flash_attention as fa

    # k/v as ARGUMENTS, not jit-closure constants: captured arrays embed
    # into the uploaded program (HTTP 413 on the remote-compile relay)
    @jax.jit
    def run(q, k, v):
        return fa.flash_attention(q, k, v, scale=scale)

    run(qs[-1], k, v).block_until_ready()   # compile + warm
    best = 1e9
    for rep in range(REPS):
        chunk = qs[rep * PER:(rep + 1) * PER]
        t0 = time.perf_counter()
        sink = 0.0
        for q in chunk:
            # fetch a VALUE per call — block_until_ready alone measured
            # 0.02 ms/call (relay resolves result futures lazily)
            sink += float(run(q, k, v)[0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / PER)
    print(f"{name:12s} {best*1e3:8.2f} ms   {GF/best/1e3:7.1f} TFLOP/s",
          flush=True)


bench("base", {"SIMPLE_TAD_NO_FUSED_L": "1", "SIMPLE_TAD_NO_PACKED_ATTN": "1"})
bench("fuse_l", {"SIMPLE_TAD_NO_PACKED_ATTN": "1"})
bench("int8qk", {"SIMPLE_TAD_INT8_QK": "1", "SIMPLE_TAD_NO_PACKED_ATTN": "1"})
bench("bnhd", {})
bench("bnhd+int8qk", {"SIMPLE_TAD_INT8_QK": "1"})
