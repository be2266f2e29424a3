"""TPU microbench: key-grid vs full-seq flash-attention kernel rate.

(docs/ROOFLINE.md: in-model A/B attributed IV2-B attention at ~49.5
TF/s vs ViT-B ~102 at the same K=64 contraction — is the key-grid
kernel really 2x slower, and where does the time go?)

Protocol: the per-call sync through the serving relay costs ~26 ms
(measured: every kernel-only variant landed at ~33 ms regardless of
shape), so single-dispatch timing is useless.  Instead CHAIN the kernel
inside one jit (output feeds the next call's q — same shape/dtype) and
difference two chain lengths: (t[K2] - t[K1]) / (K2 - K1) is the pure
per-kernel time with the dispatch constant and the input upload
subtracted exactly.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/mb_kvgrid.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from simple_tad_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

rng = np.random.default_rng(0)
REPS, PER = 3, 4
NBUF = REPS * PER + 1
K1, K2 = 2, 10


def timed(run, qs, k, v):
    np.asarray(run(qs[-1], k, v))    # compile + warm with a FETCH (trap #8)
    best = 1e9
    for rep in range(REPS):
        chunk = qs[rep * PER:(rep + 1) * PER]
        t0 = time.perf_counter()
        sink = 0.0
        for q in chunk:
            sink += float(run(q, k, v)[0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / PER)
    return best


def bench(name, B, N, Hh, D, env, dtype=jnp.bfloat16):
    for key in ("SIMPLE_TAD_ATTN_KV_GRID", "SIMPLE_TAD_NO_PACKED_ATTN",
                "SIMPLE_TAD_ATTN_BLOCK_Q", "SIMPLE_TAD_ABLATE_QK",
                "SIMPLE_TAD_ABLATE_EXP", "SIMPLE_TAD_ABLATE_PV"):
        os.environ.pop(key, None)
    os.environ.update(env)
    import simple_tad_tpu.ops.flash_attention as fa

    qs = [jnp.asarray(rng.normal(size=(B, N, Hh, D)).astype(np.float32),
                      jnp.bfloat16) for _ in range(NBUF)]
    k = jnp.asarray(rng.normal(size=(B, N, Hh, D)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, Hh, D)).astype(np.float32),
                    jnp.bfloat16)
    scale = D ** -0.5
    gf = 4 * B * Hh * N * N * D / 1e9

    def chain(n):
        @jax.jit
        def run(q, k, v):
            for _ in range(n):
                q = fa.flash_attention(q, k, v, scale=scale)
            return q
        return run

    t1 = timed(chain(K1), qs, k, v)
    t2 = timed(chain(K2), qs, k, v)
    per = (t2 - t1) / (K2 - K1)
    print(f"{name:26s} {per*1e3:8.2f} ms/kernel  {gf/per/1e3:7.1f} TFLOP/s"
          f"   (chain{K1} {t1*1e3:.1f}, chain{K2} {t2*1e3:.1f})",
          flush=True)
    return per


VITB = dict(B=96, N=1568, Hh=12, D=64)
IV2B = dict(B=48, N=2049, Hh=12, D=64)

bench("vitb full-seq", **VITB, env={})
bench("vitb kv-grid n=2", **VITB, env={"SIMPLE_TAD_ATTN_KV_GRID": "2"})
bench("iv2b kv-grid auto", **IV2B, env={})
bench("iv2b kv-grid n=4", **IV2B, env={"SIMPLE_TAD_ATTN_KV_GRID": "4"})
bench("iv2b query-grid", **IV2B, env={"SIMPLE_TAD_ATTN_KV_GRID": "0"})
# in-kernel component costs (key-grid): QK / exp2 / PV ablations
bench("iv2b kv no-QK", **IV2B, env={"SIMPLE_TAD_ABLATE_QK": "1"})
bench("iv2b kv no-exp2", **IV2B, env={"SIMPLE_TAD_ABLATE_EXP": "1"})
bench("iv2b kv no-PV", **IV2B, env={"SIMPLE_TAD_ABLATE_PV": "1"})
