"""Block-chain inter-op HBM floor, measured directly (VERDICT r4 weak #1).

ROOFLINE.md attributes the ViT-B serving remainder to "irreducible
inter-op HBM traffic of the block chain ... ~2.8 ms/layer streaming
floor" — a CLAIM derived from byte counts, never A/B-verified.

A single-call microbench CANNOT verify it: one jit call through the
serving relay floors at ~7-9 ms regardless of traffic (measured
2026-08-21: a 462 MB copy, an 809 MB add+LNQ and a 578 MB fused
add+LNQ all landed at 7.4-9.2 ms — the same ~6.6 ms floor the batch-1
stream latency sits on).  So each variant here chains K=24 DEPENDENT
iterations (= the 24 residual sites of the 12-block ViT-B chain) inside
ONE jit via lax.scan, with the opaque Pallas LNQ kernel separating
sites exactly as in the real program, and divides by K:

  stream    s -> pallas copy(s)                 (pure dependent streaming:
                                                 measures achievable GB/s)
  add_lnq   s = s + a_i ; q = LNQ(s)            (today's chain: XLA add
                                                 pass + opaque LNQ re-read)
  fused     (s, q) = AddLNQ(a_i, s)             (ops/ln.py one-kernel form)

q must be consumed or XLA DCEs the site; each iteration folds q into a
running int32 scalar, which costs one extra read of q — counted in the
nominal bytes.  a_i cycles over 4 distinct device-generated buffers
(CLAUDE.md trap #1; 231 MB each cannot persist in VMEM, so every
iteration re-reads from HBM).

Run on the real chip:  python scripts/chain_floor.py [--rows 150528]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

K_SITES = 24


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def _pallas_copy(x):
    rows, C = x.shape
    br = 1024
    return pl.pallas_call(
        _copy_kernel, grid=(rows // br,),
        in_specs=[pl.BlockSpec((br, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((br, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
    )(x)


def _time(fn, args_list, reps=3, per_rep=4):
    """Fetch-synced timing (trap #8) — but fetch a [:1, :1] SLICE, never
    the full tensor: a 231 MB result fetch rides the relay tunnel at
    tens of MB/s and lands INSIDE the timed region (measured: the same
    24-site pallas-copy chain reads 1.71 ms/site with a sliced fetch,
    59-81 ms/site with a full fetch).  In-order execution means the tiny
    fetch still proves the whole chunk ran."""
    np.asarray(jax.tree_util.tree_leaves(fn(*args_list[-1]))[0][:1, :1])
    best = 1e9
    for rep in range(reps):
        chunk = args_list[rep * per_rep:(rep + 1) * per_rep]
        t0 = time.perf_counter()
        outs = [fn(*a) for a in chunk]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0][:1, :1])
        best = min(best, (time.perf_counter() - t0) / len(chunk))
        del outs
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=96 * 1568)
    ap.add_argument("--dim", type=int, default=768)
    args = ap.parse_args()

    from simple_tad_tpu.ops.ln import (fused_add_layernorm_quant,
                                       fused_layernorm_quant)
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    rows, C = args.rows, args.dim
    n = 3 * 4 + 1
    mk = jax.jit(lambda k: jax.random.normal(k, (rows, C), jnp.bfloat16))
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    # one 231 MB stream seed per timed call + one shared (4, rows, C)
    # branch stack (~924 MB) — distinct STREAMS defeat relay memoization
    svals = [mk(k) for k in keys]
    astack = jnp.stack([mk(k) for k in
                        jax.random.split(jax.random.PRNGKey(1), 4)])
    np.asarray(svals[-1][:1, :1])

    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    amax = jnp.asarray(3.0, jnp.float32)

    @jax.jit
    def stream(s, a):
        def body(carry, _):
            return _pallas_copy(carry), None
        out, _ = jax.lax.scan(body, s, None, length=K_SITES)
        return out

    @jax.jit
    def stream_i8(s, a):
        # best case for "int8 residual storage" (ROUND4_NOTES parked idea
        # b): the dependent stream crossing HBM at HALF the bytes.  If
        # this does not come in near 2x faster than the bf16 stream, the
        # chain is latency-bound and int8 storage cannot pay.
        def body(carry, _):
            return _pallas_copy(carry), None
        out, _ = jax.lax.scan(body, s.astype(jnp.int8), None,
                              length=K_SITES)
        return out

    @jax.jit
    def add_lnq(s, a):
        def body(carry, i):
            st, acc = carry
            st = st + a[i % 4]
            q = fused_layernorm_quant(st, scale, bias, amax)
            acc = acc + jnp.sum(q.astype(jnp.int32))
            return (st, acc), None
        (out, acc), _ = jax.lax.scan(
            body, (s, jnp.zeros((), jnp.int32)),
            jnp.arange(K_SITES))
        return out, acc

    @jax.jit
    def fused(s, a):
        def body(carry, i):
            st, acc = carry
            st, q = fused_add_layernorm_quant(a[i % 4], st, scale, bias,
                                              amax)
            acc = acc + jnp.sum(q.astype(jnp.int32))
            return (st, acc), None
        (out, acc), _ = jax.lax.scan(
            body, (s, jnp.zeros((), jnp.int32)),
            jnp.arange(K_SITES))
        return out, acc

    tens = rows * C * 2 / 1e9          # one bf16 tensor pass, GB
    tq = tens / 2                      # int8 pass
    per_site = {
        "stream": 2 * tens,                       # read s + write s
        "stream_i8": 2 * tq,                      # same at half the bytes
        "add_lnq": 4 * tens + 2 * tq,             # a, s, write s, re-read s
                                                  # + write q + re-read q
        "fused": 3 * tens + 2 * tq,               # a, s, write s
    }
    args_list = [(s, astack) for s in svals]
    for name, fn in (("stream", stream), ("stream_i8", stream_i8),
                     ("add_lnq", add_lnq), ("fused", fused)):
        dt = _time(fn, args_list)
        site_ms = dt * 1e3 / K_SITES
        gb = per_site[name]
        print(f"{name:10s} {dt * 1e3:8.2f} ms total  {site_ms:6.3f} ms/site "
              f"  {gb / (dt / K_SITES):6.1f} GB/s "
              f"({gb * 1e3:.0f} MB/site nominal)", flush=True)


if __name__ == "__main__":
    main()
