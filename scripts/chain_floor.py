"""Block-chain inter-op HBM floor, measured directly (VERDICT r4 weak #1).

ROOFLINE.md attributes the ViT-B serving remainder to "irreducible
inter-op HBM traffic of the block chain ... ~2.8 ms/layer streaming
floor" — a CLAIM derived from byte counts, never A/B-verified.  This
microbench measures, at the exact serving geometry (batch 96 x 1568
tokens x 768, bf16), the three elementwise programs that make up one
residual site:

  copy        y = x                       (1 read + 1 write: the unit)
  add_lnq     q = LNQ(x + a)              (today's chain: XLA add pass
                                           writes the bf16 sum, the opaque
                                           LNQ kernel re-reads it)
  fused       (s, q) = AddLNQ(a, x)       (ops/ln.py one-kernel version)

Per-call traffic (bf16 tensor = rows*768*2 B):
  copy    2 tensors        add_lnq  read a,x + write s + read s + int8 out
  fused   read a,x + write s + int8 out  (one read fewer)

Each program is timed with DISTINCT input buffers, pipelined dispatch,
fetch-synced (CLAUDE.md traps #1/#8).  Run on the real chip:

  python scripts/chain_floor.py [--rows 150528] [--dim 768]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _time(fn, bufs, reps=3, per_rep=8):
    np.asarray(fn(*bufs[-1]))            # compile + warm via FETCH
    best = 1e9
    for rep in range(reps):
        chunk = bufs[rep * per_rep:(rep + 1) * per_rep]
        t0 = time.perf_counter()
        outs = [fn(*b) for b in chunk]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
        best = min(best, (time.perf_counter() - t0) / len(chunk))
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
    rng = np.random.default_rng(0)
    n = 3 * 8 + 1
    bufs = [(jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32),
                         dtype=jnp.bfloat16),
             jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32),
                         dtype=jnp.bfloat16)) for _ in range(n)]
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    amax = jnp.asarray(3.0, jnp.float32)

    copy = jax.jit(lambda a, x: x + 0.0)
    add_lnq = jax.jit(lambda a, x: fused_layernorm_quant(
        x + a, scale, bias, amax))
    fused = jax.jit(lambda a, x: fused_add_layernorm_quant(
        a, x, scale, bias, amax))

    tens_gb = rows * C * 2 / 1e9
    for name, fn, tensors in (("copy", copy, 2.0),
                              ("add_lnq", add_lnq, 3.5),
                              ("fused_add_lnq", fused, 2.5)):
        dt = _time(fn, bufs)
        gb = tensors * tens_gb
        print(f"{name:15s} {dt * 1e3:7.3f} ms   {gb / dt:6.1f} GB/s "
              f"({gb * 1e3:.2f} GB nominal)")


if __name__ == "__main__":
    main()
