"""Model-efficiency benchmark harness.

Equivalent of /root/reference/test_efficiency.py:12-197: per model type,
measure forward latency and throughput.  Extends the reference protocol
(batch-1, 1000 iters, fp16) with a batch sweep — the honest TPU serving
metric is windows/s at the best batch, not batch-1 latency.

Usage:
  python -m simple_tad_tpu.cli.efficiency --model vit_base_patch16_224 \
      --batches 1 8 32 --iters 50
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def benchmark_model(name: str, *, batches=(1, 8, 32), iters: int = 50,
                    num_frames: int = 16, input_size: int = 224,
                    dtype=jnp.bfloat16, attn_impl: str = "auto"):
    import simple_tad_tpu as st

    model = st.create_model(name, num_classes=2, all_frames=num_frames,
                            dtype=dtype, attn_impl=attn_impl)
    params = model.init_params(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                           deterministic=True))
    rows = []
    for b in batches:
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (b, num_frames, input_size, input_size, 3),
                              dtype)
        fwd(params, x).block_until_ready()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                fwd(params, x).block_until_ready()
            times.append((time.perf_counter() - t0) / iters)
        ms = min(times) * 1000
        rows.append({"model": name, "batch": b,
                     "latency_ms": round(ms, 2),
                     "clips_per_sec": round(b / (ms / 1000), 1),
                     "params_m": round(n_params / 1e6, 1)})
        print(json.dumps(rows[-1]))
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser("simple_tad_tpu efficiency benchmark")
    parser.add_argument("--model", nargs="+",
                        default=["vit_small_patch16_224",
                                 "vit_base_patch16_224"])
    parser.add_argument("--batches", nargs="+", type=int, default=[1, 8, 32])
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--num_frames", type=int, default=16)
    parser.add_argument("--input_size", type=int, default=224)
    parser.add_argument("--attn_impl", default="auto")
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args(argv)

    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    out = []
    for name in args.model:
        out += benchmark_model(name, batches=tuple(args.batches),
                               iters=args.iters, num_frames=args.num_frames,
                               input_size=args.input_size, dtype=dtype,
                               attn_impl=args.attn_impl)
    return out


if __name__ == "__main__":
    main()
