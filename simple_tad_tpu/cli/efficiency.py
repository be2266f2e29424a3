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
                            img_size=input_size, dtype=dtype,
                            attn_impl=attn_impl)
    params = model.init_params(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                           deterministic=True))
    rows = []
    for b in batches:
        # EVERY timed call gets a fresh buffer: the serving relay memoizes
        # repeated identical (program, inputs) executions (fantasy
        # latencies otherwise; see CLAUDE.md trap #1).  Pool bounded to
        # ~4 GB of HBM; iters shrink to the pool rather than recycle.
        buf_bytes = (b * num_frames * input_size * input_size * 3
                     * jnp.dtype(dtype).itemsize)
        nbuf = int(max(6, min(3 * iters, 4e9 // max(buf_bytes, 1))))
        # HOST-generated uploads (bench.py protocol): device-side
        # jax.random buffers measured as memoized through the relay even
        # with distinct keys (0.04 ms ViT-B b32 "latencies")
        rng = np.random.default_rng(1)
        bufs = [jnp.asarray(rng.normal(size=(
            b, num_frames, input_size, input_size, 3)).astype(np.float32)
            * 0.5, dtype) for _ in range(nbuf + 1)]
        # warmup must FETCH, not block: through the serving relay,
        # block_until_ready() returns early while the compile is still in
        # flight, and every subsequent "timed" call returns instantly
        # (0.04 ms ViT-B b32 fantasy latencies; CLAUDE.md trap #8).
        np.asarray(fwd(params, bufs[-1]))
        per_rep = max(nbuf // 3, 1)
        times = []
        for rep in range(3):
            chunk = bufs[rep * per_rep:(rep + 1) * per_rep] or bufs[:1]
            t0 = time.perf_counter()
            outs = [fwd(params, x) for x in chunk]
            jax.block_until_ready(outs)
            # fetch-sync the pipelined chunk (tiny (b,2) logits): TPU
            # executes in order, so fetching the last output proves the
            # whole chunk ran (trap #8); cost amortizes over per_rep
            np.asarray(outs[-1])
            times.append((time.perf_counter() - t0) / len(chunk))
        ms = min(times) * 1000
        # peak-HBM column (reference reports peak CUDA MB per model,
        # test_efficiency.py:174-194); first device's peak over the run
        from simple_tad_tpu.utils.diagnostics import device_memory_stats
        mem = next(iter(device_memory_stats().values()), {})
        rows.append({"model": name, "batch": b,
                     "latency_ms": round(ms, 2),
                     "clips_per_sec": round(b / (ms / 1000), 1),
                     "params_m": round(n_params / 1e6, 1),
                     "peak_hbm_mb": round(mem.get("peak_bytes_mb", 0.0), 1)
                     or None})
        print(json.dumps(rows[-1]))
    return rows


def benchmark_train_input(dataset, *, batch_size: int = 24, steps: int = 20,
                          num_threads: int = 4, resize_scale: float = 1.1,
                          num_sample: int = 1, step_ms: float = 0.0):
    """Measure the HOST side of a training step: decoded windows/s through
    TrainLoader (threaded zip decode + frame LRU) and — given the device
    step time — the input occupancy.

    VERDICT r1 #6: the 790-decodes/s requirement at batch-24/485 ms was
    never measured.  occupancy < 1 means the host feeds the device with
    time to spare (decode overlaps the step); > 1 means input-bound.
    """
    import itertools

    from simple_tad_tpu.data.zipreader import frame_cache
    from simple_tad_tpu.train.engine import TrainLoader

    cache = frame_cache()
    if cache is not None:
        cache.clear()
    loader = TrainLoader(dataset, batch_size, num_threads=num_threads,
                         resize_scale=resize_scale, num_sample=num_sample)
    steps = min(steps, loader.steps_per_epoch())
    if steps < 1:
        print(json.dumps({"phase": "train_input", "skipped":
                          "dataset shorter than one batch"}))
        return []
    # epoch 0 = cold cache; epoch 1 = steady state (the LRU holds frames
    # shared between overlapping windows)
    rows = []
    for epoch in (0, 1):
        t0 = time.perf_counter()
        n = 0
        for batch in itertools.islice(loader.epoch(epoch), steps):
            n += batch["video_u8"].shape[0]
        dt = time.perf_counter() - t0
        wps = n / dt
        row = {"phase": f"train_input_epoch{epoch}",
               "windows_per_sec": round(wps, 1),
               "frames_per_sec": round(wps * dataset.view_len, 1),
               "cache_hit_rate": round(
                   cache.hits / max(cache.hits + cache.misses, 1), 3)
               if cache is not None else None}
        if step_ms > 0:
            # host decode time per batch vs device step time
            row["input_occupancy"] = round(
                (batch_size / wps) / (step_ms / 1000.0), 3)
        rows.append(row)
        print(json.dumps(row))
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
    # host input-pipeline probe (no device needed)
    parser.add_argument("--train_input", action="store_true",
                        help="measure TrainLoader decode throughput instead")
    parser.add_argument("--data_path", default=None)
    parser.add_argument("--data_set", default="DoTA",
                        choices=["DoTA", "DADA2K"])
    parser.add_argument("--batch_size", type=int, default=24)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--num_threads", type=int, default=4)
    parser.add_argument("--step_ms", type=float, default=0.0,
                        help="known device step time for occupancy")
    args = parser.parse_args(argv)

    if args.train_input:
        import types

        from simple_tad_tpu.data.builders import build_frame_dataset
        ds_args = types.SimpleNamespace(
            data_path=args.data_path, data_set=args.data_set,
            num_frames=args.num_frames, sampling_rate=1, view_fps=10,
            input_size=args.input_size, ttc_TT=2.0, ttc_TA=1.0)
        dataset, _ = build_frame_dataset(True, False, ds_args)
        return benchmark_train_input(
            dataset, batch_size=args.batch_size, steps=args.steps,
            num_threads=args.num_threads, step_ms=args.step_ms)

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
