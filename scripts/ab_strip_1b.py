"""IV2 score-strip VMEM budget sweep (VERDICT r4 next #6).

The round-4 int8 output tiles freed scoped VMEM, so attention query/key
strips larger than the round-3 10.5 MB cap may now compile.  For the 1B
trunk (N=2049 -> padded 2304, Dh=88) the default budget picks a 3-strip
key grid; 11.5 MB admits a 2-strip plan and ~21.5 MB a single-pass
full-sequence block.  Each variant rebuilds the full serving program
with SIMPLE_TAD_ATTN_STRIP_BUDGET set (read at trace time) and is timed
with the bench.py protocol in ONE process so relay drift cancels.
Compile failures (VMEM OOM) are caught and reported per point.

Usage: python scripts/ab_strip_1b.py [--model internvideo2_1B_patch14_224]
       [--batch 16] [--budgets 10500000 11500000 21500000]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="internvideo2_1B_patch14_224")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--budgets", type=int, nargs="+",
                    default=[10_500_000, 11_500_000, 21_500_000])
    args = ap.parse_args()

    import bench
    import simple_tad_tpu as st
    from simple_tad_tpu.eval.engine import half_kernel_tokens
    from simple_tad_tpu.ops.quant import quantize_and_calibrate
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    from simple_tad_tpu.utils.fold_norm import fold_normalization
    enable_persistent_cache()

    rng = np.random.default_rng(0)
    model = st.create_model(args.model, num_classes=2, all_frames=8,
                            dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    params = fold_normalization(params)
    xcal = jnp.asarray(rng.integers(0, 256, (2, 8, 224, 224, 3),
                                    np.uint8)).astype(jnp.bfloat16)
    model, params = quantize_and_calibrate(model, params, [xcal],
                                           deterministic=True)

    def build():
        @jax.jit
        def score(p, frames_u8, window_idx):
            toks = half_kernel_tokens(frames_u8.astype(jnp.bfloat16),
                                      p["patch_kernel"], p["patch_bias"],
                                      14, 1, 1, jnp.bfloat16)
            g = jnp.take(toks, window_idx, axis=0)
            x = g.reshape(g.shape[0], -1, toks.shape[-1])
            return model.apply({"params": p}, x, deterministic=True,
                               tokens_input=True).astype(jnp.float32)
        return score

    reps, per_rep = 3, 8
    bufs = [jnp.asarray(rng.integers(0, 256, (128, 224, 224, 3), np.uint8))
            for _ in range(reps * per_rep + 1)]
    idx = jnp.asarray(np.stack([np.arange(i, i + 8)
                                for i in range(args.batch)]) % 128,
                      jnp.int32)

    results = {}
    for budget in args.budgets:
        os.environ["SIMPLE_TAD_ATTN_STRIP_BUDGET"] = str(budget)
        fn = build()
        try:
            dt = bench._time_batched(fn, params, bufs, idx, reps, per_rep)
            results[str(budget)] = round(dt * 1e3, 2)
            print(json.dumps({"budget": budget, "ms": results[str(budget)],
                              "clips_per_sec": round(args.batch / dt, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report VMEM OOMs per point
            results[str(budget)] = f"FAIL: {type(e).__name__}"
            print(json.dumps({"budget": budget,
                              "error": str(e)[:200]}), flush=True)
    os.environ.pop("SIMPLE_TAD_ATTN_STRIP_BUDGET", None)
    print(json.dumps({"model": args.model, "batch": args.batch, **results}))


if __name__ == "__main__":
    main()
