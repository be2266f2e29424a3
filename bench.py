"""Headline benchmark: ViT-B 16x224 sliding-window inference throughput on
one TPU chip (windows/s), vs the reference's 94 FPS on A100 MIG 2/1
(BASELINE.md, figs/results.png).

Measures the on-device scoring program used by the eval engine
(simple_tad_tpu/eval/engine.py): uint8 frame buffer -> window gather ->
ViT-B forward (bf16, Pallas fused attention, input normalization folded
into the patch embed).  Every timed call blocks on its result.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/s/chip", "vs_baseline": N}
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_BASELINE_FPS = 94.0   # DAPT-VideoMAE-B, A100 MIG 2/1 (BASELINE.md)


def main():
    import simple_tad_tpu as st
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    from simple_tad_tpu.utils.fold_norm import fold_normalization
    enable_persistent_cache()

    model = st.create_model("vit_base_patch16_224", num_classes=2,
                            dtype=jnp.bfloat16, attn_impl="auto")
    params = model.init_params(jax.random.PRNGKey(0))
    params = fold_normalization(params)

    @jax.jit
    def score(params, frames_u8, window_idx):
        windows = jnp.take(frames_u8, window_idx, axis=0).astype(jnp.bfloat16)
        return model.apply({"params": params}, windows,
                           deterministic=True).astype(jnp.float32)

    # DISTINCT input buffers per timed call: the serving runtime here
    # memoizes repeat executions of identical (program, inputs), which
    # would make fixed-input timing loops report fantasy numbers.
    rng = np.random.default_rng(0)
    reps, per_rep = 3, 8
    frame_bufs = [jnp.asarray(rng.integers(0, 256, (128, 224, 224, 3),
                                           dtype=np.uint8))
                  for _ in range(reps * per_rep + 1)]

    best = 0.0
    results = {}
    for batch in (96,):
        idx = np.stack([np.arange(i, i + 16) for i in range(batch)])
        idx = jnp.asarray(idx % 128, jnp.int32)
        score(params, frame_bufs[-1], idx).block_until_ready()   # compile
        times = []
        for rep in range(reps):
            # pipelined (dispatch-then-block) — the eval engine's pattern
            t0 = time.perf_counter()
            outs = [score(params, frame_bufs[rep * per_rep + i], idx)
                    for i in range(per_rep)]
            jax.block_until_ready(outs)
            times.append((time.perf_counter() - t0) / per_rep)
        wps = batch / min(times)
        results[batch] = round(wps, 1)
        best = max(best, wps)

    # secondary: opt-in int8 path (static calibrated scales; docs/QUANT.md).
    # Headline stays bf16 — int8 AUC is unvalidated on real data.
    quant_wps = None
    try:
        from simple_tad_tpu.ops.quant import quantize_and_calibrate
        xcal = jnp.take(frame_bufs[-1],
                        jnp.arange(16)[None].repeat(2, 0),
                        axis=0).astype(jnp.bfloat16)
        qmodel, qps = quantize_and_calibrate(model, params, [xcal],
                                             deterministic=True)

        @jax.jit
        def qscore(p, frames_u8, window_idx):
            w = jnp.take(frames_u8, window_idx,
                         axis=0).astype(jnp.bfloat16)
            return qmodel.apply({"params": p}, w,
                                deterministic=True).astype(jnp.float32)

        batch = 96
        idx = jnp.asarray(np.stack([np.arange(i, i + 16)
                                    for i in range(batch)]) % 128,
                          jnp.int32)
        qscore(qps, frame_bufs[-1], idx).block_until_ready()
        times = []
        for rep in range(reps):
            t0 = time.perf_counter()
            outs = [qscore(qps, frame_bufs[rep * per_rep + i], idx)
                    for i in range(per_rep)]
            jax.block_until_ready(outs)
            times.append((time.perf_counter() - t0) / per_rep)
        quant_wps = round(batch / min(times), 1)
    except Exception:   # never let the opt-in path break the headline
        pass

    print(json.dumps({
        "metric": "ViT-B 16x224 sliding-window inference throughput",
        "value": round(best, 1),
        "unit": "windows/s/chip",
        "vs_baseline": round(best / A100_BASELINE_FPS, 2),
        "detail": {"windows_per_sec_by_batch": results,
                   "int8_static_quant_windows_per_sec": quant_wps},
    }))


if __name__ == "__main__":
    main()
