"""Headline benchmark: ViT-B 16x224 sliding-window inference throughput on
one TPU chip (windows/s), vs the reference's 94 FPS on A100 MIG 2/1
(BASELINE.md, figs/results.png).

Headline = the int8 static-quant serving path (PTQ recipe of docs/QUANT.md:
per-channel int8 weights + calibrated per-tensor activation scales, XLA
int8 GEMMs, packed transpose-free Pallas attention).  int8-vs-bf16 logit
drift is bounded by tests/test_quant.py; bf16 rows are reported alongside.

Detail rows (VERDICT r1 #8): batch sweep, streaming batch-1 latency
(run_inference.py:85-109 protocol), ViT-S/L points, MFU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/s/chip", "vs_baseline": N}
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_BASELINE_FPS = 94.0   # DAPT-VideoMAE-B, A100 MIG 2/1 (BASELINE.md)
# honest utilization target (VERDICT r2 weak #1): the int8 serving path
# runs its GEMMs int8 (394 TOPS ceiling) and attention+embed bf16 (197),
# so the speed of light is the MIXED roofline, not the bf16 peak:
# 266 G int8 ops/window / 394e12 + 93 G bf16 FLOPs / 197e12 = 1.148 ms
# -> 871 windows/s at 100% MXU with zero glue (docs/ROOFLINE.md)
VIT_B_MIXED_ROOFLINE_WPS = 871.0


def _time_batched(fn, p, bufs, idx, reps=3, per_rep=8):
    """Pipelined dispatch-then-fetch over DISTINCT buffers (the serving
    relay memoizes repeated identical executions).  Sync discipline is
    CLAUDE.md trap #8: block_until_ready returns EARLY while a compile is
    in flight through the relay, so warm-up and every timing chunk end in
    a result FETCH — in-order execution makes the one fetch of the chunk's
    last output prove the whole chunk ran."""
    np.asarray(fn(p, bufs[-1], idx))           # compile + warm via FETCH
    best = 1e9
    for rep in range(reps):
        chunk = bufs[rep * per_rep:(rep + 1) * per_rep]
        t0 = time.perf_counter()
        outs = [fn(p, b, idx) for b in chunk]
        np.asarray(outs[-1])
        best = min(best, (time.perf_counter() - t0) / len(chunk))
    return best


def _frame_bufs(rng, n, frames=256):
    return [jnp.asarray(rng.integers(0, 256, (frames, 224, 224, 3),
                                     dtype=np.uint8)) for _ in range(n)]


def _win_idx(batch, frames=256):
    idx = np.stack([np.arange(i, i + 16) for i in range(batch)])
    return jnp.asarray(idx % frames, jnp.int32)


def bench_model(name, batches, quant, rng, stream_latency=False):
    import simple_tad_tpu as st
    from simple_tad_tpu.ops.quant import quantize_and_calibrate
    from simple_tad_tpu.utils.fold_norm import fold_normalization

    model = st.create_model(name, num_classes=2, dtype=jnp.bfloat16,
                            attn_impl="auto")
    params = model.init_params(jax.random.PRNGKey(0))
    params = fold_normalization(params)
    if quant:
        xcal = jnp.asarray(
            rng.integers(0, 256, (2, 16, 224, 224, 3), np.uint8)
        ).astype(jnp.bfloat16)
        model, params = quantize_and_calibrate(model, params, [xcal],
                                               deterministic=True)

    tb = model.cfg.tubelet_size
    use_tokens = not os.environ.get("SIMPLE_TAD_NO_TUBELET_PRECOMPUTE")

    @jax.jit
    def score(p, frames_u8, window_idx):
        if use_tokens:
            # embed each unique frame once (half-kernel tubelet trick,
            # eval/engine.py) and gather token embeddings per window —
            # sliding windows share 15/16 frames with their neighbors
            from simple_tad_tpu.eval.engine import half_kernel_tokens
            pe = p["patch_embed"]
            toks = half_kernel_tokens(frames_u8.astype(jnp.bfloat16),
                                      pe["kernel"], pe["bias"], 16, tb, 1,
                                      jnp.bfloat16)
            g = jnp.take(toks, window_idx[:, ::tb], axis=0)
            x = g.reshape(g.shape[0], -1, toks.shape[-1])
            return model.apply({"params": p}, x, deterministic=True,
                               tokens_input=True).astype(jnp.float32)
        windows = jnp.take(frames_u8, window_idx, axis=0).astype(jnp.bfloat16)
        return model.apply({"params": p}, windows,
                           deterministic=True).astype(jnp.float32)

    out = {}
    reps, per_rep = 3, 8
    bufs = _frame_bufs(rng, reps * per_rep + 1)
    for batch in batches:
        dt = _time_batched(score, params, bufs, _win_idx(batch),
                           reps, per_rep)
        out[str(batch)] = round(batch / dt, 1)
    if stream_latency:
        # streaming protocol: one window scored per arriving frame
        # (reference run_inference.py:85-109); single-sample latency
        idx1 = _win_idx(1)
        np.asarray(score(params, bufs[-1], idx1))   # warm via FETCH (trap #8)
        times = []
        for rep in range(reps):
            t0 = time.perf_counter()
            sink = [score(params, bufs[rep * per_rep + i], idx1)
                    for i in range(per_rep)]
            np.asarray(sink[-1])
            times.append((time.perf_counter() - t0) / per_rep)
        out["stream_batch1_ms"] = round(min(times) * 1e3, 2)
    return out


def bench_iv2(batch, rng, model_name="internvideo2_base_patch14_224"):
    """InternVideo2 int8 serving point (clips/s): 8-frame patch14
    sliding windows over a 128-frame buffer, token-path gather (same
    program as scripts/iv2_breakdown.py 'full').  model_name picks the
    trunk (base / 1B — VERDICT r3 weak #3 asked the 1B to be captured)."""
    import simple_tad_tpu as st
    from simple_tad_tpu.eval.engine import half_kernel_tokens
    from simple_tad_tpu.ops.quant import quantize_and_calibrate
    from simple_tad_tpu.utils.fold_norm import fold_normalization

    model = st.create_model(model_name, num_classes=2,
                            all_frames=8, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    params = fold_normalization(params)
    xcal = jnp.asarray(rng.integers(0, 256, (2, 8, 224, 224, 3),
                                    np.uint8)).astype(jnp.bfloat16)
    model, params = quantize_and_calibrate(model, params, [xcal],
                                           deterministic=True)

    @jax.jit
    def score(p, frames_u8, window_idx):
        toks = half_kernel_tokens(frames_u8.astype(jnp.bfloat16),
                                  p["patch_kernel"], p["patch_bias"],
                                  14, 1, 1, jnp.bfloat16)
        g = jnp.take(toks, window_idx, axis=0)
        x = g.reshape(g.shape[0], -1, toks.shape[-1])
        return model.apply({"params": p}, x, deterministic=True,
                           tokens_input=True).astype(jnp.float32)

    reps, per_rep = 3, 8
    bufs = [jnp.asarray(rng.integers(0, 256, (128, 224, 224, 3), np.uint8))
            for _ in range(reps * per_rep + 1)]
    idx = jnp.asarray(np.stack([np.arange(i, i + 8)
                                for i in range(batch)]) % 128, jnp.int32)
    dt = _time_batched(score, params, bufs, idx, reps, per_rep)
    return round(batch / dt, 1)


def _time_steps(step, state, batches, reps=8, warmup=2):
    """Warm-up + timed loop, both ending in a scalar result FETCH
    (state.step) — trap #8: one tiny fetch of the last dispatched step's
    output synchronizes the whole in-order chunk."""
    import time as _t
    for i in range(warmup):
        state, _ = step(state, batches[i % len(batches)])
    np.asarray(state.step)
    t0 = _t.perf_counter()
    for i in range(reps):
        state, _ = step(state, batches[i % len(batches)])
    np.asarray(state.step)
    return (_t.perf_counter() - t0) / reps


def bench_train_step(batch=24, rng=None, model_name="vit_base_patch16_224",
                     num_frames=16):
    """Finetune train step (remat, drop_path 0.1, adamw + layer decay +
    clip — the TRAIN.md recipe), clips/s.  VERDICT r3 weak #2 asked ViT-B;
    r4 #8 asked S and L; r4 #5 asks the IV2-B trunk (8-frame, N=785+CLS).
    Reference behavioral baseline: the AMP train loops of
    engine_for_frame_finetuning.py:136-189 /
    iv2_engine_for_frame_finetuning.py."""
    import simple_tad_tpu as st
    from simple_tad_tpu.train import losses as L
    from simple_tad_tpu.train import optim as O
    from simple_tad_tpu.train.steps import TrainState, make_finetune_train_step

    model = st.create_model(model_name, num_classes=2,
                            dtype=jnp.bfloat16, attn_impl="auto",
                            remat=True, drop_path_rate=0.1,
                            **({"all_frames": num_frames}
                               if num_frames != 16 else {}))
    params = model.init_params(jax.random.PRNGKey(0))
    sched = O.cosine_scheduler(1e-3, 1e-6, epochs=20, niter_per_ep=100,
                               warmup_epochs=5)
    tx = O.create_optimizer(params, lr_schedule=O.array_schedule(sched),
                            weight_decay=0.05, layer_decay=0.75,
                            depth=model.cfg.depth, clip_grad=5.0)
    step = make_finetune_train_step(model, tx,
                                    L.create_criterion("crossentropy"))
    state = jax.device_put(TrainState.create(params, tx,
                                             jax.random.PRNGKey(1)))
    batches = []
    for _ in range(4):
        batches.append({
            "video": jnp.asarray(rng.normal(
                size=(batch, num_frames, 224, 224, 3)).astype(np.float32)
                * 0.5, dtype=jnp.bfloat16),
            "label": jnp.asarray(rng.integers(0, 2, batch)),
            "smoothed": jnp.asarray(rng.random((batch, 2), np.float32)),
            "ttc": jnp.asarray(rng.random(batch, np.float32)),
        })
    dt = _time_steps(step, state, batches)
    return round(batch / dt, 1), round(dt * 1e3, 1)


def bench_mae_step(batch=48, rng=None, mask_ratio=0.75,
                   model_name="pretrain_videomae_base_patch16_224"):
    """DAPT/MAE pretrain step (default: the jobs/dapt/pretrain_capdata.sh
    recipe shape — MAE-B, 16 frames, tube mask 0.75 -> 392 visible encoder
    tokens, 1568-token decoder), clips/s.  VERDICT r4 #2: the paper's core
    workload had no measured training throughput.  model_name also accepts
    the IV2 DAPT trunks (pretrain_videomae_internvideo2_*: 8-frame
    tubelet-1 patch-14, iv2_run_mae_double_pretraining.py recipe).
    Reference: engine_for_pretraining.py:155-221."""
    import simple_tad_tpu as st
    from simple_tad_tpu.train import optim as O
    from simple_tad_tpu.train.steps import TrainState, make_mae_train_step

    model = st.create_model(model_name, dtype=jnp.bfloat16,
                            attn_impl="auto", remat=True)
    n_tok = model.cfg.num_patches
    frames = model.cfg.all_frames
    num_masked = int(mask_ratio * n_tok)
    dummy_mask = np.zeros((1, n_tok), bool)
    dummy_mask[:, :num_masked] = True
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, frames, 224, 224, 3), jnp.bfloat16),
                        jnp.asarray(dummy_mask), num_masked)["params"]
    sched = O.cosine_scheduler(3e-4, 3e-5, epochs=12, niter_per_ep=100,
                               warmup_epochs=1)
    tx = O.create_optimizer(params, lr_schedule=O.array_schedule(sched),
                            weight_decay=0.05, betas=(0.9, 0.95),
                            clip_grad=0.0)
    step = make_mae_train_step(model, tx, num_masked=num_masked)
    state = jax.device_put(TrainState.create(params, tx,
                                             jax.random.PRNGKey(1)))
    batches = []
    for _ in range(4):
        masks = np.zeros((batch, n_tok), bool)
        for r in range(batch):
            masks[r, rng.permutation(n_tok)[:num_masked]] = True
        batches.append({
            "video": jnp.asarray(rng.normal(
                size=(batch, frames, 224, 224, 3)).astype(np.float32) * 0.5,
                dtype=jnp.bfloat16),
            "mask": jnp.asarray(masks),
        })
    dt = _time_steps(step, state, batches)
    return round(batch / dt, 1), round(dt * 1e3, 1)


def _note(key, val):
    """Progress line to stderr: a TPU fault mid-run (CLAUDE.md trap #7)
    must not lose the rows already measured."""
    import sys
    print(f"# {key} = {val}", file=sys.stderr, flush=True)


def main():
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    rng = np.random.default_rng(0)

    vitb_int8 = bench_model("vit_base_patch16_224", (48, 96, 192), True,
                            rng, stream_latency=True)
    _note("vitb_int8", vitb_int8)
    vitb_bf16 = bench_model("vit_base_patch16_224", (96,), False, rng)
    _note("vitb_bf16", vitb_bf16)
    # same-session drift anchor (VERDICT r4 weak #5): cross-session drift
    # at large program sizes is 10-15%, so IV2 rows are reported alongside
    # their ratio to this fixed bf16 config measured in the SAME session
    anchor = vitb_bf16["96"]
    small = {"anchor_vitb_bf16_b96": anchor}
    if not os.environ.get("SIMPLE_TAD_BENCH_FAST"):
        small["vit_s_int8_b96"] = bench_model(
            "vit_small_patch16_224", (96,), True, rng)["96"]
        small["vit_s_vs_baseline"] = round(
            small["vit_s_int8_b96"] / A100_BASELINE_FPS, 2)
        small["vit_l_int8_b48"] = bench_model(
            "vit_large_patch16_224", (48,), True, rng)["48"]
        small["iv2_b_int8_clips_per_sec_b48"] = bench_iv2(48, rng)
        small["iv2_1b_int8_clips_per_sec_b16"] = bench_iv2(
            16, rng, "internvideo2_1B_patch14_224")
        small["iv2_b_per_anchor"] = round(
            small["iv2_b_int8_clips_per_sec_b48"] / anchor, 4)
        small["iv2_1b_per_anchor"] = round(
            small["iv2_1b_int8_clips_per_sec_b16"] / anchor, 4)
        _note("serving", small)
        for nm, bsz, key in (("vit_base_patch16_224", 24, "vitb_b24"),
                             ("vit_small_patch16_224", 24, "vits_b24"),
                             ("vit_large_patch16_224", 12, "vitl_b12")):
            tr_cps, tr_ms = bench_train_step(bsz, rng, nm)
            small[f"train_{key}_clips_per_sec"] = tr_cps
            small[f"train_{key}_step_ms"] = tr_ms
            _note(f"train_{key}", (tr_cps, tr_ms))
        mae_cps, mae_ms = bench_mae_step(24, rng)
        small["mae_b24_clips_per_sec"] = mae_cps
        small["mae_b_step_ms"] = mae_ms
        _note("mae_b24", (mae_cps, mae_ms))
        # mask 0.9 = the K700 pretrain recipe (jobs/dapt/pretrain_k700.sh);
        # 0.75 above is the BDD+CAP DAPT shape — both driver-captured
        mae9_cps, mae9_ms = bench_mae_step(24, rng, mask_ratio=0.90)
        small["mae90_b24_clips_per_sec"] = mae9_cps
        small["mae90_b_step_ms"] = mae9_ms
        _note("mae90_b24", (mae9_cps, mae9_ms))
        iv2tr_cps, iv2tr_ms = bench_train_step(
            8, rng, "internvideo2_base_patch14_224", num_frames=8)
        small["train_iv2b_b8_clips_per_sec"] = iv2tr_cps
        small["train_iv2b_b8_step_ms"] = iv2tr_ms
        _note("train_iv2b_b8", (iv2tr_cps, iv2tr_ms))

    sweep = {k: v for k, v in vitb_int8.items() if k.isdigit()}
    best_batch, best = max(sweep.items(), key=lambda kv: kv[1])

    print(json.dumps({
        "metric": "ViT-B 16x224 sliding-window inference throughput (int8)",
        "value": best,
        "unit": "windows/s/chip",
        "vs_baseline": round(best / A100_BASELINE_FPS, 2),
        "detail": {
            "int8_windows_per_sec_by_batch": sweep,
            "best_batch": int(best_batch),
            "bf16_windows_per_sec_by_batch": vitb_bf16,
            "stream_batch1_latency_ms": vitb_int8.get("stream_batch1_ms"),
            "pct_of_mixed_roofline": round(
                best / VIT_B_MIXED_ROOFLINE_WPS * 100, 1),
            **small,
        },
    }))


if __name__ == "__main__":
    main()
