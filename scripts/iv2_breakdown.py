"""Whole-model A/B cost breakdown of InternVideo2-B serving (round 3).

Same rules as scripts/perf_breakdown.py (CLAUDE.md relay traps): each
variant rebuilds the full jit'd sliding-window token-path program with
one ablation knob set; full-vs-variant deltas price one component.

IV2-B differs from the ViT trunk in ways that change the cost surface:
  * qk_normalization: TWO LayerNorm passes over (B, N, 768) per layer
    on the sliced q and k (internvideo2.py IV2Attention; reference
    other_models/InternVideo2_single_modality vit.py q_norm/k_norm),
  * N = 2049 (patch14, 8 frames, +cls) pads to 2304 with bq=384 —
    no full-sequence single-pass blocks,
  * RMS blocks, so the LayerNormQuant int8 fusion does not apply.

Variants: full | no_attn | no_qknorm | no_mlp | no_ln | bf16 |
model_only (tokens pre-gathered on device: full - model_only = the
half_kernel_tokens embed + window gather input path)
Usage: python scripts/iv2_breakdown.py [--batch 48] [--variants ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

KNOBS = ("SIMPLE_TAD_ABLATE_ATTN", "SIMPLE_TAD_ABLATE_QKNORM",
         "SIMPLE_TAD_ABLATE_MLP", "SIMPLE_TAD_ABLATE_LN",
         "SIMPLE_TAD_ABLATE_EXP", "SIMPLE_TAD_ABLATE_QK",
         "SIMPLE_TAD_ABLATE_PV", "SIMPLE_TAD_QKV_I8")


def build(quant, batch, rng, model_name="internvideo2_base_patch14_224"):
    import simple_tad_tpu as st
    from simple_tad_tpu.eval.engine import half_kernel_tokens
    from simple_tad_tpu.ops.quant import quantize_and_calibrate
    from simple_tad_tpu.utils.fold_norm import fold_normalization

    model = st.create_model(model_name, num_classes=2,
                            all_frames=8, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    params = fold_normalization(params)
    if quant:
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

    @jax.jit
    def score_tokens(p, x, window_idx):
        del window_idx
        return model.apply({"params": p}, x, deterministic=True,
                           tokens_input=True).astype(jnp.float32)

    idx = jnp.asarray(np.stack([np.arange(i, i + 8)
                                for i in range(batch)]) % 128, jnp.int32)
    return score, score_tokens, params, idx


def timeit(score, params, idx, rng, shape=(128, 224, 224, 3),
           dtype=np.uint8):
    if dtype == np.uint8:
        bufs = [jnp.asarray(rng.integers(0, 256, shape, np.uint8))
                for _ in range(25)]
    else:
        bufs = [jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1,
                            dtype=dtype) for _ in range(25)]
    # warm with a FETCH: block_until_ready returns early while a compile
    # is in flight through the relay (CLAUDE.md trap #8) — without this,
    # a fresh-variant run reports fantasy numbers
    np.asarray(score(params, bufs[-1], idx))
    best = 1e9
    for rep in range(3):
        chunk = bufs[rep * 8:(rep + 1) * 8]
        t0 = time.perf_counter()
        outs = [score(params, b, idx) for b in chunk]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / 8)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--model",
                    default="internvideo2_base_patch14_224",
                    help="IV2 trunk (base / 1B — VERDICT r3 weak #3)")
    ap.add_argument("--variants", nargs="+",
                    default=["full", "no_attn", "no_qknorm", "no_mlp",
                             "no_ln"])
    args = ap.parse_args()

    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    rng = np.random.default_rng(0)
    results = {}
    for variant in args.variants:
        for k in KNOBS:
            os.environ.pop(k, None)
        quant = variant != "bf16"
        # build (init + calibrate) with knobs CLEAR so the param tree is
        # complete; the jit traces at first call inside timeit, which is
        # when the ablation knob must be set
        score, score_tokens, params, idx = build(quant, args.batch, rng,
                                                 args.model)
        if variant == "no_attn":
            os.environ["SIMPLE_TAD_ABLATE_ATTN"] = "1"
        elif variant == "no_qknorm":
            os.environ["SIMPLE_TAD_ABLATE_QKNORM"] = "1"
        elif variant == "no_mlp":
            os.environ["SIMPLE_TAD_ABLATE_MLP"] = "1"
        elif variant == "no_ln":
            os.environ["SIMPLE_TAD_ABLATE_LN"] = "1"
        elif variant == "no_exp":
            os.environ["SIMPLE_TAD_ABLATE_EXP"] = "1"
        elif variant == "no_qk":
            os.environ["SIMPLE_TAD_ABLATE_QK"] = "1"
        elif variant == "no_pv":
            os.environ["SIMPLE_TAD_ABLATE_PV"] = "1"
        elif variant == "bf16_qkv":
            # disable int8-STORAGE attention (round 4): A/B of the
            # separate-operand i8d path vs bf16 q/k/v through HBM
            os.environ["SIMPLE_TAD_QKV_I8"] = "0"
        if variant == "model_only":
            # pre-gathered token batches (B, 2048, 768) replace the
            # frame buffers; distinct per call, same relay rules
            tok_rng = np.random.default_rng(7)
            ed = params["patch_kernel"].shape[-1]   # 768 base / 1408 1B
            dt = timeit(score_tokens, params, idx, tok_rng,
                        shape=(args.batch, 2048, ed), dtype=jnp.bfloat16)
        else:
            dt = timeit(score, params, idx, rng)
        results[variant] = dt
        print(json.dumps({"variant": variant, "ms": round(dt * 1000, 1),
                          "clips_per_sec": round(args.batch / dt, 1)}),
              flush=True)
    for k in KNOBS:
        os.environ.pop(k, None)
    if "full" in results:
        full = results["full"]
        deltas = {k: round((full - v) * 1000, 1)
                  for k, v in results.items() if k != "full"}
        print(json.dumps({"full_ms": round(full * 1000, 1),
                          "component_delta_ms": deltas}))


if __name__ == "__main__":
    main()
