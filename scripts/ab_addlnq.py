"""Same-session A/B of the deferred-residual add+LNQ serving carry
(SIMPLE_TAD_ADD_LNQ, VERDICT r4 next #1b variant): the residual add runs
inside the next LNQ kernel's read instead of as its own XLA pass whose
bf16 sum the opaque LNQ kernel re-reads from HBM.

Protocol: bench.py's exact timing (distinct buffers, pipelined dispatch,
fetch-synced — CLAUDE.md traps #1/#8), both programs built and timed in
ONE process so relay drift cancels.

Usage: python scripts/ab_addlnq.py [--model vit_base_patch16_224]
       [--batch 96]
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
    ap.add_argument("--model", default="vit_base_patch16_224")
    ap.add_argument("--batch", type=int, default=96)
    args = ap.parse_args()

    import bench
    import simple_tad_tpu as st
    from simple_tad_tpu.eval.engine import half_kernel_tokens
    from simple_tad_tpu.ops.quant import quantize_and_calibrate
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    from simple_tad_tpu.utils.fold_norm import fold_normalization
    enable_persistent_cache()

    rng = np.random.default_rng(0)
    model = st.create_model(args.model, num_classes=2, dtype=jnp.bfloat16,
                            attn_impl="auto")
    params = model.init_params(jax.random.PRNGKey(0))
    params = fold_normalization(params)
    xcal = jnp.asarray(rng.integers(0, 256, (2, 16, 224, 224, 3),
                                    np.uint8)).astype(jnp.bfloat16)
    model, params = quantize_and_calibrate(model, params, [xcal],
                                           deterministic=True)
    tb = model.cfg.tubelet_size
    bufs = bench._frame_bufs(rng, 25)
    idx = bench._win_idx(args.batch)

    def build():
        @jax.jit
        def score(p, frames_u8, window_idx):
            pe = p["patch_embed"]
            toks = half_kernel_tokens(frames_u8.astype(jnp.bfloat16),
                                      pe["kernel"], pe["bias"], 16, tb, 1,
                                      jnp.bfloat16)
            g = jnp.take(toks, window_idx[:, ::tb], axis=0)
            x = g.reshape(g.shape[0], -1, toks.shape[-1])
            return model.apply({"params": p}, x, deterministic=True,
                               tokens_input=True).astype(jnp.float32)
        return score

    # env is read at TRACE time, which jit defers to the first CALL —
    # so each variant must be warmed (traced + fetched) under its env
    os.environ.pop("SIMPLE_TAD_ADD_LNQ", None)
    base_fn = build()
    ref = np.asarray(base_fn(params, bufs[-1], idx))
    os.environ["SIMPLE_TAD_ADD_LNQ"] = "1"
    lnq_fn = build()
    new = np.asarray(lnq_fn(params, bufs[-1], idx))
    os.environ.pop("SIMPLE_TAD_ADD_LNQ", None)
    drift = float(np.max(np.abs(ref - new)))
    print(json.dumps({"max_abs_logit_drift": drift}), flush=True)

    # prove the variant actually engaged (the first run of this script
    # compared one program against itself: identical timings, 1 cache
    # entry) — the fused add+LNQ kernel must appear in the lowered HLO
    os.environ["SIMPLE_TAD_ADD_LNQ"] = "1"
    txt = build().lower(params, bufs[-1], idx).as_text()
    os.environ.pop("SIMPLE_TAD_ADD_LNQ", None)
    n_fused = txt.count("_add_ln_quant_kernel")
    print(json.dumps({"fused_addlnq_kernel_sites": n_fused}), flush=True)
    assert n_fused > 0, "SIMPLE_TAD_ADD_LNQ gate did not engage"

    out = {}
    # interleave A/B/A/B to cancel slow relay drift
    for tag, fn in (("base", base_fn), ("addlnq", lnq_fn),
                    ("base2", base_fn), ("addlnq2", lnq_fn)):
        dt = bench._time_batched(fn, params, bufs, idx)
        out[tag] = round(dt * 1e3, 2)
        print(json.dumps({tag: out[tag],
                          "wps": round(args.batch / dt, 1)}), flush=True)
    print(json.dumps({"model": args.model, "batch": args.batch, **out}))


if __name__ == "__main__":
    main()
