"""Whole-model A/B cost breakdown of the int8 serving program (round 3).

Protocol: identical to bench.py (distinct input buffers, pipelined
dispatch-then-block) — single-op microbenchmarks are useless through the
serving relay (CLAUDE.md traps).  Each variant rebuilds the jit with one
measurement knob set, so the full-vs-variant delta isolates one
component's cost:

  full       the production int8-static program (token-precompute path)
  no_attn    attention core replaced by a zero-FLOP qkv combine
  no_ln      LayerNorm mean/var passes removed (affine kept; with the
             LayerNormQuant default this delta is small — the quantize
             remains in the ablated affine)
  no_mlp     whole MLP (fc1+GELU+fc2) removed
  gather     LEGACY pixel window gather + patch embed (the path the
             token precompute replaced; kept for comparison)

Usage: python scripts/perf_breakdown.py [--model vit_base_patch16_224]
       [--batch 96] [--quant]
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


def _frame_bufs(rng, n, frames=256):
    return [jnp.asarray(rng.integers(0, 256, (frames, 224, 224, 3),
                                     dtype=np.uint8)) for _ in range(n)]


def _win_idx(batch, frames=256):
    idx = np.stack([np.arange(i, i + 16) for i in range(batch)])
    return jnp.asarray(idx % frames, jnp.int32)


def _time(fn, p, bufs, idx, reps=3, per_rep=8):
    # trap #8: warm-up and every chunk end in a result FETCH — through the
    # relay block_until_ready returns early while a compile is in flight
    np.asarray(fn(p, bufs[-1], idx))
    best = 1e9
    for rep in range(reps):
        chunk = bufs[rep * per_rep:(rep + 1) * per_rep]
        t0 = time.perf_counter()
        outs = [fn(p, b, idx) for b in chunk]
        np.asarray(outs[-1])
        best = min(best, (time.perf_counter() - t0) / len(chunk))
    return best


KNOBS = ("SIMPLE_TAD_ABLATE_ATTN", "SIMPLE_TAD_ABLATE_LN",
         "SIMPLE_TAD_ABLATE_MLP", "SIMPLE_TAD_ABLATE_QKV",
         "SIMPLE_TAD_ABLATE_PROJ")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_base_patch16_224")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--bf16", action="store_true",
                    help="skip int8 quantization (bf16 program)")
    ap.add_argument("--variants", nargs="+",
                    default=["full", "no_attn", "no_ln", "no_mlp", "no_qkv",
                             "no_proj", "tokens_only", "embed_only",
                             "gather"])
    args = ap.parse_args()

    import simple_tad_tpu as st
    from simple_tad_tpu.ops.quant import quantize_and_calibrate
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    from simple_tad_tpu.utils.fold_norm import fold_normalization
    enable_persistent_cache()

    for k in KNOBS:
        os.environ.pop(k, None)
    rng = np.random.default_rng(0)
    model = st.create_model(args.model, num_classes=2, dtype=jnp.bfloat16,
                            attn_impl="auto")
    params = model.init_params(jax.random.PRNGKey(0))
    params = fold_normalization(params)
    if not args.bf16:
        xcal = jnp.asarray(
            rng.integers(0, 256, (2, 16, 224, 224, 3), np.uint8)
        ).astype(jnp.bfloat16)
        model, params = quantize_and_calibrate(model, params, [xcal],
                                               deterministic=True)

    bufs = _frame_bufs(rng, 25)
    idx = _win_idx(args.batch)
    results = {}
    for variant in args.variants:
        for k in KNOBS:
            os.environ.pop(k, None)
        if variant == "no_attn":
            os.environ["SIMPLE_TAD_ABLATE_ATTN"] = "1"
        elif variant == "no_ln":
            os.environ["SIMPLE_TAD_ABLATE_LN"] = "1"
        elif variant == "no_mlp":
            os.environ["SIMPLE_TAD_ABLATE_MLP"] = "1"
        elif variant == "no_qkv":
            os.environ["SIMPLE_TAD_ABLATE_QKV"] = "1"
        elif variant == "no_proj":
            os.environ["SIMPLE_TAD_ABLATE_PROJ"] = "1"

        if variant in ("tokens_only", "embed_only"):
            # split the embed+gather front end out of the program:
            #   tokens_only — frames are pre-embedded OUTSIDE the timed fn
            #                 (full - tokens_only = half_kernel_tokens cost)
            #   embed_only  — embed + window gather alone, no transformer
            from simple_tad_tpu.eval.engine import half_kernel_tokens
            tb = model.cfg.tubelet_size
            pe = params["patch_embed"]

            def embed(frames_u8):
                return half_kernel_tokens(frames_u8.astype(jnp.bfloat16),
                                          pe["kernel"], pe["bias"], 16, tb,
                                          1, jnp.bfloat16)

            if variant == "tokens_only":
                tok_bufs = [jax.jit(embed)(b) for b in bufs]
                jax.block_until_ready(tok_bufs)

                @jax.jit
                def score(p, toks, window_idx):
                    g = jnp.take(toks, window_idx[:, ::tb], axis=0)
                    x = g.reshape(g.shape[0], -1, toks.shape[-1])
                    return model.apply({"params": p}, x, deterministic=True,
                                       tokens_input=True).astype(jnp.float32)
                dt = _time(score, params, tok_bufs, idx)
            else:
                @jax.jit
                def score(p, frames_u8, window_idx):
                    toks = embed(frames_u8)
                    g = jnp.take(toks, window_idx[:, ::tb], axis=0)
                    return jnp.sum(g, axis=(1, 2), dtype=jnp.float32)
                dt = _time(score, params, bufs, idx)
        elif variant == "gather":
            from simple_tad_tpu.models.layers import PatchEmbed
            pe = PatchEmbed(embed_dim=768, dtype=jnp.bfloat16)
            pep = pe.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 16, 224, 224, 3),
                                    jnp.bfloat16))["params"]

            @jax.jit
            def score(p, frames_u8, window_idx):
                w = jnp.take(frames_u8, window_idx,
                             axis=0).astype(jnp.bfloat16)
                return jnp.sum(pe.apply({"params": p}, w), axis=(1, 2))

            dt = _time(score, pep, bufs, idx)
        else:
            tb = model.cfg.tubelet_size

            @jax.jit
            def score(p, frames_u8, window_idx):
                # mirror bench.py's production token path
                from simple_tad_tpu.eval.engine import half_kernel_tokens
                pe = p["patch_embed"]
                toks = half_kernel_tokens(frames_u8.astype(jnp.bfloat16),
                                          pe["kernel"], pe["bias"], 16, tb,
                                          1, jnp.bfloat16)
                g = jnp.take(toks, window_idx[:, ::tb], axis=0)
                x = g.reshape(g.shape[0], -1, toks.shape[-1])
                return model.apply({"params": p}, x, deterministic=True,
                                   tokens_input=True).astype(jnp.float32)
            dt = _time(score, params, bufs, idx)
        results[variant] = round(dt * 1e3, 2)
        print(json.dumps({"variant": variant, "ms_per_batch": results[variant],
                          "windows_per_sec": round(args.batch / dt, 1)}),
              flush=True)

    full = results.get("full")
    if full:
        deltas = {k: round(full - v, 2) for k, v in results.items()
                  if k not in ("full", "gather", "embed_only")}
        print(json.dumps({"batch": args.batch, "full_ms": full,
                          "component_ms": deltas,
                          "gather_ms": results.get("gather")}))


if __name__ == "__main__":
    main()
