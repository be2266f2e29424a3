"""Whole-step A/B cost breakdown of the finetune TRAINING program.

Serving got a measured roofline decomposition in round 3
(scripts/perf_breakdown.py, docs/ROOFLINE.md); this is the training-side
equivalent.  Same rules: single-op microbenchmarks are useless through
the serving relay (CLAUDE.md traps), so every variant rebuilds the full
jit'd train step with one measurement knob set and the full-vs-variant
delta isolates one component.

Variants:
  full      production step: remat scan, drop_path 0.1, adamw +
            layer-decay + global-norm clip, batch 24 (TRAIN.md recipe)
  no_attn   attention core replaced by a zero-FLOP qkv combine
            (fwd AND bwd FLOPs disappear; the qkv/proj GEMMs remain)
  no_ln     LayerNorm mean/var passes removed (affine kept)
  no_mlp    whole MLP (fc1+GELU+fc2) removed
  fwd       forward + loss only (no grad, no remat refwd, no optimizer)
  opt       optimizer alone: tx.update + apply_updates + global_norm on
            captured real-shaped grads (the non-model step overhead)
  dropout   full + attn_drop 0.1 (in-kernel PRNG path)
  noremat   full without gradient checkpointing (smaller batch if OOM)
  mae       DAPT/MAE-B pretrain step, mask 0.75, batch 48 (BDD+CAP
            recipe shape; encoder sees 392 visible tokens, decoder 4
            blocks on 1568)
  mae90     same at mask 0.9 (K700 recipe; 160 visible tokens)

Usage: python scripts/train_breakdown.py [--batch 24] [--depth-variants]
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

KNOBS = ("SIMPLE_TAD_ABLATE_ATTN", "SIMPLE_TAD_ABLATE_LN",
         "SIMPLE_TAD_ABLATE_MLP")


def _batches(rng, n, b, frames=16):
    out = []
    for _ in range(n):
        out.append({
            "video": jnp.asarray(rng.normal(
                size=(b, frames, 224, 224, 3)).astype(np.float32) * 0.5,
                dtype=jnp.bfloat16),
            "label": jnp.asarray(rng.integers(0, 2, b)),
            "smoothed": jnp.asarray(rng.random((b, 2), np.float32)),
            "ttc": jnp.asarray(rng.random(b, np.float32)),
        })
    return out


def _build_step(batch_size, *, remat=True, attn_drop=0.0, ema=False):
    import simple_tad_tpu as st
    from simple_tad_tpu.train import losses as L
    from simple_tad_tpu.train import optim as O
    from simple_tad_tpu.train.steps import TrainState, make_finetune_train_step

    model = st.create_model("vit_base_patch16_224", num_classes=2,
                            dtype=jnp.bfloat16, attn_impl="auto",
                            remat=remat, drop_path_rate=0.1,
                            attn_drop_rate=attn_drop)
    params = model.init_params(jax.random.PRNGKey(0))
    sched = O.cosine_scheduler(1e-3, 1e-6, epochs=20, niter_per_ep=100,
                               warmup_epochs=5)
    tx = O.create_optimizer(params, lr_schedule=O.array_schedule(sched),
                            weight_decay=0.05, layer_decay=0.75,
                            depth=model.cfg.depth, clip_grad=5.0)
    criterion = L.create_criterion("crossentropy")
    step = make_finetune_train_step(model, tx, criterion,
                                    ema_decay=0.9999 if ema else None)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1),
                              ema_decay=0.9999 if ema else None)
    state = jax.device_put(state)
    return model, tx, criterion, step, state


def _build_mae_step(batch_size, mask_ratio, rng):
    import simple_tad_tpu as st
    from simple_tad_tpu.train import optim as O
    from simple_tad_tpu.train.steps import TrainState, make_mae_train_step

    model = st.create_model("pretrain_videomae_base_patch16_224",
                            dtype=jnp.bfloat16, attn_impl="auto",
                            remat=True)   # b48 needs 25G un-remat on 16G
    n_tok = model.cfg.num_patches
    num_masked = int(mask_ratio * n_tok)
    dummy_mask = np.zeros((1, n_tok), bool)
    dummy_mask[:, :num_masked] = True
    dummy = jnp.zeros((1, 16, 224, 224, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), dummy,
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
        masks = np.zeros((batch_size, n_tok), bool)
        for r in range(batch_size):
            masks[r, rng.permutation(n_tok)[:num_masked]] = True
        batches.append({
            "video": jnp.asarray(rng.normal(
                size=(batch_size, 16, 224, 224, 3)).astype(np.float32)
                * 0.5, dtype=jnp.bfloat16),
            "mask": jnp.asarray(masks),
        })
    return step, state, batches, model, num_masked


def _time_steps(step, state, batches, warmup=2, reps=8):
    # trap #8: a result FETCH (np.asarray), not block_until_ready, is what
    # synchronizes through the relay; state.step is a scalar so the fetch
    # itself is free
    for i in range(warmup):
        state, _ = step(state, batches[i % len(batches)])
    np.asarray(state.step)
    t0 = time.perf_counter()
    for i in range(reps):
        state, _ = step(state, batches[i % len(batches)])
    np.asarray(state.step)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--noremat-batch", type=int, default=8)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "no_attn", "no_ln", "no_mlp", "fwd",
                             "opt", "dropout"])
    args = ap.parse_args()

    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    rng = np.random.default_rng(0)
    batches = _batches(rng, 4, args.batch)
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

        b = args.batch
        if variant.startswith("mae"):
            # mae / mae90 / mae_no_attn / mae_no_mlp / mae_no_ln — the MAE
            # encoder+decoder share Block, so the same ablation knobs
            # price attention/MLP across BOTH stacks at the masked
            # geometry (VERDICT r4 #2 attribution)
            if variant.endswith("_no_attn"):
                os.environ["SIMPLE_TAD_ABLATE_ATTN"] = "1"
            elif variant.endswith("_no_mlp"):
                os.environ["SIMPLE_TAD_ABLATE_MLP"] = "1"
            elif variant.endswith("_no_ln"):
                os.environ["SIMPLE_TAD_ABLATE_LN"] = "1"
            b = args.batch      # b24 = the bench.py mae row geometry;
                                # b48 crashed the TPU worker (r5)
            ratio = 0.9 if variant == "mae90" else 0.75
            step, state, bts, mmodel, n_masked = _build_mae_step(
                b, ratio, rng)
            if variant == "mae_fwd":
                # forward + target construction + loss only: full minus
                # this = backward + optimizer
                from simple_tad_tpu.models.mae import mae_targets
                from simple_tad_tpu.ops.image import (IMAGENET_MEAN,
                                                      IMAGENET_STD)
                mean = jnp.asarray(IMAGENET_MEAN)
                std = jnp.asarray(IMAGENET_STD)
                cfgm = mmodel.cfg

                @jax.jit
                def fwd(params, batch, rngs):
                    unnorm = batch["video"].astype(jnp.float32) * std + mean
                    tgt = mae_targets(unnorm, batch["mask"], n_masked,
                                      patch_size=cfgm.patch_size,
                                      tubelet_size=cfgm.tubelet_size)
                    pred = mmodel.apply(
                        {"params": params}, batch["video"], batch["mask"],
                        n_masked, deterministic=False, rngs=rngs)
                    return jnp.mean(jnp.square(pred - tgt))
                rngs = {"dropout": jax.random.PRNGKey(2),
                        "droppath": jax.random.PRNGKey(3)}
                np.asarray(fwd(state.params, bts[0], rngs))
                t0 = time.perf_counter()
                outs = [fwd(state.params, bb, rngs) for bb in bts * 2]
                np.asarray(outs[-1])
                dt = (time.perf_counter() - t0) / (len(bts) * 2)
            elif variant == "mae_pretgt":
                # targets precomputed OUTSIDE the timed step: full minus
                # this = the unnorm+patchify+per-patch-norm target pass
                from simple_tad_tpu.models.mae import mae_targets
                from simple_tad_tpu.ops.image import (IMAGENET_MEAN,
                                                      IMAGENET_STD)
                mean = jnp.asarray(IMAGENET_MEAN)
                std = jnp.asarray(IMAGENET_STD)
                cfgm = mmodel.cfg
                mk_tgt = jax.jit(lambda v, m: mae_targets(
                    v.astype(jnp.float32) * std + mean, m, n_masked,
                    patch_size=cfgm.patch_size,
                    tubelet_size=cfgm.tubelet_size))
                for bb in bts:
                    bb["targets"] = mk_tgt(bb["video"], bb["mask"])
                jax.block_until_ready([bb["targets"] for bb in bts])
                import optax as _ox
                from simple_tad_tpu.train import optim as O
                # same optimizer construction as _build_mae_step; the
                # only difference from the full step is the loss reading
                # batch["targets"] instead of building them in-step
                sched = O.cosine_scheduler(3e-4, 3e-5, epochs=12,
                                           niter_per_ep=100,
                                           warmup_epochs=1)
                tx2 = O.create_optimizer(
                    state.params, lr_schedule=O.array_schedule(sched),
                    weight_decay=0.05, betas=(0.9, 0.95), clip_grad=0.0)

                def step2(state, batch):
                    rng, d_rng, p_rng = jax.random.split(state.rng, 3)

                    def loss_fn(params):
                        pred = mmodel.apply(
                            {"params": params}, batch["video"],
                            batch["mask"], n_masked, deterministic=False,
                            rngs={"dropout": d_rng, "droppath": p_rng})
                        return jnp.mean(jnp.square(pred - batch["targets"]))
                    loss, grads = jax.value_and_grad(loss_fn)(state.params)
                    updates, opt_state = tx2.update(grads, state.opt_state,
                                                    state.params)
                    params = _ox.apply_updates(state.params, updates)
                    return state.replace(step=state.step + 1, params=params,
                                         opt_state=opt_state, rng=rng), loss
                jstep = jax.jit(step2, donate_argnums=(0,))
                dt = _time_steps(jstep, state, bts)
            else:
                dt = _time_steps(step, state, bts)
        elif variant == "noremat":
            b = args.noremat_batch
            bts = _batches(rng, 4, b)
            model, tx, criterion, step, state = _build_step(b, remat=False)
            dt = _time_steps(step, state, bts)
        elif variant == "dropout":
            model, tx, criterion, step, state = _build_step(
                args.batch, attn_drop=0.1)
            dt = _time_steps(step, state, batches)
        elif variant == "fwd":
            model, tx, criterion, _, state = _build_step(args.batch)

            @jax.jit
            def fwd(params, batch, rngs):
                logits = model.apply({"params": params}, batch["video"],
                                     deterministic=False, rngs=rngs)
                return criterion(logits, batch["label"], batch["smoothed"],
                                 batch["ttc"])
            rngs = {"dropout": jax.random.PRNGKey(2),
                    "droppath": jax.random.PRNGKey(3)}
            fwd(state.params, batches[0], rngs).block_until_ready()
            t0 = time.perf_counter()
            outs = [fwd(state.params, bb, rngs) for bb in batches * 2]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / (len(batches) * 2)
        elif variant == "opt":
            model, tx, criterion, _, state = _build_step(args.batch)
            import optax
            grads = jax.tree.map(
                lambda p: jnp.full(p.shape, 1e-4, p.dtype), state.params)

            @jax.jit
            def opt_step(grads, opt_state, params):
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, optax.global_norm(grads)
            p, o, g = opt_step(grads, state.opt_state, state.params)
            jax.block_until_ready((p, o, g))
            t0 = time.perf_counter()
            for _ in range(8):
                p, o, g = opt_step(grads, o, state.params)
            jax.block_until_ready((p, o, g))
            dt = (time.perf_counter() - t0) / 8
        else:
            model, tx, criterion, step, state = _build_step(args.batch)
            dt = _time_steps(step, state, batches)

        results[variant] = round(dt * 1e3, 1)
        print(json.dumps({"variant": variant, "batch": b,
                          "ms_per_step": results[variant],
                          "samples_per_sec": round(b / dt, 1)}), flush=True)

    full = results.get("full")
    if full:
        deltas = {k: round(full - v, 1) for k, v in results.items()
                  if k.startswith("no_")}
        print(json.dumps({"batch": args.batch, "full_ms": full,
                          "component_ms": deltas,
                          "fwd_ms": results.get("fwd"),
                          "opt_ms": results.get("opt"),
                          "dropout_ms": results.get("dropout")}))


if __name__ == "__main__":
    main()
