"""Knowledge-distillation driver: teacher -> student.

Two objectives:

* ``--objective logit_kd`` (labeled): a frozen teacher's soft logits
  supervise a smaller student alongside the hard-label loss,
  loss = alpha * T^2 * KL(teacher_T || student_T) + (1-alpha) * CE(labels)
  — the classic Hinton recipe, usable on DoTA/DADA frame windows.
* ``--objective feature`` (UNSUPERVISED): the reference's IV2 recipe
  (/root/reference/other_models/InternVideo2_single_modality/run_distill.py
  + engines/engine_for_pretraining.py:127-143) distills the teacher's
  l2-normalized FINAL features into the student on unlabeled video with
  loss = mean(2 - 2 * cos(student_feat, teacher_feat)); no labels are
  read.  Both IV2 trunks project to the same clip_embed_dim (768), so
  final-feature alignment needs no decoder; a Linear aligner is inserted
  automatically when dims differ (the reference's Linear_Decoder).
  Middle-layer feature taps (clip_return_layer > 1) are not implemented.

Usage (labeled logit KD):
  python -m simple_tad_tpu.cli.distill \
      --data_set DoTA --data_path <root> \
      --teacher_model vit_large_patch16_224 --teacher_ckpt big.pth \
      --model vit_small_patch16_224 --epochs 10 --output_dir out/
Usage (unsupervised feature distillation, K700):
  ... --objective feature --data_set K700 --data_path <k700 root> \
      --teacher_model internvideo2_1B_patch14_224 \
      --model internvideo2_small_patch14_224 --num_frames 8
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def make_distill_step(student, teacher, tx, *, alpha: float = 0.5,
                      temperature: float = 2.0, donate: bool = False):
    from simple_tad_tpu.train.losses import cross_entropy
    from simple_tad_tpu.train.steps import TrainState
    import optax

    T = temperature

    def step(state: "TrainState", batch, teacher_params):
        rng, d1, d2 = jax.random.split(state.rng, 3)
        t_logits = teacher.apply({"params": teacher_params},
                                 batch["video"], deterministic=True)
        t_soft = jax.nn.softmax(t_logits.astype(jnp.float32) / T, -1)

        def loss_fn(p):
            s_logits = student.apply(
                {"params": p}, batch["video"], deterministic=False,
                rngs={"dropout": d1, "droppath": d2}).astype(jnp.float32)
            s_log = jax.nn.log_softmax(s_logits / T, -1)
            kd = -jnp.mean(jnp.sum(t_soft * s_log, -1)) * T * T
            ce = cross_entropy(s_logits, batch["label"])
            return alpha * kd + (1 - alpha) * ce, (kd, ce, s_logits)

        (loss, (kd, ce, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "kd": kd, "ce": ce,
                   "grad_norm": optax.global_norm(grads)}
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), (metrics, logits)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_feature_distill_step(student, teacher, aligner, tx, *,
                              donate: bool = False):
    """Unsupervised final-feature distillation
    (engines/engine_for_pretraining.py:131-143): both features
    l2-normalize, loss = mean(2 - 2 * cos).  ``aligner`` is a flax Dense
    (or None when widths already match, e.g. IV2 clip_embed_dim 768 for
    every size)."""
    import optax

    from simple_tad_tpu.train.steps import TrainState

    def l2n(x):
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-6)

    def step(state: "TrainState", batch, teacher_params):
        rng, d1, d2 = jax.random.split(state.rng, 3)
        t_feat = l2n(teacher.apply({"params": teacher_params},
                                   batch["video"], deterministic=True,
                                   features_only=True))

        def loss_fn(p):
            s_feat = student.apply(
                {"params": p["student"]}, batch["video"],
                deterministic=False, features_only=True,
                rngs={"dropout": d1, "droppath": d2})
            if aligner is not None:
                s_feat = aligner.apply({"params": p["aligner"]},
                                       s_feat.astype(jnp.float32))
            s_feat = l2n(s_feat)
            return jnp.mean(2.0 - 2.0 * jnp.sum(s_feat * t_feat, -1))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), (metrics, None)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def main(argv=None):
    p = argparse.ArgumentParser("simple_tad_tpu distillation")
    p.add_argument("--data_set", default="DoTA")
    p.add_argument("--data_path", required=True)
    p.add_argument("--model", default="vit_small_patch16_224")
    p.add_argument("--teacher_model", default="vit_large_patch16_224")
    p.add_argument("--teacher_ckpt", default="")
    p.add_argument("--finetune", default="", help="student init ckpt")
    p.add_argument("--nb_classes", type=int, default=2)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--view_fps", type=int, default=10)
    p.add_argument("--sampling_rate", type=int, default=1)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--warmup_epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--objective", default="logit_kd",
                   choices=["logit_kd", "feature"],
                   help="feature = unsupervised l2-feature distillation "
                        "(reference run_distill.py); logit_kd = labeled "
                        "soft-logit KD")
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--output_dir", default="")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--attn_impl", default="auto")
    args = p.parse_args(argv)

    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import simple_tad_tpu as st
    from simple_tad_tpu.data.frame_datasets import (FrameDataset,
                                                    read_dada_clips,
                                                    read_dota_clips)
    from simple_tad_tpu.ops.augment import train_augment
    from simple_tad_tpu.train import optim as O
    from simple_tad_tpu.train.engine import TrainLoader
    from simple_tad_tpu.train.steps import TrainState
    from simple_tad_tpu.utils import checkpoint as ckpt_utils
    from simple_tad_tpu.utils.logging import MetricLogger
    from simple_tad_tpu.utils.torch_convert import load_checkpoint_auto

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    common = dict(num_classes=args.nb_classes, all_frames=args.num_frames,
                  img_size=args.input_size, dtype=dtype,
                  attn_impl=args.attn_impl)
    student = st.create_model(args.model, **common)
    teacher = st.create_model(args.teacher_model, **common)
    s_params = student.init_params(jax.random.PRNGKey(args.seed))
    t_params = teacher.init_params(jax.random.PRNGKey(args.seed + 1))
    if args.finetune:
        s_params = load_checkpoint_auto(args.finetune, student, s_params)
    if args.teacher_ckpt:
        t_params = load_checkpoint_auto(args.teacher_ckpt, teacher,
                                        t_params)
        print(f"teacher from {args.teacher_ckpt}")
    t_params = jax.device_put(t_params)

    kinetics_loader = None
    if args.data_set in ("K700", "Kinetics-700", "Kinetics-400"):
        # unlabeled video source (feature objective only — there are no
        # frame labels): one TSN window per video per epoch, like the
        # pretrain driver (run_distill.py trains on the K710 video list)
        if args.objective != "feature":
            raise ValueError("Kinetics sources are unlabeled - use "
                             "--objective feature")
        from simple_tad_tpu.data.pretrain_datasets import (
            KineticsPretrainDataset, VideoFileSource, read_kinetics_clips)
        paths = read_kinetics_clips(args.data_path, "annotations/train.csv")
        ds = KineticsPretrainDataset(
            VideoFileSource(paths, half_first=False),
            view_len=args.num_frames, sampling_rate=args.sampling_rate,
            mode="tsn", target_fps=args.view_fps, seed=args.seed)
        kinetics_loader = True
    elif args.data_set == "DoTA":
        clips = read_dota_clips(args.data_path, "train_split.txt",
                                orig_fps=10)
        orig_fps = 10
    elif args.data_set in ("DADA2K", "DADA"):
        clips = read_dada_clips(args.data_path,
                                "DADA2K_my_split/training.txt", orig_fps=30)
        orig_fps = 30
    else:
        raise ValueError(f"unknown data_set {args.data_set}")
    if kinetics_loader is None:
        ds = FrameDataset(clips, mode="train", view_len=args.num_frames,
                          target_fps=args.view_fps, orig_fps=orig_fps,
                          view_step=args.sampling_rate,
                          crop_size=args.input_size)
    # batch_size is per-device; loader batches are global and sharded
    # over a 1-D data mesh like cli.finetune
    from simple_tad_tpu.parallel.mesh import data_parallel_setup
    n_dev, put, replicate = data_parallel_setup()
    t_params = replicate(t_params)
    if kinetics_loader:
        from simple_tad_tpu.data.pretrain_datasets import PretrainLoader
        window = (args.num_frames, args.input_size // 14,
                  args.input_size // 14)
        loader = PretrainLoader(ds, args.batch_size * n_dev,
                                window_size=window, mask_ratio=0.75,
                                seed=args.seed,
                                num_threads=args.num_workers)
    else:
        loader = TrainLoader(ds, args.batch_size * n_dev, seed=args.seed,
                             num_threads=args.num_workers)
    steps = loader.steps_per_epoch()
    lr = args.lr * args.batch_size * n_dev / 256.0
    sched = O.cosine_scheduler(lr, 1e-6, args.epochs, steps,
                               warmup_epochs=args.warmup_epochs)

    aligner = None
    if args.objective == "feature":
        import flax.linen as nn

        def feat_dim(m):
            return getattr(m.cfg, "clip_embed_dim", None) or m.cfg.embed_dim
        params: dict = {"student": s_params}
        if feat_dim(student) != feat_dim(teacher):
            # the reference's Linear_Decoder aligns student width to the
            # teacher's (internvideo2_distill.py); IV2 trunks all share
            # clip_embed_dim 768 and skip it
            aligner = nn.Dense(feat_dim(teacher), dtype=jnp.float32)
            params["aligner"] = aligner.init(
                jax.random.PRNGKey(args.seed + 4),
                jnp.zeros((1, feat_dim(student)), jnp.float32))["params"]
        tx = O.create_optimizer(params, lr_schedule=O.array_schedule(sched),
                                weight_decay=args.weight_decay)
        step_fn = make_feature_distill_step(student, teacher, aligner, tx)
        state = replicate(TrainState.create(
            params, tx, jax.random.PRNGKey(args.seed + 2)))
    else:
        tx = O.create_optimizer(s_params,
                                lr_schedule=O.array_schedule(sched),
                                weight_decay=args.weight_decay)
        step_fn = make_distill_step(student, teacher, tx, alpha=args.alpha,
                                    temperature=args.temperature)
        state = replicate(TrainState.create(
            s_params, tx, jax.random.PRNGKey(args.seed + 2)))
    aug_key = jax.random.PRNGKey(args.seed + 3)

    for epoch in range(args.epochs):
        ml = MetricLogger(print_freq=10)
        t0 = time.time()
        for batch in ml.log_every(loader.epoch(epoch),
                                  header=f"Epoch [{epoch}]"):
            aug_key, k = jax.random.split(aug_key)
            video = train_augment(put(batch["video_u8"]), k,
                                  crop_size=args.input_size,
                                  reprob=args.reprob, dtype=dtype)
            if args.objective == "feature":
                dev_batch = {"video": video}
                state, (metrics, _) = step_fn(state, dev_batch, t_params)
                ml.update(loss=float(metrics["loss"]))
            else:
                dev_batch = {"video": video,
                             "label": put(batch["label"])}
                state, (metrics, _) = step_fn(state, dev_batch, t_params)
                ml.update(loss=float(metrics["loss"]),
                          kd=float(metrics["kd"]),
                          ce=float(metrics["ce"]))
        print(f"[epoch {epoch}] {ml} ({time.time() - t0:.0f}s)")
        if args.output_dir:
            os.makedirs(args.output_dir, exist_ok=True)
            ckpt_utils.save_train_state(args.output_dir, state, epoch)
    return state


if __name__ == "__main__":
    main()
