"""Knowledge-distillation driver: teacher -> student.

Two objectives:

* ``--objective logit_kd`` (labeled): a frozen teacher's soft logits
  supervise a smaller student alongside the hard-label loss,
  loss = alpha * T^2 * KL(teacher_T || student_T) + (1-alpha) * CE(labels)
  — the classic Hinton recipe, usable on DoTA/DADA frame windows.
* ``--objective feature`` (UNSUPERVISED): final-feature-only cosine
  alignment on unmasked video — the simplified warm-up objective.  Both
  IV2 trunks project to the same clip_embed_dim (768), so final-feature
  alignment needs no decoder; a Linear aligner is inserted automatically
  when dims differ.

* ``--objective masked_feature`` (UNSUPERVISED): the reference's ACTUAL
  stage-2 recipe (/root/reference/other_models/InternVideo2_single_modality/
  run_distill.py + engines/engine_for_pretraining.py:63-143 +
  scripts/distillation/*_dist_1B_stage2.sh): the frozen teacher runs on
  the FULL clip and returns K l2-normalized intermediate-layer features
  plus its attention-pooled final feature; the student
  (distill_internvideo2_*) runs on the VISIBLE tokens of a masked clip
  (``--mask_type tube|random|attention``, ratio 0.8 in the recipes) and
  aligns each of its K decoded taps against the teacher's features at the
  visible positions, plus its decoded final feature, with
  loss = ratio[0] * mean(2-2cos(middle)) + ratio[1] * mean(2-2cos(final)).
  ``attention`` masking importance-samples visible tokens from the
  teacher's pooling attention (multinomial-without-replacement == Gumbel
  top-k), per engine_for_pretraining.py:106-118.

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


def attention_mask_from_importance(attn, num_masked: int, key):
    """(B, N) non-negative importance -> (B, N+1) bool mask with a
    leading always-visible CLS slot (True = masked).

    Sampling-without-replacement by importance via Gumbel top-k — the
    exact distribution of the reference's ``torch.multinomial(attn, N)``
    prefix (engine_for_pretraining.py:106-118): the N - num_masked
    highest gumbel-perturbed log-weights stay visible."""
    B, N = attn.shape
    g = jax.random.gumbel(key, (B, N), dtype=jnp.float32)
    keys = jnp.log(jnp.maximum(attn.astype(jnp.float32), 1e-20)) + g
    # threshold = the (N - num_masked)-th largest key per row; everything
    # strictly below it is masked (exactly num_masked with distinct keys)
    thresh = jnp.sort(keys, axis=1)[:, num_masked][:, None]
    masked = keys < thresh
    return jnp.concatenate([jnp.zeros((B, 1), bool), masked], axis=1)


def make_masked_distill_step(student, teacher, tx, *, num_masked: int,
                             teacher_taps, loss_ratio=(1.0, 1.0),
                             mask_type: str = "tube", donate: bool = False):
    """The stage-2 masked multi-layer alignment step
    (engine_for_pretraining.py:63-143, single-teacher CLIP variant as
    wired by run_distill.py:216-253 + :375-390).

    batch: {'video': (B,T,H,W,C) normalized, 'mask': (B,N) bool from the
    loader's generator (ignored for mask_type='attention')}.  num_masked
    counts NON-CLS tokens; the step prepends the always-visible CLS slot.
    """
    import optax

    from simple_tad_tpu.models.mae import mask_partition
    from simple_tad_tpu.train.steps import TrainState

    r_mid, r_fin = float(loss_ratio[0]), float(loss_ratio[1])

    def step(state: "TrainState", batch, teacher_params):
        rng, d1, d2, mkey = jax.random.split(state.rng, 4)
        video = batch["video"]
        t_mid, t_fin, t_attn = teacher.apply(
            {"params": teacher_params}, video, deterministic=True,
            return_taps=teacher_taps)
        t_mid = jax.lax.stop_gradient(t_mid)
        t_fin = jax.lax.stop_gradient(t_fin)
        if mask_type == "attention":
            mask = attention_mask_from_importance(
                jax.lax.stop_gradient(t_attn), num_masked, mkey)
        else:
            m = batch["mask"]
            mask = jnp.concatenate(
                [jnp.zeros((m.shape[0], 1), bool), m], axis=1)
        vis_idx, _ = mask_partition(mask, num_masked)
        # teacher targets at the visible positions, shared across taps
        # (engine:119-122 norm_clip_middle[~clip_bool_masked_pos])
        tgt = jnp.take_along_axis(t_mid, vis_idx[None, :, :, None], axis=2)

        def loss_fn(p):
            s_mid, s_fin = student.apply(
                {"params": p}, video, mask, num_masked,
                deterministic=False,
                rngs={"dropout": d1, "droppath": d2})
            l_mid = jnp.mean(2.0 - 2.0 * jnp.sum(
                s_mid.astype(jnp.float32) * tgt, -1))
            if s_fin is not None and r_fin > 0:
                l_fin = jnp.mean(2.0 - 2.0 * jnp.sum(
                    s_fin.astype(jnp.float32) * t_fin, -1))
            else:
                l_fin = jnp.zeros((), jnp.float32)
            return r_mid * l_mid + r_fin * l_fin, (l_mid, l_fin)

        (loss, (l_mid, l_fin)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "loss_clip_middle": l_mid,
                   "loss_clip_final": l_fin,
                   "grad_norm": optax.global_norm(grads)}
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
                   choices=["logit_kd", "feature", "masked_feature"],
                   help="masked_feature = the reference stage-2 recipe "
                        "(masked multi-layer alignment, run_distill.py); "
                        "feature = final-feature-only on unmasked video; "
                        "logit_kd = labeled soft-logit KD")
    # stage-2 recipe knobs (run_distill.py:67-95; defaults from
    # scripts/distillation/S14_dist_1B_stage2.sh)
    p.add_argument("--mask_type", default="attention",
                   choices=["tube", "random", "attention"])
    p.add_argument("--mask_ratio", type=float, default=0.8)
    p.add_argument("--clip_return_layer", type=int, default=6)
    p.add_argument("--clip_teacher_return_interval", type=float,
                   default=1.0)
    p.add_argument("--clip_student_return_interval", type=float,
                   default=1.0)
    p.add_argument("--clip_teacher_embed_dim", type=int, default=0,
                   help="teacher middle-feature width (0 = the teacher "
                        "trunk's embed_dim)")
    p.add_argument("--clip_teacher_final_dim", type=int, default=768,
                   help="0 disables final-feature alignment")
    p.add_argument("--clip_loss_ratio", type=float, nargs=2,
                   default=[1.0, 1.0],
                   help="middle/final loss weights")
    p.add_argument("--clip_norm_type", default="l2",
                   choices=["l2", "none"])
    p.add_argument("--clip_student_decoder", default="mlp",
                   choices=["linear", "mlp"],
                   help="Linear_Decoder / MLP_Decoder")
    p.add_argument("--drop_path", type=float, default=0.05)
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
    teacher = st.create_model(args.teacher_model, **common)
    if args.objective == "masked_feature":
        if not args.model.startswith("distill_"):
            raise ValueError("masked_feature needs a distill_* student "
                             "(masked trunk + tap decoders)")
        student = st.create_model(
            args.model, **common,
            drop_path_rate=args.drop_path,
            clip_teacher_embed_dim=(args.clip_teacher_embed_dim
                                    or teacher.cfg.embed_dim),
            clip_teacher_final_dim=args.clip_teacher_final_dim,
            clip_return_layer=args.clip_return_layer,
            clip_student_return_interval=args.clip_student_return_interval,
            clip_norm_type=args.clip_norm_type,
            clip_student_decoder=args.clip_student_decoder)
        if student.cfg.grid_size != teacher.cfg.grid_size:
            raise ValueError(
                f"student grid {student.cfg.grid_size} != teacher grid "
                f"{teacher.cfg.grid_size} — middle-feature alignment "
                "needs matching token grids")
        if (args.clip_teacher_final_dim > 0
                and args.clip_teacher_final_dim != teacher.cfg.clip_embed_dim):
            raise ValueError(
                f"--clip_teacher_final_dim {args.clip_teacher_final_dim} "
                f"!= teacher clip_embed_dim {teacher.cfg.clip_embed_dim} "
                "(final alignment targets the teacher's pooled feature)")
    else:
        student = st.create_model(args.model, **common)
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
        if args.objective not in ("feature", "masked_feature"):
            raise ValueError("Kinetics sources are unlabeled - use "
                             "--objective feature/masked_feature")
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
        # attention masking is teacher-derived on-device; the loader still
        # generates (ignored) tube masks so batch shapes stay uniform
        loader = PretrainLoader(
            ds, args.batch_size * n_dev, window_size=window,
            mask_ratio=(args.mask_ratio
                        if args.objective == "masked_feature" else 0.75),
            mask_type=("tube" if args.mask_type == "attention"
                       else args.mask_type),
            seed=args.seed, num_threads=args.num_workers)
    else:
        if args.objective == "masked_feature":
            raise ValueError("masked_feature trains on unlabeled video "
                             "lists (K700/K710) — use a Kinetics source")
        loader = TrainLoader(ds, args.batch_size * n_dev, seed=args.seed,
                             num_threads=args.num_workers)
    steps = loader.steps_per_epoch()
    lr = args.lr * args.batch_size * n_dev / 256.0
    sched = O.cosine_scheduler(lr, 1e-6, args.epochs, steps,
                               warmup_epochs=args.warmup_epochs)

    aligner = None
    if args.objective == "masked_feature":
        # teacher tap indices (internvideo2_teacher.py:396-404), ascending
        t_depth = teacher.cfg.depth
        t_taps = tuple(sorted(
            t_depth - int(i * args.clip_teacher_return_interval) - 1
            for i in range(args.clip_return_layer)))
        n_patch = student.cfg.num_patches
        if args.mask_type == "attention":
            num_masked = int(n_patch * args.mask_ratio)
        else:
            num_masked = int(loader.num_masked)
        print(f"teacher taps {t_taps}, student taps "
              f"{student.cfg.return_index}, num_masked {num_masked}/"
              f"{n_patch}")
        tx = O.create_optimizer(s_params,
                                lr_schedule=O.array_schedule(sched),
                                weight_decay=args.weight_decay)
        step_fn = make_masked_distill_step(
            student, teacher, tx, num_masked=num_masked,
            teacher_taps=t_taps, loss_ratio=args.clip_loss_ratio,
            mask_type=args.mask_type)
        state = replicate(TrainState.create(
            s_params, tx, jax.random.PRNGKey(args.seed + 2)))
    elif args.objective == "feature":
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
            if args.objective == "masked_feature":
                dev_batch = {"video": video, "mask": put(batch["mask"])}
                state, (metrics, _) = step_fn(state, dev_batch, t_params)
                ml.update(loss=float(metrics["loss"]),
                          mid=float(metrics["loss_clip_middle"]),
                          final=float(metrics["loss_clip_final"]))
            elif args.objective == "feature":
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
