"""Knowledge-distillation driver: teacher -> student on frame windows.

Equivalent of the reference's IV2 distillation workflow
(/root/reference/other_models/InternVideo2_single_modality/run_distill.py):
a frozen teacher's soft logits supervise a (smaller) student alongside the
hard-label loss:  loss = alpha * T^2 * KL(teacher_T || student_T)
                        + (1 - alpha) * CE(labels).

Usage:
  python -m simple_tad_tpu.cli.distill \
      --data_set DoTA --data_path <root> \
      --teacher_model vit_large_patch16_224 --teacher_ckpt big.pth \
      --model vit_small_patch16_224 --epochs 10 --output_dir out/
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

    if args.data_set == "DoTA":
        clips = read_dota_clips(args.data_path, "train_split.txt",
                                orig_fps=10)
        orig_fps = 10
    else:
        clips = read_dada_clips(args.data_path,
                                "DADA2K_my_split/training.txt", orig_fps=30)
        orig_fps = 30
    ds = FrameDataset(clips, mode="train", view_len=args.num_frames,
                      target_fps=args.view_fps, orig_fps=orig_fps,
                      view_step=args.sampling_rate,
                      crop_size=args.input_size)
    # batch_size is per-device; loader batches are global and sharded
    # over a 1-D data mesh like cli.finetune
    from simple_tad_tpu.parallel.mesh import data_parallel_setup
    n_dev, put, replicate = data_parallel_setup()
    t_params = replicate(t_params)
    loader = TrainLoader(ds, args.batch_size * n_dev, seed=args.seed,
                         num_threads=args.num_workers)
    steps = loader.steps_per_epoch()
    lr = args.lr * args.batch_size * n_dev / 256.0
    sched = O.cosine_scheduler(lr, 1e-6, args.epochs, steps,
                               warmup_epochs=args.warmup_epochs)
    tx = O.create_optimizer(s_params, lr_schedule=O.array_schedule(sched),
                            weight_decay=args.weight_decay)
    step_fn = make_distill_step(student, teacher, tx, alpha=args.alpha,
                                temperature=args.temperature)
    state = replicate(TrainState.create(s_params, tx,
                                        jax.random.PRNGKey(args.seed + 2)))
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
            dev_batch = {"video": video,
                         "label": put(batch["label"])}
            state, (metrics, _) = step_fn(state, dev_batch, t_params)
            ml.update(loss=float(metrics["loss"]), kd=float(metrics["kd"]),
                      ce=float(metrics["ce"]))
        print(f"[epoch {epoch}] {ml} ({time.time() - t0:.0f}s)")
        if args.output_dir:
            os.makedirs(args.output_dir, exist_ok=True)
            ckpt_utils.save_train_state(args.output_dir, state, epoch)
    return state


if __name__ == "__main__":
    main()
