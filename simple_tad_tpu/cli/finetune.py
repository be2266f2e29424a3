"""Frame fine-tuning driver CLI.

Equivalent of /root/reference/run_frame_finetuning.py: dataset build,
model build + checkpoint init, layer-decay AdamW with per-step cosine
lr/wd, epoch loop with validation, best-metric checkpoints and auto-resume.

Usage:
  python -m simple_tad_tpu.cli.finetune --data_set DoTA \
      --data_path /data/dota --model vit_base_patch16_224 \
      --finetune k400_init.pth --output_dir out/ --epochs 20
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from simple_tad_tpu.config import FinetuneConfig


def build_datasets(cfg: FinetuneConfig):
    from simple_tad_tpu.data.frame_datasets import (
        FrameDataset, read_dada_clips, read_dota_clips)
    if cfg.data_set == "DoTA":
        orig_fps = 10
        train_clips = read_dota_clips(cfg.data_path, "train_split.txt",
                                      orig_fps=orig_fps, ttc_TT=cfg.ttc_TT,
                                      ttc_TA=cfg.ttc_TA)
        val_clips = read_dota_clips(cfg.data_path, "val_split.txt",
                                    orig_fps=orig_fps, ttc_TT=cfg.ttc_TT,
                                    ttc_TA=cfg.ttc_TA)
    elif cfg.data_set in ("DADA2K", "DADA"):
        orig_fps = 30
        train_clips = read_dada_clips(
            cfg.data_path, "DADA2K_my_split/training.txt",
            orig_fps=orig_fps, ttc_TT=cfg.ttc_TT, ttc_TA=cfg.ttc_TA)
        val_clips = read_dada_clips(
            cfg.data_path, "DADA2K_my_split/validation.txt",
            orig_fps=orig_fps, ttc_TT=cfg.ttc_TT, ttc_TA=cfg.ttc_TA)
    else:
        raise ValueError(cfg.data_set)
    train_ds = FrameDataset(train_clips, mode="train",
                            view_len=cfg.num_frames,
                            target_fps=cfg.view_fps, orig_fps=orig_fps,
                            view_step=cfg.sampling_rate,
                            crop_size=cfg.input_size)
    # validation stride 1 (datasets_frame.py:219)
    val_ds = FrameDataset(val_clips, mode="validation",
                          view_len=cfg.num_frames, target_fps=cfg.view_fps,
                          orig_fps=orig_fps, view_step=1,
                          crop_size=cfg.input_size)
    return train_ds, val_ds


def main(argv=None):
    cfg = FinetuneConfig.from_args(argv)
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import simple_tad_tpu as st
    from simple_tad_tpu.eval.engine import FrameEvaluator
    from simple_tad_tpu.train import losses as L
    from simple_tad_tpu.train import optim as O
    from simple_tad_tpu.train.engine import (FinetuneTrainer, TrainLoader,
                                             validate)
    from simple_tad_tpu.train.steps import TrainState, make_finetune_train_step
    from simple_tad_tpu.utils import checkpoint as ckpt_utils
    from simple_tad_tpu.utils.logging import (JsonlLogger, TensorboardLogger)
    from simple_tad_tpu.utils.torch_convert import load_checkpoint_auto

    np.random.seed(cfg.seed)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = st.create_model(
        cfg.model, num_classes=cfg.nb_classes, all_frames=cfg.num_frames,
        img_size=cfg.input_size, tubelet_size=cfg.tubelet_size, fc_drop_rate=cfg.fc_drop_rate,
        drop_rate=cfg.drop, drop_path_rate=cfg.drop_path,
        attn_drop_rate=cfg.attn_drop_rate,
        final_reduction=cfg.final_reduction, init_scale=cfg.init_scale,
        dtype=dtype, attn_impl=cfg.attn_impl, remat=cfg.use_checkpoint)
    params = model.init_params(jax.random.PRNGKey(cfg.seed))
    if cfg.finetune:
        params = load_checkpoint_auto(cfg.finetune, model, params)
        print(f"initialized from {cfg.finetune}")

    train_ds, val_ds = build_datasets(cfg)
    # data parallelism: cfg.batch_size is per-device (like the reference's
    # per-GPU batch); loader batches are global and get sharded over a
    # 1-D mesh in the trainer
    n_dev = jax.device_count()
    mesh = None
    if n_dev > 1:
        from simple_tad_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    loader = TrainLoader(train_ds, cfg.batch_size * n_dev, seed=cfg.seed,
                         nb_samples_per_epoch=cfg.nb_samples_per_epoch,
                         num_threads=cfg.num_workers,
                         num_sample=cfg.num_sample)
    steps_per_epoch = loader.steps_per_epoch()
    print(f"train windows: {len(train_ds)}  steps/epoch: {steps_per_epoch} "
          f"devices: {n_dev}")

    total_batch = cfg.batch_size * cfg.update_freq * n_dev
    lr = O.scale_lr_by_batch(cfg.lr, total_batch)
    min_lr = O.scale_lr_by_batch(cfg.min_lr, total_batch)
    warmup_lr = O.scale_lr_by_batch(cfg.warmup_lr, total_batch)
    # schedules advance once per OPTIMIZER update: under MultiSteps the
    # inner chain (and thus array_schedule's count) steps every
    # update_freq mini-batches, so size the arrays in optimizer steps
    # (matches run_frame_finetuning.py's num_training_steps_per_epoch
    # = dataset // total_batch)
    opt_steps_per_epoch = max(steps_per_epoch // cfg.update_freq, 1)
    lr_sched = O.cosine_scheduler(lr, min_lr, cfg.epochs,
                                  opt_steps_per_epoch,
                                  warmup_epochs=cfg.warmup_epochs,
                                  start_warmup_value=warmup_lr,
                                  warmup_steps=cfg.warmup_steps)
    wd_end = (cfg.weight_decay if cfg.weight_decay_end is None
              else cfg.weight_decay_end)
    wd_sched = O.cosine_scheduler(cfg.weight_decay, wd_end, cfg.epochs,
                                  opt_steps_per_epoch)
    tx = O.create_optimizer(
        params, lr_schedule=O.array_schedule(lr_sched),
        wd_schedule=O.array_schedule(wd_sched),
        weight_decay=cfg.weight_decay, layer_decay=cfg.layer_decay,
        depth=model.cfg.depth, betas=tuple(cfg.opt_betas), eps=cfg.opt_eps,
        clip_grad=cfg.clip_grad, freeze_layers=cfg.freeze_layers,
        opt=cfg.opt)
    import optax
    if cfg.update_freq > 1:
        tx = optax.MultiSteps(tx, cfg.update_freq)

    criterion = L.create_criterion(cfg.loss, cfg.smoothing)
    step = make_finetune_train_step(
        model, tx, criterion,
        ema_decay=cfg.model_ema_decay if cfg.model_ema else None)
    state = TrainState.create(
        params, tx, jax.random.PRNGKey(cfg.seed + 1),
        ema_decay=cfg.model_ema_decay if cfg.model_ema else None)

    start_epoch = cfg.start_epoch
    if cfg.output_dir:
        os.makedirs(cfg.output_dir, exist_ok=True)
        cfg.save(os.path.join(cfg.output_dir, "params.json"))
        if cfg.auto_resume and not cfg.resume:
            state, start_epoch = ckpt_utils.load_train_state(cfg.output_dir,
                                                             state)
            if start_epoch:
                print(f"auto-resumed at epoch {start_epoch}")

    log_writer = TensorboardLogger(cfg.log_dir)
    jsonl = JsonlLogger(cfg.output_dir or None)
    tracker = (ckpt_utils.BestTracker(cfg.output_dir)
               if cfg.output_dir else None)
    trainer = FinetuneTrainer(model, step, state, crop_size=cfg.input_size,
                              reprob=cfg.reprob, dtype=dtype,
                              log_writer=log_writer, seed=cfg.seed,
                              mesh=mesh, zero_stage=cfg.zero_stage)
    evaluator = None

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        train_stats = trainer.train_one_epoch(loader, epoch)
        # validation with current params (rebuilt evaluator -> folded copy);
        # with --model_ema the EMA weights are what gets validated and
        # best-tracked (run_frame_finetuning.py:487-494 carries a ModelEma —
        # here it is actually consumed, not just checkpointed)
        eval_params = (trainer.state.ema_params
                       if cfg.model_ema and trainer.state.ema_params
                       is not None else trainer.state.params)
        evaluator = FrameEvaluator(model, eval_params,
                                   batch_size=cfg.batch_size * 2,
                                   dtype=dtype)
        val_stats = validate(evaluator, val_ds)
        print(f"[epoch {epoch}] train loss {train_stats.get('loss', 0):.4f} "
              f"val auroc {val_stats['auroc']:.4f} ap {val_stats['ap']:.4f} "
              f"mccauc {val_stats['mccauc']:.4f} "
              f"({time.time() - t0:.0f}s)")
        jsonl.write({"epoch": epoch,
                     **{f"train_{k}": v for k, v in train_stats.items()},
                     **{f"val_{k}": v for k, v in val_stats.items()}})
        if cfg.output_dir and cfg.save_ckpt:
            ckpt_utils.save_train_state(cfg.output_dir, trainer.state, epoch)
            if tracker:
                tracker.update(eval_params, val_stats)
            if (epoch + 1) % cfg.save_ckpt_freq == 0:
                ckpt_utils.save_weights(cfg.output_dir, trainer.state.params,
                                        f"checkpoint-{epoch}")
    return trainer.state


if __name__ == "__main__":
    main()
