"""MAE / DAPT pre-training driver CLI.

Equivalent of /root/reference/run_mae_pretraining.py (single dataset) and
run_mae_double_pretraining.py (dual-dataset DAPT: e.g. BDD100K + CAP-DATA,
batches concatenated per step, hard stop at --stop_at_epoch).  Supports
warm start from a VideoMAE .pth (from_ckpt, run_mae_double_pretraining.py:
289-354) and the triple loop (--data_set3; train_one_epoch_triple,
engine_for_pretraining.py:310-355 — unused by any reference job).

Usage (single):
  python -m simple_tad_tpu.cli.pretrain --data_set DoTA \
      --data_path /data/dota --model pretrain_videomae_small_patch16_224 \
      --mask_ratio 0.9 --epochs 100 --output_dir out/
Usage (double DAPT):
  ... --data_set BDD100K --data_path /data/bdd \
      --data_set2 DoTA --data_path2 /data/cap --batch_size2 160 \
      --transforms_finetune_align --stop_at_epoch 12
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from simple_tad_tpu.config import PretrainConfig


def _build_source(data_set: str, data_path: str, cfg,
                  view_list: str = "", clips_list: str = ""):
    from simple_tad_tpu.data.frame_datasets import (read_dada_clips,
                                                    read_dota_clips)
    from simple_tad_tpu.data.pretrain_datasets import (
        PretrainWindowDataset, VideoFileSource, ZipClipSource)
    if data_set == "DoTA":
        clips = read_dota_clips(data_path, "all_split.txt", orig_fps=10)
        source, orig_fps = ZipClipSource(clips), 10
    elif data_set in ("DADA2K", "DADA"):
        clips = read_dada_clips(data_path, "DADA2K_my_split/all.txt",
                                orig_fps=30)
        source, orig_fps = ZipClipSource(clips), 30
    elif data_set == "BDD100K":
        from simple_tad_tpu.data.pretrain_datasets import read_bdd_clips
        names = read_bdd_clips(data_path, clips_list=clips_list or None)
        paths = [os.path.join(data_path, "videos", n) for n in names]
        source, orig_fps = VideoFileSource(paths), 30
        # BDD100K enumerates views with RegularSequencerWithStart
        # (bdd100k.py:32,38-49); see PretrainWindowDataset docstring
        return PretrainWindowDataset(
            source, view_len=cfg.num_frames, target_fps=cfg.view_fps,
            orig_fps=orig_fps, view_step=cfg.sampling_rate,
            view_list=view_list or None, with_start=True)
    elif data_set in ("K700", "Kinetics-700", "Kinetics-400",
                      "K700_aligned"):
        # Kinetics MAE source (kinetics.py VideoMAE:463 / _aligned:850,
        # wired by jobs/dapt/pretrain_k700.sh): one window per video per
        # epoch, TSN sampling or fps-aligned interpolation
        from simple_tad_tpu.data.pretrain_datasets import (
            KineticsPretrainDataset, read_kinetics_clips)
        paths = read_kinetics_clips(data_path, "annotations/train.csv")
        source = VideoFileSource(paths, half_first=False)
        return KineticsPretrainDataset(
            source, view_len=cfg.num_frames,
            sampling_rate=cfg.sampling_rate,
            mode="aligned" if data_set == "K700_aligned" else "tsn",
            target_fps=cfg.view_fps, seed=cfg.seed)
    else:
        raise ValueError(data_set)
    return PretrainWindowDataset(
        source, view_len=cfg.num_frames, target_fps=cfg.view_fps,
        orig_fps=orig_fps, view_step=cfg.sampling_rate,
        view_list=view_list or None)


def main(argv=None):
    cfg = PretrainConfig.from_args(argv)
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import simple_tad_tpu as st
    from simple_tad_tpu.data.pretrain_datasets import PretrainLoader
    from simple_tad_tpu.ops.augment import (pretrain_augment_align,
                                            pretrain_augment_orig)
    from simple_tad_tpu.train import optim as O
    from simple_tad_tpu.train.steps import TrainState, make_mae_train_step
    from simple_tad_tpu.utils import checkpoint as ckpt_utils
    from simple_tad_tpu.utils.logging import JsonlLogger, MetricLogger

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = st.create_model(cfg.model, all_frames=cfg.num_frames,
                            img_size=cfg.input_size,
                            tubelet_size=cfg.tubelet_size,
                            decoder_depth=cfg.decoder_depth,
                            drop_path_rate=cfg.drop_path,
                            dtype=dtype, attn_impl=cfg.attn_impl,
                            remat=cfg.use_checkpoint)
    patch = model.cfg.patch_size     # 16 (VideoMAE/MVD) or 14 (IV2 DAPT)
    window_size = (cfg.num_frames // cfg.tubelet_size,
                   cfg.input_size // patch, cfg.input_size // patch)

    # cfg.batch_size is per-device (the reference's per-GPU batch);
    # loader batches are global and sharded over a 1-D data mesh
    from simple_tad_tpu.parallel.mesh import data_parallel_setup
    n_dev, put, replicate = data_parallel_setup()

    ds1 = _build_source(cfg.data_set, cfg.data_path, cfg, cfg.view_list,
                        cfg.clips_list)
    loader1 = PretrainLoader(ds1, cfg.batch_size * n_dev,
                             window_size=window_size,
                             mask_ratio=cfg.mask_ratio,
                             mask_type=cfg.mask_type, seed=cfg.seed,
                             nb_samples_per_epoch=cfg.nb_samples_per_epoch,
                             num_threads=cfg.num_workers)
    loader2 = loader3 = None
    if cfg.data_set2:
        ds2 = _build_source(cfg.data_set2, cfg.data_path2, cfg,
                            cfg.view_list2, cfg.clips_list2)
        loader2 = PretrainLoader(
            ds2, (cfg.batch_size2 or cfg.batch_size) * n_dev,
            window_size=window_size, mask_ratio=cfg.mask_ratio,
            mask_type=cfg.mask_type,
            seed=cfg.seed + 1,
            nb_samples_per_epoch=cfg.nb_samples_per_epoch,
            num_threads=cfg.num_workers)
    if cfg.data_set3:
        # triple loop (train_one_epoch_triple): third concurrent source
        assert cfg.data_set2, "--data_set3 requires --data_set2"
        ds3 = _build_source(cfg.data_set3, cfg.data_path3, cfg,
                            cfg.view_list3, cfg.clips_list3)
        loader3 = PretrainLoader(
            ds3, (cfg.batch_size3 or cfg.batch_size) * n_dev,
            window_size=window_size, mask_ratio=cfg.mask_ratio,
            mask_type=cfg.mask_type,
            seed=cfg.seed + 7,
            nb_samples_per_epoch=cfg.nb_samples_per_epoch,
            num_threads=cfg.num_workers)
    num_masked = loader1.num_masked

    # init params with a dummy shaped batch
    dummy = jnp.zeros((1, cfg.num_frames, cfg.input_size, cfg.input_size, 3),
                      dtype)
    dummy_mask = np.zeros((1, model.cfg.num_patches), bool)
    dummy_mask[:, :num_masked] = True
    params = model.init(jax.random.PRNGKey(cfg.seed), dummy,
                        jnp.asarray(dummy_mask), num_masked)["params"]
    if cfg.from_ckpt:
        from simple_tad_tpu.utils.torch_convert import (
            load_torch_state_dict, merge_params, torch_to_iv2_mae_params,
            torch_to_mae_params)
        sd = load_torch_state_dict(cfg.from_ckpt)
        if hasattr(model.cfg, "qk_normalization"):   # IV2 DAPT trunk
            loaded = torch_to_iv2_mae_params(
                sd, encoder_depth=model.cfg.encoder_depth,
                decoder_depth=model.cfg.decoder_depth,
                encoder_dim=model.cfg.encoder_embed_dim)
        else:
            loaded = torch_to_mae_params(
                sd, encoder_depth=model.cfg.encoder_depth,
                decoder_depth=model.cfg.decoder_depth)
        params = merge_params(params, loaded)
        print(f"warm-started from {cfg.from_ckpt}")

    steps_per_epoch = loader1.steps_per_epoch()
    total_batch = ((cfg.batch_size + (cfg.batch_size2 or 0)
                    + (cfg.batch_size3 or 0)) * cfg.update_freq * n_dev)
    lr = cfg.lr * total_batch / 256.0
    # schedules are indexed per OPTIMIZER update (see finetune.py): under
    # MultiSteps the inner chain only advances every update_freq batches
    opt_steps_per_epoch = max(steps_per_epoch // cfg.update_freq, 1)
    lr_sched = O.cosine_scheduler(lr, cfg.min_lr, cfg.epochs,
                                  opt_steps_per_epoch,
                                  warmup_epochs=cfg.warmup_epochs,
                                  start_warmup_value=cfg.warmup_lr,
                                  warmup_steps=cfg.warmup_steps)
    wd_end = (cfg.weight_decay if cfg.weight_decay_end is None
              else cfg.weight_decay_end)
    wd_sched = O.cosine_scheduler(cfg.weight_decay, wd_end, cfg.epochs,
                                  opt_steps_per_epoch)
    tx = O.create_optimizer(params, lr_schedule=O.array_schedule(lr_sched),
                            wd_schedule=O.array_schedule(wd_sched),
                            weight_decay=cfg.weight_decay,
                            betas=tuple(cfg.opt_betas), eps=cfg.opt_eps,
                            clip_grad=cfg.clip_grad, opt=cfg.opt)
    if cfg.update_freq > 1:
        import optax
        tx = optax.MultiSteps(tx, cfg.update_freq)
    step = make_mae_train_step(model, tx, num_masked=num_masked,
                               normalize_target=cfg.normlize_target)
    state = replicate(
        TrainState.create(params, tx, jax.random.PRNGKey(cfg.seed + 2)))

    start_epoch = cfg.start_epoch
    if cfg.output_dir:
        os.makedirs(cfg.output_dir, exist_ok=True)
        cfg.save(os.path.join(cfg.output_dir, "params.json"))
        if cfg.auto_resume and not cfg.resume:
            state, start_epoch = ckpt_utils.load_train_state(cfg.output_dir,
                                                             state)

    augment = (pretrain_augment_align if cfg.transforms_finetune_align
               else pretrain_augment_orig)
    jsonl = JsonlLogger(cfg.output_dir or None)
    aug_key = jax.random.PRNGKey(cfg.seed + 3)

    stop_epoch = cfg.epochs if cfg.stop_at_epoch < 0 else min(
        cfg.epochs, cfg.stop_at_epoch)
    for epoch in range(start_epoch, stop_epoch):
        ml = MetricLogger(print_freq=10)
        t0 = time.time()

        def batches():
            if loader2 is None:
                for b in loader1.epoch(epoch):
                    yield (b,)
            elif loader3 is not None:
                # triple loop: loader1 drives, the others cycle
                from simple_tad_tpu.data.pretrain_datasets import CyclicZipN
                czn = CyclicZipN(loader1.epoch, loader2.epoch, loader3.epoch)
                yield from czn.epoch(epoch)
            else:
                from simple_tad_tpu.data.pretrain_datasets import CyclicZip
                cz = CyclicZip(loader1.epoch if len(loader1.dataset)
                               >= len(loader2.dataset) else loader2.epoch,
                               loader2.epoch if len(loader1.dataset)
                               >= len(loader2.dataset) else loader1.epoch)
                for b1, b2 in cz.epoch(epoch):
                    yield (b1, b2)

        nonlocal_key = jax.random.fold_in(aug_key, epoch)
        for parts in ml.log_every(batches(), header=f"Epoch [{epoch}]"):
            # concatenate the dual-dataset halves on the HOST, then one
            # device augment over the combined batch: fewer distinct XLA
            # programs (the per-part augment + device-concat pair
            # intermittently segfaulted XLA:CPU compile deep into the
            # test suite), and augment draws per-sample params anyway
            if len(parts) > 1:
                video_u8 = np.concatenate([p["video_u8"] for p in parts])
                mask = np.concatenate([p["mask"] for p in parts])
            else:
                video_u8, mask = parts[0]["video_u8"], parts[0]["mask"]
            nonlocal_key, k = jax.random.split(nonlocal_key)
            batch = {"video": augment(put(video_u8), k,
                                      crop_size=cfg.input_size,
                                      dtype=dtype),
                     "mask": put(mask)}
            state, metrics = step(state, batch)
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                raise FloatingPointError(f"loss is {loss}")
            ml.update(loss=loss, grad_norm=float(metrics["grad_norm"]))
        stats = ml.epoch_stats()
        print(f"[epoch {epoch}] mae loss {stats.get('loss', 0):.4f} "
              f"({time.time() - t0:.0f}s)")
        jsonl.write({"epoch": epoch, **stats})
        if cfg.output_dir:
            ckpt_utils.save_train_state(cfg.output_dir, state, epoch)
            if (epoch + 1) % cfg.save_ckpt_freq == 0:
                ckpt_utils.save_weights(cfg.output_dir, state.params,
                                        f"checkpoint-{epoch}")
    return state


if __name__ == "__main__":
    main()
