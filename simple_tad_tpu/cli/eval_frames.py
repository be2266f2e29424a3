"""Sliding-window frame-level evaluation CLI.

Equivalent of ``run_frame_finetuning.py --eval``
(/root/reference/run_frame_finetuning.py:597-614): builds the test-mode
dataset (stride 1 — every frame gets a window, datasets_frame.py:216-219),
scores every window, writes predictions.csv + stats.txt.

Usage:
  python -m simple_tad_tpu.cli.eval_frames \
      --data_set DoTA --data_path /data/dota \
      --model vit_base_patch16_224 --finetune ckpt.pth \
      --output_dir out/
"""

from __future__ import annotations

import os
import sys

import numpy as np

import jax.numpy as jnp

from simple_tad_tpu.config import FinetuneConfig


def main(argv=None):
    cfg = FinetuneConfig.from_args(argv)
    if cfg.dist_eval:
        # must run BEFORE the first backend touch (enable_persistent_cache
        # calls jax.default_backend()) — jax.distributed.initialize rejects
        # an already-initialized backend
        from simple_tad_tpu.parallel import multihost as _mh
        _mh.initialize()
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import simple_tad_tpu as st
    from simple_tad_tpu.data.frame_datasets import (
        FrameDataset, read_dada_clips, read_dota_clips)
    from simple_tad_tpu.eval.engine import FrameEvaluator
    from simple_tad_tpu.parallel import multihost
    from simple_tad_tpu.utils.torch_convert import load_checkpoint_auto

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = st.create_model(
        cfg.model, num_classes=cfg.nb_classes, all_frames=cfg.num_frames,
        img_size=cfg.input_size, tubelet_size=cfg.tubelet_size, fc_drop_rate=cfg.fc_drop_rate,
        drop_rate=cfg.drop, drop_path_rate=cfg.drop_path,
        attn_drop_rate=cfg.attn_drop_rate,
        final_reduction=cfg.final_reduction, init_scale=cfg.init_scale,
        dtype=dtype, attn_impl=cfg.attn_impl)
    params = model.init_params(jax.random.PRNGKey(cfg.seed))
    if cfg.finetune:
        if cfg.finetune.endswith(".pth"):
            params = load_checkpoint_auto(cfg.finetune, model, params)
        else:
            from simple_tad_tpu.utils.checkpoint import load_weights
            params = load_weights(cfg.finetune, params)
        print(f"loaded checkpoint {cfg.finetune}")

    if cfg.data_set == "DoTA":
        clips = read_dota_clips(cfg.data_path, "val_split.txt",
                                orig_fps=10, ttc_TT=cfg.ttc_TT,
                                ttc_TA=cfg.ttc_TA)
        orig_fps = 10
    elif cfg.data_set in ("DADA2K", "DADA"):
        # test split = validation.txt (datasets_frame.py:253-258)
        clips = read_dada_clips(cfg.data_path,
                                "DADA2K_my_split/validation.txt",
                                orig_fps=30, ttc_TT=cfg.ttc_TT,
                                ttc_TA=cfg.ttc_TA)
        orig_fps = 30
    else:
        raise ValueError(f"unknown data_set {cfg.data_set}")

    ds = FrameDataset(clips, mode="test", view_len=cfg.num_frames,
                      target_fps=cfg.view_fps, orig_fps=orig_fps,
                      view_step=1, crop_size=cfg.input_size)
    print(f"eval windows: {len(ds)} over {len(clips)} clips")

    # --dist_eval (reference run_frame_finetuning.py:303-314): clips
    # round-robin over the local devices; across hosts each process scores
    # its views[rank::world] slice and rank 0 merges the CSV shards.
    devices = None
    views = None
    if cfg.dist_eval:
        local = jax.local_devices()
        if len(local) > 1:
            devices = local
        if jax.process_count() > 1:
            views = ds.clip_eval_views()[jax.process_index()::
                                         jax.process_count()]

    ev = FrameEvaluator(model, params, batch_size=cfg.batch_size,
                        frame_bucket=cfg.frame_bucket, dtype=dtype,
                        quant8=cfg.quant8, quant8_mode=cfg.quant8_mode,
                        resize_on_host=cfg.resize_on_host, devices=devices)
    res = ev.evaluate(ds, views=views, exact_metrics=cfg.exact_metrics)

    nproc = jax.process_count()
    if nproc > 1 and cfg.output_dir:
        # per-host shard -> merge on rank 0 -> global metrics everywhere
        os.makedirs(cfg.output_dir, exist_ok=True)
        rank = jax.process_index()
        res.rows.to_csv(os.path.join(cfg.output_dir,
                                     f"predictions.{rank}.csv"), index=False)
        from simple_tad_tpu.eval.metrics import binary_metrics
        # ragged gather: the views[rank::world] shards need not be equal
        # (the reference pads its all_gather the same way, utils.py:759)
        gathered = multihost.allgather_ragged_1d({
            "probs": _softmax_risk(res.rows),
            "label": res.rows["label"].to_numpy()})
        probs = np.asarray(gathered["probs"])
        labels = np.asarray(gathered["label"])
        res.metrics = binary_metrics(probs, labels,
                                     exact=cfg.exact_metrics)
        merged = multihost.merge_csv_shards(cfg.output_dir, "predictions",
                                            nproc)
        if merged and multihost.is_main_process():
            import pandas as pd
            res.rows = pd.read_csv(merged)
    print(f"AUROC {res.metrics.auroc:.4f}  AP {res.metrics.ap:.4f}  "
          f"AUC-MCC {res.metrics.mcc_auc:.4f}  MCC@0.5 {res.metrics.mcc_05:.4f}  "
          f"({res.windows_per_sec:.1f} windows/s)")
    if cfg.output_dir and multihost.is_main_process():
        os.makedirs(cfg.output_dir, exist_ok=True)
        res.save(os.path.join(cfg.output_dir, "predictions.csv"),
                 os.path.join(cfg.output_dir, "stats.txt"),
                 plots_dir=cfg.output_dir)
        cfg.save(os.path.join(cfg.output_dir, "params.json"))
        print(f"wrote {cfg.output_dir}/predictions.csv")
    return res


def _softmax_risk(rows):
    logits = rows[["logits_safe", "logits_risk"]].to_numpy()
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return (e / e.sum(axis=1, keepdims=True))[:, 1]


if __name__ == "__main__":
    main()
