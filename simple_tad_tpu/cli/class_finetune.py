"""Action-recognition (Kinetics/SSV2) classification fine-tuning CLI.

Equivalent of /root/reference/run_class_finetuning.py +
engine_for_finetuning.py: Mixup/CutMix with soft-target CE, TSN-sampled
training clips, center-crop validation, multi-(segment x crop) test with
per-video softmax averaging.

Usage:
  python -m simple_tad_tpu.cli.class_finetune --data_path /data/k400 \
      --anno_train train.csv --anno_val val.csv --nb_classes 400 \
      --model vit_base_patch16_224 --epochs 30 --output_dir out/
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def get_args(argv=None):
    p = argparse.ArgumentParser("simple_tad_tpu class finetuning")
    p.add_argument("--model", default="vit_base_patch16_224")
    p.add_argument("--data_path", default="")
    p.add_argument("--anno_train", required=True)
    p.add_argument("--anno_val", default="")
    p.add_argument("--anno_test", default="")
    p.add_argument("--nb_classes", type=int, default=400)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--sampling_rate", type=int, default=4)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--short_side_size", type=int, default=256)
    p.add_argument("--sparse_sampling", action="store_true",
                   help="SSV2-style TSN segment sampling")
    p.add_argument("--data_set", default="Kinetics",
                   help="dataset family (run_linear_probing.py:188-193): "
                        "Kinetics/SSV2-style CSV (default), ANet/HACS "
                        "(interval reader), HMDB51 (video TSN), "
                        "HMDB51_rawframe (frame folders)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=0.75)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--opt", default="adamw",
                   help="optimizer menu (run_class_finetuning.py:56)")
    p.add_argument("--momentum", type=float, default=0.9,
                   help="sgd/rmsprop momentum (run_class_finetuning.py:64)")
    p.add_argument("--opt_eps", type=float, default=1e-8,
                   help="optimizer epsilon (run_class_finetuning.py:58)")
    p.add_argument("--opt_betas", type=float, nargs="+",
                   default=(0.9, 0.999),
                   help="optimizer betas (run_class_finetuning.py:60)")
    p.add_argument("--drop_path", type=float, default=0.1)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--mixup_switch_prob", type=float, default=0.5)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--test_num_segment", type=int, default=5)
    p.add_argument("--test_num_crop", type=int, default=3)
    p.add_argument("--finetune", default="")
    p.add_argument("--head_label_map", default="",
                   help="json list of 710-space indices remapping a "
                        "K710-pretrained head to nb_classes 600/700 "
                        "(k710/label_mixto{N}.json, run_finetuning.py:"
                        "388-400); 400 slices automatically")
    # probing (run_linear_probing.py:548-573): freeze the trunk except the
    # last open_block_num blocks; the attention-pooling projector stays
    # frozen unless --open_clip_projector.  --freeze takes a raw
    # train/optim.freeze_mask_tree spec for anything fancier.
    p.add_argument("--open_block_num", type=int, default=None)
    p.add_argument("--open_clip_projector", action="store_true")
    p.add_argument("--freeze", default="")
    p.add_argument("--output_dir", default="")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--attn_impl", default="auto")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import simple_tad_tpu as st
    from simple_tad_tpu.data.video_cls_datasets import (build_cls_dataset,
                                                        merge_test_views)
    from simple_tad_tpu.ops.augment import (IMAGENET_MEAN, IMAGENET_STD,
                                            mixup_cutmix, random_hflip,
                                            random_resized_crop,
                                            rand_augment_full,
                                            random_erasing)
    from simple_tad_tpu.train import losses as L
    from simple_tad_tpu.train import optim as O
    from simple_tad_tpu.train.steps import TrainState, make_finetune_train_step
    from simple_tad_tpu.utils import checkpoint as ckpt_utils
    from simple_tad_tpu.utils.logging import MetricLogger
    from simple_tad_tpu.utils.torch_convert import load_checkpoint_auto

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = st.create_model(args.model, num_classes=args.nb_classes,
                            all_frames=args.num_frames,
                            img_size=args.input_size,
                            drop_path_rate=args.drop_path, dtype=dtype,
                            attn_impl=args.attn_impl)
    params = model.init_params(jax.random.PRNGKey(args.seed))
    if args.finetune:
        label_map = None
        if args.head_label_map:
            import json
            with open(args.head_label_map) as f:
                label_map = json.load(f)
        params = load_checkpoint_auto(args.finetune, model, params,
                                      head_label_map=label_map)

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def train_augment_cls(video_u8, labels, key):
        """kinetics _aug_frame on device: RRC -> flip -> full RandAugment
        -> normalize -> erasing, then mixup/cutmix with soft targets."""
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        x = video_u8.astype(jnp.float32)
        x = random_resized_crop(x, k1, args.input_size)
        x = random_hflip(x, k2)
        x = rand_augment_full(x, k3)
        x = (x / 255.0 - mean) / std
        if args.reprob > 0:
            x = random_erasing(x, k4, probability=args.reprob)
        if args.mixup > 0 or args.cutmix > 0:
            x, targets = mixup_cutmix(
                x, labels, k5, num_classes=args.nb_classes,
                mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
                switch_prob=args.mixup_switch_prob,
                label_smoothing=args.smoothing)
        else:
            targets = jax.nn.one_hot(labels, args.nb_classes)
        return x.astype(dtype), targets

    @jax.jit
    def eval_logits(params, video_u8):
        x = (video_u8.astype(jnp.float32) / 255.0 - mean) / std
        return model.apply({"params": params}, x.astype(dtype),
                           deterministic=True).astype(jnp.float32)

    # soft-target CE (SoftTargetCrossEntropy, run_class_finetuning.py:467)
    criterion = lambda lg, lb, sm, ttc: L.cross_entropy(lg, sm)  # noqa: E731

    if args.eval:
        test_ds = build_cls_dataset(
            args.data_set,
            args.anno_test or args.anno_val, args.data_path, mode="test",
            clip_len=args.num_frames, frame_sample_rate=args.sampling_rate,
            crop_size=args.input_size, short_side_size=args.short_side_size,
            test_num_segment=args.test_num_segment,
            test_num_crop=args.test_num_crop,
            sparse_sampling=args.sparse_sampling)
        logits_all, vids, labels = [], [], []
        B = args.batch_size
        buf = []
        for vi in range(len(test_ds)):
            clip, y, vid, ck, cp = test_ds.get_test_view(vi)
            buf.append((clip, y, vid))
            if len(buf) == B or vi == len(test_ds) - 1:
                batch = np.stack([b[0] for b in buf])
                lg = np.asarray(eval_logits(params, jnp.asarray(batch)))
                for j, (_, y_j, vid_j) in enumerate(buf):
                    logits_all.append(lg[j])
                    labels.append(y_j)
                    vids.append(vid_j)
                buf = []
        top1, top5 = merge_test_views(logits_all, vids, labels)
        print(f"test top1 {top1:.2f} top5 {top5:.2f} "
              f"({len(set(vids))} videos, {len(vids)} views)")
        return top1, top5

    train_ds = build_cls_dataset(
        args.data_set,
        args.anno_train, args.data_path, mode="train",
        clip_len=args.num_frames, frame_sample_rate=args.sampling_rate,
        crop_size=args.input_size, short_side_size=args.short_side_size,
        sparse_sampling=args.sparse_sampling)
    # batch_size is per-device; train batches are global and sharded over
    # a 1-D data mesh like cli.finetune
    from simple_tad_tpu.parallel.mesh import data_parallel_setup
    n_dev, put, replicate = data_parallel_setup()
    global_batch = args.batch_size * n_dev
    steps = max(len(train_ds) // global_batch, 1)
    lr = args.lr * global_batch / 256.0
    lr_sched = O.cosine_scheduler(lr, args.min_lr, args.epochs, steps,
                                  warmup_epochs=args.warmup_epochs)
    freeze = args.freeze
    if args.open_block_num is not None:
        freeze = (f"probe;{args.open_block_num};"
                  f"{int(args.open_clip_projector)}")
    tx = O.create_optimizer(params, lr_schedule=O.array_schedule(lr_sched),
                            weight_decay=args.weight_decay,
                            layer_decay=args.layer_decay,
                            depth=model.cfg.depth, clip_grad=args.clip_grad,
                            freeze_layers=freeze or None, opt=args.opt,
                            momentum=args.momentum, eps=args.opt_eps,
                            betas=tuple(args.opt_betas))
    step_fn = make_finetune_train_step(model, tx, criterion)
    state = replicate(
        TrainState.create(params, tx, jax.random.PRNGKey(args.seed + 1)))
    rng = np.random.default_rng(args.seed)
    aug_key = jax.random.PRNGKey(args.seed + 2)

    for epoch in range(args.epochs):
        ml = MetricLogger(print_freq=10)
        order = rng.permutation(len(train_ds))[: steps * global_batch]
        if len(order) < steps * global_batch:
            # tiny dataset: wrap indices so every batch is full (sharding
            # needs the global batch divisible by the device count)
            order = np.resize(order, steps * global_batch)
        t0 = time.time()
        for s in ml.log_every(range(steps), header=f"Epoch [{epoch}]"):
            idxs = order[s * global_batch:(s + 1) * global_batch]
            clips, ys = zip(*(train_ds.get_train_clip(int(i), rng)
                              for i in idxs))
            h = min(c.shape[1] for c in clips)
            w = min(c.shape[2] for c in clips)
            clips = np.stack([c[:, :h, :w] for c in clips])
            aug_key, k = jax.random.split(aug_key)
            video, targets = train_augment_cls(
                put(clips), put(np.asarray(ys)), k)
            batch = {"video": video,
                     "label": put(np.asarray(ys)),
                     "smoothed": targets,
                     "ttc": put(np.zeros(len(ys), np.float32))}
            state, (metrics, _) = step_fn(state, batch)
            ml.update(loss=float(metrics["loss"]))
        print(f"[epoch {epoch}] loss {ml.epoch_stats().get('loss', 0):.4f} "
              f"({time.time() - t0:.0f}s)")
        if args.output_dir:
            os.makedirs(args.output_dir, exist_ok=True)
            ckpt_utils.save_train_state(args.output_dir, state, epoch)
    return state


if __name__ == "__main__":
    main()
