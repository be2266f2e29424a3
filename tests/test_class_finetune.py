"""Action-recognition datasets, mixup, multi-view merge, CLI smoke."""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    """4 tiny AVI videos of 2 classes with a class-correlated brightness."""
    root = tmp_path_factory.mktemp("k400")
    rows = []
    for i in range(4):
        label = i % 2
        path = root / f"vid{i}.avi"
        wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                             10, (64, 48))
        for t in range(40):
            val = 60 + label * 120 + (t % 7)
            wr.write(np.full((48, 64, 3), val, np.uint8))
        wr.release()
        rows.append(f"{path},{label}")
    anno = root / "anno.csv"
    anno.write_text("\n".join(rows) + "\n")
    return str(root), str(anno)


def test_train_and_val_clips(video_root):
    from simple_tad_tpu.data.video_cls_datasets import VideoClsDataset
    root, anno = video_root
    ds = VideoClsDataset(anno, root, mode="train", clip_len=8,
                         frame_sample_rate=2, crop_size=32,
                         short_side_size=40)
    rng = np.random.default_rng(0)
    clip, label = ds.get_train_clip(0, rng)
    assert clip.shape[0] == 8 and min(clip.shape[1:3]) == 40
    assert label == 0

    ds_val = VideoClsDataset(anno, root, mode="validation", clip_len=8,
                             frame_sample_rate=2, crop_size=32,
                             short_side_size=40)
    clip, label = ds_val.get_val_clip(1)
    assert clip.shape == (8, 32, 32, 3) and label == 1


def test_test_views_and_merge(video_root):
    from simple_tad_tpu.data.video_cls_datasets import (VideoClsDataset,
                                                        merge_test_views)
    root, anno = video_root
    ds = VideoClsDataset(anno, root, mode="test", clip_len=8,
                         frame_sample_rate=2, crop_size=32,
                         short_side_size=40, test_num_segment=2,
                         test_num_crop=2)
    assert len(ds) == 4 * 2 * 2
    clip, label, vid, ck, cp = ds.get_test_view(0)
    assert clip.shape == (8, 32, 32, 3)

    # merge: views of one video dominated by correct class win
    logits, vids, labels = [], [], []
    for vi in range(len(ds)):
        _, y, vid, _, _ = ds.test_views[vi][0], ds.label_array[
            ds.test_views[vi][0]], ds.samples[ds.test_views[vi][0]], 0, 0
        base = np.zeros(5)
        base[y] = 3.0
        logits.append(base + np.random.default_rng(vi).normal(0, 0.5, 5))
        vids.append(vid)
        labels.append(y)
    top1, top5 = merge_test_views(logits, vids, labels)
    assert top1 == 100.0 and top5 == 100.0


def test_ssv2_sparse_sampling(video_root):
    from simple_tad_tpu.data.video_cls_datasets import VideoClsDataset
    root, anno = video_root
    ds = VideoClsDataset(anno, root, mode="train", clip_len=8,
                         crop_size=32, short_side_size=40,
                         sparse_sampling=True)
    idx = ds._train_indices(40, np.random.default_rng(0))
    assert len(idx) == 8
    assert (np.diff(idx) >= 0).all()          # ordered TSN segments
    assert idx[0] < 5 and idx[-1] >= 35 - 5   # spans the video


class TestMixup:
    def test_blend_and_targets(self):
        from simple_tad_tpu.ops.augment import mixup_cutmix
        video = jnp.stack([jnp.zeros((2, 8, 8, 3)), jnp.ones((2, 8, 8, 3))])
        labels = jnp.asarray([0, 1])
        out, tgt = mixup_cutmix(video, labels, jax.random.PRNGKey(0),
                                num_classes=2, prob=1.0,
                                label_smoothing=0.0)
        tgt = np.asarray(tgt)
        # soft targets sum to 1, mixing is symmetric across the flip
        np.testing.assert_allclose(tgt.sum(-1), 1.0, atol=1e-6)
        np.testing.assert_allclose(tgt[0], tgt[1][::-1], atol=1e-6)
        out = np.asarray(out)
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_disabled_prob_zero(self):
        from simple_tad_tpu.ops.augment import mixup_cutmix
        video = jnp.ones((2, 2, 8, 8, 3)) * 0.5
        out, tgt = mixup_cutmix(video, jnp.asarray([0, 1]),
                                jax.random.PRNGKey(1), num_classes=2,
                                prob=0.0, label_smoothing=0.1)
        np.testing.assert_allclose(np.asarray(out), 0.5)
        np.testing.assert_allclose(np.asarray(tgt)[0], [0.95, 0.05])


def test_class_finetune_cli(video_root, tmp_path):
    from simple_tad_tpu.cli.class_finetune import main
    root, anno = video_root
    out = str(tmp_path / "cls")
    state = main([
        "--anno_train", anno, "--anno_val", anno, "--data_path", root,
        "--model", "vit_small_patch16_224", "--nb_classes", "2",
        "--num_frames", "8", "--sampling_rate", "2", "--input_size", "32",
        # per-device batch 1 -> global batch 8 on the 8-device conftest mesh
        "--short_side_size", "40", "--batch_size", "1", "--epochs", "1",
        "--warmup_epochs", "0", "--output_dir", out,
        "--dtype", "float32", "--attn_impl", "naive",
    ])
    assert int(state.step) == 1   # 4 clips wrap into one global batch of 8
    assert os.path.exists(os.path.join(out, "checkpoint-last"))
    # eval mode with multi-view merge
    top1, top5 = main([
        "--anno_train", anno, "--anno_test", anno, "--data_path", root,
        "--model", "vit_small_patch16_224", "--nb_classes", "2",
        "--num_frames", "8", "--sampling_rate", "2", "--input_size", "32",
        "--short_side_size", "40", "--batch_size", "4", "--eval",
        "--test_num_segment", "2", "--test_num_crop", "2",
        "--dtype", "float32", "--attn_impl", "naive",
    ])
    assert 0.0 <= top1 <= 100.0 and top5 == 100.0   # 2 classes -> top5 100
