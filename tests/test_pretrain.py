"""Pre-training data pipeline + CLI end-to-end on the synthetic fixture."""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.fixtures import make_synthetic_dota


@pytest.fixture(scope="module")
def dota_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dota_pre"))
    return make_synthetic_dota(root, n_clips=2, frames_per_clip=30,
                               h=48, w=64)


def test_zip_source_and_window_dataset(dota_root):
    from simple_tad_tpu.data.frame_datasets import read_dota_clips
    from simple_tad_tpu.data.pretrain_datasets import (
        PretrainWindowDataset, ZipClipSource)
    clips = read_dota_clips(dota_root, "all_split.txt")
    src = ZipClipSource(clips, short_size=40)
    ds = PretrainWindowDataset(src, view_len=16, target_fps=10, orig_fps=10,
                               view_step=4)
    # 30 frames, window 16, stride 4 -> floor((30-16)/4)+1 = 4 per clip
    assert len(ds) == 2 * 4
    w = ds.get_window(0)
    assert w.shape[0] == 16 and w.ndim == 4
    assert min(w.shape[1], w.shape[2]) == 40   # short side normalized


def test_video_file_source(tmp_path):
    from simple_tad_tpu.data.pretrain_datasets import VideoFileSource
    path = str(tmp_path / "clip.avi")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                         (64, 48))
    for t in range(25):
        img = np.full((48, 64, 3), t * 10 % 255, np.uint8)
        wr.write(img)
    wr.release()
    src = VideoFileSource([path], short_size=40)
    assert src.num_frames(0) == 25
    win = src.read_window(0, [0, 2, 4, 6])
    assert win.shape[0] == 4
    assert min(win.shape[1], win.shape[2]) == 40
    # frame values increase with index (brightness ramp)
    assert win[0].mean() < win[-1].mean()


def test_pretrain_loader_batches(dota_root):
    from simple_tad_tpu.data.frame_datasets import read_dota_clips
    from simple_tad_tpu.data.pretrain_datasets import (PretrainLoader,
                                                       PretrainWindowDataset,
                                                       ZipClipSource)
    clips = read_dota_clips(dota_root, "all_split.txt")
    ds = PretrainWindowDataset(ZipClipSource(clips, short_size=40),
                               view_len=16, target_fps=10, orig_fps=10,
                               view_step=4)
    loader = PretrainLoader(ds, 4, window_size=(8, 2, 2), mask_ratio=0.75,
                            num_threads=2)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch() == 2
    b = batches[0]
    assert b["video_u8"].shape[0] == 4 and b["video_u8"].shape[1] == 16
    assert b["mask"].shape == (4, 8 * 4)
    assert (b["mask"].sum(1) == loader.num_masked).all()


def test_group_multi_scale_crop_identity_on_square():
    from simple_tad_tpu.ops.augment import group_multi_scale_crop
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.integers(0, 256, (2, 2, 40, 40, 3))
                        .astype(np.float32))
    out = group_multi_scale_crop(video, jax.random.PRNGKey(0), 32,
                                 scales=(1.0,))
    assert out.shape == (2, 2, 32, 32, 3)
    # full-image crop -> equals plain 2-tap bilinear resize (cv2 semantics;
    # PIL antialiases on downscale, a documented distribution-level diff)
    want = np.stack([
        np.stack([cv2.resize(np.asarray(video[b, t]), (32, 32),
                             interpolation=cv2.INTER_LINEAR)
                  for t in range(2)]) for b in range(2)])
    np.testing.assert_allclose(np.asarray(out), want, atol=1.0)


def test_pretrain_augment_pipelines():
    from simple_tad_tpu.ops.augment import (pretrain_augment_align,
                                            pretrain_augment_orig)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (2, 4, 40, 64, 3), dtype=np.uint8))
    for fn in (pretrain_augment_orig, pretrain_augment_align):
        out = fn(u8, jax.random.PRNGKey(0), crop_size=32, dtype=jnp.float32)
        assert out.shape == (2, 4, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_pretrain_cli_one_epoch(dota_root, tmp_path):
    from simple_tad_tpu.cli.pretrain import main
    out = str(tmp_path / "pre_run")
    state = main([
        "--data_set", "DoTA", "--data_path", dota_root,
        "--model", "pretrain_videomae_small_patch16_224",
        # per-device batch 1 -> global batch 8 on the 8-device conftest mesh
        "--input_size", "32", "--num_frames", "16", "--batch_size", "1",
        "--epochs", "1", "--warmup_epochs", "0", "--mask_ratio", "0.75",
        "--sampling_rate", "4", "--decoder_depth", "2",
        "--output_dir", out, "--dtype", "float32", "--attn_impl", "naive",
        "--num_workers", "2",
    ])
    assert int(state.step) == 1
    assert os.path.exists(os.path.join(out, "checkpoint-last"))


def test_pretrain_cli_random_mask(dota_root, tmp_path):
    """--mask_type random (iv2_run_mae_double_pretraining.py:56): per-token
    masking over the full T*H*W grid instead of tube tiling."""
    from simple_tad_tpu.cli.pretrain import main
    out = str(tmp_path / "pre_run_rand")
    state = main([
        "--data_set", "DoTA", "--data_path", dota_root,
        "--model", "pretrain_videomae_small_patch16_224",
        "--input_size", "32", "--num_frames", "16", "--batch_size", "1",
        "--epochs", "1", "--warmup_epochs", "0", "--mask_ratio", "0.75",
        "--mask_type", "random",
        "--sampling_rate", "4", "--decoder_depth", "2",
        "--output_dir", out, "--dtype", "float32", "--attn_impl", "naive",
        "--num_workers", "2",
    ])
    assert int(state.step) == 1
    assert os.path.exists(os.path.join(out, "checkpoint-last"))


def test_cyclic_zip():
    from simple_tad_tpu.data.pretrain_datasets import CyclicZip

    def longer(_e):
        return iter(range(5))

    def shorter(e):
        return iter([f"s{e}_{i}" for i in range(2)])

    pairs = list(CyclicZip(longer, shorter).epoch(0))
    assert len(pairs) == 5                     # ends with the longer one
    assert [p[0] for p in pairs] == [0, 1, 2, 3, 4]
    shorts = [p[1] for p in pairs]
    assert len(set(shorts)) == 5               # short side cycled w/ reshuffle


# ---------------------------------------------------------------- K700


@pytest.fixture(scope="module")
def k700_root(tmp_path_factory):
    from tests.fixtures import make_synthetic_k700
    root = str(tmp_path_factory.mktemp("k700"))
    return make_synthetic_k700(root, n_videos=3, frames_per_video=90,
                               fps=30.0, h=48, w=64)


def test_read_kinetics_clips(k700_root, tmp_path):
    from simple_tad_tpu.data.pretrain_datasets import read_kinetics_clips
    paths = read_kinetics_clips(k700_root)
    assert len(paths) == 3
    assert all(os.path.exists(p) for p in paths)
    assert paths[0].endswith("vid0000xxxxx_000000_000010.mp4")
    # ignore list drops by youtube id
    ign = str(tmp_path / "ignore.txt")
    with open(ign, "w") as f:
        f.write("vid0001xxxxx\n")
    assert len(read_kinetics_clips(k700_root, ignore_file=ign)) == 2


def test_tsn_train_indices_math():
    """Restates kinetics.py:684-704 + 745-757: windows are in bounds,
    stride new_step, random offset covers [1, avg]."""
    from simple_tad_tpu.data.pretrain_datasets import tsn_train_indices
    rng = np.random.default_rng(0)
    # plenty of frames: offset uniform in [1, avg], contiguous stride walk
    for _ in range(50):
        ids = tsn_train_indices(90, 16, 4, rng)
        assert ids.shape == (16,)
        assert (np.diff(ids) == 4).all()
        assert 0 <= ids[0] <= 90 - 16 * 4
        assert ids[-1] < 90
    # short video: skip_length > n -> offsets stay 0-based at frame 0 and
    # the walk clamps (offset only advances while offset+new_step < n)
    ids = tsn_train_indices(10, 16, 4, rng)
    assert ids.min() >= 0 and ids.max() < 10
    assert ids.shape == (16,)
    # exactly-fits case
    ids = tsn_train_indices(64, 16, 4, rng)
    assert ids[0] == 0 and (np.diff(ids) == 4).all()


def test_kinetics_dataset_tsn_and_aligned(k700_root):
    from simple_tad_tpu.data.pretrain_datasets import (
        KineticsPretrainDataset, VideoFileSource, read_kinetics_clips)
    paths = read_kinetics_clips(k700_root)
    src = VideoFileSource(paths, short_size=40, half_first=False)
    assert src.num_frames(0) == 90
    assert abs(src.fps(0) - 30.0) < 1e-3

    ds = KineticsPretrainDataset(src, view_len=16, sampling_rate=4,
                                 mode="tsn", seed=1)
    assert len(ds) == 3
    w0 = ds.get_window(0)
    assert w0.shape[0] == 16 and w0.dtype == np.uint8
    assert min(w0.shape[1], w0.shape[2]) == 40
    # deterministic within an epoch, resampled across epochs
    assert np.array_equal(w0, ds.get_window(0))
    ds.set_epoch(1)
    w1 = ds.get_window(0)
    assert not np.array_equal(w0, w1)

    ds_al = KineticsPretrainDataset(src, view_len=16, sampling_rate=4,
                                    mode="aligned", target_fps=10, seed=1)
    a0 = ds_al.get_window(0)
    assert a0.shape[0] == 16 and a0.dtype == np.uint8


def test_short_side_resize_no_upsample():
    from simple_tad_tpu.data.pretrain_datasets import _short_side
    img = np.zeros((48, 64, 3), np.uint8)
    out = _short_side(img, 320)   # min(h,w,320)=48 -> unchanged
    assert out.shape == (48, 64, 3)
    out = _short_side(img, 24)
    assert out.shape == (24, 32, 3)


def test_pretrain_cli_k700_one_epoch(tmp_path_factory, tmp_path):
    # 10 videos -> one global batch of 8 on the simulated 8-device mesh
    from tests.fixtures import make_synthetic_k700
    from simple_tad_tpu.cli.pretrain import main
    root = make_synthetic_k700(str(tmp_path_factory.mktemp("k700cli")),
                               n_videos=10, frames_per_video=80,
                               fps=30.0, h=40, w=56)
    out = str(tmp_path / "k700_run")
    state = main([
        "--data_set", "K700", "--data_path", root,
        "--model", "pretrain_videomae_small_patch16_224",
        "--input_size", "32", "--num_frames", "16", "--sampling_rate", "4",
        "--mask_ratio", "0.9", "--decoder_depth", "1",
        "--batch_size", "1", "--epochs", "1", "--warmup_epochs", "0",
        "--output_dir", out, "--dtype", "float32", "--attn_impl", "naive",
        "--num_workers", "2",
    ])
    assert int(np.asarray(state.step)) == 1
    assert os.path.exists(os.path.join(out, "checkpoint-last"))


def test_cyclic_zip_n():
    from simple_tad_tpu.data.pretrain_datasets import CyclicZipN

    def driver(_e):
        return iter(range(5))

    def mid(e):
        return iter([f"m{e}_{i}" for i in range(3)])

    def short(e):
        return iter([f"s{e}_{i}" for i in range(2)])

    trips = list(CyclicZipN(driver, mid, short).epoch(0))
    assert len(trips) == 5                     # driver ends the epoch
    assert [t[0] for t in trips] == [0, 1, 2, 3, 4]
    assert all(len(t) == 3 for t in trips)
    assert len(set(t[1] for t in trips)) == 5  # both others cycle with
    assert len(set(t[2] for t in trips)) == 5  # reshuffled epoch seeds


def test_pretrain_cli_triple_dataset(dota_root, tmp_path):
    """Triple-loop equivalent of train_one_epoch_triple
    (engine_for_pretraining.py:310): three concurrent sources concatenated
    into each step's batch."""
    from simple_tad_tpu.cli.pretrain import main
    out = str(tmp_path / "pre_run3")
    state = main([
        "--data_set", "DoTA", "--data_path", dota_root,
        "--data_set2", "DoTA", "--data_path2", dota_root,
        "--data_set3", "DoTA", "--data_path3", dota_root,
        "--model", "pretrain_videomae_small_patch16_224",
        "--input_size", "32", "--num_frames", "16", "--batch_size", "1",
        "--batch_size2", "1", "--batch_size3", "1",
        "--epochs", "1", "--warmup_epochs", "0", "--mask_ratio", "0.75",
        "--sampling_rate", "4", "--decoder_depth", "2",
        "--output_dir", out, "--dtype", "float32", "--attn_impl", "naive",
        "--num_workers", "2",
    ])
    assert int(state.step) == 1
    assert os.path.exists(os.path.join(out, "checkpoint-last"))
