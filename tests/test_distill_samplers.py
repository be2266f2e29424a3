"""Distillation driver + fps-window samplers."""

import os

import numpy as np
import pytest

import jax

from tests.fixtures import make_synthetic_dota


def test_sample_frame_window_indices():
    from simple_tad_tpu.data.pretrain_datasets import \
        sample_frame_window_indices
    rng = np.random.default_rng(0)
    idx = sample_frame_window_indices(100, 30, 8, 10, rng)
    assert len(idx) == 8 and (np.diff(idx) == 3).all()
    assert idx[-1] < 100
    with pytest.raises(ValueError):
        sample_frame_window_indices(10, 30, 8, 10, rng)


def test_sample_interpolated_window_blends():
    from simple_tad_tpu.data.pretrain_datasets import \
        sample_interpolated_window

    class RampSource:
        """Frame t is a constant image of value t (easy to check blends)."""

        def num_frames(self, _):
            return 100

        def read_window(self, _, idx):
            return np.stack([np.full((4, 4, 3), i, np.float32)
                             for i in idx]).astype(np.uint8)

    rng = np.random.default_rng(0)
    out = sample_interpolated_window(RampSource(), 0, new_length=8,
                                    target_fps=10, src_fps=25, rng=rng)
    assert out.shape == (8, 4, 4, 3)
    vals = out[:, 0, 0, 0].astype(np.float64)
    # timestamps step 1/10 s -> source-index step 2.5 frames
    diffs = np.diff(vals)
    assert np.all(np.abs(diffs - 2.5) <= 1.0), diffs


def test_distill_cli_one_epoch(tmp_path):
    from simple_tad_tpu.cli.distill import main
    root = str(tmp_path / "d")
    make_synthetic_dota(root, split="train_split.txt", prefix="train",
                        n_clips=2, frames_per_clip=24, h=48, w=64)
    out = str(tmp_path / "kd")
    state = main([
        "--data_set", "DoTA", "--data_path", root,
        "--model", "vit_small_patch16_224",
        "--teacher_model", "vit_small_patch16_224",
        "--input_size", "32", "--num_frames", "16",
        # per-device batch 1 -> global batch 8 on the 8-device conftest mesh
        "--batch_size", "1", "--epochs", "1", "--warmup_epochs", "0",
        "--output_dir", out, "--dtype", "float32",
        "--attn_impl", "naive", "--num_workers", "2",
    ])
    assert int(state.step) > 0
    assert os.path.exists(os.path.join(out, "checkpoint-last"))


def test_feature_distill_cli_k700_one_epoch(tmp_path):
    """ADVICE r3 (medium): the K700 recipe needs an unlabeled source and
    a feature-distillation objective (reference run_distill.py's
    l2-cosine loss on final features) — drive it end to end on the
    synthetic Kinetics fixture with tiny IV2 trunks."""
    from tests.fixtures import make_synthetic_k700
    from simple_tad_tpu.cli.distill import main
    root = make_synthetic_k700(str(tmp_path / "k"), n_videos=8,
                               frames_per_video=40, fps=30.0, h=48, w=64)
    out = str(tmp_path / "fd")
    state = main([
        "--objective", "feature",
        "--data_set", "K700", "--data_path", root,
        "--model", "internvideo2_small_patch14_224",
        "--teacher_model", "internvideo2_small_patch14_224",
        "--input_size", "28", "--num_frames", "4", "--view_fps", "10",
        "--batch_size", "1", "--epochs", "1", "--warmup_epochs", "0",
        "--output_dir", out, "--dtype", "float32",
        "--attn_impl", "naive", "--num_workers", "2",
    ])
    assert int(state.step) > 0
    assert "student" in state.params
    assert os.path.exists(os.path.join(out, "checkpoint-last"))


def test_feature_distill_aligner_when_widths_differ(tmp_path):
    """ViT-S (384) student vs ViT-L-width teacher inserts the Linear
    aligner (the reference's Linear_Decoder role)."""
    from simple_tad_tpu.cli.distill import main
    root = str(tmp_path / "d2")
    make_synthetic_dota(root, split="train_split.txt", prefix="train",
                        n_clips=2, frames_per_clip=24, h=48, w=64)
    out = str(tmp_path / "fa")
    state = main([
        "--objective", "feature",
        "--data_set", "DoTA", "--data_path", root,
        "--model", "vit_small_patch16_224",
        "--teacher_model", "vit_base_patch16_224",
        "--input_size", "32", "--num_frames", "16",
        "--batch_size", "1", "--epochs", "1", "--warmup_epochs", "0",
        "--output_dir", out, "--dtype", "float32",
        "--attn_impl", "naive", "--num_workers", "2",
    ])
    assert "aligner" in state.params
    assert state.params["aligner"]["kernel"].shape == (384, 768)
