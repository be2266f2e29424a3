"""DADA-2000 reader + eval/pretrain paths on a synthetic DADA fixture."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.fixtures import make_synthetic_dada


@pytest.fixture(scope="module")
def dada_root(tmp_path_factory):
    return make_synthetic_dada(str(tmp_path_factory.mktemp("dada")),
                               n_clips=2, frames_per_clip=60)


def test_read_dada_clips(dada_root):
    from simple_tad_tpu.data.frame_datasets import read_dada_clips
    clips = read_dada_clips(dada_root, "DADA2K_my_split/validation.txt",
                            orig_fps=30)
    assert len(clips) == 2
    c0, c1 = clips
    assert c0.binary_labels.sum() == 0
    assert c1.binary_labels.sum() == 16          # frames 30..45 inclusive
    assert c0.night and not c1.night
    assert c0.ego and c1.ego                     # types 1,2 in ego set
    assert c1.frame_names[0] == "0000.png"
    # TTC negative within 2s (60 frames at 30fps) before the anomaly
    assert c1.ttc[29] < 0 and c1.ttc[29] == pytest.approx(-1 / 30)


def test_dada_eval_windows(dada_root):
    """30->10 fps decimation: windows span 46 frames (16 frames, step 3)."""
    from simple_tad_tpu.data.frame_datasets import FrameDataset, read_dada_clips
    clips = read_dada_clips(dada_root, "DADA2K_my_split/validation.txt",
                            orig_fps=30)
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=30, view_step=1, crop_size=32)
    # actual span = 3*16 - 2 = 46 -> 60-46+1 = 15 windows per clip
    assert len(ds) == 2 * 15
    s = ds.samples[0]
    assert (np.diff(s.frame_idx) == 3).all()


def test_dada_end_to_end_eval(dada_root):
    from simple_tad_tpu.data.frame_datasets import FrameDataset, read_dada_clips
    from simple_tad_tpu.eval.engine import FrameEvaluator
    from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
    model = VisionTransformer(ViTConfig(
        img_size=32, all_frames=16, embed_dim=64, depth=1, num_heads=2,
        num_classes=2, attn_impl="naive"))
    params = model.init_params(jax.random.PRNGKey(0))
    clips = read_dada_clips(dada_root, "DADA2K_my_split/validation.txt",
                            orig_fps=30)
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=30, view_step=1, crop_size=32)
    res = FrameEvaluator(model, params, batch_size=8,
                         dtype=jnp.float32).evaluate(ds)
    assert res.n_windows == 30
    assert np.isfinite(res.rows["logits_risk"].to_numpy()).all()


def test_double_pretrain_cli(dada_root, tmp_path):
    """Dual-dataset DAPT: DoTA + DADA loaders zipped per step."""
    import os
    from tests.fixtures import make_synthetic_dota
    from simple_tad_tpu.cli.pretrain import main
    dota_root = str(tmp_path / "dota")
    make_synthetic_dota(dota_root, n_clips=3, frames_per_clip=40,
                        h=48, w=64)
    out = str(tmp_path / "dapt")
    state = main([
        "--data_set", "DoTA", "--data_path", dota_root,
        "--data_set2", "DADA2K", "--data_path2", dada_root,
        # per-device batch 1 -> global batch 8 on the 8-device conftest mesh
        "--batch_size", "1", "--batch_size2", "1",
        "--model", "pretrain_videomae_small_patch16_224",
        "--input_size", "32", "--num_frames", "16", "--epochs", "1",
        "--warmup_epochs", "0", "--mask_ratio", "0.75",
        "--sampling_rate", "4", "--decoder_depth", "1",
        "--transforms_finetune_align",
        "--output_dir", out, "--dtype", "float32",
        "--attn_impl", "naive", "--num_workers", "1",
    ])
    assert int(state.step) > 0
    assert os.path.exists(os.path.join(out, "checkpoint-last"))
