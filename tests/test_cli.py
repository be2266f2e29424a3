"""End-to-end CLI smoke tests on the synthetic fixture (CPU, tiny model)."""

import glob
import os
import zipfile

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def full_root(tmp_path_factory):
    from tests.fixtures import make_synthetic_dota_full
    root = str(tmp_path_factory.mktemp("dota_full"))
    return make_synthetic_dota_full(root, n_clips=2, frames_per_clip=24,
                                    h=48, w=64)


def test_finetune_cli_one_epoch(full_root, tmp_path):
    from simple_tad_tpu.cli.finetune import main
    out = str(tmp_path / "run")
    state = main([
        "--data_set", "DoTA", "--data_path", full_root,
        "--model", "vit_small_patch16_224", "--input_size", "32",
        # per-device batch 1: conftest simulates 8 devices, so the
        # global (loader) batch is 8 and the mesh shard path is exercised
        "--num_frames", "16", "--batch_size", "1", "--epochs", "1",
        "--warmup_epochs", "0", "--output_dir", out,
        "--dtype", "float32", "--attn_impl", "naive",
        "--num_workers", "2", "--drop_path", "0.0",
    ])
    assert int(state.step) > 0
    assert os.path.exists(os.path.join(out, "checkpoint-last"))
    assert os.path.exists(os.path.join(out, "log.txt"))
    assert os.path.exists(os.path.join(out, "params.json"))
    # best-metric snapshots written
    assert glob.glob(os.path.join(out, "checkpoint-best*"))


def test_finetune_cli_auto_resume(full_root, tmp_path):
    from simple_tad_tpu.cli.finetune import main
    out = str(tmp_path / "resume_run")
    args = [
        "--data_set", "DoTA", "--data_path", full_root,
        "--model", "vit_small_patch16_224", "--input_size", "32",
        # per-device batch 1: conftest simulates 8 devices, so the
        # global (loader) batch is 8 and the mesh shard path is exercised
        "--num_frames", "16", "--batch_size", "1", "--epochs", "1",
        "--warmup_epochs", "0", "--output_dir", out,
        "--dtype", "float32", "--attn_impl", "naive", "--num_workers", "2",
        "--drop_path", "0.0",
    ]
    main(args)
    # second invocation with --epochs 1 resumes at epoch 1 -> trains 0 steps
    state2 = main(args)
    assert int(state2.step) > 0  # state restored from checkpoint-last


def test_eval_cli(full_root, tmp_path):
    from simple_tad_tpu.cli.eval_frames import main
    out = str(tmp_path / "eval_out")
    res = main([
        "--data_set", "DoTA", "--data_path", full_root,
        "--model", "vit_small_patch16_224", "--input_size", "32",
        "--num_frames", "16", "--batch_size", "8",
        "--output_dir", out, "--dtype", "float32",
        "--attn_impl", "naive",
    ])
    assert os.path.exists(os.path.join(out, "predictions.csv"))
    assert os.path.exists(os.path.join(out, "stats.txt"))
    assert res.n_windows > 0


def test_inference_cli_stream_and_batch(full_root, tmp_path):
    from simple_tad_tpu.cli.inference import main
    from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
    from simple_tad_tpu.utils import checkpoint as ck

    # extract fixture frames to a plain folder
    frames_dir = str(tmp_path / "frames")
    os.makedirs(frames_dir)
    zf = os.path.join(full_root, "frames", "val_000", "images.zip")
    with zipfile.ZipFile(zf) as z:
        z.extractall(frames_dir)

    import simple_tad_tpu as st
    model = st.create_model("vit_small_patch16_224", num_classes=2,
                            all_frames=16, img_size=32)
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "w")
    os.makedirs(ckpt_dir)
    ck.save_weights(ckpt_dir, params, "weights")

    common = ["--ckpt", os.path.join(ckpt_dir, "weights"),
              "--frames_folder", frames_dir,
              "--model", "vit_small_patch16_224",
              "--input_size", "32", "--dtype", "float32"]
    res_stream = main(common)
    assert len(res_stream) == 24 - 16
    res_batch = main(common + ["--batched",
                               "--output_csv",
                               str(tmp_path / "risk.csv")])
    assert len(res_batch) == 24 - 16 + 1
    assert os.path.exists(tmp_path / "risk.csv")


def test_finetune_cli_ema_eval_path(full_root, tmp_path, monkeypatch):
    """--model_ema routes EMA params (not raw params) into validation and
    best tracking (run_frame_finetuning.py:487-494's ModelEma, consumed)."""
    import simple_tad_tpu.eval.engine as ev
    from simple_tad_tpu.cli.finetune import main

    seen = []
    real = ev.FrameEvaluator

    class Spy(real):
        def __init__(self, model, params, **kw):
            seen.append(params)
            super().__init__(model, params, **kw)

    monkeypatch.setattr(ev, "FrameEvaluator", Spy)
    out = str(tmp_path / "ema_run")
    state = main([
        "--data_set", "DoTA", "--data_path", full_root,
        "--model", "vit_small_patch16_224", "--input_size", "32",
        "--num_frames", "16", "--batch_size", "1", "--epochs", "1",
        "--warmup_epochs", "0", "--output_dir", out,
        "--dtype", "float32", "--attn_impl", "naive",
        "--num_workers", "2", "--drop_path", "0.0",
        "--model_ema", "--model_ema_decay", "0.5",
    ])
    assert state.ema_params is not None
    assert len(seen) == 1
    got = jax.tree.leaves(seen[0])
    want_ema = jax.tree.leaves(state.ema_params)
    raw = jax.tree.leaves(state.params)
    assert all(np.array_equal(np.asarray(g), np.asarray(w))
               for g, w in zip(got, want_ema))
    # EMA params actually differ from raw params after training
    assert any(not np.array_equal(np.asarray(g), np.asarray(r))
               for g, r in zip(got, raw))


def test_eval_cli_dist_matches_single(full_root, tmp_path):
    """--dist_eval (default; 8 local devices on the conftest mesh) writes
    a byte-identical predictions.csv to --no_dist_eval."""
    from simple_tad_tpu.cli.eval_frames import main
    base = [
        "--data_set", "DoTA", "--data_path", full_root,
        "--model", "vit_small_patch16_224", "--input_size", "32",
        "--num_frames", "16", "--batch_size", "8",
        "--dtype", "float32", "--attn_impl", "naive",
    ]
    out_d = str(tmp_path / "dist")
    out_s = str(tmp_path / "single")
    main(base + ["--output_dir", out_d])
    main(base + ["--output_dir", out_s, "--no_dist_eval"])
    pd_bytes = open(os.path.join(out_d, "predictions.csv"), "rb").read()
    ps_bytes = open(os.path.join(out_s, "predictions.csv"), "rb").read()
    assert pd_bytes == ps_bytes
