"""Round-trip export, standalone inference parity, visualization tools."""

import os
import sys
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
from simple_tad_tpu.utils import torch_convert as tc


def _model(num_classes=2, depth=2):
    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=64, depth=depth,
                    num_heads=2, num_classes=num_classes, attn_impl="naive")
    m = VisionTransformer(cfg)
    return m, m.init_params(jax.random.PRNGKey(0))


def test_torch_export_roundtrip(tmp_path):
    """flax params -> .pth -> load_vit_checkpoint == identity."""
    model, params = _model()
    path = str(tmp_path / "export.pth")
    tc.save_torch_checkpoint(params, path)
    params2 = tc.load_vit_checkpoint(path, model,
                                     model.init_params(
                                         jax.random.PRNGKey(7)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    a = np.asarray(model.apply({"params": params}, x))
    b = np.asarray(model.apply({"params": params2}, x))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_standalone_inference_matches_framework():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    import standalone_inference as si

    cfg = ViTConfig(img_size=224, all_frames=16, embed_dim=64, depth=2,
                    num_heads=2, num_classes=2, attn_impl="naive")
    model = VisionTransformer(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    video = np.random.default_rng(0).normal(
        size=(16, 224, 224, 3)).astype(np.float32)

    want = np.asarray(model.apply({"params": params},
                                  jnp.asarray(video)[None]))[0]
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)
    walk("", params)
    got = np.asarray(si.vit_forward(flat, jnp.asarray(video), depth=2,
                                    heads=2))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_visualize_overlay_and_gif(tmp_path):
    import pandas as pd
    from tests.fixtures import make_synthetic_dota
    from simple_tad_tpu.cli.visualize import overlay_clip, zip2gif

    root = str(tmp_path / "d")
    make_synthetic_dota(root, n_clips=1, frames_per_clip=24, h=48, w=64)
    rng = np.random.default_rng(0)
    names = [f"{t:06d}.jpg" for t in range(15, 24)]
    preds = pd.DataFrame({
        "clip": ["clip_000"] * len(names), "filename": names,
        "logits_safe": rng.normal(size=len(names)),
        "logits_risk": rng.normal(size=len(names)),
        "label": [0] * len(names), "ttc": 0.0})
    csv = str(tmp_path / "p.csv")
    preds.to_csv(csv, index=False)

    out = str(tmp_path / "vis")
    gif = str(tmp_path / "c.gif")
    n = overlay_clip(root, csv, "clip_000", out, gif=gif)
    assert n == len(names)
    assert len(os.listdir(out)) == len(names)
    assert os.path.getsize(gif) > 500

    g2 = str(tmp_path / "plain.gif")
    n = zip2gif(os.path.join(root, "frames", "clip_000", "images.zip"), g2)
    assert n == 24 and os.path.getsize(g2) > 500


def test_mae_recon_cli(tmp_path):
    """mae-recon on a tiny synthetic video: strips written, visible patches
    of the 'recon' image equal the original (only masked patches are
    predicted)."""
    import cv2
    import numpy as np

    from simple_tad_tpu.cli.visualize import main as vis_main

    vid = tmp_path / "demo.avi"
    wr = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 10,
                         (64, 48))
    for t in range(20):
        wr.write(np.full((48, 64, 3), 40 + 8 * t, np.uint8))
    wr.release()
    out = tmp_path / "vis"
    vis_main(["mae-recon", "--video", str(vid), "--output_dir", str(out),
              "--model", "pretrain_videomae_small_patch16_224",
              "--num_frames", "4", "--sampling_rate", "2",
              "--input_size", "32", "--decoder_depth", "1"])
    import os
    names = sorted(os.listdir(out))
    assert sum(n.startswith("orig") for n in names) == 4
    assert sum(n.startswith("masked") for n in names) == 4
    assert sum(n.startswith("recon") for n in names) == 4


def test_paper_figure(tmp_path):
    """paper-figure compositor (anaysis/vis_video_paper.py:40-253): glued
    timestamped strip + N risk curves + anomaly shading, one output file."""
    import pandas as pd
    from tests.fixtures import make_synthetic_dota
    from simple_tad_tpu.cli.visualize import main as vis_main

    root = str(tmp_path / "d")
    make_synthetic_dota(root, n_clips=2, frames_per_clip=24, h=48, w=64)
    rng = np.random.default_rng(1)
    names = [f"{t:06d}.jpg" for t in range(24)]
    csvs = []
    for i in range(2):
        preds = pd.DataFrame({
            "clip": ["clip_001"] * len(names), "filename": names,
            "logits_safe": rng.normal(size=len(names)),
            "logits_risk": rng.normal(size=len(names)) + i,
            "label": [int(12 <= t <= 20) for t in range(24)], "ttc": 0.0})
        csv = str(tmp_path / f"p{i}.csv")
        preds.to_csv(csv, index=False)
        csvs.append(csv)

    out = str(tmp_path / "fig.png")
    vis_main(["paper-figure", "--data_path", root, "--clip", "clip_001",
              "--out", out, "--preds", csvs[0], "--name", "w/o DAPT",
              "--preds", csvs[1], "--name", "w/ DAPT",
              "--frame_times", "0.3", "1.0", "1.6", "2.2"])
    assert os.path.getsize(out) > 10_000

    # mismatched labels across models must be rejected
    bad = pd.read_csv(csvs[1])
    bad["label"] = 0
    bad.to_csv(csvs[1], index=False)
    with pytest.raises(AssertionError, match="labels mismatch"):
        vis_main(["paper-figure", "--data_path", root, "--clip", "clip_001",
                  "--out", out, "--preds", csvs[0], "--name", "a",
                  "--preds", csvs[1], "--name", "b"])
