"""End-to-end eval on the synthetic DoTA fixture (BASELINE.json config 1/2
shape, CPU): annotations -> windows -> clip-at-once scoring ->
predictions.csv + metrics."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from simple_tad_tpu.data.frame_datasets import FrameDataset, read_dota_clips
from simple_tad_tpu.eval.engine import FrameEvaluator
from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer

from tests.fixtures import make_synthetic_dota

import jax


@pytest.fixture(scope="module")
def dota_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dota")
    return make_synthetic_dota(str(root), n_clips=3, frames_per_clip=40,
                               h=72, w=128)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ViTConfig(img_size=32, all_frames=16, patch_size=16, embed_dim=64,
                    depth=2, num_heads=2, num_classes=2, attn_impl="naive")
    model = VisionTransformer(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_read_dota_clips(dota_root):
    clips = read_dota_clips(dota_root, "val_split.txt")
    assert len(clips) == 3
    c1 = clips[1]
    assert c1.binary_labels.sum() == 9            # frames 20..28 risky
    assert c1.ego and not c1.night
    assert c1.meta_category == "LA" and c1.meta_ego
    assert clips[0].binary_labels.sum() == 0
    assert len(c1.frame_names) == 40
    # TTC negative shortly before anomaly, 0 inside
    assert c1.ttc[20] == 0 and c1.ttc[19] < 0


def test_window_enumeration_and_labels(dota_root):
    clips = read_dota_clips(dota_root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=32)
    # 40 frames, window 16, stride 1 -> 25 windows per clip
    assert len(ds) == 3 * 25
    labels = ds.labels
    # window label == last-frame label
    risky = [s for s in ds.samples if s.label == 1]
    assert all(clips[s.clip_idx].binary_labels[s.frame_idx[-1]] == 1
               for s in risky)
    assert labels.sum() == sum(
        clips[1].binary_labels[15:].tolist())   # only clip 1 has anomalies


def test_clip_eval_views_cover_all_windows(dota_root):
    clips = read_dota_clips(dota_root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=32)
    views = ds.clip_eval_views()
    assert sum(v.window_idx.shape[0] for v in views) == len(ds)
    v = views[0]
    # windows reconstructed through unique/inverse match the raw sequences
    raw = v.unique_frames[v.window_idx]
    assert raw.shape == (25, 16)
    assert (np.diff(raw, axis=1) == 1).all()


def test_end_to_end_eval(dota_root, tiny_model, tmp_path):
    model, params = tiny_model
    clips = read_dota_clips(dota_root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=32)
    ev = FrameEvaluator(model, params, batch_size=8, frame_bucket=64,
                        dtype=jnp.float32)
    res = ev.evaluate(ds)
    assert res.n_windows == len(ds)
    assert len(res.rows) == len(ds)
    assert set(res.rows.columns) == {"clip", "filename", "logits_safe",
                                     "logits_risk", "label", "ttc"}
    assert 0.0 <= res.metrics.auroc <= 1.0
    preds = tmp_path / "predictions.csv"
    stats = tmp_path / "stats.txt"
    res.save(str(preds), str(stats))
    assert preds.exists() and "auroc" in stats.read_text()


def test_eval_chunking_invariant(dota_root, tiny_model):
    """Same logits regardless of batch size (padding correctness)."""
    model, params = tiny_model
    clips = read_dota_clips(dota_root, "val_split.txt")[:1]
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=32)
    view = ds.clip_eval_views()[0]
    a = FrameEvaluator(model, params, batch_size=25,
                       dtype=jnp.float32).score_view(ds, view)
    b = FrameEvaluator(model, params, batch_size=7,
                       dtype=jnp.float32).score_view(ds, view)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_device_resize_close_to_host_resize(dota_root, tiny_model):
    model, params = tiny_model
    clips = read_dota_clips(dota_root, "val_split.txt")[:1]
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=32)
    view = ds.clip_eval_views()[0]
    host = FrameEvaluator(model, params, batch_size=25, dtype=jnp.float32,
                          resize_on_host=True).score_view(ds, view)
    dev = FrameEvaluator(model, params, batch_size=25, dtype=jnp.float32,
                         resize_on_host=False).score_view(ds, view)
    # cv2 vs XLA bicubic: logits should agree closely on natural frames
    assert np.abs(host - dev).max() < 0.05


def test_multi_device_eval_identical(dota_root, tiny_model, tmp_path):
    """VERDICT r2 #2 'done' criterion: clip-parallel eval over the
    8-virtual-device CPU mesh writes a byte-identical predictions.csv to
    the single-device run."""
    model, params = tiny_model
    clips = read_dota_clips(dota_root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=32)

    one = FrameEvaluator(model, params, batch_size=8, frame_bucket=64,
                         dtype=jnp.float32)
    res1 = one.evaluate(ds)
    p1 = tmp_path / "pred_1dev.csv"
    res1.rows.to_csv(p1, index=False)

    assert len(jax.devices()) >= 2, "conftest provides 8 CPU devices"
    many = FrameEvaluator(model, params, batch_size=8, frame_bucket=64,
                          dtype=jnp.float32, devices=jax.devices())
    res8 = many.evaluate(ds)
    p8 = tmp_path / "pred_8dev.csv"
    res8.rows.to_csv(p8, index=False)

    assert p1.read_bytes() == p8.read_bytes()
    assert res1.metrics.auroc == res8.metrics.auroc


def test_multi_host_view_sharding_covers_all(dota_root, tiny_model):
    """views[rank::world] slices partition the dataset: the union of the
    per-rank evaluate() rows equals the full run's rows."""
    import pandas as pd
    model, params = tiny_model
    clips = read_dota_clips(dota_root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=32)
    ev = FrameEvaluator(model, params, batch_size=8, frame_bucket=64,
                        dtype=jnp.float32)
    full = ev.evaluate(ds).rows
    views = ds.clip_eval_views()
    parts = [ev.evaluate(ds, views=views[r::2]).rows for r in range(2)]
    merged = pd.concat(parts, ignore_index=True).sort_values(
        ["clip", "filename"]).reset_index(drop=True)
    want = full.sort_values(["clip", "filename"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, want)


@pytest.mark.parametrize("target_fps", [10, 5])
def test_tubelet_precompute_matches_pixel_path(dota_root, tiny_model,
                                               target_fps):
    """The half-kernel token-gather serving path scores identically (up to
    fp reassociation) to the pixel-gather path, including fps-decimated
    windows (step > 1)."""
    model, params = tiny_model
    clips = read_dota_clips(dota_root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=16,
                      target_fps=target_fps, orig_fps=10, view_step=1,
                      crop_size=32)
    view = ds.clip_eval_views()[0]
    pix = FrameEvaluator(model, params, batch_size=8, frame_bucket=64,
                         dtype=jnp.float32, precompute_tubelets=False)
    tok = FrameEvaluator(model, params, batch_size=8, frame_bucket=64,
                         dtype=jnp.float32, precompute_tubelets=True)
    assert tok.precompute_tubelets
    a = pix.score_view(ds, view)
    b = tok.score_view(ds, view)
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4)


def test_tubelet_precompute_tubelet1_variant(dota_root):
    """tubelet_size=1 (UMT geometry): token path == pixel path."""
    cfg = ViTConfig(img_size=32, all_frames=8, patch_size=16, embed_dim=64,
                    depth=1, num_heads=2, num_classes=2, attn_impl="naive",
                    tubelet_size=1, pos_embed_kind="umt")
    model = VisionTransformer(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    clips = read_dota_clips(dota_root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=8, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=32)
    view = ds.clip_eval_views()[0]
    pix = FrameEvaluator(model, params, batch_size=8, frame_bucket=64,
                         dtype=jnp.float32, precompute_tubelets=False)
    tok = FrameEvaluator(model, params, batch_size=8, frame_bucket=64,
                         dtype=jnp.float32, precompute_tubelets=True)
    np.testing.assert_allclose(pix.score_view(ds, view),
                               tok.score_view(ds, view),
                               atol=5e-4, rtol=5e-4)


def test_tubelet_precompute_iv2(dota_root):
    """InternVideo2 (flat patch params, cls token, tubelet 1) through the
    token-gather path == pixel path."""
    import simple_tad_tpu as st
    model = st.create_model("internvideo2_small_patch14_224", num_classes=2,
                            all_frames=8, img_size=28, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    clips = read_dota_clips(dota_root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=8, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=28)
    view = ds.clip_eval_views()[0]
    pix = FrameEvaluator(model, params, batch_size=8, frame_bucket=64,
                         dtype=jnp.float32, precompute_tubelets=False)
    tok = FrameEvaluator(model, params, batch_size=8, frame_bucket=64,
                         dtype=jnp.float32, precompute_tubelets=True)
    assert tok.precompute_tubelets
    np.testing.assert_allclose(pix.score_view(ds, view),
                               tok.score_view(ds, view),
                               atol=5e-4, rtol=5e-4)
