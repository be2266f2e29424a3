"""Device-side preprocessing vs cv2 oracle (the reference's eval pixel path)."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from simple_tad_tpu.ops.image import (
    IMAGENET_MEAN, IMAGENET_STD, eval_preprocess, make_windows, normalize,
    pad_to_square, resize_bicubic)


def _natural_image(h=720, w=1280):
    """Smooth gradient + texture — dashcam-frame-like spectral content.
    (On pure uint8 noise, cv2's fixed-point 4-tap cubic and float cubic
    decorrelate; real video frames are smooth and match closely.)"""
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
    y = np.linspace(0, 200, h, dtype=np.float32)[:, None, None]
    tex = 25 * np.sin(np.arange(w, dtype=np.float32) / 17)[None, :, None]
    tex = tex + 15 * np.cos(np.arange(h, dtype=np.float32) / 23)[:, None, None]
    img = np.clip((x + y) / 2 + tex, 0, 255)
    return np.repeat(img, 3, axis=2).astype(np.uint8)


def test_resize_bicubic_close_to_cv2():
    img = _natural_image()
    want = cv2.resize(img, (224, 224), interpolation=cv2.INTER_CUBIC)
    got = np.asarray(resize_bicubic(jnp.asarray(img), (224, 224)))
    got = np.clip(got, 0, 255)
    diff = np.abs(got - want.astype(np.float32))
    assert np.mean(diff) < 0.5, np.mean(diff)
    assert np.percentile(diff, 99) <= 2.0


def test_normalize_matches_reference_math():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8).astype(np.float32)
    got = np.asarray(normalize(jnp.asarray(img)))
    want = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_eval_preprocess_end_to_end_range():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (2, 360, 640, 3), dtype=np.uint8)
    out = np.asarray(eval_preprocess(jnp.asarray(frames), (224, 224)))
    assert out.shape == (2, 224, 224, 3)
    # normalized ImageNet range
    assert out.min() > -3.0 and out.max() < 3.0


def test_make_windows_gather():
    frames = jnp.arange(10 * 2 * 2 * 1).reshape(10, 2, 2, 1)
    idx = jnp.asarray([[0, 2, 4], [1, 3, 5]])
    w = make_windows(frames, idx)
    assert w.shape == (2, 3, 2, 2, 1)
    np.testing.assert_array_equal(np.asarray(w[0, 1]), np.asarray(frames[2]))


@pytest.mark.parametrize("mode", ["black", "replicate", "color"])
def test_pad_to_square(mode):
    img = jnp.ones((2, 100, 160, 3)) * 7
    out = pad_to_square(img, mode, fill=(1.0, 2.0, 3.0))
    assert out.shape == (2, 160, 160, 3)
    # center rows keep original content
    np.testing.assert_allclose(np.asarray(out[:, 80]), 7.0)
    if mode == "black":
        np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0)
    elif mode == "replicate":
        np.testing.assert_allclose(np.asarray(out[:, 0]), 7.0)
    else:
        np.testing.assert_allclose(np.asarray(out[:, 0, 0]),
                                   np.tile([1.0, 2.0, 3.0], (2, 1)))
