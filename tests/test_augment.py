"""Device augmentations vs PIL/cv2 oracles (distribution/math parity,
SURVEY.md §7 hard part #5)."""

import cv2
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

import jax
import jax.numpy as jnp

from simple_tad_tpu.ops import augment as A


def _img(h=40, w=64, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 200, w, dtype=np.float32)[None, :, None]
    y = np.linspace(0, 100, h, dtype=np.float32)[:, None, None]
    img = np.clip(x + y / 2 + rng.normal(0, 8, (h, w, 3)), 0, 255)
    return img.astype(np.uint8)


def _clip(img):
    """(1, 1, H, W, C) float clip from one image."""
    return jnp.asarray(img.astype(np.float32))[None]


class TestPILParityOps:
    def setup_method(self):
        self.img = _img()
        self.clip = jnp.asarray(self.img.astype(np.float32))[None]  # (1,H,W,C)
        self.key = jax.random.PRNGKey(0)

    def test_invert(self):
        got = np.asarray(A._op_invert(self.clip, 0.0, self.key))[0]
        want = np.asarray(ImageOps.invert(Image.fromarray(self.img)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_autocontrast(self):
        got = np.asarray(A._op_autocontrast(self.clip, 0.0, self.key))[0]
        want = np.asarray(ImageOps.autocontrast(Image.fromarray(self.img)))
        assert np.abs(got - want).mean() < 1.0

    def test_equalize(self):
        got = np.asarray(A._op_equalize(self.clip, 0.0, self.key))[0]
        want = np.asarray(ImageOps.equalize(Image.fromarray(self.img)))
        assert np.abs(got - want).mean() < 1.0

    @pytest.mark.parametrize("factor", [0.46, 1.54])
    def test_brightness(self, factor):
        want = np.asarray(ImageEnhance.Brightness(
            Image.fromarray(self.img)).enhance(factor)).astype(np.float32)
        got = np.asarray(jnp.clip(self.clip[0] * factor, 0, 255))
        assert np.abs(got - want).max() <= 1.0

    @pytest.mark.parametrize("factor", [0.46, 1.54])
    def test_color_blend(self, factor):
        want = np.asarray(ImageEnhance.Color(
            Image.fromarray(self.img)).enhance(factor)).astype(np.float32)
        gray = A._luma(self.clip[0])
        got = np.asarray(jnp.clip(
            A._blend(self.clip[0], jnp.broadcast_to(gray, self.clip[0].shape),
                     factor), 0, 255))
        assert np.abs(got - want).mean() < 1.5

    @pytest.mark.parametrize("factor", [0.46, 1.54])
    def test_contrast_blend(self, factor):
        want = np.asarray(ImageEnhance.Contrast(
            Image.fromarray(self.img)).enhance(factor)).astype(np.float32)
        clip4 = self.clip  # (1,H,W,C) treated as T=1
        mean = jnp.mean(A._luma(clip4), axis=(1, 2), keepdims=True)
        got = np.asarray(jnp.clip(
            A._blend(clip4, jnp.broadcast_to(mean, clip4.shape), factor),
            0, 255))[0]
        # PIL rounds the gray mean to int; allow small mean error
        assert np.abs(got - want).mean() < 2.0

    @pytest.mark.parametrize("factor", [0.3, 1.7])
    def test_sharpness(self, factor):
        want = np.asarray(ImageEnhance.Sharpness(
            Image.fromarray(self.img)).enhance(factor)).astype(np.float32)
        mag = (factor - 1.0) / 0.9 * 10.0
        # call the op with a key that yields the right sign
        clip4 = self.clip  # (T=1,H,W,C)
        sm_key = jax.random.PRNGKey(3)
        sign = bool(jax.random.bernoulli(sm_key))
        use_mag = abs(mag)
        got = np.asarray(jnp.clip(
            A._op_sharpness(clip4, use_mag if (sign == (factor > 1)) else use_mag,
                            sm_key), 0, 255))[0]
        if (factor > 1) != sign:
            pytest.skip("random sign mismatch for this key")
        # interior only (border handling differs at corners)
        assert np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2]).mean() < 2.0

    def test_rotate_against_pil(self):
        deg = 18.0
        want = np.asarray(Image.fromarray(self.img).rotate(
            -deg, resample=Image.BILINEAR,
            fillcolor=(128, 128, 128))).astype(np.float32)
        # call warp directly with the inverse-map coefficients for +18deg
        # clockwise (PIL rotate(angle) is counter-clockwise)
        h, w = self.img.shape[:2]
        rad = np.deg2rad(deg)
        cx, cy = (w - 1) / 2, (h - 1) / 2
        cos, sin = np.cos(rad), np.sin(rad)
        coeffs = (cos, sin, cx - cos * cx - sin * cy,
                  -sin, cos, cy + sin * cx - cos * cy)
        got = np.asarray(A._warp_clip(self.clip, coeffs))[0]
        inner = (slice(8, -8), slice(8, -8))
        assert np.abs(got[inner] - want[inner]).mean() < 4.0


class TestPadWideResize:
    def test_resample_matches_cv2_border_modes(self):
        img = _img(40, 64).astype(np.float32)
        pt, pb = 7, 5
        crop = 48
        hp = 40 + pt + pb
        ys = (np.arange(crop) + 0.5) * (hp / crop) - 0.5 - pt
        for mode, cv2_border in [("constant", cv2.BORDER_CONSTANT),
                                 ("replicate", cv2.BORDER_REPLICATE),
                                 ("reflect", cv2.BORDER_REFLECT)]:
            padded = cv2.copyMakeBorder(img, pt, pb, 0, 0, cv2_border,
                                        value=[0, 0, 0])
            want = cv2.resize(padded, dsize=(64, crop),
                              interpolation=cv2.INTER_CUBIC)
            got = np.asarray(A._resample_axis_cubic(
                jnp.asarray(img), jnp.asarray(ys, jnp.float32), axis=0,
                mode=mode, fill=0.0))
            assert np.abs(got - want).mean() < 1.5, mode

    def test_pad_wide_shapes_and_range(self):
        rng = np.random.default_rng(0)
        video = jnp.asarray(rng.integers(
            0, 256, (4, 2, 40, 64, 3)).astype(np.float32))
        out = A.pad_wide_and_resize(video, jax.random.PRNGKey(0), 48)
        assert out.shape == (4, 2, 48, 48, 3)
        assert float(out.min()) >= 0 and float(out.max()) <= 255
        # frames of the same clip share the pad params: per-clip columns of
        # pure pad (if any) are identical across frames
        out2 = A.pad_wide_and_resize(video, jax.random.PRNGKey(0), 48)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


class TestRandomErasing:
    def test_rate_and_cube_consistency(self):
        video = jnp.zeros((64, 3, 16, 16, 3))
        out = np.asarray(A.random_erasing(video, jax.random.PRNGKey(0),
                                          probability=0.5))
        erased = (np.abs(out).sum(axis=(1, 2, 3, 4)) > 0)
        assert 0.25 < erased.mean() < 0.75
        # cube: same mask across frames within a clip
        b = np.flatnonzero(erased)[0]
        m0 = np.abs(out[b, 0]).sum(-1) > 0
        for t in range(1, 3):
            mt = np.abs(out[b, t]).sum(-1) > 0
            np.testing.assert_array_equal(m0, mt)

    def test_noise_is_standard_normal(self):
        video = jnp.zeros((128, 1, 24, 24, 3))
        out = np.asarray(A.random_erasing(video, jax.random.PRNGKey(1),
                                          probability=1.0))
        vals = out[np.abs(out) > 0]
        assert abs(vals.mean()) < 0.05
        assert 0.8 < vals.std() < 1.2


def test_train_augment_end_to_end():
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (2, 4, 40, 64, 3), dtype=np.uint8))
    out = A.train_augment(u8, jax.random.PRNGKey(0), crop_size=32,
                          dtype=jnp.float32)
    assert out.shape == (2, 4, 32, 32, 3)
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    # normalized scale
    assert -4 < arr.mean() < 4
    # different keys -> different augs
    out2 = A.train_augment(u8, jax.random.PRNGKey(1), crop_size=32,
                           dtype=jnp.float32)
    assert np.abs(np.asarray(out2) - arr).max() > 1e-3


@pytest.mark.parametrize("mag", [0.0, 2.5, 5.0, 7.0, 10.0])
def test_posterize_matches_pil_increasing(mag):
    """PosterizeIncreasing keeps 4 - int(mag/10*4) high bits
    (rand_augment.py:247-252)."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    bits = 4 - int(mag / 10.0 * 4)
    if bits == 0:
        want = np.zeros_like(img)
    else:
        want = np.asarray(ImageOps.posterize(Image.fromarray(img), bits))
    clip = jnp.asarray(img[None].astype(np.float32))
    got = np.asarray(A._op_posterize(clip, mag, None))[0]
    np.testing.assert_array_equal(got.astype(np.uint8), want)
