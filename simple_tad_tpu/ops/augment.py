"""Batched on-device training augmentations (the reference's PIL/cv2 train
pipeline re-expressed as XLA ops over whole batches).

Behavioral reference (applied per window in _aug_frame,
/root/reference/dota.py:288-331):
  1. pad_wide_clips — random vertical pad {none x5, black x2, color x1,
     reflect-blend x2, replicate x2} with U(0,0.5(w-h)) top/bottom offsets,
     then cubic resize to crop^2 (video_transforms.py:1301-1337),
  2. RandAugment 'rand-m6-n3-mstd0.5-inc1' restricted to the 10
     driving-safe DRIVE_TRANSFORMS (video_transforms.py:34-46): no flips or
     translations, clip-consistent parameters,
  3. ImageNet normalize,
  4. RandomErasing p=0.25, pixel-mode noise, one cube region per clip
     (random_erasing.py:27-173).

PIL is not bit-reproducible in XLA; this module matches *distributions* and
PIL's documented math (enhance blends, ITU-R 601-2 luma, PIL equalize LUT,
timm increasing-magnitude level maps) — SURVEY.md §7 hard part #5.

All entry points take uint8-valued float video (B, T, H, W, C) in [0, 255]
and a jax PRNG key; everything jits and runs on the VPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from simple_tad_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD

GRAY_FILL = 128.0
NUM_RA_OPS = 10   # autocontrast equalize invert rotate color contrast
                  # brightness sharpness shear_x shear_y


# --------------------------------------------------------------- sampling ---

def _bilinear_sample(img, xs, ys, fill):
    """img (H, W, C); xs/ys (H', W') source coords -> (H', W', C);
    out-of-range samples take ``fill``."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    valid = ((xs >= -0.5) & (xs <= W - 0.5)
             & (ys >= -0.5) & (ys <= H - 0.5))[..., None]
    return jnp.where(valid, out, fill)


def _cubic_weights(t):
    """Keys cubic (a=-0.5) weights for fractional offset t: taps -1..2."""
    a = -0.5
    t2, t3 = t * t, t * t * t
    w0 = a * (t3 - 2 * t2 + t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w3 = -a * (t3 - t2)
    return w0, w1, w2, w3


def _resample_axis_cubic(img, coords, axis, mode, fill):
    """4-tap cubic resample of ``img`` along ``axis`` at float ``coords``.

    mode: 'constant' (out-of-range taps read ``fill``, matching cv2
    copyMakeBorder(BORDER_CONSTANT) then resize), 'replicate' (clamp),
    'reflect' (BORDER_REFLECT: edge pixel duplicated, period 2n).
    ``fill`` may be a scalar or a (C,) vector (channels-last).
    """
    n = img.shape[axis]
    base = jnp.floor(coords).astype(jnp.int32)
    t = coords - base
    w = _cubic_weights(t)
    taps = (base - 1, base, base + 1, base + 2)
    shape = [1] * img.ndim
    shape[axis] = -1

    def index(idx):
        if mode == "reflect":
            idx = jnp.abs(idx + (idx < 0))            # -1->0, -2->1 ...
            idx = jnp.where(idx >= n, 2 * n - 1 - idx, idx)
            idx = jnp.clip(idx, 0, n - 1)
            return jnp.take(img, idx, axis=axis)
        if mode == "constant":
            in_range = (idx >= 0) & (idx < n)
            gathered = jnp.take(img, jnp.clip(idx, 0, n - 1), axis=axis)
            return jnp.where(in_range.reshape(shape), gathered,
                             jnp.asarray(fill, img.dtype))
        return jnp.take(img, jnp.clip(idx, 0, n - 1), axis=axis)

    return sum(wk.reshape(shape) * index(ik) for wk, ik in zip(w, taps))


# ---------------------------------------------------- pad_wide + resize ---

def pad_wide_and_resize(video, key, crop_size: int):
    """Random vertical pad-to-square + cubic resize for one clip batch.

    video: (B, T, H, W, C) float [0,255] with W >= H (wide dashcam frames).
    Per-sample random mode/offsets, consistent across the clip's frames —
    matching pad_wide_clips (video_transforms.py:1301-1337).
    """
    B, T, H, W, C = video.shape
    kmode, ktop, kbot, kalpha, kcolor = jax.random.split(key, 5)
    # 12-slot table: 0-4 none, 5-6 black, 7 color, 8-9 reflect, 10-11 repl
    slot = jax.random.randint(kmode, (B,), 0, 12)
    mode = jnp.where(slot < 5, 0,
                     jnp.where(slot < 7, 1,
                               jnp.where(slot < 8, 2,
                                         jnp.where(slot < 10, 3, 4))))
    h_to_sq = max(W - H, 0)
    pad_top = jnp.round(jax.random.uniform(ktop, (B,)) * 0.5 * h_to_sq)
    pad_bot = jnp.round(jax.random.uniform(kbot, (B,)) * 0.5 * h_to_sq)
    alpha = jax.random.uniform(kalpha, (B,)) * 0.7
    color = jax.random.randint(kcolor, (B, 3), 0, 256).astype(video.dtype)

    ys_out = jnp.arange(crop_size, dtype=jnp.float32)
    xs_out = jnp.arange(crop_size, dtype=jnp.float32)
    x_coords = (xs_out + 0.5) * (W / crop_size) - 0.5     # shared

    def one(clip, mode_i, pt, pb, a, col):
        hp = H + pt + pb
        y_pad = (ys_out + 0.5) * (hp / crop_size) - 0.5
        y_src = y_pad - pt                                 # into source rows

        def rows(m, fill):
            return _resample_axis_cubic(clip, y_src, axis=1, mode=m,
                                        fill=fill)

        def none_case():
            y_direct = (ys_out + 0.5) * (H / crop_size) - 0.5
            return _resample_axis_cubic(clip, y_direct, axis=1,
                                        mode="replicate", fill=0.0)

        def black_case():
            return rows("constant", 0.0)

        def color_case():
            return rows("constant", col)

        def reflect_case():
            refl = rows("reflect", 0.0)
            blk = rows("constant", 0.0)
            return refl * a + blk * (1 - a)

        def replicate_case():
            return rows("replicate", 0.0)

        resampled = jax.lax.switch(
            mode_i, [none_case, black_case, color_case, reflect_case,
                     replicate_case])
        return _resample_axis_cubic(resampled, x_coords, axis=2,
                                    mode="replicate", fill=0.0)

    out = jax.vmap(one)(video, mode, pad_top, pad_bot, alpha, color)
    return jnp.clip(out, 0.0, 255.0)


# ------------------------------------------------------- randaugment ops ---

def _luma(img):
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def _blend(a, b, factor):
    """PIL Image.blend semantics used by enhancers: b + factor * (a - b)."""
    return b + factor * (a - b)


def _op_autocontrast(clip, _mag, _key):
    lo = jnp.min(clip, axis=(0, 1, 2), keepdims=True)
    hi = jnp.max(clip, axis=(0, 1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    return jnp.where(hi > lo, (clip - lo) * scale, clip)


def _op_equalize(clip, _mag, _key):
    """PIL ImageOps.equalize per channel, LUT computed over the whole clip
    (clip-consistent, like applying the same PIL transform per frame would
    be per-frame; clip-level is the batched analogue)."""
    def chan(c):
        vals = jnp.clip(c, 0, 255).astype(jnp.int32).reshape(-1)
        h = jnp.bincount(vals, length=256)
        step = (jnp.sum(h) - h[255]) // 255
        csum = jnp.concatenate([jnp.zeros(1, h.dtype), jnp.cumsum(h)[:-1]])
        lut = jnp.clip((step // 2 + csum) // jnp.maximum(step, 1), 0, 255)
        out = lut[jnp.clip(c, 0, 255).astype(jnp.int32)].astype(c.dtype)
        return jnp.where(step == 0, c, out)
    return jnp.stack([chan(clip[..., i]) for i in range(clip.shape[-1])],
                     axis=-1)


def _op_invert(clip, _mag, _key):
    return 255.0 - clip


def _enhance_factor(mag, key):
    """timm increasing variant: 1 +/- 0.9 * mag/10."""
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    return 1.0 + sign * 0.9 * mag / 10.0


def _op_color(clip, mag, key):
    return _blend(clip, jnp.broadcast_to(_luma(clip), clip.shape),
                  _enhance_factor(mag, key))


def _op_contrast(clip, mag, key):
    # PIL Contrast: blend with the mean of the L image (per frame)
    mean = jnp.mean(_luma(clip), axis=(1, 2), keepdims=True)
    # PIL computes mean on the uint8 L image then uses it as flat gray
    return _blend(clip, jnp.broadcast_to(mean, clip.shape),
                  _enhance_factor(mag, key))


def _op_brightness(clip, mag, key):
    return clip * _enhance_factor(mag, key)


_SMOOTH_K = jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0


def _op_sharpness(clip, mag, key):
    t, h, w, c = clip.shape
    x = clip.transpose(0, 3, 1, 2).reshape(t * c, 1, h, w)
    sm = jax.lax.conv_general_dilated(
        x, _SMOOTH_K[None, None], (1, 1), "SAME")
    sm = sm.reshape(t, c, h, w).transpose(0, 2, 3, 1)
    # PIL SMOOTH leaves the 1px border unfiltered
    border_y = (jnp.arange(h) == 0) | (jnp.arange(h) == h - 1)
    border_x = (jnp.arange(w) == 0) | (jnp.arange(w) == w - 1)
    border = border_y[:, None] | border_x[None, :]
    sm = jnp.where(border[None, :, :, None], clip, sm)
    return _blend(clip, sm, _enhance_factor(mag, key))


def _warp_clip(clip, coeffs):
    """PIL AFFINE inverse-map warp: out(x,y) <- src(a x + b y + c,
    d x + e y + f), bilinear, gray fill."""
    t, h, w, _ = clip.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    a, b, c, d, e, f = coeffs
    sx = a * xs + b * ys + c
    sy = d * xs + e * ys + f
    return jax.vmap(lambda img: _bilinear_sample(img, sx, sy, GRAY_FILL))(clip)


def _op_rotate(clip, mag, key):
    deg = mag / 10.0 * 30.0
    deg = jnp.where(jax.random.bernoulli(key), deg, -deg)
    rad = jnp.deg2rad(deg)
    h, w = clip.shape[1], clip.shape[2]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    # inverse rotation about center
    a, b = cos, sin
    d, e = -sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return _warp_clip(clip, (a, b, c, d, e, f))


def _op_shear_x(clip, mag, key):
    s = mag / 10.0 * 0.3
    s = jnp.where(jax.random.bernoulli(key), s, -s)
    return _warp_clip(clip, (1.0, s, 0.0, 0.0, 1.0, 0.0))


def _op_shear_y(clip, mag, key):
    s = mag / 10.0 * 0.3
    s = jnp.where(jax.random.bernoulli(key), s, -s)
    return _warp_clip(clip, (1.0, 0.0, 0.0, s, 1.0, 0.0))


_RA_OPS = [_op_autocontrast, _op_equalize, _op_invert, _op_rotate,
           _op_color, _op_contrast, _op_brightness, _op_sharpness,
           _op_shear_x, _op_shear_y]


def rand_augment_drive(video, key, *, magnitude: float = 6.0,
                       mstd: float = 0.5, num_layers: int = 3,
                       prob: float = 0.5):
    """'rand-m6-n3-mstd0.5-inc1' over DRIVE_TRANSFORMS, clip-consistent.

    Per sample: ``num_layers`` ops drawn uniformly with replacement, each
    applied with probability ``prob``, magnitude ~ N(magnitude, mstd)
    clipped to [0, 10] (timm rand_augment semantics).
    """
    B = video.shape[0]
    keys = jax.random.split(key, B)

    def per_clip(clip, k):
        def layer(i, state):
            clip, k = state
            k, kop, kmag, kapply, kparam = jax.random.split(k, 5)
            op_idx = jax.random.randint(kop, (), 0, NUM_RA_OPS)
            mag = jnp.clip(magnitude + mstd * jax.random.normal(kmag),
                           0.0, 10.0)
            out = jax.lax.switch(op_idx, list(_RA_OPS), clip, mag,
                                 kparam)
            out = jnp.clip(out, 0.0, 255.0)
            use = jax.random.bernoulli(kapply, prob)
            return jnp.where(use, out, clip), k

        clip, _ = jax.lax.fori_loop(0, num_layers, layer, (clip, k))
        return clip

    return jax.vmap(per_clip)(video, keys)


# -------------------------------------------------------- random erasing ---

def random_erasing(video, key, *, probability: float = 0.25,
                   min_area: float = 0.02, max_area: float = 1 / 3,
                   min_aspect: float = 0.01):
    """Pixel-mode cube RandomErasing on normalized video (B, T, H, W, C):
    per sample, with ``probability``, one random rect (same across frames)
    filled with per-pixel standard-normal noise
    (random_erasing.py:27-173, mode='pixel', cube=True, count=1)."""
    B, T, H, W, C = video.shape
    karea, kaspect, ktop, kleft, kdo, knoise = jax.random.split(key, 6)
    area = jax.random.uniform(karea, (B,), minval=min_area,
                              maxval=max_area) * (H * W)
    log_ar = jax.random.uniform(
        kaspect, (B,), minval=jnp.log(min_aspect),
        maxval=jnp.log(1.0 / min_aspect))
    ar = jnp.exp(log_ar)
    h = jnp.clip(jnp.round(jnp.sqrt(area * ar)), 1, H - 1).astype(jnp.int32)
    w = jnp.clip(jnp.round(jnp.sqrt(area / ar)), 1, W - 1).astype(jnp.int32)
    top = (jax.random.uniform(ktop, (B,)) * (H - h)).astype(jnp.int32)
    left = (jax.random.uniform(kleft, (B,)) * (W - w)).astype(jnp.int32)
    do = jax.random.bernoulli(kdo, probability, (B,))
    noise = jax.random.normal(knoise, video.shape, video.dtype)

    ys = jnp.arange(H)[None, :]
    xs = jnp.arange(W)[None, :]
    row_m = (ys >= top[:, None]) & (ys < (top + h)[:, None])      # (B, H)
    col_m = (xs >= left[:, None]) & (xs < (left + w)[:, None])    # (B, W)
    mask = (row_m[:, None, :, None, None] & col_m[:, None, None, :, None]
            & do[:, None, None, None, None])
    return jnp.where(mask, noise, video)


# ------------------------------------------------------------- pipeline ---

@functools.partial(jax.jit,
                   static_argnames=("crop_size", "magnitude", "num_layers",
                                    "reprob", "dtype"))
def train_augment(video_u8, key, *, crop_size: int = 224,
                  magnitude: float = 6.0, num_layers: int = 3,
                  reprob: float = 0.25, dtype=jnp.float32):
    """Full train-path augmentation: (B, T, H, W, C) uint8 full-res frames
    -> normalized, augmented (B, T, crop, crop, C) in ``dtype``.

    Order matches _aug_frame (dota.py:288-331): pad+resize -> RandAugment
    -> /255 + ImageNet normalize -> RandomErasing."""
    k1, k2, k3 = jax.random.split(key, 3)
    x = video_u8.astype(jnp.float32)
    x = pad_wide_and_resize(x, k1, crop_size)
    x = rand_augment_drive(x, k2, magnitude=magnitude,
                           num_layers=num_layers)
    x = x / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    if reprob > 0:
        x = random_erasing(x, k3, probability=reprob)
    return x.astype(dtype)


# --------------------------------------------- pretrain (MAE/DAPT) paths ---

def group_multi_scale_crop(video, key, out_size: int,
                           scales=(1.0, 0.875, 0.75, 0.66),
                           max_distort: int = 1):
    """TSN-style GroupMultiScaleCrop as a batched device op.

    Semantics of /root/reference/transforms.py:91-165: crop sizes =
    base_size * scales (snapped to out_size when within 3px), (w, h) pairs
    with |i - j| <= max_distort, uniform pair choice, one of 13 fixed
    offsets, bilinear resize to out_size; clip-consistent per sample.
    video: (B, T, H, W, C) float [0,255].
    """
    B, T, H, W, C = video.shape
    base = min(H, W)
    sizes = [int(base * s) for s in scales]
    crop_hs = [out_size if abs(s - out_size) < 3 else s for s in sizes]
    crop_ws = [out_size if abs(s - out_size) < 3 else s for s in sizes]
    pairs = [(w, h) for i, h in enumerate(crop_hs)
             for j, w in enumerate(crop_ws) if abs(i - j) <= max_distort]
    pair_arr = jnp.asarray(pairs, jnp.float32)              # (P, 2) [w, h]

    kpair, koff = jax.random.split(key)
    pair_idx = jax.random.randint(kpair, (B,), 0, len(pairs))
    off_idx = jax.random.randint(koff, (B,), 0, 13)

    crop_w = pair_arr[pair_idx, 0]                          # (B,)
    crop_h = pair_arr[pair_idx, 1]
    w_step = jnp.floor((W - crop_w) / 4.0)
    h_step = jnp.floor((H - crop_h) / 4.0)
    # 13 fixed offsets (transforms.py:139-165) as multiples of the steps
    mult = jnp.asarray([
        [0, 0], [4, 0], [0, 4], [4, 4], [2, 2],            # corners+center
        [0, 2], [4, 2], [2, 4], [2, 0],                    # side centers
        [1, 1], [3, 1], [1, 3], [3, 3],                    # quarters
    ], jnp.float32)                                        # (13, 2) [w, h]
    off_w = mult[off_idx, 0] * w_step                      # (B,)
    off_h = mult[off_idx, 1] * h_step

    xs_out = jnp.arange(out_size, dtype=jnp.float32)

    def one(clip, cw, ch, ow, oh):
        # PIL crop + resize(BILINEAR): src = off + (out + 0.5)*crop/out - 0.5
        sx = ow + (xs_out + 0.5) * (cw / out_size) - 0.5
        sy = oh + (xs_out + 0.5) * (ch / out_size) - 0.5
        gx, gy = jnp.meshgrid(sx, sy)                       # (out, out)
        return jax.vmap(
            lambda img: _bilinear_sample(img, gx, gy, 0.0))(clip)

    return jax.vmap(one)(video, crop_w, crop_h, off_w, off_h)


@functools.partial(jax.jit, static_argnames=("crop_size", "dtype"))
def pretrain_augment_orig(video_u8, key, *, crop_size: int = 224,
                          dtype=jnp.float32):
    """MAE 'orig' pipeline (datasets_frame.py:13-39): GroupMultiScaleCrop
    [1, .875, .75, .66] -> /255 -> ImageNet normalize."""
    x = group_multi_scale_crop(video_u8.astype(jnp.float32), key, crop_size)
    x = x / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x.astype(dtype)


@functools.partial(jax.jit, static_argnames=("crop_size", "magnitude",
                                             "num_layers", "dtype"))
def pretrain_augment_align(video_u8, key, *, crop_size: int = 224,
                           magnitude: float = 6.0, num_layers: int = 3,
                           dtype=jnp.float32):
    """DAPT 'transforms_finetune_align' pipeline (dota.py:697-716 +
    DataAugmentationForVideoMAE_LightCrop): pad_wide -> DRIVE RandAugment
    on 70% of clips -> light GroupMultiScaleCrop -> normalize."""
    k1, k2, k3, kgate = jax.random.split(key, 4)
    B = video_u8.shape[0]
    x = video_u8.astype(jnp.float32)
    x = pad_wide_and_resize(x, k1, crop_size)
    aug = rand_augment_drive(x, k2, magnitude=magnitude,
                             num_layers=num_layers)
    use_aug = jax.random.uniform(kgate, (B,)) > 0.3        # dota.py:706
    x = jnp.where(use_aug[:, None, None, None, None], aug, x)
    x = group_multi_scale_crop(
        x, k3, crop_size, scales=(1, 1, 0.975, 0.95, 0.9, 0.875, 0.85))
    x = x / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x.astype(dtype)


# ------------------------------------- action-recognition (class) paths ---

def _op_posterize(clip, mag, _key):
    """Keep (4 - int(mag/10*4)) high bits — PosterizeIncreasing range
    [4..0] (rand_augment.py:247-252), NOT the original-paper [4..8]."""
    bits = jnp.clip(4.0 - jnp.floor(mag / 10.0 * 4.0), 0, 4)
    shift = (8 - bits).astype(jnp.int32)
    vals = jnp.clip(clip, 0, 255).astype(jnp.int32)
    return ((vals >> shift) << shift).astype(clip.dtype)


def _op_solarize(clip, mag, _key):
    """Invert pixels above threshold 256 - mag/10*256 (timm increasing)."""
    thresh = 256.0 - mag / 10.0 * 256.0
    return jnp.where(clip >= thresh, 255.0 - clip, clip)


def _op_translate_x(clip, mag, key):
    frac = mag / 10.0 * 0.45
    frac = jnp.where(jax.random.bernoulli(key), frac, -frac)
    shift = frac * clip.shape[2]
    return _warp_clip(clip, (1.0, 0.0, shift, 0.0, 1.0, 0.0))


def _op_translate_y(clip, mag, key):
    frac = mag / 10.0 * 0.45
    frac = jnp.where(jax.random.bernoulli(key), frac, -frac)
    shift = frac * clip.shape[1]
    return _warp_clip(clip, (1.0, 0.0, 0.0, 0.0, 1.0, shift))


_RA_FULL_OPS = _RA_OPS + [_op_posterize, _op_solarize,
                          _op_translate_x, _op_translate_y]


def rand_augment_full(video, key, *, magnitude: float = 7.0,
                      mstd: float = 0.5, num_layers: int = 4,
                      prob: float = 0.5):
    """Unrestricted RandAugment (timm 'rand-m7-n4-mstd0.5-inc1' as used by
    the action-recognition pipeline, kinetics.py _aug_frame) — the DRIVE
    10 ops plus posterize/solarize/translate."""
    B = video.shape[0]
    keys = jax.random.split(key, B)
    n_ops = len(_RA_FULL_OPS)

    def per_clip(clip, k):
        def layer(i, state):
            clip, k = state
            k, kop, kmag, kapply, kparam = jax.random.split(k, 5)
            op_idx = jax.random.randint(kop, (), 0, n_ops)
            mag = jnp.clip(magnitude + mstd * jax.random.normal(kmag),
                           0.0, 10.0)
            out = jax.lax.switch(op_idx, list(_RA_FULL_OPS), clip, mag,
                                 kparam)
            out = jnp.clip(out, 0.0, 255.0)
            use = jax.random.bernoulli(kapply, prob)
            return jnp.where(use, out, clip), k

        clip, _ = jax.lax.fori_loop(0, num_layers, layer, (clip, k))
        return clip

    return jax.vmap(per_clip)(video, keys)


def random_resized_crop(video, key, out_size: int,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision-style RandomResizedCrop, clip-consistent per sample
    (video_transforms.random_resized_crop used by kinetics _aug_frame)."""
    B, T, H, W, C = video.shape
    karea, kratio, kx, ky = jax.random.split(key, 4)
    area = H * W
    target = jax.random.uniform(karea, (B,), minval=scale[0],
                                maxval=scale[1]) * area
    log_r = jax.random.uniform(kratio, (B,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    w = jnp.sqrt(target * r)
    h = jnp.sqrt(target / r)
    w = jnp.clip(w, 8, W)
    h = jnp.clip(h, 8, H)
    x0 = jax.random.uniform(kx, (B,)) * (W - w)
    y0 = jax.random.uniform(ky, (B,)) * (H - h)

    xs_out = jnp.arange(out_size, dtype=jnp.float32)

    def one(clip, cw, ch, ox, oy):
        sx = ox + (xs_out + 0.5) * (cw / out_size) - 0.5
        sy = oy + (xs_out + 0.5) * (ch / out_size) - 0.5
        gx, gy = jnp.meshgrid(sx, sy)
        return jax.vmap(lambda img: _bilinear_sample(img, gx, gy, 0.0))(clip)

    return jax.vmap(one)(video, w, h, x0, y0)


def random_hflip(video, key, prob: float = 0.5):
    """Per-sample horizontal flip, clip-consistent."""
    B = video.shape[0]
    do = jax.random.bernoulli(key, prob, (B,))
    flipped = video[:, :, :, ::-1]
    return jnp.where(do[:, None, None, None, None], flipped, video)


def mixup_cutmix(video, labels, key, *, num_classes: int,
                 mixup_alpha: float = 0.8, cutmix_alpha: float = 1.0,
                 switch_prob: float = 0.5, prob: float = 1.0,
                 label_smoothing: float = 0.1):
    """Batch mixup/cutmix with soft targets (reference mixup.py:100-316,
    active only in class fine-tuning, run_class_finetuning.py:300-307).

    Mixes each sample with its batch-flipped partner; one lambda per batch
    (timm Mixup default batch mode).  Returns (mixed_video, soft_targets).
    """
    B = video.shape[0]
    kuse, kswitch, klam1, klam2, kx, ky = jax.random.split(key, 6)
    onehot = jax.nn.one_hot(labels, num_classes)
    off = label_smoothing / num_classes
    onehot = onehot * (1.0 - label_smoothing) + off

    use = jax.random.bernoulli(kuse, prob)
    use_cutmix = jax.random.bernoulli(kswitch, switch_prob)
    lam_mix = jax.random.beta(klam1, mixup_alpha, mixup_alpha)
    lam_cut = jax.random.beta(klam2, cutmix_alpha, cutmix_alpha)

    flipped = video[::-1]
    H, W = video.shape[2], video.shape[3]

    # mixup blend
    mixed_blend = video * lam_mix + flipped * (1.0 - lam_mix)

    # cutmix box (timm rand_bbox): area ratio 1-lam, centered randomly
    cut_rat = jnp.sqrt(1.0 - lam_cut)
    cut_h = (H * cut_rat).astype(jnp.int32)
    cut_w = (W * cut_rat).astype(jnp.int32)
    cy = jax.random.randint(ky, (), 0, H)
    cx = jax.random.randint(kx, (), 0, W)
    y1 = jnp.clip(cy - cut_h // 2, 0, H)
    y2 = jnp.clip(cy + cut_h // 2, 0, H)
    x1 = jnp.clip(cx - cut_w // 2, 0, W)
    x2 = jnp.clip(cx + cut_w // 2, 0, W)
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    in_box = ((ys[:, None] >= y1) & (ys[:, None] < y2)
              & (xs[None, :] >= x1) & (xs[None, :] < x2))
    mixed_cut = jnp.where(in_box[None, None, :, :, None], flipped, video)
    lam_cut_eff = 1.0 - ((y2 - y1) * (x2 - x1)) / (H * W)

    mixed = jnp.where(use_cutmix, mixed_cut, mixed_blend)
    lam = jnp.where(use_cutmix, lam_cut_eff, lam_mix)
    targets = onehot * lam + onehot[::-1] * (1.0 - lam)

    video_out = jnp.where(use, mixed, video)
    targets_out = jnp.where(use, targets, onehot)
    return video_out, targets_out
