"""Device-side batched image preprocessing (the reference's CPU-bound
cv2/PIL chain re-expressed as XLA ops — BASELINE.json north star).

Eval-path parity target (/root/reference/dota.py:333-360, 443-460):
cv2.resize(..., INTER_CUBIC) to crop_size, BGR->RGB, /255, ImageNet
mean/std normalize.  jax.image.resize(method='cubic', antialias=False)
matches cv2 INTER_CUBIC coordinate mapping (half-pixel, edge clamp, Keys
a=-0.5 kernel); remaining differences are cv2's fixed-point rounding
(<~1/255 per pixel) — validated in tests/test_image_ops.py and bounded on
logits, with a cv2-on-host fallback in the data layer for strict parity
runs (SURVEY.md §7 hard part #2).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CENTER_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
CENTER_STD = np.array([0.5, 0.5, 0.5], np.float32)


def resize_bicubic(frames: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic resize of (..., H, W, C) frames to (..., size[0], size[1], C)."""
    out_shape = frames.shape[:-3] + (size[0], size[1], frames.shape[-1])
    return jax.image.resize(frames.astype(jnp.float32), out_shape,
                            method="cubic", antialias=False)


def normalize(frames: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD,
              dtype=jnp.float32) -> jnp.ndarray:
    """[0,255] float frames -> normalized; matches tensor_normalize
    (dota.py:443-460): /255, -mean, /std."""
    x = frames.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x.astype(dtype)


@functools.partial(jax.jit, static_argnames=("size", "dtype"))
def eval_preprocess(frames_u8: jnp.ndarray, size: Tuple[int, int] = (224, 224),
                    dtype=jnp.float32) -> jnp.ndarray:
    """uint8 RGB frames (..., H, W, C) -> resized + normalized video."""
    x = resize_bicubic(frames_u8, size)
    x = jnp.clip(x, 0.0, 255.0)
    return normalize(x, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("dtype",))
def normalize_only(frames_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 RGB frames already at target size -> normalized video."""
    return normalize(frames_u8, dtype=dtype)


def make_windows(frames: jnp.ndarray, window_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather sliding windows from a decoded clip on device.

    frames: (F, H, W, C); window_idx: (W, T) int32 frame indices from the
    sequencer.  Returns (W, T, H, W, C).  This is the decode-cache +
    device-windowing design (SURVEY.md §7): each source frame is decoded and
    transferred once even though stride-1 eval reuses it in up to T windows —
    the reference re-decodes every frame T times
    (/root/reference/dota.py:333-360 runs per window).
    """
    return jnp.take(frames, window_idx, axis=0)


def pad_to_square(frames: jnp.ndarray, mode: str = "black",
                  fill: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """Pad (..., H, W, C) frames to square along the shorter side.

    Device-side equivalent of pad_wide_clips' deterministic modes
    (/root/reference/video_transforms.py:1301-1337): 'black' zero-pads,
    'color' fills with ``fill``, 'replicate' repeats the edge rows.
    The random mode/offset choice lives in the host augmentation policy;
    this op applies a chosen mode symmetrically (even split).
    """
    h, w = frames.shape[-3], frames.shape[-2]
    if h == w:
        return frames
    diff = abs(h - w)
    lo, hi = diff // 2, diff - diff // 2
    axis = -3 if h < w else -2
    pad_width = [(0, 0)] * frames.ndim
    pad_width[axis] = (lo, hi)
    if mode == "replicate":
        return jnp.pad(frames, pad_width, mode="edge")
    if mode == "color" and fill is not None:
        out = jnp.pad(frames, pad_width)
        # overwrite padded bands with fill color
        fill_arr = jnp.asarray(fill, frames.dtype)
        idx = jnp.arange(out.shape[axis])
        band = (idx < lo) | (idx >= out.shape[axis] - hi)
        band = band.reshape([-1 if i == axis % out.ndim else 1
                             for i in range(out.ndim)])
        return jnp.where(band, fill_arr, out)
    return jnp.pad(frames, pad_width)   # black
