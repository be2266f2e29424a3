"""Threaded zip -> JPEG/PNG frame decoding (host side).

Replaces the reference's sequential per-window zip reads
(/root/reference/dota.py:333-360) with a clip-level batch decode: one zip
open, all members read, cv2.imdecode in a thread pool (cv2 releases the
GIL).  For sliding-window eval this pairs with device-side windowing
(simple_tad_tpu.ops.image.make_windows) so every source frame is decoded
exactly once instead of up to 16 times.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import zipfile
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

_POOL: Optional[cf.ThreadPoolExecutor] = None


def _pool() -> cf.ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = cf.ThreadPoolExecutor(
            max_workers=int(os.environ.get("SIMPLE_TAD_DECODE_THREADS",
                                           os.cpu_count() or 8)))
    return _POOL


def _decode_one(buf: bytes, resize: Optional[Tuple[int, int]],
                interpolation: int) -> np.ndarray:
    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise IOError("failed to decode frame")
    if resize is not None:
        img = cv2.resize(img, dsize=resize, interpolation=interpolation)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def decode_zip_frames(zip_path: str, names: Sequence[str],
                      resize: Optional[Tuple[int, int]] = None,
                      interpolation: int = cv2.INTER_CUBIC
                      ) -> List[np.ndarray]:
    """Read ``names`` members from ``zip_path`` and decode to RGB uint8
    (H, W, 3) arrays, optionally cv2-resizing to ``resize`` (w, h).

    Uses the native C++ decoder (native/decoder.cpp: cached zip directory +
    threaded libjpeg) when built; falls back to python zipfile + a cv2
    thread pool.
    """
    from simple_tad_tpu.data import native
    frames = native.decode_zip_frames_native(zip_path, names)
    if frames is not None:
        if resize is None:
            return list(frames)
        futs = [_pool().submit(cv2.resize, f, resize, None, 0, 0,
                               interpolation) for f in frames]
        return [f.result() for f in futs]

    with zipfile.ZipFile(zip_path, "r") as zf:
        raw = [zf.read(n) for n in names]
    futs = [_pool().submit(_decode_one, b, resize, interpolation) for b in raw]
    return [f.result() for f in futs]


def decode_scaled(zip_path: str, names: Sequence[str], crop_size: int,
                  resize_scale: float = 1.0, short_side_cap: int = 320
                  ) -> List[np.ndarray]:
    """Train-path decode: scale so the short side hits
    crop_size*resize_scale, mirroring /root/reference/dota.py:349-355
    (short side capped at ``short_side_cap`` before computing the factor)."""
    with zipfile.ZipFile(zip_path, "r") as zf:
        raw = [zf.read(n) for n in names]

    def work(buf):
        img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise IOError("failed to decode frame")
        short = min(min(img.shape[:2]), short_side_cap)
        k = crop_size * resize_scale / short
        img = cv2.resize(img, dsize=(0, 0), fx=k, fy=k,
                         interpolation=cv2.INTER_CUBIC)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    futs = [_pool().submit(work, b) for b in raw]
    return [f.result() for f in futs]
