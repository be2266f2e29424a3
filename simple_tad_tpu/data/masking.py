"""Tube masking for masked-video-modeling pre-training.

Behavioral reference: /root/reference/masking_generator.py — one random
mask over the H*W patch grid per sample, tiled identically across all
temporal slots.  Vectorized to emit whole batches at once (the reference
generates one mask per __getitem__ on the dataloader worker).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class TubeMaskingGenerator:
    """np.random-based per-sample generator (reference-compatible API)."""

    def __init__(self, input_size: Tuple[int, int, int], mask_ratio: float):
        self.frames, self.height, self.width = input_size
        self.num_patches_per_frame = self.height * self.width
        self.total_patches = self.frames * self.num_patches_per_frame
        self.num_masks_per_frame = int(mask_ratio * self.num_patches_per_frame)
        self.total_masks = self.frames * self.num_masks_per_frame

    def __call__(self, rng: np.random.Generator = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        per_frame = np.zeros(self.num_patches_per_frame, bool)
        per_frame[rng.choice(self.num_patches_per_frame,
                             self.num_masks_per_frame, replace=False)] = True
        return np.tile(per_frame, self.frames)

    def batch(self, batch_size: int,
              rng: np.random.Generator = None) -> np.ndarray:
        """(B, total_patches) bool, True = masked; equal count per sample."""
        rng = rng or np.random.default_rng()
        n = self.num_patches_per_frame
        k = self.num_masks_per_frame
        # vectorized shuffle: argsort of uniform noise per row
        order = np.argsort(rng.random((batch_size, n)), axis=1)
        per_frame = np.zeros((batch_size, n), bool)
        np.put_along_axis(per_frame, order[:, :k], True, axis=1)
        return np.tile(per_frame, (1, self.frames))
