"""Shared deterministic weight/input generation for reference-golden tests.

Used by BOTH scripts/make_goldens.py (which executes the actual reference
code at /root/reference on CPU to produce tests/goldens/*.npz) and
tests/test_golden_parity.py (which regenerates the identical torch state
dict from the npz manifest, converts it with our converters, and compares
our flax forward against the reference-produced logits).

Everything here must be platform-deterministic: PCG64 streams seeded from
crc32 of the parameter name, no torch RNG, no hash().
"""

from __future__ import annotations

import json
import zlib

import numpy as np

GOLDEN_DIR = "tests/goldens"


def param_fill(name: str, shape) -> np.ndarray:
    """Deterministic realistic-magnitude values for a parameter.

    Norm scales land near 1, LayerScale gammas near 0.1, biases near 0,
    everything else ~N(0, 0.02) — magnitudes where fp32 CPU (reference)
    and fp32 TPU-style (ours) forwards agree to ~1e-5.
    """
    seed = zlib.crc32(name.encode("utf-8"))
    rng = np.random.Generator(np.random.PCG64(seed))
    arr = rng.standard_normal(int(np.prod(shape)) or 1)
    arr = arr[: int(np.prod(shape))].reshape(shape).astype(np.float32)
    leaf = name.rsplit(".", 1)[-1]
    stem = name.rsplit(".", 2)[-2] if "." in name else ""
    if leaf == "weight" and ("norm" in stem or stem in ("ln", "rms")):
        return (1.0 + 0.1 * arr).astype(np.float32)
    if leaf == "gamma" or stem in ("ls1", "ls2"):
        return (0.1 + 0.02 * arr).astype(np.float32)
    if leaf == "bias":
        return (0.02 * arr).astype(np.float32)
    return (0.02 * arr).astype(np.float32)


def build_state_dict(manifest: dict) -> dict:
    """manifest: {param_name: shape_list} -> {param_name: np.float32 array}"""
    return {k: param_fill(k, tuple(v)) for k, v in manifest.items()}


def input_video(seed: int, batch: int, frames: int, size: int) -> np.ndarray:
    """(B, C, T, H, W) fp32 ~N(0,1) — torch layout; transpose for flax."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal(
        (batch, 3, frames, size, size)).astype(np.float32)


def tube_mask(seed: int, batch: int, n_patches: int,
              n_masked: int) -> np.ndarray:
    """Boolean (B, n_patches) mask with exactly n_masked True per row."""
    rng = np.random.Generator(np.random.PCG64(seed))
    out = np.zeros((batch, n_patches), bool)
    for b in range(batch):
        idx = rng.permutation(n_patches)[:n_masked]
        out[b, idx] = True
    return out


def save_golden(path: str, *, logits: np.ndarray, manifest: dict,
                meta: dict) -> None:
    np.savez_compressed(path, logits=logits.astype(np.float32),
                        manifest=json.dumps(manifest),
                        meta=json.dumps(meta))


def load_golden(path: str):
    z = np.load(path, allow_pickle=False)
    return (z["logits"],
            json.loads(str(z["manifest"])),
            json.loads(str(z["meta"])))
