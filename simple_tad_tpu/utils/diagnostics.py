"""Training diagnostics: per-layer/per-head gradient-norm tracing and
profiler hooks.

Behavioral reference: the reference's research-specific grad-norm tracer
(/root/reference/utils.py:813-1011) dumps per-layer qkv/proj/patch-embed
gradient norms to grad_norms/gradnorm_ep{N}.npz
(run_frame_finetuning.py:643-647); plus the per-step iter/data-time meters
and memory printer (§5a).  TPU-native: the norms reduce over the scanned
block stack in one vectorized pass on device; profiling uses jax.profiler
traces (viewable in TensorBoard / XProf).
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def grad_norm_summary(grads: Dict[str, Any], num_heads: int
                      ) -> Dict[str, jnp.ndarray]:
    """Per-layer (and per-head for qkv) gradient norms from a scanned-block
    grads pytree.  Keys mirror the reference npz contents:
      qkv (L, H, 3)  — per layer, per head, per {q, k, v}
      proj (L,)      — attention output projection
      fc1/fc2 (L,)   — MLP
      patch_embed () — embedding kernel
    Everything computes on device in one fused pass; call np.asarray on
    the result to materialize.
    """
    out: Dict[str, jnp.ndarray] = {}
    blocks = grads.get("blocks")
    if blocks is not None:
        qkv = blocks["attn"]["qkv_kernel"] if "qkv_kernel" in blocks["attn"] \
            else blocks["attn"]["qkv"]["kernel"]
        L, C = qkv.shape[0], qkv.shape[1]
        head_dim = C // num_heads
        # (L, C, 3C) -> (L, C, 3, H, hd): norms over (C, hd)
        q3 = qkv.reshape(L, C, 3, num_heads, head_dim)
        out["qkv"] = jnp.sqrt(
            jnp.sum(jnp.square(q3.astype(jnp.float32)), axis=(1, 4))
        ).transpose(0, 2, 1)                                  # (L, H, 3)
        out["proj"] = jnp.sqrt(jnp.sum(jnp.square(
            blocks["attn"]["proj"]["kernel"].astype(jnp.float32)),
            axis=(1, 2)))
        if "mlp" in blocks:
            out["fc1"] = jnp.sqrt(jnp.sum(jnp.square(
                blocks["mlp"]["fc1"]["kernel"].astype(jnp.float32)),
                axis=(1, 2)))
            out["fc2"] = jnp.sqrt(jnp.sum(jnp.square(
                blocks["mlp"]["fc2"]["kernel"].astype(jnp.float32)),
                axis=(1, 2)))
    pe = grads.get("patch_embed")
    if pe is not None:
        out["patch_embed"] = jnp.sqrt(
            jnp.sum(jnp.square(pe["kernel"].astype(jnp.float32))))
    return out


class GradNormAccumulator:
    """Accumulates grad-norm summaries over an epoch and writes the npz
    artifact the reference's analysis notebooks expect."""

    def __init__(self, output_dir: Optional[str], num_heads: int):
        self.dir = (os.path.join(output_dir, "grad_norms")
                    if output_dir else None)
        self.num_heads = num_heads
        self.sums: Dict[str, np.ndarray] = {}
        self.count = 0

    def update(self, grads) -> None:
        summary = grad_norm_summary(grads, self.num_heads)
        for k, v in summary.items():
            v = np.asarray(v, np.float64)
            self.sums[k] = self.sums.get(k, 0.0) + v
        self.count += 1

    def save_epoch(self, epoch: int) -> Optional[str]:
        if self.dir is None or not self.count:
            return None
        os.makedirs(self.dir, exist_ok=True)
        path = os.path.join(self.dir, f"gradnorm_ep{epoch}.npz")
        np.savez(path, count=self.count,
                 **{k: v for k, v in self.sums.items()})
        self.sums, self.count = {}, 0
        return path


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context (TPU equivalent of the reference's manual
    CUDA meters, SURVEY.md §5a).  No-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory usage in MB (print_memory_usage equivalent,
    utils.py:624-635)."""
    stats = {}
    for d in jax.local_devices():
        try:
            m = d.memory_stats()
        except Exception:
            m = None
        if m is None:
            # the axon serving relay returns None (no allocator stats
            # surface); callers report the column as unavailable
            stats[str(d)] = {}
        else:
            stats[str(d)] = {
                "bytes_in_use_mb": m.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_mb": m.get("peak_bytes_in_use", 0) / 2**20,
            }
    return stats
