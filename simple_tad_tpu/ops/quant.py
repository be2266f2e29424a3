"""Int8 quantized matmul path for inference (w8a8, per-channel weights,
per-token dynamic activations).

The v5e MXU runs int8 x int8 at 2x the bf16 rate (394 vs 197 TOPS); the
transformer's GEMMs (qkv/proj/fc1/fc2 — ~75% of model FLOPs outside
attention scores) can take that path at inference with dynamic activation
quantization:

  y = (q8(x) @ q8(W)) * s_x * s_w        accumulate int32, rescale fp32

Weights quantize offline per OUTPUT channel (absmax/127); activations
quantize per token row on the fly.  Accuracy: symmetric per-channel w8a8
is the standard ViT recipe; validate AUC on real data before production
(exposed as an opt-in, `quant8=True`).

MEASURED (v5e, ViT-B batch-96 eval program): 170 windows/s vs 200 for
bf16 — the un-fused dynamic activation quantization (abs-max + round +
clip VPU passes per GEMM) costs more than the 2x int8 MXU rate saves.
Kept as a correctness-tested opt-in; making it pay requires fusing the
activation quantization into a Pallas GEMM kernel (future work).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(in, out) fp kernel -> (int8 kernel, (out,) fp32 scale)."""
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-12)
    w_i8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return w_i8, scale.astype(np.float32)


def int8_matmul(x, w_i8, w_scale):
    """x: (..., K) float; w_i8: (K, N) int8; w_scale: (N,) -> (..., N) f32.

    Per-row dynamic activation quantization; int32 accumulation on the
    int8 MXU path.
    """
    x32 = x.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    x_scale = jnp.maximum(x_scale, 1e-12)
    x_i8 = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_i8, w_i8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * x_scale * w_scale


def quantize_vit_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """fp32 VisionTransformer params -> quantized pytree: every block GEMM
    kernel becomes {*_q: int8, *_scale: f32(out,)} (stacked over depth);
    embeddings, norms, and the head stay fp32.  Feed to a model built with
    ``quant=True``."""
    out = jax.tree.map(lambda x: x, params)   # shallow-ish copy
    blocks = dict(out["blocks"])
    attn = dict(blocks["attn"])
    mlp = {k: dict(v) for k, v in blocks["mlp"].items()}

    def stack_quant(kernels):
        qs, scales = [], []
        for i in range(kernels.shape[0]):
            q, s = quantize_weight(np.asarray(kernels[i]))
            qs.append(q)
            scales.append(s)
        return (jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(scales)))

    qkv_q, qkv_s = stack_quant(np.asarray(attn.pop("qkv_kernel")))
    attn["qkv_q"] = qkv_q
    attn["qkv_scale"] = qkv_s
    proj = dict(attn["proj"])
    pq, ps = stack_quant(np.asarray(proj.pop("kernel")))
    proj["kernel_q"] = pq
    proj["kernel_scale"] = ps
    attn["proj"] = proj
    for name in ("fc1", "fc2"):
        sub = mlp[name]
        kq, ks = stack_quant(np.asarray(sub.pop("kernel")))
        sub["kernel_q"] = kq
        sub["kernel_scale"] = ks
    blocks["attn"] = attn
    blocks["mlp"] = mlp
    out["blocks"] = blocks
    return jax.device_put(out)
