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

MEASURED (v5e, ViT-B batch-96 eval program):
  dynamic per-row activation scales:  170 windows/s (LOSES to bf16 249 —
    the abs-max reduction forces an extra materialized pass over x)
  static calibrated per-tensor scales: 287 windows/s (+15% over bf16;
    no pre-matmul reduction, XLA fuses round/clip into the producer
    epilogue)
Static-mode wins scale with the GEMM share of runtime (v5e, measured):
  ViT-B 249->287 w/s (+15%), ViT-L 85->106 (+25%),
  InternVideo2-B 48.6->50.3 clips/s (+3.5% — its 2049-token sequence
  makes attention the larger share).
Production recipe: quantize_vit_params / quantize_iv2_params +
calibrate_act_amax on a few representative clips + apply_act_amax,
model quant_mode='static' (FrameEvaluator does all three automatically
with quant8=True).
Validate AUC on real data before deploying — int8 is opt-in; the
default bf16 path is bit-stable against the fp32 reference.
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


def int8_matmul_static(x, w_i8, w_scale, a_amax):
    """Static-scale activation quantization: ``a_amax`` is the calibrated
    per-tensor absmax for this GEMM input (a 0-d array; per-layer when the
    param rides a scanned block stack).

    Unlike the dynamic path, there is no data-dependent reduction before
    the matmul, so XLA fuses the scale+round+clip into the producer's
    epilogue instead of materializing an extra pass over x — measured
    1.6x over bf16 on chained GEMMs where the dynamic path LOSES.

    x may arrive ALREADY int8 (the fused LayerNormQuant producer emits
    the quantized activation directly); then ``a_amax`` is the scale that
    produced it and only the dequant epilogue runs here.
    """
    if x.dtype == jnp.int8:
        y = jax.lax.dot_general(
            x, w_i8, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (w_scale * (a_amax / 127.0))
    inv = 127.0 / jnp.maximum(a_amax, 1e-12)
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                    -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_i8, w_i8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (w_scale * (a_amax / 127.0))


def calibrate_act_amax(model, params, batches, reduce="max",
                       **apply_kwargs):
    """Run forwards through a model built with quant_mode='calib' and
    return the per-site activation absmax tree (the 'calib' collection).
    PTQ calibration — the standard static-quantization recipe (a few
    hundred representative windows).

    reduce: how per-batch absmax observations combine across batches —
      'max' (default): strict absmax (never clips a calibration value);
      a float q in (0, 1): the q-quantile of the per-batch absmax
      samples — an outlier-robust clip when one calibration batch has a
      freak activation (needs enough batches to be meaningful; the
      per-batch value is still a within-batch max).

    The forward is jit'd: an eager apply would dispatch the network
    op-by-op, which is pathological through a serving relay."""
    @jax.jit
    def run(p, x):
        _, variables = model.apply({"params": p}, x, mutable=["calib"],
                                   **apply_kwargs)
        return variables["calib"]

    per_batch = [run(params, x) for x in batches]
    if reduce == "max":
        amax = per_batch[0]
        for cur in per_batch[1:]:
            amax = jax.tree.map(jnp.maximum, amax, cur)
        return jax.tree.map(lambda t: np.asarray(t), amax)
    q = float(reduce)
    if not 0.0 < q <= 1.0:
        raise ValueError(f"reduce must be 'max' or a quantile, got {reduce}")
    stacked = jax.tree.map(lambda *ts: np.quantile(
        np.stack([np.asarray(t) for t in ts]), q, axis=0), *per_batch)
    return stacked


def apply_act_amax(params: Dict[str, Any], amax_tree) -> Dict[str, Any]:
    """Write calibrated absmax values into a quantized param tree as the
    ``*_amax`` params the quant_mode='static' modules read.  The calib
    collection mirrors the module tree; sow stores 1-tuples.

    Only the dicts on the touched paths are copied — leaves are
    immutable jax/np arrays, so no deep copy is needed (a deepcopy of a
    ViT-L/IV2 tree moves hundreds of MB through the host for nothing)."""
    # sow name is 'amax' under each QuantDense / Attention scope; the
    # static param is 'act_amax' in the same scope
    def walk(dst, src):
        out = dict(dst)
        for key, val in src.items():
            if isinstance(val, dict):
                out[key] = walk(out.get(key, {}), val)
            else:
                v = val[0] if isinstance(val, (tuple, list)) else val
                name = "act_amax" if key == "amax" else key
                out[name] = jnp.asarray(np.asarray(v), jnp.float32)
        return out

    return jax.device_put(walk(params, amax_tree))


def quantize_params_for(model, params):
    """Dispatch weight quantization on the model family; returns
    (model_family_class, quantized_params)."""
    from simple_tad_tpu.models.internvideo2 import InternVideo2
    from simple_tad_tpu.models.vit import VisionTransformer
    if isinstance(model, InternVideo2):
        return InternVideo2, quantize_iv2_params(params)
    if isinstance(model, VisionTransformer):
        return VisionTransformer, quantize_vit_params(params)
    raise TypeError(f"no int8 path for model type {type(model).__name__}")


def quantize_and_calibrate(model, params, batches, **apply_kwargs):
    """One-call PTQ pipeline: quantize weights for ``model`` (dispatching
    on its family), calibrate static activation scales on ``batches``
    (inputs in the model's runtime pixel format), and return
    ``(static_model, static_params)`` ready to serve.

    This is the 'production recipe' from docs/QUANT.md; the evaluator,
    the inference CLI, and bench.py all route through it."""
    import dataclasses as dc
    family, qp = quantize_params_for(model, params)
    calib = family(dc.replace(model.cfg, quant=True, quant_mode="calib"))
    amax = calibrate_act_amax(calib, qp, batches, **apply_kwargs)
    qps = apply_act_amax(qp, amax)
    static = family(dc.replace(model.cfg, quant=True, quant_mode="static"))
    return static, qps


def _stack_quant(kernels: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(D, in, out) stacked fp kernels -> (int8 stack, (D, out) scales)."""
    qs, scales = [], []
    for i in range(kernels.shape[0]):
        q, s = quantize_weight(np.asarray(kernels[i]))
        qs.append(q)
        scales.append(s)
    return jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(scales))


def quantize_iv2_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """fp InternVideo2 params -> quantized pytree (block GEMMs qkv/proj/
    fc1/fc2 become int8 + per-channel scales; norms, LayerScale, pos
    embeds, patch embed, attn-pool head stay fp).  Feed to a model built
    with quant=True."""
    out = jax.tree.map(lambda x: x, params)
    blocks = dict(out["blocks"])
    attn = {k: (dict(v) if isinstance(v, dict) else v)
            for k, v in blocks["attn"].items()}
    for parent, name in ((attn, "qkv"), (attn, "proj"),
                         (blocks, "fc1"), (blocks, "fc2")):
        sub = dict(parent[name])
        kq, ks = _stack_quant(np.asarray(sub.pop("kernel")))
        sub["kernel_q"] = kq
        sub["kernel_scale"] = ks
        parent[name] = sub
    blocks["attn"] = attn
    out["blocks"] = blocks
    return jax.device_put(out)


def quantize_vit_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """fp32 VisionTransformer params -> quantized pytree: every block GEMM
    kernel becomes {*_q: int8, *_scale: f32(out,)} (stacked over depth);
    embeddings, norms, and the head stay fp32.  Feed to a model built with
    ``quant=True``."""
    out = jax.tree.map(lambda x: x, params)   # shallow-ish copy
    blocks = dict(out["blocks"])
    attn = dict(blocks["attn"])
    mlp = {k: dict(v) for k, v in blocks["mlp"].items()}

    qkv_q, qkv_s = _stack_quant(np.asarray(attn.pop("qkv_kernel")))
    attn["qkv_q"] = qkv_q
    attn["qkv_scale"] = qkv_s
    proj = dict(attn["proj"])
    pq, ps = _stack_quant(np.asarray(proj.pop("kernel")))
    proj["kernel_q"] = pq
    proj["kernel_scale"] = ps
    attn["proj"] = proj
    for name in ("fc1", "fc2"):
        sub = mlp[name]
        kq, ks = _stack_quant(np.asarray(sub.pop("kernel")))
        sub["kernel_q"] = kq
        sub["kernel_scale"] = ks
    blocks["attn"] = attn
    blocks["mlp"] = mlp
    out["blocks"] = blocks
    return jax.device_put(out)
