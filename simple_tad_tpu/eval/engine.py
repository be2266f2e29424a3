"""Batched sliding-window evaluation engine.

Behavioral reference: final_test
(/root/reference/engine_for_frame_finetuning.py:386-545) — score every
window of every eval clip, collect {clip, frame, logits_safe, logits_risk,
label, ttc}, write predictions.csv + stats.txt + metric curves.

TPU-first redesign (SURVEY.md §7): instead of a per-window DataLoader that
re-decodes each frame up to 16x, eval runs CLIP-AT-ONCE:

  host:   threaded zip decode of the clip's unique frames (once each)
  device: one jit'd program per (frame-bucket, chunk) shape =
          gather windows -> normalize -> model forward

Frame counts are bucketed and window chunks fixed-size so the whole eval
compiles a handful of programs regardless of clip lengths.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simple_tad_tpu.data.frame_datasets import ClipEvalView, FrameDataset
from simple_tad_tpu.eval.metrics import BinaryMetrics, binary_metrics
from simple_tad_tpu.ops import image as image_ops


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def half_kernel_tokens(frames, kernel, bias, patch: int, tubelet: int,
                       step: int, dtype):
    """Embed every unique frame ONCE for sliding-window serving.

    The tubelet patch-embed kernel (tb*p*p*c, D) splits along its t-major
    rows into per-frame half-kernels, so token(pair i) = patches_i @ k0 +
    patches_{i+step} @ k1 + bias — each frame runs through both halves
    once instead of once per window that contains it (a window shares
    15/16 frames with its neighbor; the pixel-gather path re-embedded
    every frame up to 16 times AND materialized (B, 16, 224, 224, 3)
    windows; measured 26.7 ms of a 224 ms ViT-B int8 batch-96 program).

    frames: (F, H, W, C) float; -> (F - step*(tubelet-1), P, D) tokens
    where P = (H/p)*(W/p); row i embeds the tubelet whose first frame is
    i (step = the sequencer's fps decimation stride between window
    slots).
    """
    F, H, W, C = frames.shape
    p = patch
    nh, nw = H // p, W // p
    pat = frames.reshape(F, nh, p, nw, p, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(F, nh * nw, p * p * C).astype(dtype)
    if tubelet == 1:
        toks = jnp.dot(pat, kernel.astype(dtype),
                       preferred_element_type=jnp.float32)
        return (toks + bias.astype(jnp.float32)).astype(dtype)
    assert tubelet == 2, "video ViT family uses tubelet 1 or 2"
    half = p * p * C
    u = jnp.dot(pat, kernel[:half].astype(dtype),
                preferred_element_type=jnp.float32)
    w = jnp.dot(pat, kernel[half:].astype(dtype),
                preferred_element_type=jnp.float32)
    toks = u[:F - step] + w[step:] + bias.astype(jnp.float32)
    return toks.astype(dtype)


@dataclasses.dataclass
class EvalResult:
    rows: "Any"                  # pandas DataFrame (clip, frame, logits, ...)
    metrics: BinaryMetrics
    windows_per_sec: float
    n_windows: int

    def save(self, preds_file: str, stats_file: Optional[str] = None,
             plots_dir: Optional[str] = None):
        self.rows.to_csv(preds_file, index=False)
        if stats_file:
            with open(stats_file, "w") as f:
                for k, v in self.metrics.scalars().items():
                    f.write(f"{k}: {v}\n")
                f.write(f"n_windows: {self.n_windows}\n")
                f.write(f"windows_per_sec: {self.windows_per_sec:.2f}\n")
        if plots_dir:
            from simple_tad_tpu.eval.plots import save_metric_plots
            logits = self.rows[["logits_safe", "logits_risk"]].to_numpy()
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            probs = (e / e.sum(axis=1, keepdims=True))[:, 1]
            save_metric_plots(self.metrics, probs,
                              self.rows["label"].to_numpy(), plots_dir)


class FrameEvaluator:
    """Scores FrameDataset eval views with a jit'd gather+forward program."""

    def __init__(self, model, params, *, batch_size: int = 96,
                 frame_bucket: int = 128, dtype=jnp.bfloat16,
                 resize_on_host: bool = False, fold_norm: bool = True,
                 quant8: bool = False, quant8_mode: str = "static",
                 mean=None, std=None, devices=None,
                 precompute_tubelets: bool = True):
        if quant8:
            if quant8_mode not in ("static", "dynamic"):
                raise ValueError(
                    f"quant8_mode must be 'static' or 'dynamic', "
                    f"got {quant8_mode!r}")
            # int8 GEMM inference: swap in the quant model + params.
            # 'static' needs calibration — call .calibrate(dataset) (or
            # the first score/evaluate call does it automatically on the
            # first clips) to fill the per-layer activation scales
            import dataclasses as _dc
            from simple_tad_tpu.ops.quant import quantize_params_for
            family, params = quantize_params_for(model, params)
            model = family(_dc.replace(model.cfg, quant=True,
                                       quant_mode=quant8_mode))
        self.quant8 = quant8
        self.quant8_mode = quant8_mode if quant8 else ""
        self._calibrated = quant8_mode != "static"
        self.model = model
        self.batch_size = batch_size
        self.frame_bucket = frame_bucket
        self.dtype = dtype
        self.resize_on_host = resize_on_host
        self.fold_norm = fold_norm
        self.mean = image_ops.IMAGENET_MEAN if mean is None else mean
        self.std = image_ops.IMAGENET_STD if std is None else std
        self.crop = model.cfg.img_size
        if fold_norm:
            from simple_tad_tpu.utils.fold_norm import fold_normalization
            params = fold_normalization(params, self.mean, self.std)
        self.params = jax.device_put(params)
        # clip-parallel multi-device eval (the reference's --dist_eval,
        # run_frame_finetuning.py:303-314, re-done device-local): clips
        # round-robin over ``devices``, params replicated once per device,
        # every pipeline stage pinned via committed arrays.  None keeps
        # the single default-device behavior.
        self.devices = list(devices) if devices else [None]
        self._params_by_slot = self._replicate_params()

        @functools.partial(jax.jit, static_argnames=())
        def _score(params, frames_u8, window_idx):
            # frames_u8: (F, H, W, C) uint8; window_idx: (B, T)
            if not self.resize_on_host:
                frames_u8 = jnp.clip(
                    image_ops.resize_bicubic(frames_u8,
                                             (self.crop, self.crop)),
                    0.0, 255.0).astype(self.dtype)
            if self.fold_norm:
                # normalization folded into patch-embed weights: gather raw
                # uint8 windows (half the HBM traffic) and cast
                windows = jnp.take(frames_u8, window_idx,
                                   axis=0).astype(self.dtype)
            else:
                x = image_ops.normalize(frames_u8, self.mean, self.std,
                                        dtype=self.dtype)
                windows = jnp.take(x, window_idx, axis=0)  # (B, T, H, W, C)
            logits = self.model.apply({"params": params}, windows,
                                      deterministic=True)
            return logits.astype(jnp.float32)

        self._score = _score
        from simple_tad_tpu.models.internvideo2 import InternVideo2
        from simple_tad_tpu.models.vit import VisionTransformer
        self.precompute_tubelets = (
            precompute_tubelets
            and isinstance(model, (VisionTransformer, InternVideo2))
            and model.cfg.tubelet_size in (1, 2)
            and not os.environ.get("SIMPLE_TAD_NO_TUBELET_PRECOMPUTE"))
        self._score_by_step: Dict[int, Any] = {}

    def _token_score(self, step: int):
        """Per-fps-step jit of the token-gather serving path: embed each
        unique frame once (half_kernel_tokens) and gather (B, T/tb, P, D)
        token embeddings per window instead of pixels."""
        fn = self._score_by_step.get(step)
        if fn is not None:
            return fn
        crop, dtype = self.crop, self.dtype
        p_sz = self.model.cfg.patch_size
        tb = self.model.cfg.tubelet_size

        @jax.jit
        def _score_tok(params, frames_u8, window_idx):
            if not self.resize_on_host:
                frames = jnp.clip(
                    image_ops.resize_bicubic(frames_u8, (crop, crop)),
                    0.0, 255.0)
            else:
                frames = frames_u8
            if self.fold_norm:
                frames = frames.astype(dtype)
            else:
                frames = image_ops.normalize(frames, self.mean, self.std,
                                             dtype=dtype)
            if "patch_embed" in params:       # ViT family
                kern, bia = (params["patch_embed"]["kernel"],
                             params["patch_embed"]["bias"])
            else:                             # InternVideo2 (flat names)
                kern, bia = params["patch_kernel"], params["patch_bias"]
            toks = half_kernel_tokens(frames, kern, bia, p_sz, tb, step,
                                      dtype)
            g = jnp.take(toks, window_idx[:, ::tb], axis=0)
            x = g.reshape(g.shape[0], -1, toks.shape[-1])
            logits = self.model.apply({"params": params}, x,
                                      deterministic=True, tokens_input=True)
            return logits.astype(jnp.float32)

        self._score_by_step[step] = _score_tok
        return _score_tok

    def _replicate_params(self):
        if self.devices == [None]:
            return [self.params]
        return [jax.device_put(self.params, d) for d in self.devices]

    def _device_frames(self, frames: np.ndarray, device=None
                       ) -> Tuple[jnp.ndarray, int]:
        f = frames.shape[0]
        f_pad = _ceil_to(max(f, 1), self.frame_bucket)
        if f_pad != f:
            frames = np.concatenate(
                [frames, np.zeros((f_pad - f,) + frames.shape[1:],
                                  frames.dtype)])
        if device is not None:
            return jax.device_put(frames, device), f
        return jnp.asarray(frames), f

    def calibrate(self, dataset: FrameDataset, n_views: int = 4,
                  views=None, reduce="max") -> None:
        """PTQ activation calibration for quant8_mode='static': run a few
        clips through a calib-mode twin of the model (same pixel path) and
        write the observed per-layer absmax into the params.  Pass
        ``views`` when the caller already enumerated them (evaluate does)
        to avoid re-walking the dataset; ``reduce`` forwards to
        ops.quant.calibrate_act_amax ('max' or an outlier-robust
        quantile)."""
        if self._calibrated or not self.quant8:
            self._calibrated = True
            return
        import dataclasses as _dc
        from simple_tad_tpu.ops.quant import (apply_act_amax,
                                              calibrate_act_amax)
        calib_model = type(self.model)(
            _dc.replace(self.model.cfg, quant_mode="calib"))
        if views is None:
            views = dataset.clip_eval_views()
        views = views[:n_views]
        batches = []
        for view in views:
            frames = dataset.decode_clip_frames(
                view, resize_on_host=self.resize_on_host)
            dev_frames, _ = self._device_frames(frames)
            if not self.resize_on_host:
                dev_frames = jnp.clip(image_ops.resize_bicubic(
                    dev_frames, (self.crop, self.crop)), 0.0, 255.0)
            chunk = view.window_idx[:min(self.batch_size,
                                         view.window_idx.shape[0])]
            if self.fold_norm:
                w = jnp.take(dev_frames.astype(self.dtype),
                             jnp.asarray(chunk), axis=0)
            else:
                x = image_ops.normalize(dev_frames, self.mean, self.std,
                                        dtype=self.dtype)
                w = jnp.take(x, jnp.asarray(chunk), axis=0)
            batches.append(w)
        amax = calibrate_act_amax(calib_model, self.params, batches,
                                  reduce=reduce, deterministic=True)
        self.params = apply_act_amax(self.params, amax)
        self._params_by_slot = self._replicate_params()
        self._calibrated = True

    def score_view_async(self, dataset: FrameDataset, view: ClipEvalView,
                         slot: int = 0):
        """Dispatch all window chunks of one clip on device ``slot``;
        -> list of (device logits, valid_count).  Dispatch-then-fetch
        keeps the device busy and hides per-call host latency (do NOT
        fetch between chunks)."""
        if not self._calibrated:
            self.calibrate(dataset)
        device = self.devices[slot % len(self.devices)]
        params = self._params_by_slot[slot % len(self.devices)]
        frames = dataset.decode_clip_frames(
            view, resize_on_host=self.resize_on_host)
        dev_frames, _ = self._device_frames(frames, device)
        W = view.window_idx.shape[0]
        B = self.batch_size
        score = self._score
        if self.precompute_tubelets and view.window_idx.shape[1] >= 2:
            step = int(view.window_idx[0, 1] - view.window_idx[0, 0])
            if step > 0:
                score = self._token_score(step)
        pending = []
        for s in range(0, W, B):
            chunk = view.window_idx[s:s + B]
            valid = chunk.shape[0]
            if valid < B:   # pad chunk to fixed shape
                chunk = np.concatenate(
                    [chunk, np.zeros((B - valid, chunk.shape[1]),
                                     chunk.dtype)])
            chunk = (jax.device_put(chunk, device) if device is not None
                     else jnp.asarray(chunk))
            pending.append((score(params, dev_frames, chunk), valid))
        return pending

    @staticmethod
    def gather_async(pending) -> np.ndarray:
        return np.concatenate([np.asarray(lg)[:valid]
                               for lg, valid in pending])

    def score_view(self, dataset: FrameDataset, view: ClipEvalView
                   ) -> np.ndarray:
        """-> (W, num_classes) float32 logits for all windows of one clip."""
        return self.gather_async(self.score_view_async(dataset, view))

    def evaluate(self, dataset: FrameDataset, *, exact_metrics: bool = False,
                 views: Optional[List[ClipEvalView]] = None) -> EvalResult:
        """Score every window of every eval view.

        ``views``: restrict to an explicit subset (multi-host sharding:
        each process passes its ``views[rank::world]`` slice and merges
        CSV shards afterwards — cli/eval_frames.py --dist_eval).
        """
        import pandas as pd
        if views is None:
            views = dataset.clip_eval_views()
        if not self._calibrated:
            self.calibrate(dataset, views=views)
        rows: Dict[str, list] = {k: [] for k in
                                 ("clip", "filename", "logits_safe",
                                  "logits_risk", "label", "ttc")}
        t0 = time.perf_counter()
        n_windows = 0
        # software pipeline: while clip k's chunks run, decode and dispatch
        # the next clips (one slot per device; clips round-robin over
        # devices), then fetch the oldest.  Fetch order == dispatch order,
        # so row order (and the CSV) is device-count independent.
        from collections import deque
        inflight: "deque" = deque()   # (view, pending)

        def _drain_one():
            nonlocal n_windows
            pview, ppending = inflight.popleft()
            logits = self.gather_async(ppending)
            n_windows += logits.shape[0]
            rows["clip"].extend([pview.clip.name] * logits.shape[0])
            rows["filename"].extend(pview.frame_names)
            rows["logits_safe"].extend(logits[:, 0].tolist())
            rows["logits_risk"].extend(logits[:, 1].tolist())
            rows["label"].extend(pview.labels.tolist())
            rows["ttc"].extend(np.asarray(pview.ttc).tolist())

        for i, view in enumerate(views):
            inflight.append((view, self.score_view_async(dataset, view,
                                                         slot=i)))
            while len(inflight) > len(self.devices):
                _drain_one()
        while inflight:
            _drain_one()
        elapsed = time.perf_counter() - t0

        df = pd.DataFrame(rows)
        logits = df[["logits_safe", "logits_risk"]].to_numpy()
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)[:, 1]
        metrics = binary_metrics(np.asarray(probs), df["label"].to_numpy(),
                                 exact=exact_metrics)
        return EvalResult(rows=df, metrics=metrics,
                          windows_per_sec=n_windows / max(elapsed, 1e-9),
                          n_windows=n_windows)
