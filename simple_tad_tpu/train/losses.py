"""Training criteria for frame-level anomaly classification.

Behavioral reference: /root/reference/utils.py:638-1118 and the selection
table in run_frame_finetuning.py:570-589.  All losses are pure jnp
functions (batch logits (N, 2) -> scalar), fully jittable; SmoothAP's
python loop over positives becomes one broadcast.

Named criteria (reference flag --loss):
  crossentropy | focal | focal6x100 | focal2_6 | focal2_2 | 2bce |
  smoothap | exponential1
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, label_smoothing: float = 0.0):
    """Mean softmax CE over int labels (N,) or soft targets (N, C)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if labels.ndim == logits.ndim:
        target = labels.astype(jnp.float32)
    else:
        target = jax.nn.one_hot(labels, logits.shape[-1])
        if label_smoothing > 0:
            c = logits.shape[-1]
            target = target * (1 - label_smoothing) + label_smoothing / c
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def _ce_per_sample(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def focal_loss(logits, labels, *, alpha: float = 0.75, gamma: float = 2.0,
               multiplier: float = 1.0):
    """FocalLoss (utils.py:638-657): m * a * (1-pt)^g * ce."""
    ce = _ce_per_sample(logits, labels)
    pt = jnp.exp(-ce)
    return jnp.mean(multiplier * alpha * (1 - pt) ** gamma * ce)


def focal_loss2(logits, labels, *, alpha=(0.40, 0.60), gamma: float = 2.0,
                multiplier: float = 1.0):
    """FocalLoss2 (utils.py:659-682): per-class alpha inside the ce term."""
    ce = _ce_per_sample(logits, labels)
    pt = jnp.exp(-ce)
    at = jnp.asarray(alpha, jnp.float32)[labels]
    return jnp.mean((1 - pt) ** gamma * (at * ce) * multiplier)


def double_bce(logits, smoothed_labels):
    """'2bce' (utils.py:1091-1118): independent BCE per output neuron on
    sigmoid-smoothed 2-channel targets; sum channels, mean batch."""
    logits = logits.astype(jnp.float32)
    targets = smoothed_labels.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(jnp.sum(per, axis=-1))


def smooth_ap(logits, labels, *, delta: float = 0.01):
    """SmoothAPLoss (utils.py:685-708): sum of hinge rank violations of
    every (positive, negative) pair, averaged over positives."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
    pos_mask = labels == 1
    neg_mask = labels == 0
    # relu(neg - pos + delta) over all pairs; masked terms contribute 0
    diff = jax.nn.relu(probs[None, :] - probs[:, None] + delta)
    pair = diff * pos_mask[:, None] * neg_mask[None, :]
    n_pos = jnp.maximum(jnp.sum(pos_mask), 1)
    return jnp.sum(pair) / n_pos


def temporal_exponential(logits, labels, ttc, *, alpha_pre: float = 0.1,
                         alpha_post: float = 0.5):
    """TemporalExponentialLoss (utils.py:711-734): CE weighted by
    exp(alpha_pre * t) before / exp(-alpha_post * t) after, clamped to 1."""
    ce = _ce_per_sample(logits, labels)
    t = ttc.astype(jnp.float32)
    w = jnp.where(t < 0, jnp.exp(alpha_pre * t),
                  jnp.where(t > 0, jnp.exp(-alpha_post * t), 1.0))
    w = jnp.minimum(w, 1.0)
    return jnp.mean(ce * w)


def create_criterion(name: str, label_smoothing: float = 0.0) -> Callable:
    """Returns loss_fn(logits, labels, smoothed_labels, ttc) -> scalar,
    wiring the same hyperparameters as run_frame_finetuning.py:570-589."""
    if name == "crossentropy":
        if label_smoothing > 0:
            return lambda lg, lb, sm, ttc: cross_entropy(
                lg, lb, label_smoothing)
        return lambda lg, lb, sm, ttc: cross_entropy(lg, lb)
    if name == "focal":
        return lambda lg, lb, sm, ttc: focal_loss(lg, lb, alpha=0.75, gamma=2)
    if name == "focal6x100":
        return lambda lg, lb, sm, ttc: focal_loss(lg, lb, alpha=0.75,
                                                  gamma=6, multiplier=100)
    if name == "focal2_6":
        return lambda lg, lb, sm, ttc: focal_loss2(lg, lb, gamma=6,
                                                   multiplier=50)
    if name == "focal2_2":
        return lambda lg, lb, sm, ttc: focal_loss2(lg, lb, gamma=2,
                                                   multiplier=10)
    if name == "2bce":
        return lambda lg, lb, sm, ttc: double_bce(lg, sm)
    if name == "smoothap":
        return lambda lg, lb, sm, ttc: smooth_ap(lg, lb)
    if name == "exponential1":
        return lambda lg, lb, sm, ttc: temporal_exponential(lg, lb, ttc)
    raise NotImplementedError(f"loss not implemented: {name}")
