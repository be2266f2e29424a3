"""jit-compiled train/eval steps for frame fine-tuning and MAE pre-training.

Behavioral reference: the per-step bodies of
/root/reference/engine_for_frame_finetuning.py:85-200 (forward, loss,
backward, clip, step, per-step lr/wd from schedules) and
engine_for_pretraining.py:16-150 (per-patch-normalized MSE on masked
tokens).  TPU-first: one pure function per workload, params/optimizer
replicated over a data mesh and the batch sharded on it, so the gradient
all-reduce is implicit; bf16 activations need no loss scaling (the
reference's AMP GradScaler machinery has no TPU equivalent to port).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from simple_tad_tpu.models.mae import mae_targets_fused
from simple_tad_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, tx, rng, ema_decay: Optional[float] = None):
        # ema_params must be distinct buffers: the donated train step would
        # otherwise donate the same buffer twice (params and its alias)
        return cls(step=jnp.zeros([], jnp.int32), params=params,
                   opt_state=tx.init(params), rng=rng,
                   ema_params=(jax.tree.map(jnp.copy, params)
                               if ema_decay else None))


def make_finetune_train_step(model, tx, criterion: Callable, *,
                             ema_decay: Optional[float] = None,
                             grad_norm_heads: Optional[int] = None,
                             donate: bool = True):
    """-> jit'd step(state, batch) -> (state, metrics).

    batch: {'video': (B,T,H,W,C) normalized, 'label': (B,), 'smoothed':
    (B,2), 'ttc': (B,)}.  criterion from train.losses.create_criterion.
    """

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, dropout_rng, droppath_rng = jax.random.split(state.rng, 3)

        def loss_fn(params):
            logits = model.apply(
                {"params": params}, batch["video"], deterministic=False,
                rngs={"dropout": dropout_rng, "droppath": droppath_rng})
            loss = criterion(logits, batch["label"], batch.get("smoothed"),
                             batch.get("ttc"))
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ema_params = state.ema_params
        if ema_decay is not None and ema_params is not None:
            ema_params = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1 - ema_decay),
                ema_params, params)

        grad_norm = optax.global_norm(grads)
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        metrics = {"loss": loss, "grad_norm": grad_norm, "acc": acc}
        if grad_norm_heads is not None:
            # per-layer/per-head tracer (utils.py:813-1011 equivalent)
            from simple_tad_tpu.utils.diagnostics import grad_norm_summary
            metrics["grad_norms"] = grad_norm_summary(grads,
                                                      grad_norm_heads)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, rng=rng,
                                  ema_params=ema_params)
        return new_state, (metrics, logits)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    """-> jit'd logits(params, video)."""
    def step(params, video):
        return model.apply({"params": params}, video,
                           deterministic=True).astype(jnp.float32)
    return jax.jit(step)


def make_mae_train_step(model, tx, *, num_masked: int,
                        normalize_target: bool = True,
                        donate: bool = True):
    """-> jit'd step(state, batch) -> (state, metrics) for DAPT/MAE.

    batch: {'video': (B,T,H,W,C) ImageNet-normalized, 'mask': (B,N) bool}.
    Target construction matches engine_for_pretraining.py:51-71: unnormalize
    to [0,1], patchify channels-last, per-patch normalize, MSE on masked
    tokens only.
    """
    cfg = model.cfg
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def step(state: TrainState, batch):
        rng, dropout_rng, droppath_rng = jax.random.split(state.rng, 3)
        video = batch["video"]
        mask = batch["mask"]
        # bit-identical fused order (gather-then-fp32): the naive
        # unnorm -> mae_targets order costs 25 ms/step at MAE-B b24
        # (fp32 materialization + 8-D transpose of the full video)
        targets = mae_targets_fused(video, mask, num_masked,
                                    mean=mean, std=std,
                                    patch_size=cfg.patch_size,
                                    tubelet_size=cfg.tubelet_size,
                                    normalize_target=normalize_target)

        def loss_fn(params):
            pred = model.apply(
                {"params": params}, video, mask, num_masked,
                deterministic=False,
                rngs={"dropout": dropout_rng, "droppath": droppath_rng})
            return jnp.mean(jnp.square(pred - targets))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
