"""Optimizer factory: AdamW + layer-wise LR decay + per-step cosine
lr/wd schedules, on scanned-block pytrees.

Behavioral reference: /root/reference/optim_factory.py (param groups,
get_num_layer_for_vit), utils.py:430-447 (cosine_scheduler) and the wiring
in run_frame_finetuning.py:505-560.  TPU-first difference: the reference
builds one torch param-group per (layer, decay) pair; here layer scales are
a *pytree of multipliers* applied to updates — the scanned 'blocks' leaves
carry a per-depth scale vector broadcast over their leading axis, so one
optax chain covers any depth with zero python-loop state.

Update rule parity (torch AdamW + timm groups):
  p -= lr_t * scale_g * (adam_dir + wd_t * p)
realized as chain(clip, adam, add_decayed_weights(wd_t, mask),
scale_by_layer_pytree, scale_by(-lr_t)).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# prefix-matched so InternVideo2's separable tables (pos_embed_spatial /
# pos_embed_temporal / pos_embed_cls) are covered too
NO_DECAY_PREFIXES = ("pos_embed", "cls_token", "mask_token")
# top-level embedding leaves: nested ViT patch_embed module OR the flat
# patch_kernel/patch_bias params InternVideo2 uses
EMBED_PREFIXES = ("patch_embed", "patch_kernel", "patch_bias")


def _is_no_decay(name: str) -> bool:
    return name.startswith(NO_DECAY_PREFIXES)


def _is_embed_layer(name: str) -> bool:
    return name.startswith(EMBED_PREFIXES) or _is_no_decay(name)


def cosine_scheduler(base_value: float, final_value: float, epochs: int,
                     niter_per_ep: int, warmup_epochs: int = 0,
                     start_warmup_value: float = 0.0,
                     warmup_steps: int = -1) -> np.ndarray:
    """Per-step schedule array, exactly utils.py:430-447: linspace warmup
    then cosine from base to final."""
    warmup_iters = warmup_epochs * niter_per_ep
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    warmup = (np.linspace(start_warmup_value, base_value, warmup_iters)
              if warmup_iters > 0 else np.array([]))
    n = epochs * niter_per_ep - warmup_iters
    it = np.arange(n)
    main = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * it / max(n, 1)))
    sched = np.concatenate([warmup, main])
    assert len(sched) == epochs * niter_per_ep
    return sched


def _effective_ndim(path: Tuple[str, ...], leaf) -> int:
    """ndim minus the stacked depth axis for scanned block leaves."""
    if any(p.startswith("blocks") for p in path):
        return leaf.ndim - 1
    return leaf.ndim


def _path_names(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", str(k)) for k in path)


def weight_decay_mask(params) -> Any:
    """True where decoupled weight decay applies: effective ndim > 1 and not
    in the no-decay list (optim_factory.py:49-56: 1-dim or bias or skip)."""
    def mask(path, leaf):
        names = _path_names(path)
        if any(_is_no_decay(n) for n in names):
            return False
        return _effective_ndim(names, leaf) > 1
    return jax.tree_util.tree_map_with_path(mask, params)


def layer_scale_tree(params, layer_decay: float, depth: int) -> Any:
    """Pytree of LR multipliers implementing get_num_layer_for_vit:
      embed/pos/cls/mask -> decay^(depth+1); block i -> decay^(depth-i)
      (broadcast vector over the stacked axis); head/fc_norm/etc -> 1.
    Nested block stacks ('encoder'/'decoder' submodules) get their own
    vectors sized by their leading axis."""
    def scale(path, leaf):
        names = _path_names(path)
        if any(n.startswith("blocks") for n in names):
            d = leaf.shape[0]
            vec = layer_decay ** (depth - np.arange(d))
            return jnp.asarray(vec.reshape((d,) + (1,) * (leaf.ndim - 1)),
                               jnp.float32)
        if any(_is_embed_layer(n) for n in names):
            return jnp.asarray(layer_decay ** (depth + 1), jnp.float32)
        return jnp.asarray(1.0, jnp.float32)
    return jax.tree_util.tree_map_with_path(scale, params)


def _scale_by_pytree(scales) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def _add_decayed_weights_scheduled(wd_schedule, mask
                                   ) -> optax.GradientTransformation:
    """add_decayed_weights with a per-step coefficient (wd cosine schedule,
    run_frame_finetuning.py:556-558 applied per step in the engine)."""
    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        wd = wd_schedule(state.count)
        updates = jax.tree.map(
            lambda u, p, m: u + wd * p if m else u, updates, params, mask)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def array_schedule(values: np.ndarray) -> Callable:
    """Step -> value lookup into a precomputed schedule array (clamped)."""
    arr = jnp.asarray(values, jnp.float32)

    def fn(step):
        idx = jnp.minimum(step, arr.shape[0] - 1)
        return arr[idx]
    return fn


def _direction_transform(opt: str, betas, eps, momentum: float = 0.9
                         ) -> optax.GradientTransformation:
    """The un-scaled update direction for each supported --opt name.

    Mirrors the reference optimizer menu (optim_factory.py:91-175, timm
    create_optimizer) on optax primitives; every choice composes with the
    same wd-mask / layer-decay / schedule chain.  adamw is the default and
    the only one any reference job uses; the rest are capability parity.
    """
    name = opt.lower()
    if name in ("adamw", "adam"):
        return optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
    if name in ("nadam", "nadamw"):
        # Nesterov-momentum Adam (timm Nadam, optim_factory.py:129-130)
        return optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps,
                                   nesterov=True)
    if name in ("sgd", "nesterov", "momentum"):
        return optax.trace(decay=momentum,
                           nesterov=(name in ("sgd", "nesterov")))
    if name == "radam":
        return optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps)
    if name == "novograd":
        return optax.scale_by_novograd(b1=betas[0], b2=betas[1], eps=eps)
    if name in ("rmsprop", "rmsproptf"):
        # torch.optim.RMSprop semantics (optim_factory.py:145: alpha=0.9,
        # momentum=args.momentum): eps OUTSIDE the sqrt, then a momentum
        # accumulator over the scaled step.
        return optax.chain(
            optax.scale_by_rms(decay=0.9, eps=eps, eps_in_sqrt=False),
            optax.trace(decay=momentum))
    if name == "adadelta":
        return optax.scale_by_adadelta(eps=eps)
    if name == "adafactor":
        return optax.scale_by_factored_rms()
    if name == "adabelief":
        return optax.scale_by_belief(b1=betas[0], b2=betas[1], eps=eps)
    if name == "lamb":
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.scale_by_trust_ratio())
    if name == "lion":
        return optax.scale_by_lion(b1=betas[0], b2=betas[1])
    raise ValueError(f"unknown optimizer {opt!r} (optim_factory.py menu: "
                     "adamw/adam/nadam/sgd/nesterov/momentum/radam/"
                     "novograd/rmsprop/adadelta/adafactor/adabelief/"
                     "lamb/lion)")


def create_optimizer(params, *, lr_schedule, wd_schedule=None,
                     weight_decay: float = 0.05,
                     layer_decay: float = 1.0, depth: int = 12,
                     betas: Tuple[float, float] = (0.9, 0.999),
                     eps: float = 1e-8, clip_grad: Optional[float] = None,
                     freeze_layers: Optional[str] = None,
                     opt: str = "adamw", momentum: float = 0.9,
                     ) -> optax.GradientTransformation:
    """AdamW (default) matching the reference's effective update; --opt
    selects the alternatives from the reference optimizer menu.

    lr_schedule / wd_schedule: callables step->value (use array_schedule
    over cosine_scheduler output) or floats.
    """
    if not callable(lr_schedule):
        lr_value = float(lr_schedule)
        lr_schedule = lambda step: lr_value  # noqa: E731
    if wd_schedule is None:
        wd_schedule = lambda step: weight_decay  # noqa: E731
    elif not callable(wd_schedule):
        wd_value = float(wd_schedule)
        wd_schedule = lambda step: wd_value  # noqa: E731

    chain = []
    if clip_grad:
        chain.append(optax.clip_by_global_norm(clip_grad))
    chain.append(_direction_transform(opt, betas, eps, momentum=momentum))
    chain.append(_add_decayed_weights_scheduled(
        wd_schedule, weight_decay_mask(params)))
    if layer_decay < 1.0:
        chain.append(_scale_by_pytree(
            layer_scale_tree(params, layer_decay, depth)))
    if freeze_layers:
        chain.append(_scale_by_pytree(
            freeze_mask_tree(params, freeze_layers, depth)))
    chain.append(optax.scale_by_schedule(lambda step: -lr_schedule(step)))
    return optax.chain(*chain)


def scale_lr_by_batch(base_lr: float, total_batch_size: int) -> float:
    """Linear LR scaling rule (run_frame_finetuning.py:505)."""
    return base_lr * total_batch_size / 256.0


def freeze_mask_tree(params, freeze_layers: Optional[str], depth: int):
    """Update-multiplier pytree implementing --freeze_layers.

    'first N blocks;K' (run_frame_finetuning.py:465-485): zero updates for
    patch_embed, pos/cls embeddings and the first K blocks (per-layer
    vector over the scanned stack); everything else trains.

    'probe;K;P' (linear / attentive probing,
    other_models/InternVideo2_single_modality/run_linear_probing.py:548-573):
    freeze embeds and every block except the LAST K (open_block_num); the
    attention-pooling head ('clip_projector') is frozen unless P is 1
    (--open_clip_projector).  fc_norm and the classifier head always train.
    """
    if not freeze_layers:
        return None
    if freeze_layers.startswith("probe"):
        parts = freeze_layers.split(";")
        open_blocks = int(parts[1]) if len(parts) > 1 else 0
        open_proj = bool(int(parts[2])) if len(parts) > 2 else False

        def mult(path, leaf):
            names = _path_names(path)
            if any(n.startswith("blocks") for n in names):
                d = leaf.shape[0]
                vec = (np.arange(d) >= d - open_blocks).astype(np.float32)
                return jnp.asarray(
                    vec.reshape((d,) + (1,) * (leaf.ndim - 1)))
            if any(n.startswith("clip_projector") for n in names):
                return jnp.asarray(1.0 if open_proj else 0.0)
            if any(_is_embed_layer(n) for n in names):
                return jnp.asarray(0.0)
            return jnp.asarray(1.0)
        return jax.tree_util.tree_map_with_path(mult, params)
    if not freeze_layers.startswith("first N blocks"):
        raise ValueError(f"unknown freeze spec {freeze_layers!r}")
    k = int(freeze_layers.split(";")[1])

    def mult(path, leaf):
        names = _path_names(path)
        if any(n.startswith("blocks") for n in names):
            d = leaf.shape[0]
            vec = (np.arange(d) >= k).astype(np.float32)
            return jnp.asarray(vec.reshape((d,) + (1,) * (leaf.ndim - 1)))
        if any(_is_embed_layer(n) for n in names):
            return jnp.asarray(0.0)
        return jnp.asarray(1.0)
    return jax.tree_util.tree_map_with_path(mult, params)
