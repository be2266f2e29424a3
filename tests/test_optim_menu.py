"""--opt menu (train/optim._direction_transform) vs torch.optim oracles.

The reference exposes a timm optimizer menu (optim_factory.py:91-175);
adamw is the only one its jobs use, the rest are capability parity.  The
torch-matching entries are oracle-tested exactly (update direction at
lr=1 equals torch's parameter delta); the optax-native rest get a
two-step smoke (finite, shape-preserving, jit-able).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from simple_tad_tpu.train import optim as O


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    ka, kb = jax.random.split(k)
    return {
        "w": jax.random.normal(ka, (4, 3), jnp.float32),
        "b": jax.random.normal(kb, (3,), jnp.float32),
    }


def _torch_deltas(params, grads_steps, make_opt):
    """Run torch at lr=1 and return the per-step parameter deltas."""
    tp = {n: torch.tensor(np.asarray(v), requires_grad=True)
          for n, v in params.items()}
    opt = make_opt(list(tp.values()))
    deltas = []
    for grads in grads_steps:
        before = {n: v.detach().clone() for n, v in tp.items()}
        for (n, v) in tp.items():
            v.grad = torch.tensor(np.asarray(grads[n]))
        opt.step()
        deltas.append({n: (before[n] - tp[n].detach()).numpy()
                       for n in tp})
    return deltas


def _optax_updates(params, grads_steps, name, momentum=0.9, eps=1e-8):
    tx = O._direction_transform(name, (0.9, 0.999), eps, momentum=momentum)
    state = tx.init(params)
    outs = []
    for grads in grads_steps:
        upd, state = tx.update(grads, state, params)
        outs.append(jax.tree.map(np.asarray, upd))
    return outs


@pytest.mark.parametrize("name,make_opt", [
    ("momentum", lambda ps: torch.optim.SGD(ps, lr=1.0, momentum=0.9)),
    ("sgd", lambda ps: torch.optim.SGD(ps, lr=1.0, momentum=0.9,
                                       nesterov=True)),
    ("nesterov", lambda ps: torch.optim.SGD(ps, lr=1.0, momentum=0.9,
                                            nesterov=True)),
    ("rmsprop", lambda ps: torch.optim.RMSprop(ps, lr=1.0, alpha=0.9,
                                               eps=1e-8, momentum=0.9)),
    ("adadelta", lambda ps: torch.optim.Adadelta(ps, lr=1.0, eps=1e-6)),
])
def test_direction_matches_torch(name, make_opt):
    params = _tree()
    grads_steps = [_tree(seed=10 + i) for i in range(3)]
    eps = 1e-6 if name == "adadelta" else 1e-8
    got = _optax_updates(params, grads_steps, name, eps=eps)
    want = _torch_deltas(params, grads_steps, make_opt)
    for g, w in zip(got, want):
        for n in params:
            np.testing.assert_allclose(g[n], w[n], atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("name", ["adamw", "nadam", "radam", "novograd",
                                  "adafactor", "adabelief", "lamb", "lion"])
def test_menu_smoke(name):
    """Every menu entry runs two jitted steps with finite, shaped output."""
    params = _tree()
    tx = O._direction_transform(name, (0.9, 0.999), 1e-8)
    state = tx.init(params)
    step = jax.jit(tx.update)
    for i in range(2):
        upd, state = step(_tree(seed=20 + i), state, params)
        for n, v in params.items():
            u = np.asarray(upd[n])
            assert u.shape == v.shape and np.isfinite(u).all(), (name, n)


def test_momentum_plumbs_through():
    """--momentum (run_class_finetuning.py:64) reaches the sgd/rmsprop
    accumulators: a non-default value still matches torch exactly."""
    params = _tree()
    grads_steps = [_tree(seed=30 + i) for i in range(3)]
    got = _optax_updates(params, grads_steps, "momentum", momentum=0.5)
    want = _torch_deltas(params, grads_steps,
                         lambda ps: torch.optim.SGD(ps, lr=1.0, momentum=0.5))
    for g, w in zip(got, want):
        for n in params:
            np.testing.assert_allclose(g[n], w[n], atol=1e-6, rtol=1e-5)


def test_unknown_opt_raises():
    with pytest.raises(ValueError, match="unknown optimizer"):
        O._direction_transform("adahessian", (0.9, 0.999), 1e-8)


def test_menu_composes_with_full_chain():
    """A non-default menu entry drops into the full create_optimizer chain
    (wd mask + layer decay + schedule) without touching its plumbing."""
    params = {"blocks": {"w": jnp.ones((2, 4, 4))},
              "head": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros((2,))}}
    tx = O.create_optimizer(params, lr_schedule=1e-2, weight_decay=0.05,
                            layer_decay=0.75, depth=2, opt="lamb")
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = jax.jit(tx.update)(grads, state, params)
    flat = jax.tree.leaves(jax.tree.map(np.asarray, upd))
    assert all(np.isfinite(f).all() for f in flat)
