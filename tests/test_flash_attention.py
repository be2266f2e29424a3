"""Pallas flash-attention kernel vs naive reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from simple_tad_tpu.ops.attention import _naive_attention
from simple_tad_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, B, N, H, D, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (B, N, H, D), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("n", [128, 300, 1568])
def test_flash_forward_matches_naive(n):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, n, 2, 64)
    scale = 64 ** -0.5
    want = _naive_attention(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_backward_matches_naive():
    n = 300
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, n, 2, 64)
    scale = 64 ** -0.5

    def loss_naive(q, k, v):
        return jnp.sum(jnp.sin(_naive_attention(q, k, v, scale)))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, scale=scale)))

    want = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-5, rtol=5e-4, err_msg=name)
