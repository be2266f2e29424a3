"""Fused w8a8 Pallas kernels vs the unfused XLA int8 math (interpret mode).

The fused kernels must be bit-identical in int space to
ops/quant.py:int8_matmul_static (same round-half-even, same symmetric
clip); only output-dtype rounding may differ.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from simple_tad_tpu.ops.int8_gemm import (_gelu_tanh, mlp_fits_vmem,
                                          use_fused_w8a8, w8a8_gemm,
                                          w8a8_mlp)
from simple_tad_tpu.ops.quant import int8_matmul_static, quantize_weight


def _qw(rng, k, n, scale=1.0):
    w = rng.normal(size=(k, n)).astype(np.float32) * scale
    q, s = quantize_weight(w)
    return jnp.asarray(q), jnp.asarray(s)


def test_w8a8_gemm_matches_unfused():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 50, 256)).astype(np.float32))
    wq, ws = _qw(rng, 256, 384)
    bias = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    amax = jnp.float32(np.abs(np.asarray(x)).max())
    ref = int8_matmul_static(x, wq, ws, amax) + bias
    with pltpu.force_tpu_interpret_mode():
        got = w8a8_gemm(x, wq, ws, amax, bias=bias, block_m=64,
                        out_dtype=jnp.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_w8a8_gemm_gelu_epilogue_and_n_blocking():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(70, 128)).astype(np.float32))
    wq, ws = _qw(rng, 128, 512)
    amax = jnp.float32(3.0)
    ref = _gelu_tanh(int8_matmul_static(x, wq, ws, amax))
    with pltpu.force_tpu_interpret_mode():
        got = w8a8_gemm(x, wq, ws, amax, act="gelu", block_m=32,
                        block_n=256, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_w8a8_mlp_matches_unfused_chain():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 60, 256)).astype(np.float32))
    w1q, w1s = _qw(rng, 256, 512, 0.05)
    w2q, w2s = _qw(rng, 512, 256, 0.05)
    b1 = jnp.asarray(rng.normal(size=(512,)).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng.normal(size=(256,)).astype(np.float32)) * 0.1
    a1 = jnp.float32(np.abs(np.asarray(x)).max())
    h = _gelu_tanh(int8_matmul_static(x, w1q, w1s, a1) + b1)
    a2 = jnp.float32(float(jnp.abs(h).max()))
    ref = int8_matmul_static(h, w2q, w2s, a2) + b2
    with pltpu.force_tpu_interpret_mode():
        got = w8a8_mlp(x, w1q, w1s, a1, b1, w2q, w2s, a2, b2,
                       block_m=64, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_mlp_vmem_gate(monkeypatch):
    assert mlp_fits_vmem(768, 3072)        # ViT-B / IV2-B
    assert mlp_fits_vmem(1024, 4096)       # ViT-L (at block_m 128)
    assert not mlp_fits_vmem(1408, 6144)   # IV2-1B weight pair > VMEM
    from simple_tad_tpu.ops.int8_gemm import use_fused_mlp
    assert not use_fused_mlp(768, 3072)    # default OFF (XLA chain wins)
    monkeypatch.setenv("SIMPLE_TAD_FUSED_MLP", "force")
    assert use_fused_mlp(768, 3072)
    assert not use_fused_mlp(1408, 6144)


def test_use_fused_gate_alignment_and_env(monkeypatch):
    monkeypatch.setenv("SIMPLE_TAD_FUSED_W8A8", "force")
    assert use_fused_w8a8(768, 2304)
    assert not use_fused_w8a8(768, 2306)   # misaligned out dim
    assert not use_fused_w8a8(100, 256)    # misaligned in dim
    monkeypatch.setenv("SIMPLE_TAD_FUSED_W8A8", "0")
    assert not use_fused_w8a8(768, 2304)
    monkeypatch.delenv("SIMPLE_TAD_FUSED_W8A8")
    assert not use_fused_w8a8(768, 2304)   # default OFF everywhere


@pytest.mark.slow
def test_static_quant_vit_fused_path_matches_unfused():
    """Whole-model check: ViT-S static-quant forward, fused kernels
    (interpret) vs the unfused XLA path."""
    import simple_tad_tpu as st
    from simple_tad_tpu.ops.quant import quantize_and_calibrate

    model = st.create_model("vit_small_patch16_224", num_classes=2,
                            all_frames=4, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 224, 224, 3)).astype(np.float32))
    qmodel, qparams = quantize_and_calibrate(model, params, [x],
                                             deterministic=True)
    ref = qmodel.apply({"params": qparams}, x, deterministic=True)
    os.environ["SIMPLE_TAD_FUSED_W8A8"] = "force"
    os.environ["SIMPLE_TAD_FUSED_MLP"] = "force"
    try:
        with pltpu.force_tpu_interpret_mode():
            got = jax.jit(lambda p, x: qmodel.apply(
                {"params": p}, x, deterministic=True))(qparams, x)
    finally:
        del os.environ["SIMPLE_TAD_FUSED_W8A8"]
        del os.environ["SIMPLE_TAD_FUSED_MLP"]
    # same int math; differences come from fp32 epilogue association and
    # the tanh-vs-erf GELU on the fused MLP path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
