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


def test_flash_dropout_forward_matches_naive_same_mask():
    """Dropout rides the kernel: same int8 keep-mask => same output as the
    naive softmax->dropout->PV math (flash_attention_class.py:26-69)."""
    from simple_tad_tpu.ops.attention import _naive_attention
    B, n, H, D = 2, 136, 2, 64   # n % 8 != 0 exercises the padded path
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), B, n, H, D)
    scale = 64 ** -0.5
    rate = 0.3
    mask = jax.random.bernoulli(jax.random.PRNGKey(7), 1 - rate,
                                (B, H, n, n)).astype(jnp.int8)
    want = _naive_attention(q, k, v, scale, dropout_rate=rate,
                            deterministic=False, dropout_mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale=scale, dropout_mask=mask,
                              keep_prob=1 - rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_flash_dropout_backward_matches_naive_same_mask():
    from simple_tad_tpu.ops.attention import _naive_attention
    B, n, H, D = 1, 136, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), B, n, H, D)
    scale = 64 ** -0.5
    rate = 0.25
    mask = jax.random.bernoulli(jax.random.PRNGKey(9), 1 - rate,
                                (B, H, n, n)).astype(jnp.int8)

    def loss_naive(q, k, v):
        out = _naive_attention(q, k, v, scale, dropout_rate=rate,
                               deterministic=False, dropout_mask=mask)
        return jnp.sum(jnp.sin(out))

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, scale=scale, dropout_mask=mask,
                              keep_prob=1 - rate)
        return jnp.sum(jnp.sin(out))

    want = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-4, rtol=1e-3, err_msg=name)


def test_flash_dropout_backward_blocked():
    """Blocked (bq < N) dropout backward — exercises the transposed dkv
    kernel's block math (the full-block case degenerates to whole-array
    tiles and hides indexing bugs)."""
    from simple_tad_tpu.ops.attention import _naive_attention
    B, n, H, D = 1, 320, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), B, n, H, D)
    scale = 64 ** -0.5
    rate = 0.3
    mask = jax.random.bernoulli(jax.random.PRNGKey(11), 1 - rate,
                                (B, H, n, n)).astype(jnp.int8)

    def loss_naive(q, k, v):
        out = _naive_attention(q, k, v, scale, dropout_rate=rate,
                               deterministic=False, dropout_mask=mask)
        return jnp.sum(jnp.sin(out))

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, scale=scale, dropout_mask=mask,
                              keep_prob=1 - rate, block_q=80)
        return jnp.sum(jnp.sin(out))

    want = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-4, rtol=1e-3, err_msg=name)


def test_dropout_rng_kernels_on_hardware():
    """Full hardware validation of the in-kernel-PRNG dropout (mask
    extraction, determinism, fwd/bwd parity).  The TPU PRNG does not
    exist in interpret mode, so this only runs when the suite is pointed
    at a real TPU (the CPU suite covers the explicit-mask path)."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU (interpret mode has no PRNG)")
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "check_dropout_rng",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "check_dropout_rng.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def test_flash_qkv_direct_matches_sliced():
    """flash_attention_qkv (block-spec views into the packed qkv array)
    must equal slicing + flash_attention, forward and backward."""
    from simple_tad_tpu.ops.flash_attention import flash_attention_qkv
    B, n, H, D = 2, 136, 2, 64
    C = H * D
    qkv = jax.random.normal(jax.random.PRNGKey(4), (B, n, 3 * C))
    scale = D ** -0.5

    def sliced(qkv):
        q4 = qkv.reshape(B, n, 3, H, D)
        return flash_attention(q4[:, :, 0], q4[:, :, 1], q4[:, :, 2],
                               scale=scale).reshape(B, n, C)

    with pltpu.force_tpu_interpret_mode():
        want = sliced(qkv)
        got = flash_attention_qkv(qkv, num_heads=H, scale=scale)
        gw = jax.grad(lambda x: jnp.sum(jnp.sin(sliced(x))))(qkv)
        gg = jax.grad(lambda x: jnp.sum(jnp.sin(
            flash_attention_qkv(x, num_heads=H, scale=scale))))(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               atol=1e-4, rtol=1e-3)


def test_packed_train_path_matches_bh_layout(monkeypatch):
    """The round-4 packed training fwd/bwd (no relayout copies, max-free
    lse) must match the BH-layout path bit-for-tolerance, including the
    multi-kv-step dq accumulation and padded sequences."""
    from simple_tad_tpu.ops import flash_attention as fa
    B, n, H, D = 2, 120, 2, 64           # pads to 128
    C = H * D
    qkv = jax.random.normal(jax.random.PRNGKey(7),
                            (B, n, 3 * C)) * 0.3
    scale = D ** -0.5

    def loss(x):
        return jnp.sum(jnp.sin(
            fa.flash_attention_qkv(x, num_heads=H, scale=scale)))

    with pltpu.force_tpu_interpret_mode():
        assert fa._packed_train_ok(n, C, D, 0)
        monkeypatch.setenv("SIMPLE_TAD_ATTN_BWD_BQ", "64")   # 2 kv steps
        out_new, res = fa._flash_core_packed_qkv_fwd(qkv, H, scale, 0)
        assert len(res) == 3              # packed residuals (qkv, out, lse)
        g_new = jax.grad(loss)(qkv)
        monkeypatch.setenv("SIMPLE_TAD_ATTN_TRAIN_PACKED", "0")
        out_old, res_old = fa._flash_core_packed_qkv_fwd(qkv, H, scale, 0)
        assert len(res_old) == 6          # BH-layout residuals
        g_old = jax.grad(loss)(qkv)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_old),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                               atol=1e-4, rtol=1e-3)


def test_dispatcher_qkv_fallback_matches_module_math():
    """dot_product_attention_qkv off-TPU slices and dispatches; equal to
    the naive reference on the same packed array."""
    from simple_tad_tpu.ops.attention import (dot_product_attention_qkv,
                                              _naive_attention)
    B, n, H, D = 2, 48, 2, 32
    C = H * D
    qkv = jax.random.normal(jax.random.PRNGKey(6), (B, n, 3 * C))
    q4 = qkv.reshape(B, n, 3, H, D)
    want = _naive_attention(q4[:, :, 0], q4[:, :, 1], q4[:, :, 2],
                            0.125).reshape(B, n, C)
    got = dot_product_attention_qkv(qkv, num_heads=H, scale=0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def _emulate_int8_attention(qkv_i8, amax, num_heads, scale):
    """Float emulation of the int8 static attention kernel's exact math
    (including the 1/127-step probs quantization and the self-normalizing
    int32 denominator)."""
    B, N, C3 = qkv_i8.shape
    C = C3 // 3
    D = C // num_heads
    q8 = qkv_i8[:, :, :C].astype(np.int32)
    k8 = qkv_i8[:, :, C:2 * C].astype(np.int32)
    v8 = qkv_i8[:, :, 2 * C:].astype(np.int32)
    out = np.zeros((B, N, C), np.float32)
    for h in range(num_heads):
        sl = slice(h * D, (h + 1) * D)
        sq = amax[0, h] / 127.0
        sk = amax[1, h] / 127.0
        sv = amax[2, h] / 127.0
        s = np.einsum("bnd,bmd->bnm", q8[:, :, sl], k8[:, :, sl])
        s = s.astype(np.float32) * (sq * sk * scale)
        m = s.max(axis=-1, keepdims=True)
        p8 = np.round(np.exp2((s - m) * 1.4426950408889634) * 127.0)
        o = np.einsum("bnm,bmd->bnd", p8, v8[:, :, sl]).astype(np.float32)
        l = p8.sum(axis=-1, keepdims=True).astype(np.float32)
        out[:, :, sl] = o / l * sv
    return out


def test_int8_qkv_kernel_matches_emulation():
    from simple_tad_tpu.ops.flash_attention import flash_attention_qkv_int8
    rng = np.random.default_rng(0)
    B, N, H, D = 2, 256, 2, 64
    C = H * D
    qkv_i8 = jnp.asarray(rng.integers(-127, 128, (B, N, 3 * C), np.int8))
    amax = jnp.asarray(rng.uniform(0.5, 4.0, (3, H)).astype(np.float32))
    scale = D ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_qkv_int8(qkv_i8, amax, num_heads=H,
                                       scale=scale)
    want = _emulate_int8_attention(np.asarray(qkv_i8), np.asarray(amax),
                                   H, scale)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=0.02 * np.abs(want).max(), rtol=0.02)


def test_int8_attention_close_to_fp():
    """End-to-end int8 path (quantize + kernel) tracks full-precision
    attention within PTQ noise at realistic activation scales."""
    from simple_tad_tpu.ops.flash_attention import flash_attention_qkv_int8
    rng = np.random.default_rng(1)
    B, N, H, D = 2, 512, 2, 64
    C = H * D
    qkv = rng.normal(0.0, 1.0, (B, N, 3 * C)).astype(np.float32)
    scale = D ** -0.5
    # per-head symmetric quantization with exact per-head amax
    amax = np.abs(qkv.reshape(B, N, 3, H, D)).max(axis=(0, 1, 4))
    inv = np.repeat((127.0 / amax).reshape(-1), D)
    qkv_i8 = np.clip(np.round(qkv * inv), -127, 127).astype(np.int8)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention_qkv_int8(
            jnp.asarray(qkv_i8), jnp.asarray(amax.astype(np.float32)),
            num_heads=H, scale=scale), np.float32)
    q, k, v = (jnp.asarray(qkv[:, :, i * C:(i + 1) * C]).reshape(B, N, H, D)
               for i in range(3))
    want = np.asarray(_naive_attention(q, k, v, scale)).reshape(B, N, C)
    err = np.abs(got - want).max()
    assert err < 0.06 * np.abs(want).max() + 0.02, err


def test_transposed_pv_matches_standard(monkeypatch):
    """SIMPLE_TAD_ATTN_PV_T kernel orientation == standard packed kernel."""
    from simple_tad_tpu.ops.flash_attention import flash_attention_qkv
    qkv = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 3 * 128),
                            jnp.float32)
    scale = 64 ** -0.5
    with pltpu.force_tpu_interpret_mode():
        want = flash_attention_qkv(qkv, num_heads=2, scale=scale)
        monkeypatch.setenv("SIMPLE_TAD_NO_ATTN_PV_T", "1")
        got = flash_attention_qkv(qkv, num_heads=2, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_layernorm_matches_reference(monkeypatch):
    from simple_tad_tpu.ops.ln import fused_layernorm
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (3, 37, 256), jnp.float32) * 3 + 1.5
    scale = jax.random.normal(jax.random.PRNGKey(6), (256,)) * 0.2 + 1
    bias = jax.random.normal(jax.random.PRNGKey(7), (256,)) * 0.1
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    want = (x32 - mean) * jax.lax.rsqrt(var + 1e-6) * scale + bias
    with pltpu.force_tpu_interpret_mode():
        got = fused_layernorm(x, scale, bias, eps=1e-6,
                              out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-6)


def test_fused_layernorm_wired_in_model(monkeypatch):
    """SIMPLE_TAD_FUSED_LN=force routes LayerNormFp32 through the kernel
    with identical outputs (interpret mode)."""
    from simple_tad_tpu.models.layers import LayerNormFp32
    ln = LayerNormFp32(128, dtype=jnp.float32)
    params = ln.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, 128)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 128))
    want = ln.apply(params, x)
    monkeypatch.setenv("SIMPLE_TAD_FUSED_LN", "force")
    with pltpu.force_tpu_interpret_mode():
        got = ln.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-6)


def test_fused_layernorm_grad_matches_xla(monkeypatch):
    """The fused LN sits on the ViT-S TRAINING path (C<=512 on TPU), so
    jax.grad must flow through it: custom VJP with the analytic LayerNorm
    backward.  Regression for the round-3 latent crash (pallas_call has
    no autodiff rule without it)."""
    from simple_tad_tpu.models.layers import LayerNormFp32
    ln = LayerNormFp32(384, dtype=jnp.float32)
    params = ln.init(jax.random.PRNGKey(0), jnp.zeros((2, 7, 384)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 384)) * 2 + 0.5

    def loss(p, x):
        return jnp.sum(jnp.cos(ln.apply(p, x)))

    want = jax.grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setenv("SIMPLE_TAD_FUSED_LN", "force")
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss, argnums=(0, 1))(params, x)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=2e-5)


def test_fused_layernorm_grad_bf16_output(monkeypatch):
    """Grad flows when the kernel emits bf16 (the training dtype)."""
    from simple_tad_tpu.ops.ln import fused_layernorm
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 128), jnp.float32)
    s = jnp.ones((128,)) * 1.3
    b = jnp.zeros((128,))

    def loss(x):
        with pltpu.force_tpu_interpret_mode():
            y = fused_layernorm(x, s, b, eps=1e-6, out_dtype=jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(x)
    assert g.dtype == jnp.float32
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_pad_rows_yields_usable_blocks():
    """N=2049 (IV2) pads to 2056 = 2^3*257 whose only block is 8 rows —
    _pad_rows must give every supported N a >= 256-row block."""
    from simple_tad_tpu.ops.flash_attention import _pad_rows, _pick_block
    for n in (300, 785, 1568, 1569, 2049, 2056, 4095):
        np_ = _pad_rows(n)
        assert np_ >= n and np_ % 8 == 0
        assert _pick_block(np_) >= 256 or n <= 256, (n, np_)
    assert _pad_rows(1568) == 1568   # ViT geometry untouched
    assert _pad_rows(128) == 128


def test_flash_at_iv2_sequence_length():
    """Packed kernel correctness at the padded IV2 geometry (N=2049)."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(9), 1, 2049, 2, 64)
    scale = 64 ** -0.5
    want = _naive_attention(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("packed_qkv", [True, False])
def test_flash_q8_output_epilogue_matches_quantized_naive(packed_qkv):
    """The int8 output epilogue (static-quant serving) equals
    quantize(naive attention output) to within one quantization step:
    both the qkv-direct form (ViT trunk) and the separate-q/k/v form
    (InternVideo2, whose qk_normalization breaks the fused qkv layout)."""
    from simple_tad_tpu.ops.flash_attention import (
        _flash_primal_packed_q8_impl, _flash_primal_packed_qkv_q8_impl)
    B, n, H, D = 2, 136, 2, 64
    C = H * D
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), B, n, H, D)
    scale = D ** -0.5
    want_f = _naive_attention(q, k, v, scale)           # (B, n, H, D)
    amax = float(jnp.max(jnp.abs(want_f))) * 1.02
    want = np.clip(np.round(np.asarray(want_f, np.float32).reshape(B, n, C)
                            * (127.0 / amax)), -127, 127)
    pk = lambda t: t.reshape(B, n, C)
    with pltpu.force_tpu_interpret_mode():
        if packed_qkv:
            qkv = jnp.concatenate([pk(q), pk(k), pk(v)], axis=-1)
            got = _flash_primal_packed_qkv_q8_impl(qkv, H, scale, 0, amax)
        else:
            got = _flash_primal_packed_q8_impl(pk(q), pk(k), pk(v), H,
                                               scale, 0, amax)
    assert got.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(got, np.int32), want, atol=1)


def test_kv_grid_plan_geometry():
    """Auto key-grid plan: triggers exactly where the full-sequence block
    does not fit, keeps the fp32 score strip under the VMEM budget, and
    covers every key."""
    from simple_tad_tpu.ops.flash_attention import (_kv_grid_plan,
                                                    _full_seq_block,
                                                    _ceil_to)
    for n in (1569, 2049, 2056, 3000, 4096):
        plan = _kv_grid_plan(n, 0)
        nq = _ceil_to(n, 8)
        if _full_seq_block(nq, 0):
            assert plan is None
            continue
        assert plan is not None, n
        np_q, np_k, bk, n_kv = plan
        assert np_q == nq and bk % 8 == 0 and bk * n_kv == np_k >= nq
        assert np_q * bk * 4 <= 10_500_000
    assert _kv_grid_plan(1568, 0) is None       # ViT: single-pass block
    assert _kv_grid_plan(2049, 784) is None     # explicit block_q wins


def test_strip_budget_env_override(monkeypatch):
    """SIMPLE_TAD_ATTN_STRIP_BUDGET (r5 sweep knob) rescales both the
    full-sequence gate and the key-grid plan.  Pins the measured r5
    facts: at the IV2 serving length the DEFAULT budget already yields
    the minimal 2-strip plan (so 11.5 MB is a no-op), and a large
    budget flips to the full-sequence block."""
    from simple_tad_tpu.ops.flash_attention import (_full_seq_block,
                                                    _kv_grid_plan)
    monkeypatch.delenv("SIMPLE_TAD_ATTN_STRIP_BUDGET", raising=False)
    assert _kv_grid_plan(2049, 0)[3] == 2           # minimal key grid
    monkeypatch.setenv("SIMPLE_TAD_ATTN_STRIP_BUDGET", "11500000")
    assert _kv_grid_plan(2049, 0)[3] == 2           # same plan: no-op point
    monkeypatch.setenv("SIMPLE_TAD_ATTN_STRIP_BUDGET", "21500000")
    assert _kv_grid_plan(2049, 0) is None           # full-seq block wins
    assert _full_seq_block(2056, 0)
    monkeypatch.setenv("SIMPLE_TAD_ATTN_STRIP_BUDGET", "4000000")
    plan = _kv_grid_plan(1568, 0)                   # shrunk budget forces
    assert plan is not None and plan[3] == 3        # a grid even for ViT
    assert not _full_seq_block(1568, 0)
    monkeypatch.setenv("SIMPLE_TAD_ATTN_STRIP_BUDGET", "1000000")
    assert _kv_grid_plan(1568, 0) is None           # too small for any
    assert not _full_seq_block(1568, 0)             # grid: block fallback


@pytest.mark.parametrize("n_kv", [2, 3])
def test_kv_grid_forward_matches_naive(monkeypatch, n_kv):
    """Forced key-grid kernel == naive attention, with key padding that
    exercises the additive ones-row denominator + global pad correction
    (N=250 -> Np_k spans blocks; the pad sits entirely in the last)."""
    from simple_tad_tpu.ops.flash_attention import _flash_primal_packed_impl
    monkeypatch.setenv("SIMPLE_TAD_ATTN_KV_GRID", str(n_kv))
    B, n, H, D = 2, 250, 2, 64
    C = H * D
    q, k, v = _rand_qkv(jax.random.PRNGKey(11), B, n, H, D)
    scale = D ** -0.5
    want = _naive_attention(q, k, v, scale).reshape(B, n, C)
    pk = lambda t: t.reshape(B, n, C)
    with pltpu.force_tpu_interpret_mode():
        got = _flash_primal_packed_impl(pk(q), pk(k), pk(v), H, scale, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kv_grid_forward_matches_naive_d128(monkeypatch):
    """Key-grid kernel at head_dim 128 (one head per lane group — the
    IV2-1B 88->128 padded geometry) == naive attention."""
    from simple_tad_tpu.ops.flash_attention import _flash_primal_packed_impl
    monkeypatch.setenv("SIMPLE_TAD_ATTN_KV_GRID", "2")
    B, n, H, D = 1, 250, 2, 128
    C = H * D
    q, k, v = _rand_qkv(jax.random.PRNGKey(13), B, n, H, D)
    scale = D ** -0.5
    want = _naive_attention(q, k, v, scale).reshape(B, n, C)
    pk = lambda t: t.reshape(B, n, C)
    with pltpu.force_tpu_interpret_mode():
        got = _flash_primal_packed_impl(pk(q), pk(k), pk(v), H, scale, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kv_grid_q8_epilogue_matches_quantized_naive(monkeypatch):
    """Forced key-grid kernel with the int8 output epilogue: within one
    quantization step of quantize(naive)."""
    from simple_tad_tpu.ops.flash_attention import (
        _flash_primal_packed_q8_impl)
    monkeypatch.setenv("SIMPLE_TAD_ATTN_KV_GRID", "3")
    B, n, H, D = 1, 250, 2, 64
    C = H * D
    q, k, v = _rand_qkv(jax.random.PRNGKey(12), B, n, H, D)
    scale = D ** -0.5
    want_f = _naive_attention(q, k, v, scale)
    amax = float(jnp.max(jnp.abs(want_f))) * 1.02
    want = np.clip(np.round(np.asarray(want_f, np.float32).reshape(B, n, C)
                            * (127.0 / amax)), -127, 127)
    pk = lambda t: t.reshape(B, n, C)
    with pltpu.force_tpu_interpret_mode():
        got = _flash_primal_packed_q8_impl(pk(q), pk(k), pk(v), H,
                                           scale, 0, amax)
    assert got.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(got, np.int32), want, atol=1)


def test_pad_rows_qk_decoupled():
    """Separate-operand kernels pad queries and keys independently: keys
    only need 8-sublane alignment, queries the smallest length with a
    >= 256-row block — 20% less score-tile MAC area than the symmetric
    _pad_rows at IV2-B geometry (2064x2056 vs 2304x2304)."""
    from simple_tad_tpu.ops.flash_attention import (_pad_rows_qk,
                                                    _packed_block_q2)
    nq, nk = _pad_rows_qk(2049, 768, 64, 0)
    assert nk == 2056 and nq < 2304 and nq % 8 == 0
    assert _packed_block_q2(nq, nk, 768, 64, 0) >= 256
    # friendly shapes keep identical padding (ViT / IV2-S geometry)
    assert _pad_rows_qk(1568, 768, 64, 0) == (1568, 1568)
    assert _pad_rows_qk(785, 384, 64, 0) == (792, 792)
    assert _pad_rows_qk(136, 128, 64, 0) == (136, 136)


def test_i8_storage_kernel_close_to_fp():
    """int8-STORAGE kernel (int8 in, bf16 compute, q8io): quantize + kernel
    tracks full-precision attention within PTQ noise, both output modes."""
    from simple_tad_tpu.ops.flash_attention import flash_attention_qkv_i8d
    rng = np.random.default_rng(2)
    B, N, H, D = 2, 200, 2, 64     # N needs row padding (tests n_pad path)
    C = H * D
    qkv = rng.normal(0.0, 1.0, (B, N, 3 * C)).astype(np.float32)
    scale = D ** -0.5
    amax = np.abs(qkv.reshape(B, N, 3, H, D)).max(axis=(0, 1, 4))
    inv = np.repeat((127.0 / amax).reshape(-1), D)
    qkv_i8 = np.clip(np.round(qkv * inv), -127, 127).astype(np.int8)
    q, k, v = (jnp.asarray(qkv[:, :, i * C:(i + 1) * C]).reshape(B, N, H, D)
               for i in range(3))
    want = np.asarray(_naive_attention(q, k, v, scale)).reshape(B, N, C)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention_qkv_i8d(
            jnp.asarray(qkv_i8), jnp.asarray(amax.astype(np.float32)),
            num_heads=H, scale=scale), np.float32)
    err = np.abs(got - want).max()
    assert err < 0.06 * np.abs(want).max() + 0.02, err

    # int8 out epilogue: dequantized output tracks too
    out_amax = float(np.abs(want).max())
    with pltpu.force_tpu_interpret_mode():
        got8 = np.asarray(flash_attention_qkv_i8d(
            jnp.asarray(qkv_i8), jnp.asarray(amax.astype(np.float32)),
            num_heads=H, scale=scale, out_amax=out_amax), np.int8)
    deq = got8.astype(np.float32) * (out_amax / 127.0)
    err8 = np.abs(deq - want).max()
    assert err8 < 0.08 * np.abs(want).max() + 0.02, err8


@pytest.mark.parametrize("D,kv_force", [(64, None), (64, "3"), (88, None),
                                        (88, "3")])
def test_i8_storage_separate_operands(D, kv_force, monkeypatch):
    """Separate-operand int8-STORAGE path (IV2: qk-norm sits between the
    GEMM and the kernel): single-pass and key-grid kernels, including the
    IV2-1B odd head dim (88 zero-pads to 128 — exact through QK/PV)."""
    from simple_tad_tpu.ops.flash_attention import flash_attention_i8d
    if kv_force is not None:
        monkeypatch.setenv("SIMPLE_TAD_ATTN_KV_GRID", kv_force)
    rng = np.random.default_rng(5)
    B, N, H = 2, 200, 2
    scale = D ** -0.5
    qkv = rng.normal(0.0, 1.0, (3, B, N, H, D)).astype(np.float32)
    amax = np.abs(qkv).max(axis=(1, 2, 4))                     # (3, H)
    inv = (127.0 / amax).reshape(3, 1, 1, H, 1)
    qkv_i8 = np.clip(np.round(qkv * inv), -127, 127).astype(np.int8)
    q, k, v = (jnp.asarray(t) for t in qkv)
    want = np.asarray(_naive_attention(q, k, v, scale))        # (B,N,H,D)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention_i8d(
            jnp.asarray(qkv_i8[0]), jnp.asarray(qkv_i8[1]),
            jnp.asarray(qkv_i8[2]), jnp.asarray(amax.astype(np.float32)),
            num_heads=H, scale=scale), np.float32)
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    assert err < 0.06 * np.abs(want).max() + 0.02, err

    out_amax = float(np.abs(want).max())
    with pltpu.force_tpu_interpret_mode():
        got8 = np.asarray(flash_attention_i8d(
            jnp.asarray(qkv_i8[0]), jnp.asarray(qkv_i8[1]),
            jnp.asarray(qkv_i8[2]), jnp.asarray(amax.astype(np.float32)),
            num_heads=H, scale=scale, out_amax=out_amax), np.int8)
    deq = got8.astype(np.float32) * (out_amax / 127.0)
    err8 = np.abs(deq - want).max()
    assert err8 < 0.08 * np.abs(want).max() + 0.02, err8


@pytest.mark.parametrize("kv_force", [None, "3"])
def test_i8_storage_masked_garbage_rows(kv_force, monkeypatch):
    """n_valid mode (model-level sequence once-padding): rows beyond
    n_valid hold GARBAGE, the kernels mask those keys to -inf, and the
    VALID rows must match the kernel run on the valid-only inputs
    EXACTLY (same int8 codes -> identical scores and probs)."""
    from simple_tad_tpu.ops.flash_attention import flash_attention_i8d
    if kv_force is not None:
        monkeypatch.setenv("SIMPLE_TAD_ATTN_KV_GRID", kv_force)
    rng = np.random.default_rng(9)
    B, Np, nv, H, D = 2, 208, 199, 2, 64
    scale = D ** -0.5
    qkv = rng.normal(0.0, 1.0, (3, B, Np, H, D)).astype(np.float32)
    amax = np.abs(qkv[:, :, :nv]).max(axis=(1, 2, 4))
    inv = (127.0 / amax).reshape(3, 1, 1, H, 1)
    qkv_i8 = np.clip(np.round(qkv * inv), -127, 127).astype(np.int8)

    with pltpu.force_tpu_interpret_mode():
        masked = np.asarray(flash_attention_i8d(
            *(jnp.asarray(t) for t in qkv_i8),
            jnp.asarray(amax.astype(np.float32)), num_heads=H,
            scale=scale, n_valid=nv), np.float32)
        # reference: same int8 codes, valid rows only, zero-pad semantics
        ref = np.asarray(flash_attention_i8d(
            *(jnp.asarray(t[:, :nv]) for t in qkv_i8),
            jnp.asarray(amax.astype(np.float32)), num_heads=H,
            scale=scale), np.float32)
    np.testing.assert_allclose(masked[:, :nv], ref, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("kv_force", [None, "3"])
def test_i8_real_dim_matches_lane_padded(kv_force, monkeypatch):
    """real_dim PV slicing (IV2-1B: Dh=88 stored in 128 lanes) is BIT-
    identical to the full lane-padded compute: the skipped v^T rows are
    exact-zero padded columns, so every surviving dot product and the
    ones-row denominator see the same operands in the same order."""
    from simple_tad_tpu.ops.flash_attention import flash_attention_i8d
    if kv_force is not None:
        monkeypatch.setenv("SIMPLE_TAD_ATTN_KV_GRID", kv_force)
    rng = np.random.default_rng(17)
    B, N, H, D = 1, 200, 2, 88
    scale = D ** -0.5
    qkv = rng.normal(0.0, 1.0, (3, B, N, H, D)).astype(np.float32)
    amax = np.abs(qkv).max(axis=(1, 2, 4))
    inv = (127.0 / amax).reshape(3, 1, 1, H, 1)
    qkv_i8 = np.clip(np.round(qkv * inv), -127, 127).astype(np.int8)
    args = tuple(jnp.asarray(t) for t in qkv_i8) + (
        jnp.asarray(amax.astype(np.float32)),)

    with pltpu.force_tpu_interpret_mode():
        slim = np.asarray(flash_attention_i8d(*args, num_heads=H,
                                              scale=scale), np.float32)
        monkeypatch.setenv("SIMPLE_TAD_NO_REAL_DH", "1")
        full = np.asarray(flash_attention_i8d(*args, num_heads=H,
                                              scale=scale), np.float32)
    np.testing.assert_array_equal(slim, full)
