"""Hardware validation of the in-kernel-PRNG attention dropout.

Interpret mode has no TPU PRNG (zero bits), so this runs on the real
chip.  Strategy: the keep-mask is implicit, but it is a pure function of
(seed, bh, q_block, k_block) — so it can be EXTRACTED exactly by probing
with q=0 (uniform softmax) and basis-vector V:

    out[q, d] = mask[q, k=d] * inv_keep / N      (v[k, d] = delta_{k, d})

Two probes (basis shifted by Dh) recover the full (N, N) mask; the same
seed then makes fwd AND grad comparable against the naive reference fed
that extracted mask.  Checks:
  1. keep rate ~ keep_prob
  2. determinism (same seed twice) + seed sensitivity
  3. forward parity vs naive-with-extracted-mask
  4. dq/dk/dv parity vs jax.grad of the naive reference

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_dropout_rng.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from simple_tad_tpu.ops.attention import _naive_attention
from simple_tad_tpu.ops.flash_attention import flash_attention


def main(N=128):
    # N=128 keeps the probe loop cheap; N=2048 pads to a geometry where
    # _drop_block < Np, exercising the merged backward kernel's dq
    # accumulation across kv-block grid steps (and multi-unit masks).
    B, H, D = 1, 2, 64
    scale = D ** -0.5
    rate = 0.3
    keep = 1.0 - rate
    seed = jnp.asarray([[123, 456]], jnp.int32)

    # ---- extract the implicit mask
    qz = jnp.zeros((B, N, H, D), jnp.float32)
    mask_parts = []
    for shift in range(0, N, D):
        v = jnp.zeros((N, D), jnp.float32)
        idx = jnp.arange(D) + shift
        v = v.at[idx, jnp.arange(D)].set(1.0)
        vb = jnp.broadcast_to(v[None, :, None, :], (B, N, H, D))
        out = flash_attention(qz, qz, vb, scale=scale, dropout_seed=seed,
                              keep_prob=keep)          # (B, N, H, D)
        mask_parts.append(np.asarray(out) * N * keep)  # ~ mask columns
    # (B, N, H, N) -> (B, H, N, N)
    m = np.concatenate(mask_parts, axis=-1)
    mask = (m > 0.5).astype(np.int8).transpose(0, 2, 1, 3)
    rate_meas = 1.0 - mask.mean()
    print(f"keep-rate: measured drop {rate_meas:.4f} vs nominal {rate}")
    assert abs(rate_meas - rate) < 0.02

    # residuals must be exactly 0 or 1/keep-scaled (kernel math sanity)
    frac = np.minimum(np.abs(m), np.abs(m - 1.0)).max()
    print(f"mask quantization residual: {frac:.2e}")
    assert frac < 1e-2

    # ---- determinism + seed sensitivity
    k1 = jax.random.normal(jax.random.PRNGKey(0), (B, N, H, D))
    out_a = flash_attention(k1, k1, k1, scale=scale, dropout_seed=seed,
                            keep_prob=keep)
    out_b = flash_attention(k1, k1, k1, scale=scale, dropout_seed=seed,
                            keep_prob=keep)
    out_c = flash_attention(k1, k1, k1, scale=scale,
                            dropout_seed=seed + 1, keep_prob=keep)
    assert np.array_equal(np.asarray(out_a), np.asarray(out_b))
    assert not np.array_equal(np.asarray(out_a), np.asarray(out_c))
    print("determinism + seed sensitivity: ok")

    # ---- fwd + grad parity vs naive with the extracted mask
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = [jax.random.normal(kk, (B, N, H, D)) for kk in ks]
    mask_j = jnp.asarray(mask)

    def loss_naive(q, k, v):
        out = _naive_attention(q, k, v, scale, dropout_rate=rate,
                               deterministic=False, dropout_mask=mask_j)
        return jnp.sum(jnp.sin(out)), out

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, scale=scale, dropout_seed=seed,
                              keep_prob=keep)
        return jnp.sum(jnp.sin(out)), out

    (_, out_n), gn = jax.value_and_grad(loss_naive, argnums=(0, 1, 2),
                                        has_aux=True)(q, k, v)
    (_, out_f), gf = jax.value_and_grad(loss_flash, argnums=(0, 1, 2),
                                        has_aux=True)(q, k, v)
    # tolerance note: on TPU a DEFAULT-precision f32 matmul is a single
    # bf16 MXU pass (~2^-8 relative), and the naive reference and the
    # kernel accumulate it differently — exact-math parity of the masking
    # itself is covered by the CPU mask-path tests; this bound checks the
    # mask CONSISTENCY between fwd and both backward kernels.
    fwd_err = float(jnp.abs(out_n - out_f).max())
    print(f"fwd parity vs naive-with-extracted-mask: max err {fwd_err:.2e}")
    assert fwd_err < 1e-2
    for g_f, g_n, name in zip(gf, gn, "qkv"):
        err = float(jnp.abs(g_f - g_n).max())
        ref = float(jnp.abs(g_n).max())
        print(f"d{name} parity: max err {err:.2e} (ref scale {ref:.2e})")
        assert err < max(2e-2 * ref, 1e-4)
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    import sys
    for n in ([int(a) for a in sys.argv[1:]] or [128, 2048]):
        print(f"=== N={n} ===")
        main(n)
