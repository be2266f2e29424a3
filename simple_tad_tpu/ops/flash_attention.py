"""Pallas TPU fused attention (non-causal, fixed-length) with custom VJP.

TPU-native replacement for the reference's CUDA flash-attn dependency
(/root/reference/flash_attention_class.py:39-69).  The reference only ever
runs non-causal, equal-length sequences (1568 tokens for VideoMAE 16x224,
785 for InternVideo2 8-frame) — short enough that a *full-K single-pass*
design beats classic online-softmax flash attention on TPU: for each query
block the whole K/V (<= ~0.5 MB at N=1568, Dh=64, bf16) sits in VMEM, so the
kernel is one big MXU matmul, a row softmax in fp32, and a second matmul —
no m/l carry loop, no scratch accumulators, far fewer grid steps.

Backward follows the same shape: a dQ kernel over query blocks and a dK/dV
kernel over key blocks, each single-pass against the full opposite sequence,
using the saved per-row logsumexp.

Layouts (fastest first):
  * inference primal: PACKED — the kernel reads q/k/v straight from the
    fused qkv-GEMM output (B, N, 3C) through block-spec views (grid over
    batch x 128-lane head group x query block), so neither the q/k/v
    slice copies nor the (B,N,H,D)->(B*H,N,D) relayouts exist
    (flash_attention_qkv / _flash_core_packed);
  * training backward + dropout: blocked (B*H, N, Dh) kernels using the
    saved per-row logsumexp; attention dropout draws keep bits from the
    TPU hardware PRNG inside fwd/dq/dkv (452 vs 402 ms/step at ViT-B
    batch-24, vs 844 ms for the materialized-mask fallback).
Sequences pad to a multiple of 8 sublanes; padded keys mask to -inf.
Falls back to XLA fused attention for N > MAX_SINGLE_PASS_N.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
MAX_SINGLE_PASS_N = 4096
LOG2E = 1.4426950408889634   # fold into the scale: exp(x) == exp2(x*log2e),
                             # saving a full score-tile multiply per layer

FLASH_RESIDUAL_NAME = "flash_res"


def _name_residuals(out, lse):
    """checkpoint_name the kernel outputs so a remat policy can SAVE them.

    Under gradient checkpointing (nn.remat on the block scan) the refwd
    would otherwise re-run the attention forward kernel just to rebuild
    (out, lse) for the custom-VJP backward.  Naming them lets
    remat_policy() (models/layers.py) keep the two kernel outputs —
    ~58 MB/layer at ViT-B batch-24 — and DCE the refwd kernel call while
    everything else (qkv GEMM, LN, MLP) still recomputes.  A no-op when
    no remat policy is in flight."""
    from jax.ad_checkpoint import checkpoint_name
    return (checkpoint_name(out, FLASH_RESIDUAL_NAME),
            checkpoint_name(lse, FLASH_RESIDUAL_NAME))


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(n: int, target: int = 0) -> int:
    """Largest divisor of n that is a multiple of 8, <= target (or, when
    target==0, <= a VMEM budget for the fp32 (block_q, n) score tile).

    End-to-end A/B on v5e (batch-64 ViT-B eval program): the bigger the
    query block the better — full-sequence single-pass (1568) beat 784
    beat 392 (193 / 192 / 189 windows/s)."""
    if target <= 0:
        budget_bytes = 10 * 2 ** 20          # score tile cap
        target = max(128, budget_bytes // (n * 4))
    best = 8
    for d in range(8, min(n, target) + 1, 8):
        if n % d == 0:
            best = d
    return best


def _pad_rows(n: int) -> int:
    """Padded sequence length with a USABLE query-block divisor.

    Sequence lengths with ugly factorizations make every grid-friendly
    block tiny: InternVideo2's 2049 tokens pad to 2056 = 2^3 * 257 whose
    only multiple-of-8 divisor is 8 — the kernel then runs 257 grid steps
    of 8-row blocks and crawls (the cause of the anomalous 19.7 clips/s
    IV2-B probe; ViT shapes like 1568 = 2^5 * 7^2 were unaffected).
    Padding to a multiple of 256 guarantees a >= 256-row block; padded
    keys mask to -inf via n_valid and padded query rows are sliced off.
    """
    np8 = _ceil_to(n, 8)
    if n > 256 and _pick_block(np8) < 256:
        return _ceil_to(n, 256)
    return np8


# ---------------------------------------------------------------- forward ---

def _attend_rows(q, k, v, *, scale, n_valid, fuse_l, int8_qk, out_dtype):
    """One head's single-pass attention on VMEM-resident tiles.

    q (Bq, D); k, v (Np, D) -> (Bq, D).  No max pass (inference-only; see
    _fwd_kernel_nomax docstring).

    fuse_l: compute the softmax denominator ON THE MXU by appending a
    ones-column to v — the PV matmul is Dh(=64)-wide against 128 MXU
    lanes, so the extra column is free MXU time and the (Bq, N) VPU row
    reduction disappears (the kernel is VPU-bound at eval geometry).
    int8_qk: dynamic per-tile int8 quantization of q/k feeding an
    int8 MXU score matmul (measurement knob).
    """
    if int8_qk:
        q32 = q.astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        sq = jnp.max(jnp.abs(q32)) / 127.0 + 1e-20
        sk = jnp.max(jnp.abs(k32)) / 127.0 + 1e-20
        qq = jnp.round(q32 / sq).astype(jnp.int8)
        kq = jnp.round(k32 / sk).astype(jnp.int8)
        s = jax.lax.dot_general(
            qq, kq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        s = s.astype(jnp.float32) * (sq * sk * scale * LOG2E)
    else:
        qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    # Padded keys are EXACT zero rows, so their scores are exactly 0 and
    # exp2(0) = 1: instead of masking them to -inf (iota+cmp+select — 3
    # VPU passes over every score tile, a cost ViT shapes never pay
    # because they need no padding), subtract the constant pad count
    # from the softmax denominator.  Padded v rows are zero, so the
    # numerator needs nothing.  (The max-subtracted SAFE_SOFTMAX/training
    # kernels keep the mask — their probs are shifted, not 1.)
    n_pad = k.shape[0] - n_valid
    p = jnp.exp2(s)
    if fuse_l:
        Np, D = v.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (Np, 128 - D % 128), 1)
        ones_col = (col == 0).astype(v.dtype)
        v_aug = jnp.concatenate([v, ones_col], axis=1)
        o_full = jax.lax.dot_general(
            p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        denom = o_full[:, D:D + 1] - n_pad if n_pad else o_full[:, D:D + 1]
        return (o_full[:, :D] / denom).astype(out_dtype)
    l = jnp.sum(p, axis=1, keepdims=True)
    if n_pad:
        l = l - n_pad
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (o / l).astype(out_dtype)


def _fwd_kernel_nomax(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid,
                      fuse_l=False, int8_qk=False):
    """Inference-only softmax without the max pass (~12% kernel speedup).

    Safe for the LN-bounded models here: attention logits stay far inside
    exp2's fp32 range (overflow needs |s| > ~83 natural units).  The
    autodiff path keeps the max-subtracted kernel (training weights can
    drift); SIMPLE_TAD_SAFE_SOFTMAX=1 restores it for inference too.
    """
    o_ref[0] = _attend_rows(q_ref[0], k_ref[0], v_ref[0], scale=scale,
                            n_valid=n_valid, fuse_l=fuse_l,
                            int8_qk=int8_qk, out_dtype=o_ref.dtype)


def _attend_rows_t(q, k, v, *, scale, n_valid, out_dtype,
                   return_denom: bool = False, qk_scale_i8=None,
                   mask_keys: bool = False, real_dim=None):
    """Transposed-PV single-pass attention: scores and probs live as
    (Np, Bq) tiles (keys on the SUBLANE axis) so the PV matmul runs as
    o^T = [v^T; ones-row] @ p^T with the head dim on the M axis.

    Why: the standard orientation's PV output is Dh(=64) lanes wide — half
    the 128-lane MXU idles whether or not the ones-column denominator
    rides along (the breakdown shows attention at 41% of the ViT-B int8
    program).  Transposed, PV does 72 output rows (64 head dims + the
    denominator row + sublane padding) at full lane width: ~44% fewer PV
    MXU cycles for three small in-kernel transposes (q, v, out).

    return_denom: also return the (1, Bq) softmax denominator row (the
    training forward's lse is log2 of it — max-free softmax, so no m term).
    qk_scale_i8: int8-STORAGE mode — q/k arrive int8 and the score matmul
    runs s8xs8->s32 (exact), scaled afterwards by this sq*sk product
    (v must arrive already dequantized to a float dtype).
    mask_keys: padded key rows hold GARBAGE, not zeros (the caller padded
    the whole token sequence once at the model level, so padded rows have
    flowed through LN/GEMM epilogues) — mask their scores to -inf with an
    iota select instead of the zero-row denominator-subtraction trick.
    The select was measured FREE on v5e (Mosaic fuses it into the exp2
    pass; docs/ROOFLINE.md round-3 falsifications).
    real_dim: VALID head dim when the lane axis is zero-padded (IV2-1B:
    88 stored as 128).  The head-dim lane pad is free in QK (contraction
    over 128 physical lanes either way) but NOT in PV: the transposed
    orientation streams Dh on the M axis, so padded dims are real MXU
    rows.  Slicing v^T to the valid rows (8-sublane aligned) cuts the PV
    matmul from ceil8(129)=136 to ceil8(89)=96 rows — exact, because the
    skipped rows are zero v columns producing zero outputs the caller
    slices off anyway.
    """
    Np = k.shape[0]
    D = v.shape[1]
    De = real_dim if real_dim is not None else D
    if qk_scale_i8 is not None:
        s = jax.lax.dot_general(
            k, q.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)            # (Np, Bq) exact
        s = s.astype(jnp.float32) * (qk_scale_i8 * scale * LOG2E)
    elif os.environ.get("SIMPLE_TAD_ABLATE_QK"):
        qt = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype).T
        # measurement knob: QK-matmul cost via A/B delta (scores become
        # a cheap broadcast that still consumes q and k)
        s = (jnp.sum(qt, axis=0, keepdims=True) * 0.0
             + jnp.sum(k, axis=1, keepdims=True)) * 1e-4
        s = jnp.broadcast_to(s, (Np, qt.shape[1]))
    else:
        qt = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype).T
        s = jax.lax.dot_general(
            k, qt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Np, Bq)
    # padded keys: exact zero rows -> p = exp2(0) = 1 -> constant
    # denominator correction instead of a masking pass (see _attend_rows);
    # mask_keys (garbage rows) masks to -inf instead — exp2(-inf) = 0, so
    # no correction
    n_pad = 0 if mask_keys else Np - n_valid
    if mask_keys and Np - n_valid:
        kid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(kid < n_valid, s, -jnp.inf)
    if os.environ.get("SIMPLE_TAD_ABLATE_EXP"):
        p = s * 1e-4   # measurement knob: softmax-exp cost via A/B delta
    else:
        p = jnp.exp2(s)
    rows = _ceil_to(De + 1, 8)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows - De, Np), 0)
    ones_row = (row_id == 0).astype(v.dtype)
    vt = v.T if De == D else v.T[:De]
    vt_aug = jnp.concatenate([vt, ones_row], axis=0)     # (rows, Np)
    if os.environ.get("SIMPLE_TAD_ABLATE_PV"):
        # measurement knob: PV-matmul cost (reduce p and v cheaply)
        ot = jnp.broadcast_to(
            jnp.sum(p, axis=0, keepdims=True) * 1e-4
            + jnp.sum(vt_aug.astype(jnp.float32), axis=1, keepdims=True)
            * 0.0 + 1.0, (rows, p.shape[1]))
    else:
        ot = jax.lax.dot_general(
            vt_aug, p.astype(v.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (rows, Bq)
    denom = ot[De:De + 1] - n_pad if n_pad else ot[De:De + 1]
    out = (ot[:De] / denom).T
    if De != D:
        out = jnp.pad(out, ((0, 0), (0, D - De)))
    out = out.astype(out_dtype)
    if return_denom:
        return out, denom
    return out


def _fwd_kernel_nomax_packed_q8(inv_ref, q_ref, k_ref, v_ref, o_ref, *,
                                scale, n_valid, head_dim, mask_keys=False):
    """Packed inference kernel with an int8 OUTPUT epilogue: the attention
    result quantizes against the proj GEMM's calibrated absmax before it
    ever touches HBM (half the output traffic, and the separate XLA
    quantize pass that could not fuse across the Pallas boundary
    disappears).  inv = 127/out_amax rides SMEM."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    inv = inv_ref[0, 0]
    pv_t = (head_dim % 128 != 0
            and not os.environ.get("SIMPLE_TAD_NO_ATTN_PV_T"))
    for h in range(q.shape[-1] // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        if pv_t:
            res = _attend_rows_t(q[:, sl], k[:, sl], v[:, sl], scale=scale,
                                 n_valid=n_valid, out_dtype=jnp.float32,
                                 mask_keys=mask_keys)
        else:
            assert not mask_keys, "mask_keys needs the transposed-PV path"
            res = _attend_rows(q[:, sl], k[:, sl], v[:, sl], scale=scale,
                               n_valid=n_valid, fuse_l=(head_dim % 128) != 0,
                               int8_qk=False, out_dtype=jnp.float32)
        o_ref[0, :, sl] = jnp.clip(jnp.round(res * inv),
                                   -127, 127).astype(jnp.int8)


def _fwd_kernel_nomax_packed(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid,
                             head_dim, fuse_l=False, int8_qk=False,
                             mask_keys=False):
    """Single-pass kernel on the qkv GEMM's native packed (B, N, C) layout.

    Each grid step receives a 128-LANE slice of the channel axis (one or
    two heads, sliced statically by the BlockSpec), so q/k/v/out DMAs stay
    fully CONTIGUOUS and the (B,N,H,D)->(B*H,N,D) relayout copies
    disappear (~22 GB per ViT-B batch-96 eval batch, ~27 ms at 819 GB/s).
    An earlier all-heads-per-step variant OOM'd scoped VMEM — Mosaic keeps
    several unrolled heads' score temporaries live at once.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # default ON where PV lanes would idle (Dh=64): measured v5e b96
    # whole-model +2.2% ViT-B int8 (470.9 -> 481.1 w/s) and +2.3% ViT-S
    # bf16 (960.6 -> 982.6); SIMPLE_TAD_NO_ATTN_PV_T restores the
    # lane-augmented orientation
    pv_t = (head_dim % 128 != 0
            and not os.environ.get("SIMPLE_TAD_NO_ATTN_PV_T"))
    for h in range(q.shape[-1] // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        if pv_t:
            o_ref[0, :, sl] = _attend_rows_t(
                q[:, sl], k[:, sl], v[:, sl], scale=scale,
                n_valid=n_valid, out_dtype=o_ref.dtype, mask_keys=mask_keys)
        else:
            assert not mask_keys, "mask_keys needs the transposed-PV path"
            o_ref[0, :, sl] = _attend_rows(
                q[:, sl], k[:, sl], v[:, sl], scale=scale, n_valid=n_valid,
                fuse_l=fuse_l, int8_qk=int8_qk, out_dtype=o_ref.dtype)


def _flash_primal_impl(q, k, v, scale, block_q):
    """Forward WITHOUT residuals (inference): no lse output, no max pass
    unless SIMPLE_TAD_SAFE_SOFTMAX=1."""
    import os
    if os.environ.get("SIMPLE_TAD_SAFE_SOFTMAX"):
        out, _ = _flash_fwd_impl(q, k, v, scale, block_q)
        return out
    BH, N, D = q.shape
    Np = _pad_rows(N)
    if Np - N:
        zpad = ((0, 0), (0, Np - N), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)
    bq = _pick_block(Np, block_q)
    # MXU-side softmax denominator whenever the head dim leaves free MXU
    # lanes (Dh=64 everywhere in this model family); measured v5e eval
    # geometry (BH 1152, N 1568): 14% kernel time saved over the VPU sum.
    fuse_l = (D % 128) != 0 and not os.environ.get("SIMPLE_TAD_NO_FUSED_L")
    int8_qk = bool(os.environ.get("SIMPLE_TAD_INT8_QK"))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_nomax, scale=scale, n_valid=N,
                          fuse_l=fuse_l, int8_qk=int8_qk),
        grid=(BH, Np // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, Np, D), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, Np, D), lambda b, qi: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
    )(q, k, v)
    return out[:, :N]


_LANE_GROUP = 128   # channel-axis block width (1-2 heads per grid step)


def _packed_block_q(Np: int, C: int, D: int, block_q: int) -> int:
    """Query-block rows for the packed kernel under a VMEM budget
    (query and key lengths equal — see _packed_block_q2)."""
    return _packed_block_q2(Np, Np, C, D, block_q)


def _packed_block_q2(Np_q: int, Np_k: int, C: int, D: int,
                     block_q: int) -> int:
    """Query-block rows for the packed kernel under a VMEM budget, with
    INDEPENDENT query/key padded lengths.

    Mosaic DOUBLE-BUFFERS pipelined blocks, so the 128-lane k/v blocks
    count twice; each query row carries the fp32 score strip + bf16 probs
    per head in the lane group.  Returns 0 when the layout is unusable
    (head dim not a divisor of 128 / channel axis not group-aligned)."""
    if D <= 0 or _LANE_GROUP % D or C % _LANE_GROUP:
        return 0
    block_q = block_q or int(os.environ.get("SIMPLE_TAD_ATTN_BLOCK_Q", 0))
    if block_q > 0:
        return _pick_block(Np_q, block_q)
    # budget calibrated empirically on v5e: the worst-case liveness model
    # (score+probs for every head in the group at once) overstates what
    # Mosaic actually keeps; 18M picks bq=784 at ViT-B/L geometry, which
    # measured fastest (332.3 vs 325.4 w/s at 392, 301.3 at 196) and
    # compiles within the 16M scoped-vmem limit
    budget = 18 * 2 ** 20
    kv_db = 4 * Np_k * _LANE_GROUP * 2
    if kv_db >= budget:
        return 0                         # caller uses the BH-layout path
    per_row = (_LANE_GROUP // D) * Np_k * 6 + _LANE_GROUP * 16
    return _pick_block(Np_q, max(8, (budget - kv_db) // per_row))


def _pad_rows_qk(n: int, C: int, D: int, block_q: int):
    """(Np_q, Np_k) for the SEPARATE-operand packed kernels: keys only
    need 8-sublane alignment plus n_valid masking, while query rows need
    a length with a usable block divisor.  Searching the smallest query
    pad whose block reaches 256 rows cuts the score-tile MAC area vs
    padding both axes to a multiple of 256 — IV2-B (N=2049): 2080x2056
    vs _pad_rows' 2304x2304, 18% less attention work, bq 520 vs 384.
    Friendly shapes (ViT 1568, IV2-S 785) keep identical padding."""
    nk = _ceil_to(n, 8)
    if (_full_seq_block(nk, block_q)
            or _packed_block_q2(nk, nk, C, D, block_q) >= 256):
        return nk, nk
    # among candidate query pads, MINIMIZE GRID STEPS (ties -> smaller
    # pad): the per-step overhead is the measured bound at N~2k (both
    # ViT-B and IV2-B pay ~5.4 us/step beyond the MXU-ideal time;
    # docs/ROOFLINE.md), so fewer bigger blocks beat less padding.
    best = (_ceil_to(n, 256), 10 ** 9)
    for cand in range(nk, _ceil_to(n, 256) + 1, 8):
        bq = _packed_block_q2(cand, nk, C, D, block_q)
        if bq >= 256 and -(-cand // bq) < best[1]:
            best = (cand, cand // bq)
    return best[0], nk



def _strip_budget() -> int:
    """fp32 score-strip scoped-VMEM cap (bytes).  10.5M is the measured
    v5e envelope at the round-3 tile set; SIMPLE_TAD_ATTN_STRIP_BUDGET
    overrides for sweeps (the round-4 int8 output tiles freed scoped
    VMEM, so larger strips may compile — VERDICT r4 #6)."""
    v = os.environ.get("SIMPLE_TAD_ATTN_STRIP_BUDGET", "")
    return int(v) if v.isdigit() else 10_500_000


def _full_seq_block(Np: int, block_q: int) -> bool:
    """Use the whole sequence as one query block?  The fp32 score strip
    is the scoped-VMEM liveness driver (Mosaic reuses it for the probs);
    1568^2 fp32 = 9.8M compiles on v5e with both int8 and bf16 output
    tiles.  Measured b96: q8 543.6 vs 515.4 (bq 784); bf16 387.6 vs
    372.1; ViT-S bf16 1086.6 vs 982.6."""
    return block_q <= 0 and Np * Np * 4 <= _strip_budget()


def _kv_grid_plan(N: int, block_q: int):
    """Full-sequence-query KEY-grid plan: (Np_q, Np_k, bk, n_kv) or None.

    For sequences whose full-sequence fp32 score strip exceeds the VMEM
    budget (N > ~1620 — InternVideo2's 2049 sliding-window tokens), the
    single-pass design otherwise degrades to a multi-step QUERY grid that
    re-reads all keys every step and runs at half the full-seq kernel's
    effective rate (docs/ROOFLINE.md: IV2-B ~49.5 vs ViT-B ~102 TF/s).
    Because the inference softmax is MAX-FREE (_fwd_kernel_nomax), partial
    PV numerators and ones-row denominators over KEY blocks are exactly
    additive — so keep the whole query sequence as ONE block and grid over
    key blocks with an fp32 VMEM accumulator: identical MACs in ViT-like
    full-sequence matmul shapes, fewer grid steps, and k/v DMA'd once
    instead of once per query step.

    SIMPLE_TAD_ATTN_KV_GRID: '0' disables; an integer >= 2 forces that
    many key steps (interpret-mode tests); unset = automatic.
    """
    force = os.environ.get("SIMPLE_TAD_ATTN_KV_GRID", "")
    if force == "0" or block_q > 0:
        return None
    Nq = _ceil_to(N, 8)
    if force.isdigit() and int(force) >= 2:
        n_kv = int(force)
        bk = _ceil_to(-(-Nq // n_kv), 8)
        return Nq, bk * n_kv, bk, n_kv
    if _full_seq_block(Nq, block_q):
        return None               # one single-pass block needs no grid
    budget = _strip_budget()      # same strip cap as _full_seq_block
    for n_kv in range(2, 9):
        bk = _ceil_to(-(-Nq // n_kv), 8)
        if bk >= 128 and Nq * bk * 4 <= budget:
            return Nq, bk * n_kv, bk, n_kv
    return None


def _kv_attend_accumulate(q, k, v, acc_ref, ki, *, scale, head_dim,
                          mask_valid=None, real_dim=None):
    """Accumulate one key block's transposed-PV partials into scratch.

    q (Nq, G) is the FULL padded query sequence (its scale/transpose per
    step is a (Nq, D) pass — negligible next to the score matmul); k, v
    (bk, G) are this grid step's key block.  acc_ref: (G//D, rows, Nq)
    fp32 with rows = ceil8(D+1) — per head, rows 0..D-1 hold the
    accumulated UNNORMALIZED output^T and row D the ones-row softmax
    denominator (padded zero keys contribute exp2(0) = 1 there; the
    finalize step subtracts the constant pad count, same trick as
    _attend_rows).  mask_valid: padded key rows hold GARBAGE (model-level
    sequence padding) — mask scores at global key index >= mask_valid to
    -inf instead of relying on zero rows (no finalize correction).
    real_dim: valid head dim under lane padding (see _attend_rows_t) —
    the accumulator and PV matmul shrink to ceil8(real_dim+1) rows."""
    D = head_dim
    De = real_dim if real_dim is not None else D
    rows = _ceil_to(De + 1, 8)
    bk = k.shape[0]
    for h in range(q.shape[-1] // D):
        sl = slice(h * D, (h + 1) * D)
        qt = (q[:, sl].astype(jnp.float32)
              * (scale * LOG2E)).astype(q.dtype).T              # (D, Nq)
        if os.environ.get("SIMPLE_TAD_ABLATE_QK"):
            # measurement knobs: same semantics as _attend_rows_t's —
            # in-kernel component costs via whole-kernel A/B deltas
            s = (jnp.sum(qt, axis=0, keepdims=True) * 0.0
                 + jnp.sum(k[:, sl], axis=1, keepdims=True)) * 1e-4
            s = jnp.broadcast_to(s, (bk, qt.shape[1]))
        else:
            s = jax.lax.dot_general(
                k[:, sl], qt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # (bk, Nq)
        if mask_valid is not None:
            kid = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            s = jnp.where(kid < mask_valid, s, -jnp.inf)
        if os.environ.get("SIMPLE_TAD_ABLATE_EXP"):
            p = s * 1e-4
        else:
            p = jnp.exp2(s)
        row_id = jax.lax.broadcasted_iota(
            jnp.int32, (rows - De, k.shape[0]), 0)
        ones_row = (row_id == 0).astype(v.dtype)
        vt = v[:, sl].T if De == D else v[:, sl].T[:De]
        vt_aug = jnp.concatenate([vt, ones_row], axis=0)
        if os.environ.get("SIMPLE_TAD_ABLATE_PV"):
            ot = jnp.broadcast_to(
                jnp.sum(p, axis=0, keepdims=True) * 1e-4
                + jnp.sum(vt_aug.astype(jnp.float32), axis=1,
                          keepdims=True) * 0.0 + 1.0,
                (rows, p.shape[1]))
        else:
            ot = jax.lax.dot_general(
                vt_aug, p.astype(v.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # (rows, Nq)

        @pl.when(ki == 0)
        def _init(h=h, ot=ot):
            acc_ref[h] = ot

        @pl.when(ki > 0)
        def _accum(h=h, ot=ot):
            acc_ref[h] += ot


def _fwd_kernel_nomax_packed_kv(q_ref, k_ref, v_ref, o_ref, acc_ref, *,
                                scale, n_pad, head_dim, n_kv,
                                mask_valid=None, real_dim=None):
    """Key-grid packed inference kernel (bf16/f32 out): accumulate over
    key blocks, normalize + write the output block on the last step (its
    BlockSpec is constant over the kv axis, so it flushes once)."""
    ki = pl.program_id(2)
    _kv_attend_accumulate(q_ref[0], k_ref[0], v_ref[0], acc_ref, ki,
                          scale=scale, head_dim=head_dim,
                          mask_valid=mask_valid, real_dim=real_dim)
    D = head_dim
    De = real_dim if real_dim is not None else D
    if mask_valid is not None:
        n_pad = 0                   # masked keys contribute exp2(-inf) = 0

    @pl.when(ki == n_kv - 1)
    def _finalize():
        for h in range(q_ref.shape[-1] // D):
            acc = acc_ref[h]
            denom = acc[De:De + 1] - n_pad if n_pad else acc[De:De + 1]
            res = (acc[:De] / denom).T
            if De != D:
                res = jnp.pad(res, ((0, 0), (0, D - De)))
            o_ref[0, :, h * D:(h + 1) * D] = res.astype(o_ref.dtype)


def _fwd_kernel_nomax_packed_kv_q8(inv_ref, q_ref, k_ref, v_ref, o_ref,
                                   acc_ref, *, scale, n_pad, head_dim,
                                   n_kv, mask_valid=None, real_dim=None):
    """Key-grid packed kernel with the int8 output epilogue (see
    _fwd_kernel_nomax_packed_q8)."""
    ki = pl.program_id(2)
    _kv_attend_accumulate(q_ref[0], k_ref[0], v_ref[0], acc_ref, ki,
                          scale=scale, head_dim=head_dim,
                          mask_valid=mask_valid, real_dim=real_dim)
    D = head_dim
    De = real_dim if real_dim is not None else D
    if mask_valid is not None:
        n_pad = 0

    @pl.when(ki == n_kv - 1)
    def _finalize():
        inv = inv_ref[0, 0]
        for h in range(q_ref.shape[-1] // D):
            acc = acc_ref[h]
            denom = acc[De:De + 1] - n_pad if n_pad else acc[De:De + 1]
            res = (acc[:De] / denom).T * inv
            if De != D:
                res = jnp.pad(res, ((0, 0), (0, D - De)))
            o_ref[0, :, h * D:(h + 1) * D] = jnp.clip(
                jnp.round(res), -127, 127).astype(jnp.int8)


def _kv_attend_accumulate_i8(q, k, v, sc_ref, g, acc_ref, ki, *, scale,
                             head_dim, mask_valid=None, real_dim=None):
    """int8-STORAGE key-grid accumulate: q (Nq, G) and this step's k, v
    (bk, G) arrive int8.  QK runs s8xs8->s32 (EXACT — zero-padded rows
    and head-dim columns stay exact zeros) with the static scales folded
    into the logit scale inside the exp2 pass; v dequantizes once in
    VMEM and PV stays the bf16 transposed path (the int8-COMPUTE
    falsification record in docs/ROOFLINE.md is why only storage is
    int8).  No q transpose: the score matmul contracts dim 1 of both
    operands directly (int8 VMEM transposes are what the packed q8io
    kernel pays instead).  real_dim: valid head dim under lane padding
    (IV2-1B 88-in-128) — PV and the accumulator shrink to
    ceil8(real_dim+1) rows (see _attend_rows_t)."""
    D = head_dim
    De = real_dim if real_dim is not None else D
    rows = _ceil_to(De + 1, 8)
    hpg = q.shape[-1] // D
    for h in range(hpg):
        head = g * hpg + h
        sl = slice(h * D, (h + 1) * D)
        sq = sc_ref[0, head] * (1.0 / 127.0)
        sk = sc_ref[1, head] * (1.0 / 127.0)
        sv = sc_ref[2, head] * (1.0 / 127.0)
        s = jax.lax.dot_general(
            k[:, sl], q[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)                  # (bk, Nq)
        sf = s.astype(jnp.float32) * (sq * sk * scale * LOG2E)
        if mask_valid is not None:
            kid = ki * k.shape[0] + jax.lax.broadcasted_iota(
                jnp.int32, sf.shape, 0)
            sf = jnp.where(kid < mask_valid, sf, -jnp.inf)
        p = jnp.exp2(sf)
        vf = (v[:, sl].astype(jnp.float32) * sv).astype(jnp.bfloat16)
        row_id = jax.lax.broadcasted_iota(
            jnp.int32, (rows - De, k.shape[0]), 0)
        ones_row = (row_id == 0).astype(vf.dtype)
        vt = vf.T if De == D else vf.T[:De]
        vt_aug = jnp.concatenate([vt, ones_row], axis=0)
        ot = jax.lax.dot_general(
            vt_aug, p.astype(vf.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (rows, Nq)

        @pl.when(ki == 0)
        def _init(h=h, ot=ot):
            acc_ref[h] = ot

        @pl.when(ki > 0)
        def _accum(h=h, ot=ot):
            acc_ref[h] += ot


def _fwd_kernel_nomax_packed_kv_q8io(sc_ref, q_ref, k_ref, v_ref, o_ref,
                                     acc_ref, *, scale, n_pad, head_dim,
                                     n_kv, int8_out, mask_valid=None,
                                     real_dim=None):
    """Key-grid kernel with int8 STORAGE in (optionally int8 out): the
    long-sequence (N > single-pass cap) analogue of
    _fwd_kernel_nomax_packed_q8io, for the separate-operand IV2 serving
    geometry.  sc rides SMEM as (4, H): rows 0-2 q/k/v absmax, row 3
    127/out_amax (ignored when int8_out=False)."""
    g = pl.program_id(1)
    ki = pl.program_id(2)
    _kv_attend_accumulate_i8(q_ref[0], k_ref[0], v_ref[0], sc_ref, g,
                             acc_ref, ki, scale=scale, head_dim=head_dim,
                             mask_valid=mask_valid, real_dim=real_dim)
    D = head_dim
    De = real_dim if real_dim is not None else D
    hpg = q_ref.shape[-1] // D
    if mask_valid is not None:
        n_pad = 0

    @pl.when(ki == n_kv - 1)
    def _finalize():
        for h in range(hpg):
            acc = acc_ref[h]
            denom = acc[De:De + 1] - n_pad if n_pad else acc[De:De + 1]
            res = (acc[:De] / denom).T
            if De != D:
                res = jnp.pad(res, ((0, 0), (0, D - De)))
            if int8_out:
                o_ref[0, :, h * D:(h + 1) * D] = jnp.clip(
                    jnp.round(res * sc_ref[3, g * hpg + h]),
                    -127, 127).astype(jnp.int8)
            else:
                o_ref[0, :, h * D:(h + 1) * D] = res.astype(o_ref.dtype)


def _kv_grid_call(q, k, v, plan, *, num_heads, scale, n_valid, inv=None,
                  real_dim=None):
    """Shared pallas_call plumbing for the key-grid kernels.  q/k/v are
    separate packed (B, N, C) operands already padded to the plan's
    (Np_q, Np_k); returns (B, Np_q, C) in int8 (inv given) or q.dtype."""
    B, Np_q, C = q.shape
    D = C // num_heads
    _, Np_k, bk, n_kv = plan
    G = _LANE_GROUP
    rows = _ceil_to((real_dim or D) + 1, 8)
    kw = dict(scale=float(scale), n_pad=Np_k - n_valid, head_dim=D,
              n_kv=n_kv, real_dim=real_dim)
    specs = [
        pl.BlockSpec((1, Np_q, G), lambda b, g, ki: (b, 0, g)),
        pl.BlockSpec((1, bk, G), lambda b, g, ki: (b, ki, g)),
        pl.BlockSpec((1, bk, G), lambda b, g, ki: (b, ki, g)),
    ]
    if inv is not None:
        kernel = functools.partial(_fwd_kernel_nomax_packed_kv_q8, **kw)
        specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + specs
        args = (inv, q, k, v)
        out_dtype = jnp.int8
    else:
        kernel = functools.partial(_fwd_kernel_nomax_packed_kv, **kw)
        args = (q, k, v)
        out_dtype = q.dtype
    return pl.pallas_call(
        kernel,
        grid=(B, C // G, n_kv),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, Np_q, G), lambda b, g, ki: (b, 0, g)),
        out_shape=jax.ShapeDtypeStruct((B, Np_q, C), out_dtype),
        scratch_shapes=[pltpu.VMEM((G // D, rows, Np_q), jnp.float32)],
    )(*args)

def _flash_primal_packed_impl(q, k, v, num_heads, scale, block_q):
    """Transpose-free inference forward on the packed (B, N, C) layout
    (C = H*Dh): grid over (batch, 128-lane head group, query block).

    Why: the (B,N,H,D)->(B*H,N,D) relayout is a real HBM copy — at ViT-B
    batch-96 eval geometry the 4 transposes (q, k, v, out) per block move
    ~22 GB per batch (~27 ms at 819 GB/s).
    """
    B, N, C = q.shape
    D = C // num_heads
    # key-grid gate: the transposed accumulate slices heads WITHIN one
    # 128-lane group, so it is exact iff D divides the group — D=64
    # (ViT/IV2-B/L) and D=128 (IV2-1B after the 88->128 lane pad)
    plan = _kv_grid_plan(N, block_q) \
        if 128 % D == 0 and not os.environ.get("SIMPLE_TAD_NO_ATTN_PV_T") \
        else None
    if plan is not None:
        Np_q, Np_k = plan[0], plan[1]
        if Np_q - N:
            q = jnp.pad(q, ((0, 0), (0, Np_q - N), (0, 0)))
        if Np_k - N:
            zpad = ((0, 0), (0, Np_k - N), (0, 0))
            k, v = jnp.pad(k, zpad), jnp.pad(v, zpad)
        out = _kv_grid_call(q, k, v, plan, num_heads=num_heads,
                            scale=scale, n_valid=N)
        return out[:, :N]
    Np_q, Np_k = _pad_rows_qk(N, C, D, block_q)
    if Np_q - N:
        q = jnp.pad(q, ((0, 0), (0, Np_q - N), (0, 0)))
    if Np_k - N:
        zpad = ((0, 0), (0, Np_k - N), (0, 0))
        k, v = jnp.pad(k, zpad), jnp.pad(v, zpad)
    bq = Np_q if Np_q == Np_k and _full_seq_block(Np_q, block_q) \
        else _packed_block_q2(Np_q, Np_k, C, D, block_q)
    assert bq > 0, "caller gates on _packed_block_q before dispatching here"
    fuse_l = (D % 128) != 0 and not os.environ.get("SIMPLE_TAD_NO_FUSED_L")
    int8_qk = bool(os.environ.get("SIMPLE_TAD_INT8_QK"))
    G = _LANE_GROUP
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_nomax_packed, scale=scale, n_valid=N,
                          head_dim=D, fuse_l=fuse_l, int8_qk=int8_qk),
        grid=(B, C // G, Np_q // bq),
        in_specs=[
            pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, Np_k, G), lambda b, g, qi: (b, 0, g)),
            pl.BlockSpec((1, Np_k, G), lambda b, g, qi: (b, 0, g)),
        ],
        out_specs=pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
        out_shape=jax.ShapeDtypeStruct((B, Np_q, C), q.dtype),
    )(q, k, v)
    return out[:, :N]


def _flash_primal_packed_q8_impl(q, k, v, num_heads, scale, block_q,
                                 out_amax):
    """Transpose-free packed forward with the int8 output epilogue, for
    models whose q/k/v cannot stay fused in the qkv-GEMM output (
    InternVideo2's qk_normalization re-normalizes q and k between the
    GEMM and the kernel, internvideo2.py IV2Attention).  Inference-only;
    same kernel as _flash_primal_packed_qkv_q8_impl, separate operands.
    """
    B, N, C = q.shape
    D = C // num_heads
    inv = (127.0 / jnp.maximum(jnp.asarray(out_amax, jnp.float32),
                               1e-12)).reshape(1, 1)
    plan = _kv_grid_plan(N, block_q) \
        if 128 % D == 0 and not os.environ.get("SIMPLE_TAD_NO_ATTN_PV_T") \
        else None
    if plan is not None:
        Np_q, Np_k = plan[0], plan[1]
        if Np_q - N:
            q = jnp.pad(q, ((0, 0), (0, Np_q - N), (0, 0)))
        if Np_k - N:
            zpad = ((0, 0), (0, Np_k - N), (0, 0))
            k, v = jnp.pad(k, zpad), jnp.pad(v, zpad)
        out = _kv_grid_call(q, k, v, plan, num_heads=num_heads,
                            scale=scale, n_valid=N, inv=inv)
        return out[:, :N]
    Np_q, Np_k = _pad_rows_qk(N, C, D, block_q)
    if Np_q - N:
        q = jnp.pad(q, ((0, 0), (0, Np_q - N), (0, 0)))
    if Np_k - N:
        zpad = ((0, 0), (0, Np_k - N), (0, 0))
        k, v = jnp.pad(k, zpad), jnp.pad(v, zpad)
    bq = Np_q if Np_q == Np_k and _full_seq_block(Np_q, block_q) \
        else _packed_block_q2(Np_q, Np_k, C, D, block_q)
    assert bq > 0, "caller gates on _packed_block_q before dispatching here"
    G = _LANE_GROUP
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_nomax_packed_q8, scale=float(scale),
                          n_valid=N, head_dim=D),
        grid=(B, C // G, Np_q // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, Np_k, G), lambda b, g, qi: (b, 0, g)),
            pl.BlockSpec((1, Np_k, G), lambda b, g, qi: (b, 0, g)),
        ],
        out_specs=pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
        out_shape=jax.ShapeDtypeStruct((B, Np_q, C), jnp.int8),
    )(inv, q, k, v)
    return out[:, :N]


def _flash_primal_packed_qkv_impl(qkv, num_heads, scale, block_q):
    """Packed kernel reading q/k/v DIRECTLY from the fused (B, N, 3C)
    qkv-GEMM output through three BlockSpecs into one operand.

    Why: Pallas operands must be materialized, so XLA turns the three
    q/k/v column slices into real copies (~17 GB per ViT-B batch-96 eval
    batch).  Indexing the original array from the kernel's specs removes
    them; DMA volume is unchanged (each spec fetches only its blocks).
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    # measurement knob: pad the sequence so lane-aligned query blocks
    # exist (1568 = 2^5*7^2 has no 128-aligned divisor; 1792 = 14*128
    # gives bq=896 with zero lane padding in the PV_T score tiles)
    pad_n = int(os.environ.get("SIMPLE_TAD_ATTN_PAD_N", "0"))
    Np = max(_pad_rows(N), pad_n)
    if Np - N:
        qkv = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))
    bq = Np if _full_seq_block(Np, block_q) \
        else _packed_block_q(Np, C, D, block_q)
    assert bq > 0, "caller gates on _packed_block_q before dispatching here"
    fuse_l = (D % 128) != 0 and not os.environ.get("SIMPLE_TAD_NO_FUSED_L")
    int8_qk = bool(os.environ.get("SIMPLE_TAD_INT8_QK"))
    G = _LANE_GROUP
    ng = C // G
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_nomax_packed, scale=scale, n_valid=N,
                          head_dim=D, fuse_l=fuse_l, int8_qk=int8_qk),
        grid=(B, ng, Np // bq),
        in_specs=[
            pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, Np, G),
                         lambda b, g, qi, ng=ng: (b, 0, ng + g)),
            pl.BlockSpec((1, Np, G),
                         lambda b, g, qi, ng=ng: (b, 0, 2 * ng + g)),
        ],
        out_specs=pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
    )(qkv, qkv, qkv)
    return out[:, :N]


# ------------------------------------------- packed TRAINING fwd + bwd ---
# Round 4: the training path previously ran on the (B*H, N, D) layout —
# every layer paid 4 materialized relayout copies in the forward (q/k/v
# slice-transposes + out back-transpose) and 5 more in the backward (do,
# dq/dk/dv, concat), and the forward kernel kept the max pass and the
# lane-augmented PV that serving had already replaced.  These kernels run
# the TRAINING forward/backward directly on the qkv GEMM's packed
# (B, N, 3C) layout: transposed-PV max-free forward emitting a per-head
# base-2 lse, and a merged D-major backward writing dq/dk/dv in the
# consumer's packed column order (no relayouts anywhere).
# SIMPLE_TAD_ATTN_TRAIN_PACKED=0 restores the BH-layout path for A/B.

def _fwd_kernel_nomax_packed_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                                 scale, n_valid, head_dim):
    # lse layout (B, ng, Np, heads-per-group): the per-group head count
    # rides the LANE axis as a full dimension (a (1, hpg, bq) block
    # violates the TPU sublane-divisibility rule for hpg=2) and lands in
    # the (Np, 1) sublane-major orientation the backward broadcasts with
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    for h in range(q.shape[-1] // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        out, denom = _attend_rows_t(q[:, sl], k[:, sl], v[:, sl],
                                    scale=scale, n_valid=n_valid,
                                    out_dtype=o_ref.dtype,
                                    return_denom=True)
        o_ref[0, :, sl] = out
        lse_ref[0, 0, :, h:h + 1] = jnp.log2(denom).T   # (Bq, 1) base-2


def _packed_train_ok(N, C, D, block_q) -> bool:
    """Geometry + opt-out gate for the packed training kernels."""
    if os.environ.get("SIMPLE_TAD_ATTN_TRAIN_PACKED", "1") == "0":
        return False
    if D % 128 == 0 or _LANE_GROUP % D or C % _LANE_GROUP:
        return False
    return (N <= MAX_SINGLE_PASS_N
            and _packed_block_q(_pad_rows(N), C, D, block_q) > 0)


def _flash_fwd_packed_qkv_impl(qkv, num_heads, scale, block_q):
    """Training forward on the packed layout: returns (out (B, N, C),
    lse (B, H, N) base-2).  Max-free softmax (same bound argument as
    _fwd_kernel_nomax — LN-bounded logits sit far inside exp2's fp32
    range; a divergence that violated it would already trip the NaN-loss
    hard exit)."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    Np = _pad_rows(N)
    if Np - N:
        qkv = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))
    bq = Np if _full_seq_block(Np, block_q) \
        else _packed_block_q(Np, C, D, block_q)
    assert bq > 0, "caller gates on _packed_train_ok"
    G = _LANE_GROUP
    ng = C // G
    hpg = G // D
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_nomax_packed_lse, scale=scale,
                          n_valid=N, head_dim=D),
        grid=(B, ng, Np // bq),
        in_specs=[
            pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, Np, G),
                         lambda b, g, qi, ng=ng: (b, 0, ng + g)),
            pl.BlockSpec((1, Np, G),
                         lambda b, g, qi, ng=ng: (b, 0, 2 * ng + g)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, 1, bq, hpg), lambda b, g, qi: (b, g, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, ng, Np, hpg), jnp.float32),
        ],
    )(qkv, qkv, qkv)
    return out[:, :N], lse[:, :, :N]


def _bwd_merged_kernel_packed(q_ref, k_ref, v_ref, do_ref, lse_ref,
                              delta_ref, dq_ref, dk_ref, dv_ref, acc_ref, *,
                              scale, n_valid, bk, n_kv, head_dim):
    """Merged D-major backward on the packed layout.

    Grid (B, head-group, kv-block): dk/dv write their kv block per step;
    dq accumulates per head into an fp32 VMEM scratch (G, Np) and flushes
    transposed on the final kv step.  Matmul orientations match
    _bwd_merged_kernel_dt (head dim on sublanes for the three output
    matmuls).
    """
    i = pl.program_id(2)
    D = head_dim
    for h in range(q_ref.shape[-1] // D):
        sl = slice(h * D, (h + 1) * D)
        q_raw = q_ref[0][:, sl]                              # (Np, D)
        q = (q_raw.astype(jnp.float32) * (scale * LOG2E)).astype(q_raw.dtype)
        k = k_ref[0][:, sl]                                  # (bk, D)
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]                                # (Np, D)
        # lse/delta are stored (B, ng, Np, hpg): column h is already the
        # (Np, 1) sublane-major orientation the broadcasts below need
        lse = lse_ref[0, 0, :, h:h + 1]                      # (Np, 1)
        delta = delta_ref[0, 0, :, h:h + 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (Np, bk)
        if n_valid < q.shape[0]:
            q_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * bk
            s = jnp.where((q_idx < n_valid) & (kv_idx < n_valid), s, NEG_INF)
        p = jnp.exp2(s - lse)                                # (Np, bk)
        dvt = jax.lax.dot_general(
            do, p.astype(do.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (D, bk)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (Np, bk)
        ds = p * (dp - delta)
        dkt = jax.lax.dot_general(
            q_raw, ds.astype(q_raw.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (D, bk)
        dqt_c = jax.lax.dot_general(
            k, ds.astype(k.dtype), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (D, Np)
        dk_ref[0, :, sl] = dkt.T.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dvt.T.astype(dv_ref.dtype)

        @pl.when(i == 0)
        def _init():
            acc_ref[sl, :] = dqt_c

        @pl.when(i > 0)
        def _accum():
            acc_ref[sl, :] += dqt_c

    @pl.when(i == n_kv - 1)
    def _flush():
        dq_ref[0] = acc_ref[...].T.astype(dq_ref.dtype)


def _flash_bwd_packed_qkv_impl(qkv, out, lse, do, num_heads, scale,
                               block_q):
    """Packed-layout merged backward: (B, N, 3C) qkv grads with NO
    relayout copies — dq/dk/dv are written in the consumer's packed
    column order and only the final [dq | dk | dv] concat remains."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    G = _LANE_GROUP
    ng = C // G
    hpg = G // D
    Np = _pad_rows(N)
    # delta = rowsum(do * out) per head, in the lse layout (B, ng, Np, hpg)
    delta = jnp.einsum(
        "bnhd,bnhd->bnh",
        do.reshape(B, N, num_heads, D).astype(jnp.float32),
        out.reshape(B, N, num_heads, D).astype(jnp.float32))
    delta = delta.reshape(B, N, ng, hpg).transpose(0, 2, 1, 3)
    if Np - N:
        zpad = ((0, 0), (0, Np - N), (0, 0))
        qkv, do = jnp.pad(qkv, zpad), jnp.pad(do, zpad)
        hpad = ((0, 0), (0, 0), (0, Np - N), (0, 0))
        lse, delta = jnp.pad(lse, hpad), jnp.pad(delta, hpad)
    target = (int(os.environ.get("SIMPLE_TAD_ATTN_BWD_BQ", "0")) or block_q
              or max(128, (13 * 2 ** 20) // (Np * 8)))
    bk = _pick_block(Np, target)
    n_kv = Np // bk

    row_full = pl.BlockSpec((1, 1, Np, hpg), lambda b, g, i: (b, g, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_merged_kernel_packed, scale=scale,
                          n_valid=N, bk=bk, n_kv=n_kv, head_dim=D),
        grid=(B, ng, n_kv),
        in_specs=[
            pl.BlockSpec((1, Np, G), lambda b, g, i: (b, 0, g)),
            pl.BlockSpec((1, bk, G),
                         lambda b, g, i, ng=ng: (b, i, ng + g)),
            pl.BlockSpec((1, bk, G),
                         lambda b, g, i, ng=ng: (b, i, 2 * ng + g)),
            pl.BlockSpec((1, Np, G), lambda b, g, i: (b, 0, g)),
            row_full,
            row_full,
        ],
        out_specs=[
            pl.BlockSpec((1, Np, G), lambda b, g, i: (b, 0, g)),
            pl.BlockSpec((1, bk, G), lambda b, g, i: (b, i, g)),
            pl.BlockSpec((1, bk, G), lambda b, g, i: (b, i, g)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((G, Np), jnp.float32)],
    )(qkv, qkv, qkv, do, lse, delta)
    return jnp.concatenate([dq[:, :N], dk[:, :N], dv[:, :N]], axis=-1)


# ------------------------------------------------- int8 static attention ---
# VERDICT r2 #1a: the rejected SIMPLE_TAD_INT8_QK experiment paid per-tile
# *dynamic* absmax on the VPU (318.6 vs 325.3 w/s); static PTQ calibration
# removes exactly that cost, the same way it did for the GEMMs.  Here the
# whole attention core runs int8 on the MXU: the kernel reads the packed
# (B, N, 3C) qkv in int8 (halving its HBM traffic), the score matmul is
# s8xs8->s32 at the MXU's 2x int8 rate, probs quantize to 1/127 steps
# after a max-subtracted softmax (the max pass is REQUIRED here — without
# normalization exp2 overflows the int8 probs), and the PV matmul runs
# int8 with the denominator riding a ones-column (value 1: l = sum p_i8,
# and out = sv * o_i32 / l_i32 — the 127s cancel).
#
# Scales are per layer per head: amax (3, H) f32 in SMEM, calibrated by
# the 'calib' forward (models/layers.py sows qkv_amax) and written into
# the param tree by ops.quant.apply_act_amax.

def _fwd_kernel_int8_packed(amax_ref, q_ref, k_ref, v_ref, o_ref, *,
                            scale, n_valid, head_dim):
    g = pl.program_id(1)
    q = q_ref[0]                                     # (Bq, G) int8
    k = k_ref[0]                                     # (Np, G) int8
    v = v_ref[0]
    G = q.shape[-1]
    D = head_dim
    Np = k.shape[0]
    for h in range(G // D):
        head = g * (G // D) + h
        sl = slice(h * D, (h + 1) * D)
        sq = amax_ref[0, head] * (1.0 / 127.0)
        sk = amax_ref[1, head] * (1.0 / 127.0)
        sv = amax_ref[2, head] * (1.0 / 127.0)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        s = s.astype(jnp.float32) * (sq * sk * scale * LOG2E)
        if n_valid < Np:
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_idx < n_valid, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p_q = jnp.round(jnp.exp2(s - m) * 127.0)     # fp32, values in [0,127]
        # denominator as an fp32 row sum of the QUANTIZED probs (exact:
        # sums of <=127 over N=1568 stay under 2^24) — NOT the bf16
        # kernel's ones-column trick: at Dh=64 the augmented PV doubles
        # the matmul width, which at the int8 2x rate cancels the whole
        # MXU saving (measured 404.9 vs 429 w/s e2e with the ones-column)
        l = jnp.sum(p_q, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p_q.astype(jnp.int8), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)        # (Bq, D)
        o_ref[0, :, sl] = (o.astype(jnp.float32) / l * sv).astype(
            o_ref.dtype)


def flash_attention_qkv_int8(qkv_i8, amax, *, num_heads: int, scale: float,
                             block_q: int = 0):
    """Inference attention on int8-quantized packed qkv (B, N, 3C).

    qkv_i8: per-head symmetric int8 (column order [q | k | v], head-major
    within each); amax: (3, num_heads) f32 calibrated absmax (value i8 *
    amax/127 recovers the real activation).  Output bf16/f32 per qkv's
    promoted float dtype is chosen by the caller via out_dtype — here
    fixed bf16 (the serving dtype).  Requires the packed-layout geometry
    (head_dim | 128, C % 128 == 0); callers gate via int8-attention
    support checks in ops/attention.py.
    """
    B, N, C3 = qkv_i8.shape
    C = C3 // 3
    D = C // num_heads
    Np = _pad_rows(N)
    if Np - N:
        qkv_i8 = jnp.pad(qkv_i8, ((0, 0), (0, Np - N), (0, 0)))
    bq = _packed_block_q(Np, C, D, block_q)
    assert bq > 0, "caller gates on int8-attn support before dispatch"
    G = _LANE_GROUP
    ng = C // G
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_int8_packed, scale=float(scale),
                          n_valid=N, head_dim=D),
        grid=(B, ng, Np // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, Np, G),
                         lambda b, g, qi, ng=ng: (b, 0, ng + g)),
            pl.BlockSpec((1, Np, G),
                         lambda b, g, qi, ng=ng: (b, 0, 2 * ng + g)),
        ],
        out_specs=pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.bfloat16),
    )(amax.astype(jnp.float32), qkv_i8, qkv_i8, qkv_i8)
    return out[:, :N]


def _fwd_kernel_nomax_packed_q8io(sc_ref, q_ref, k_ref, v_ref, o_ref, *,
                                  scale, n_valid, head_dim, int8_out,
                                  mask_keys=False, real_dim=None):
    """int8-STORAGE attention (round 4): int8 qkv IN, float COMPUTE,
    optionally int8 OUT.

    The falsified int8-COMPUTE kernel (_fwd_kernel_int8_packed) lost to
    bf16 because int8 PV forces probs quantization + a max pass while the
    MXU 2x never materializes at Dh=64 — but HALF of that experiment is
    still free money: the HBM traffic.  Here only the STORAGE is int8
    (the qkv GEMM's quantize epilogue fuses on the XLA side, so the bf16
    qkv never touches HBM): QK runs s8xs8->s32 (EXACT integer matmul;
    the static scales fold into the logit scale, so scores match the
    quantized-operand reference bit-for-bit), the max-free softmax stays
    fp32, v dequantizes once in VMEM, and PV runs the transposed bf16
    path unchanged.  sc rides SMEM as (4, H): rows 0-2 = q/k/v absmax,
    row 3 = 127/out_amax for the int8 out epilogue (ignored when
    int8_out=False).
    """
    g = pl.program_id(1)
    q = q_ref[0]                                     # (Bq, G) int8
    k = k_ref[0]                                     # (Np, G) int8
    v = v_ref[0]
    G = q.shape[-1]
    D = head_dim
    hpg = G // D
    for h in range(hpg):
        head = g * hpg + h
        sl = slice(h * D, (h + 1) * D)
        sq = sc_ref[0, head] * (1.0 / 127.0)
        sk = sc_ref[1, head] * (1.0 / 127.0)
        sv = sc_ref[2, head] * (1.0 / 127.0)
        vf = (v[:, sl].astype(jnp.float32) * sv).astype(jnp.bfloat16)
        res = _attend_rows_t(q[:, sl], k[:, sl], vf, scale=scale,
                             n_valid=n_valid, out_dtype=jnp.float32,
                             qk_scale_i8=sq * sk, mask_keys=mask_keys,
                             real_dim=real_dim)
        if int8_out:
            o_ref[0, :, sl] = jnp.clip(jnp.round(res * sc_ref[3, head]),
                                       -127, 127).astype(jnp.int8)
        else:
            o_ref[0, :, sl] = res.astype(o_ref.dtype)


def flash_attention_qkv_i8d(qkv_i8, amax, *, num_heads: int, scale: float,
                            out_amax=None, block_q: int = 0):
    """Inference attention on int8-STORED packed qkv with float compute.

    qkv_i8: (B, N, 3C) per-head symmetric int8 ([q | k | v] column order,
    head-major within each); amax: (3, num_heads) f32 calibrated absmax.
    out_amax: when given, the kernel emits the proj GEMM's int8 through
    the same epilogue as _fwd_kernel_nomax_packed_q8; otherwise bf16.
    Vs the retired int8-COMPUTE path: storage-only quantization keeps the
    bf16 kernel's max-free softmax and transposed PV (no probs
    quantization, no max pass) while halving the qkv HBM read — and the
    producer-side quantize halves the qkv GEMM's output write, which
    ROOFLINE.md measured AT its write floor.  Geometry: packed layout
    (head_dim | 128, C % 128 == 0, single-pass N); callers gate via
    ops.attention.i8_storage_attn_supported.
    """
    B, N, C3 = qkv_i8.shape
    C = C3 // 3
    D = C // num_heads
    Np = _pad_rows(N)
    if Np - N:
        qkv_i8 = jnp.pad(qkv_i8, ((0, 0), (0, Np - N), (0, 0)))
    bq = Np if _full_seq_block(Np, block_q) \
        else _packed_block_q(Np, C, D, block_q)
    assert bq > 0, "caller gates on i8_storage_attn_supported"
    int8_out = out_amax is not None
    inv_row = (127.0 / jnp.maximum(
        jnp.asarray(out_amax if int8_out else 1.0, jnp.float32), 1e-12)
               ) * jnp.ones((1, num_heads), jnp.float32)
    sc = jnp.concatenate([amax.astype(jnp.float32), inv_row], axis=0)
    G = _LANE_GROUP
    ng = C // G
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_nomax_packed_q8io, scale=float(scale),
                          n_valid=N, head_dim=D, int8_out=int8_out),
        grid=(B, ng, Np // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, Np, G),
                         lambda b, g, qi, ng=ng: (b, 0, ng + g)),
            pl.BlockSpec((1, Np, G),
                         lambda b, g, qi, ng=ng: (b, 0, 2 * ng + g)),
        ],
        out_specs=pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
        out_shape=jax.ShapeDtypeStruct(
            (B, Np, C), jnp.int8 if int8_out else jnp.bfloat16),
    )(sc, qkv_i8, qkv_i8, qkv_i8)
    return out[:, :N]


def _i8_head_pad(D: int) -> int:
    """Padded head dim for the int8 separate-operand path: the smallest
    divisor of 128 that holds D (zero int8 codes stay exact zeros through
    QK and PV, so padding is exact; IV2-1B pads 88 -> 128)."""
    for dp in (8, 16, 32, 64, 128):
        if dp >= D:
            return dp
    return 0


def flash_attention_i8d(q_i8, k_i8, v_i8, amax, *, num_heads: int,
                        scale: float, out_amax=None, block_q: int = 0,
                        n_valid=None):
    """Inference attention on int8-STORED separate q/k/v, float compute.

    For models whose q/k cannot stay fused in the qkv GEMM's output:
    InternVideo2's qk_normalization re-normalizes q and k between the
    GEMM and the kernel (reference internvideo2.py:151-219), so the
    quantize fuses into the RMSNorm fusion's epilogue instead of the
    GEMM's.  q_i8/k_i8/v_i8: (B, N, H, D) int8, per-head symmetric
    against amax (3, H) f32.  D needs only 8-alignment — dims not
    dividing 128 are zero-padded here (exact).  Long sequences take the
    int8 key-grid kernel; single-pass geometries the packed q8io kernel
    with separate-operand specs.  Returns (B, N, H, D) int8 (out_amax
    given) or bfloat16.

    n_valid: the caller padded the TOKEN SEQUENCE once at the model level
    (ops.attention.attn_seq_pad), so N is already the kernel-friendly
    physical length and rows >= n_valid hold garbage — no row pads or
    output slices here (their per-layer HBM copies are the point of the
    model-level pad); the kernels mask garbage keys to -inf in the exp2
    pass instead of using the zero-row denominator trick.
    """
    B, N, H, D = q_i8.shape
    mask_valid = n_valid if (n_valid is not None and n_valid < N) else None
    dp = _i8_head_pad(D)
    assert dp, f"head dim {D} > 128 unsupported by the packed layouts"
    # valid head dim under the lane pad: PV streams Dh on the M axis, so
    # padded dims are real MXU rows there (QK's lane-pad is free) — slice
    # the transposed v to the 8-aligned valid rows (IV2-1B: 96-row PV
    # tiles instead of 136, exact; see _attend_rows_t real_dim)
    real_dim = D if (dp != D and D % 8 == 0
                     and not os.environ.get("SIMPLE_TAD_NO_REAL_DH")) \
        else None
    if dp - D:
        cfg = ((0, 0), (0, 0), (0, 0), (0, dp - D))
        q_i8 = jnp.pad(q_i8, cfg)
        k_i8 = jnp.pad(k_i8, cfg)
        v_i8 = jnp.pad(v_i8, cfg)
    C = H * dp
    q = q_i8.reshape(B, N, C)
    k = k_i8.reshape(B, N, C)
    v = v_i8.reshape(B, N, C)
    int8_out = out_amax is not None
    inv_row = (127.0 / jnp.maximum(
        jnp.asarray(out_amax if int8_out else 1.0, jnp.float32), 1e-12)
               ) * jnp.ones((1, H), jnp.float32)
    sc = jnp.concatenate([amax.astype(jnp.float32), inv_row], axis=0)
    G = _LANE_GROUP
    out_dtype = jnp.int8 if int8_out else jnp.bfloat16
    plan = _kv_grid_plan(N, block_q) \
        if not os.environ.get("SIMPLE_TAD_NO_ATTN_PV_T") else None
    if plan is not None:
        Np_q, Np_k, bk, n_kv = plan
        if mask_valid is not None:
            # the model padded the sequence to the plan's query length;
            # a plan whose key grid overshoots (bk * n_kv > Nq) still
            # zero-pads k/v the few extra rows — masked like the rest
            assert Np_q == N, \
                "attn_seq_pad must return the plan's own padded length"
        if Np_q - N:
            q = jnp.pad(q, ((0, 0), (0, Np_q - N), (0, 0)))
        if Np_k - N:
            zpad = ((0, 0), (0, Np_k - N), (0, 0))
            k, v = jnp.pad(k, zpad), jnp.pad(v, zpad)
        rows = _ceil_to((real_dim or dp) + 1, 8)
        out = pl.pallas_call(
            functools.partial(
                _fwd_kernel_nomax_packed_kv_q8io, scale=float(scale),
                n_pad=Np_k - N, head_dim=dp, n_kv=n_kv, int8_out=int8_out,
                mask_valid=mask_valid, real_dim=real_dim),
            grid=(B, C // G, n_kv),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Np_q, G), lambda b, g, ki: (b, 0, g)),
                pl.BlockSpec((1, bk, G), lambda b, g, ki: (b, ki, g)),
                pl.BlockSpec((1, bk, G), lambda b, g, ki: (b, ki, g)),
            ],
            out_specs=pl.BlockSpec((1, Np_q, G), lambda b, g, ki: (b, 0, g)),
            out_shape=jax.ShapeDtypeStruct((B, Np_q, C), out_dtype),
            scratch_shapes=[pltpu.VMEM((G // dp, rows, Np_q), jnp.float32)],
        )(sc, q, k, v)
    else:
        Np_q, Np_k = _pad_rows_qk(N, C, dp, block_q)
        if mask_valid is not None:
            assert Np_q == N, \
                "attn_seq_pad must return the plan's own padded length"
        if Np_q - N:
            q = jnp.pad(q, ((0, 0), (0, Np_q - N), (0, 0)))
        if Np_k - N:
            zpad = ((0, 0), (0, Np_k - N), (0, 0))
            k, v = jnp.pad(k, zpad), jnp.pad(v, zpad)
        bq = Np_q if Np_q == Np_k and _full_seq_block(Np_q, block_q) \
            else _packed_block_q2(Np_q, Np_k, C, dp, block_q)
        assert bq > 0, "caller gates on i8_storage_attn_sep_supported"
        out = pl.pallas_call(
            functools.partial(
                _fwd_kernel_nomax_packed_q8io, scale=float(scale),
                n_valid=N if mask_valid is None else mask_valid,
                head_dim=dp, int8_out=int8_out,
                mask_keys=mask_valid is not None, real_dim=real_dim),
            grid=(B, C // G, Np_q // bq),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
                pl.BlockSpec((1, Np_k, G), lambda b, g, qi: (b, 0, g)),
                pl.BlockSpec((1, Np_k, G), lambda b, g, qi: (b, 0, g)),
            ],
            out_specs=pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
            out_shape=jax.ShapeDtypeStruct((B, Np_q, C), out_dtype),
        )(sc, q, k, v)
    if Np_q - N:
        out = out[:, :N]
    out = out.reshape(B, N, H, dp)
    return out[..., :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _flash_core_packed_qkv(qkv, num_heads, scale, block_q):
    # inference primal: no q/k/v slice copies at all
    return _flash_primal_packed_qkv_impl(qkv, num_heads, scale, block_q)


def _flash_core_packed_qkv_fwd(qkv, num_heads, scale, block_q):
    B, N, C3 = qkv.shape
    C = C3 // 3
    H, D = num_heads, C // num_heads
    if _packed_train_ok(N, C, D, block_q):
        # packed training path (round 4): no relayout copies anywhere —
        # fwd reads the qkv GEMM output directly and the residuals stay
        # in packed layout for the packed merged backward
        out, lse = _name_residuals(
            *_flash_fwd_packed_qkv_impl(qkv, num_heads, scale, block_q))
        return out, (qkv, out, lse)
    tr = lambda t: t.reshape(B, N, H, D).transpose(0, 2, 1, 3).reshape(
        B * H, N, D)
    q, k, v = (tr(qkv[:, :, i * C:(i + 1) * C]) for i in range(3))
    out, lse = _name_residuals(*_flash_fwd_impl(q, k, v, scale, block_q))
    return (out.reshape(B, H, N, D).transpose(0, 2, 1, 3).reshape(B, N, C),
            (q, k, v, out, lse, B))


def _flash_core_packed_qkv_bwd(num_heads, scale, block_q, res, do):
    if len(res) == 3:                       # packed training path
        qkv, out, lse = res
        return (_flash_bwd_packed_qkv_impl(qkv, out, lse, do, num_heads,
                                           scale, block_q),)
    qt, kt, vt, out, lse, B = res
    N, D = qt.shape[1:]
    H = num_heads
    dot = do.reshape(B, N, H, D).transpose(0, 2, 1, 3).reshape(B * H, N, D)
    dq, dk, dv = _flash_bwd_impl(qt, kt, vt, out, lse, dot, scale, block_q)
    back = lambda t: t.reshape(B, H, N, D).transpose(0, 2, 1, 3).reshape(
        B, N, H * D)
    return (jnp.concatenate([back(dq), back(dk), back(dv)], axis=-1),)


_flash_core_packed_qkv.defvjp(_flash_core_packed_qkv_fwd,
                              _flash_core_packed_qkv_bwd)


def _flash_primal_packed_qkv_q8_impl(qkv, num_heads, scale, block_q,
                                     out_amax):
    """qkv-direct packed forward with the int8 output epilogue (inference
    only — the static-quant serving model takes no gradients)."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    pad_n = int(os.environ.get("SIMPLE_TAD_ATTN_PAD_N", "0"))
    Np = max(_pad_rows(N), pad_n)
    if Np - N:
        qkv = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))
    bq = Np if _full_seq_block(Np, block_q) \
        else _packed_block_q(Np, C, D, block_q)
    assert bq > 0, "caller gates on _packed_block_q before dispatching here"
    G = _LANE_GROUP
    ng = C // G
    inv = (127.0 / jnp.maximum(jnp.asarray(out_amax, jnp.float32),
                               1e-12)).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_nomax_packed_q8, scale=float(scale),
                          n_valid=N, head_dim=D),
        grid=(B, ng, Np // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, Np, G),
                         lambda b, g, qi, ng=ng: (b, 0, ng + g)),
            pl.BlockSpec((1, Np, G),
                         lambda b, g, qi, ng=ng: (b, 0, 2 * ng + g)),
        ],
        out_specs=pl.BlockSpec((1, bq, G), lambda b, g, qi: (b, qi, g)),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.int8),
    )(inv, qkv, qkv, qkv)
    return out[:, :N]


def flash_attention_qkv(qkv, *, num_heads: int, scale: float,
                        block_q: int = 0, out_quant_amax=None):
    """Fused attention straight off the packed qkv-GEMM output.

    qkv: (B, N, 3*C) laid out [q | k | v] in the reference's
    (3, H, Dh)-major column order (modeling_finetune.py:100-104) ->
    (B, N, C) attention output.  No dropout (use flash_attention with a
    mask/seed for that); grads route through the blocked BH-layout
    backward.

    Unsupported geometry (head dim not dividing 128, channel axis not
    128-aligned, N beyond the single-pass cap) falls back to slicing
    q/k/v out and using flash_attention's own dispatch (ADVICE r2: the
    packed impl asserts otherwise, which -O strips).

    out_quant_amax: when given (static-quant serving), the kernel
    quantizes the attention output against this calibrated absmax and
    returns int8 (the proj GEMM's activation) — the quantize pass XLA
    cannot fuse across the Pallas boundary disappears and output HBM
    traffic halves.  Inference-only; ignored on the fallback path
    (callers handle a float return there).
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    if N > MAX_SINGLE_PASS_N or _packed_block_q(_pad_rows(N), C, D,
                                                block_q) <= 0:
        qkv4 = qkv.reshape(B, N, 3, num_heads, D)
        out = flash_attention(qkv4[:, :, 0], qkv4[:, :, 1], qkv4[:, :, 2],
                              scale=scale, block_q=block_q)
        return out.reshape(B, N, C)
    if out_quant_amax is not None:
        return _flash_primal_packed_qkv_q8_impl(qkv, num_heads,
                                                float(scale), block_q,
                                                out_quant_amax)
    return _flash_core_packed_qkv(qkv, num_heads, float(scale), block_q)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core_packed(q, k, v, num_heads, scale, block_q):
    # inference primal: transpose-free kernel on the (B, N, H*D) layout
    return _flash_primal_packed_impl(q, k, v, num_heads, scale, block_q)


def _flash_core_packed_fwd(q, k, v, num_heads, scale, block_q):
    # training forward: the blocked bwd kernels want the (B*H, N, D)
    # layout, so transpose here (the relayout cost only exists under grad)
    B, N, C = q.shape
    H, D = num_heads, C // num_heads
    tr = lambda t: t.reshape(B, N, H, D).transpose(0, 2, 1, 3).reshape(
        B * H, N, D)
    out, lse = _name_residuals(
        *_flash_fwd_impl(tr(q), tr(k), tr(v), scale, block_q))
    res = (tr(q), tr(k), tr(v), out, lse, B)
    return (out.reshape(B, H, N, D).transpose(0, 2, 1, 3).reshape(B, N, C),
            res)


def _flash_core_packed_bwd(num_heads, scale, block_q, res, do):
    qt, kt, vt, out, lse, B = res
    N, D = qt.shape[1:]
    H = num_heads
    dot = do.reshape(B, N, H, D).transpose(0, 2, 1, 3).reshape(B * H, N, D)
    dq, dk, dv = _flash_bwd_impl(qt, kt, vt, out, lse, dot, scale, block_q)
    back = lambda t: t.reshape(B, H, N, D).transpose(0, 2, 1, 3).reshape(
        B, N, H * D)
    return back(dq), back(dk), back(dv)


_flash_core_packed.defvjp(_flash_core_packed_fwd, _flash_core_packed_bwd)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, n_valid):
    # scale q BEFORE the matmul: a (Bq, D) multiply instead of a full
    # (Bq, Np) score-tile pass
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(
        q_ref.dtype)                                         # (Bq, D)
    k = k_ref[0]                                             # (Np, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Bq, Np)
    if n_valid < k.shape[0]:
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < n_valid, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)                    # (Bq, 1)
    p = jnp.exp2(s - m)
    D = v.shape[1]
    if D % 128:
        # denominator on the MXU via a ones-column in v (free lanes at
        # Dh=64) — same trick as the inference kernel; lse = m + log2(l)
        Np = v.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (Np, 128 - D % 128), 1)
        v_aug = jnp.concatenate([v, (col == 0).astype(v.dtype)], axis=1)
        o_full = jax.lax.dot_general(
            p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o, l = o_full[:, :D], o_full[:, D:D + 1]
    else:
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # normalize AFTER the matmul: a (Bq, Dh) divide instead of a full
    # (Bq, N) pass over p
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log2(l)                             # base-2 lse


def _flash_fwd_impl(q, k, v, scale, block_q):
    BH, N, D = q.shape
    Np = _pad_rows(N)
    if Np - N:
        zpad = ((0, 0), (0, Np - N), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)
    bq = _pick_block(Np, block_q)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=N),
        grid=(BH, Np // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, Np, D), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, Np, D), lambda b, qi: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, qi: (b, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Np, 1), jnp.float32),
        ],
    )(q, k, v)
    return out[:, :N], lse[:, :N, 0]


# ----------------------------------------------------------- with dropout ---
# Attention dropout on the fast path (reference flash_attention_class.py:26-69
# supports dropout_p; round 1 silently fell back to the naive N^2 path).
# Semantics match torch: softmax -> dropout(p)*1/keep -> @v, so the lse /
# normalization is PRE-dropout.  The keep-mask is generated once in XLA as
# int8 (BH, N, N) and streamed through all three kernels; at ~1 byte per
# score element it adds <1% HBM traffic to a training step, while the naive
# fallback materialized fp32 logits AND probs.

def _fwd_kernel_drop(q_ref, k_ref, v_ref, m_ref, o_ref, lse_ref, *,
                     scale, n_valid, inv_keep):
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if n_valid < k.shape[0]:
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < n_valid, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    pd = p * (m_ref[0].astype(jnp.float32) * inv_keep)
    o = jax.lax.dot_general(
        pd.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log2(l)


def _bwd_dq_kernel_drop(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        m_ref, dq_ref, *, scale, n_valid, inv_keep):
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if n_valid < k.shape[0]:
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < n_valid, s, NEG_INF)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = dp * (m_ref[0].astype(jnp.float32) * inv_keep)
    ds = p * (dp - delta)
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel_drop(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         m_ref, dk_ref, dv_ref, *, scale, n_valid, inv_keep):
    """TRANSPOSED orientation ((Bk, Np) score tiles): the int8 keep-mask
    then streams as ROW blocks of the pre-transposed (BH, Nk, Nq) mask.
    Column blocks of the original mask are illegal on TPU whenever the
    key-block width isn't lane-aligned (Mosaic requires the last block
    dim be a multiple of 128 or the full axis — N=1568 has no 128-aligned
    divisors; caught on hardware, invisible to interpret mode)."""
    q_raw = q_ref[0]                                         # (Np, D)
    q = (q_raw.astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]                                             # (Bk, D)
    v = v_ref[0]
    do = do_ref[0]                                           # (Np, D)
    lse = lse_ref[0]                                         # (1, Np)
    delta = delta_ref[0]                                     # (1, Np)
    s = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Bk, Np)
    if n_valid < q_raw.shape[0]:
        # padded q columns: their lse is 0, exp2(s) could explode
        q_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(q_idx < n_valid, s, NEG_INF)
    p = jnp.exp2(s - lse)                                    # (Bk, Np)
    mt = m_ref[0].astype(jnp.float32) * inv_keep             # (Bk, Np)
    pd = p * mt
    dv = jax.lax.dot_general(
        pd.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Bk, D)
    dp = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * mt             # (Bk, Np)
    ds = p * (dp - delta)
    dk = jax.lax.dot_general(
        ds.astype(q_raw.dtype), q_raw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (Bk, D)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_drop_fwd_impl(q, k, v, mask, scale, keep_prob, block_q):
    BH, N, D = q.shape
    Np = _pad_rows(N)
    if Np - N:
        zpad = ((0, 0), (0, Np - N), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)
        mask = jnp.pad(mask, ((0, 0), (0, Np - N), (0, Np - N)))
    # the int8 mask tile (double-buffered) rides along with the fp32
    # score strip: full-sequence blocks OOM scoped vmem (20.6M measured
    # at N=1568), so budget ~10 bytes/row-element
    bq = _pick_block(Np, block_q if block_q > 0 else
                     max(128, (11 * 2 ** 20) // (Np * 10)))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_drop, scale=scale, n_valid=N,
                          inv_keep=1.0 / keep_prob),
        grid=(BH, Np // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, Np, D), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, Np, D), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, bq, Np), lambda b, qi: (b, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, qi: (b, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Np, 1), jnp.float32),
        ],
    )(q, k, v, mask)
    return out[:, :N], lse[:, :N, 0]


def _flash_drop_bwd_impl(q, k, v, mask, o, lse, do, scale, keep_prob,
                         block_q):
    BH, N, D = q.shape
    Np = _pad_rows(N)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    lse3 = lse[:, :, None]
    delta3 = delta[:, :, None]
    if Np - N:
        zpad3 = ((0, 0), (0, Np - N), (0, 0))
        q, k, v, do = (jnp.pad(a, zpad3) for a in (q, k, v, do))
        lse3, delta3 = jnp.pad(lse3, zpad3), jnp.pad(delta3, zpad3)
        mask = jnp.pad(mask, ((0, 0), (0, Np - N), (0, Np - N)))
    bq = _pick_block(Np, block_q if block_q > 0 else
                     max(128, (3 * 2 ** 20) // (Np * 4)))
    inv_keep = 1.0 / keep_prob

    qkv_spec_full = pl.BlockSpec((1, Np, D), lambda b, i: (b, 0, 0))
    blk_spec = pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0))
    row_blk = pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0))
    lane_full = pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0))
    mask_rows = pl.BlockSpec((1, bq, Np), lambda b, i: (b, i, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_drop, scale=scale, n_valid=N,
                          inv_keep=inv_keep),
        grid=(BH, Np // bq),
        in_specs=[blk_spec, qkv_spec_full, qkv_spec_full, blk_spec,
                  row_blk, row_blk, mask_rows],
        out_specs=blk_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
    )(q, k, v, do, lse3, delta3, mask)

    # dkv runs transposed (see its docstring): mask transposed once here
    # in XLA, lse/delta as (1, Np) lane vectors
    mask_t = jnp.swapaxes(mask, 1, 2)
    lse_row = jnp.swapaxes(lse3, 1, 2)
    delta_row = jnp.swapaxes(delta3, 1, 2)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_drop, scale=scale, n_valid=N,
                          inv_keep=inv_keep),
        grid=(BH, Np // bq),
        in_specs=[qkv_spec_full, blk_spec, blk_spec, qkv_spec_full,
                  lane_full, lane_full, mask_rows],
        out_specs=[blk_spec, blk_spec],
        out_shape=[jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
                   jax.ShapeDtypeStruct((BH, Np, D), q.dtype)],
    )(q, k, v, do, lse_row, delta_row, mask_t)

    return dq[:, :N], dk[:, :N], dv[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core_drop(q, k, v, mask, scale, keep_prob, block_q):
    out, _ = _flash_drop_fwd_impl(q, k, v, mask, scale, keep_prob, block_q)
    return out


def _flash_core_drop_fwd(q, k, v, mask, scale, keep_prob, block_q):
    out, lse = _name_residuals(
        *_flash_drop_fwd_impl(q, k, v, mask, scale, keep_prob, block_q))
    return out, (q, k, v, mask, out, lse)


def _flash_core_drop_bwd(scale, keep_prob, block_q, res, do):
    q, k, v, mask, out, lse = res
    dq, dk, dv = _flash_drop_bwd_impl(q, k, v, mask, out, lse, do, scale,
                                      keep_prob, block_q)
    return dq, dk, dv, jnp.zeros_like(mask)


_flash_core_drop.defvjp(_flash_core_drop_fwd, _flash_core_drop_bwd)


# ----------------------------------------------- dropout, in-kernel PRNG ---
# The mask-array path above is exact and testable on CPU, but materializing
# (BH, N, N) int8 masks per layer costs ~2.1x on a real training step
# (402 -> 844 ms measured: threefry generation + 708 MB/layer of traffic,
# regenerated under remat).  The production path instead draws the keep
# bits from the TPU's hardware PRNG *inside* each kernel: bits come in
# (B0, B0) units seeded by (seed, bh, q_unit, k_unit), so the forward and
# both backward kernels regenerate identical masks from a 2-word seed and
# no mask ever touches HBM.  This is the same trick the reference's CUDA
# flash-attn uses with Philox (flash_attention_class.py:26-69).
# Interpret mode returns zero bits, so numerical validation runs on
# hardware (scripts/check_dropout_rng.py); CPU tests cover the mask path.

def _drop_block(Np: int) -> int:
    """Shared unit/block size for all three dropout-RNG kernels."""
    return _pick_block(Np, max(128, (11 * 2 ** 20) // (Np * 10)))


_SEED_MIX = -1640531527   # 0x9E3779B9 as int32: odd => bijective in mix


def _unit_keep(seed_ref, unit_id, shape, thresh, inv_keep):
    """(B0, B0) keep-mask unit scaled by 1/keep, as f32.

    Mosaic's prng_seed takes at most 2 words, so the (bh, q_unit, k_unit)
    coordinates are packed bijectively into ``unit_id`` by the caller and
    spread over the seed space with a golden-ratio multiply."""
    pltpu.prng_seed(seed_ref[0, 0],
                    seed_ref[0, 1] + unit_id * _SEED_MIX)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return jnp.where(bits >= thresh, inv_keep, 0.0)


def _fwd_kernel_drop_rng(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                         scale, n_valid, thresh, inv_keep, b0):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (B0, Np)
    if n_valid < k.shape[0]:
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < n_valid, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)                    # pre-dropout
    nu = k.shape[0] // b0
    cols = []
    for kb in range(nu):
        uid = (bh * nu + qi) * nu + kb
        keep = _unit_keep(seed_ref, uid, (b0, b0), thresh, inv_keep)
        cols.append(p[:, kb * b0:(kb + 1) * b0] * keep)
    pd = jnp.concatenate(cols, axis=1)
    o = jax.lax.dot_general(
        pd.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log2(l)


def _bwd_dq_kernel_drop_rng(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                            delta_ref, dq_ref, *, scale, n_valid, thresh,
                            inv_keep, b0):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (B0, Np)
    if n_valid < k.shape[0]:
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < n_valid, s, NEG_INF)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (B0, Np)
    nu = k.shape[0] // b0
    cols = []
    for kb in range(nu):
        uid = (bh * nu + qi) * nu + kb
        keep = _unit_keep(seed_ref, uid, (b0, b0), thresh, inv_keep)
        cols.append(dp[:, kb * b0:(kb + 1) * b0] * keep)
    dpm = jnp.concatenate(cols, axis=1)
    ds = p * (dpm - delta)
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel_drop_rng(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                             delta_ref, dk_ref, dv_ref, *, scale, n_valid,
                             thresh, inv_keep, b0):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    q_raw = q_ref[0]                                         # (Np, D)
    q = (q_raw.astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]                                             # (B0, D)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Np, B0)
    if n_valid < q.shape[0]:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(q_idx < n_valid, s, NEG_INF)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Np, B0)
    nu = q.shape[0] // b0
    pd_rows, dpm_rows = [], []
    for qb in range(nu):
        uid = (bh * nu + qb) * nu + ki
        keep = _unit_keep(seed_ref, uid, (b0, b0), thresh, inv_keep)
        sl = slice(qb * b0, (qb + 1) * b0)
        pd_rows.append(p[sl] * keep)
        dpm_rows.append(dp[sl] * keep)
    pd = jnp.concatenate(pd_rows, axis=0)
    dpm = jnp.concatenate(dpm_rows, axis=0)
    dv = jax.lax.dot_general(
        pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (B0, D)
    ds = p * (dpm - delta)
    dk = jax.lax.dot_general(
        ds.astype(q_raw.dtype), q_raw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_merged_kernel_drop_rng(seed_ref, q_ref, k_ref, v_ref, do_ref,
                                lse_ref, delta_ref, dq_ref, dk_ref, dv_ref,
                                *, scale, n_valid, thresh, inv_keep, b0):
    """Dropout-RNG analogue of _bwd_merged_kernel: dq+dk+dv in one pass
    over kv blocks.  The split dkv kernel already regenerates the full
    column of keep units and computes ds — the merged form reuses that ds
    for the dq contribution, dropping the separate dq kernel's QK/doV
    matmuls and its second regeneration of every mask unit."""
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    q_raw = q_ref[0]                                         # (Np, D)
    q = (q_raw.astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]                                             # (b0, D)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Np, b0)
    if n_valid < q.shape[0]:
        # padded QUERY rows (lse 0: exp2 would explode) and padded KV
        # columns (must not contribute to dq; dk/dv padded rows get
        # sliced off but dq accumulates over every block)
        q_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * b0
        s = jnp.where((q_idx < n_valid) & (kv_idx < n_valid), s, NEG_INF)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Np, b0)
    nu = q.shape[0] // b0
    pd_rows, dpm_rows = [], []
    for qb in range(nu):
        uid = (bh * nu + qb) * nu + ki
        keep = _unit_keep(seed_ref, uid, (b0, b0), thresh, inv_keep)
        sl = slice(qb * b0, (qb + 1) * b0)
        pd_rows.append(p[sl] * keep)
        dpm_rows.append(dp[sl] * keep)
    pd = jnp.concatenate(pd_rows, axis=0)
    dpm = jnp.concatenate(dpm_rows, axis=0)
    # D-major orientation (see _bwd_merged_kernel_dt: 341.0 vs 360.2
    # ms/step for row-major on the no-dropout path)
    dvt = jax.lax.dot_general(
        do, pd.astype(do.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (D, b0)
    ds = p * (dpm - delta)                                   # (Np, b0)
    dkt = jax.lax.dot_general(
        q_raw, ds.astype(q_raw.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (D, b0)
    dqt_c = jax.lax.dot_general(
        k, ds.astype(k.dtype), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (D, Np)
    dk_ref[0] = dkt.T.astype(dk_ref.dtype)
    dv_ref[0] = dvt.T.astype(dv_ref.dtype)

    @pl.when(ki == 0)
    def _init():
        dq_ref[0] = dqt_c

    @pl.when(ki > 0)
    def _accum():
        dq_ref[0] += dqt_c


def _drop_rng_thresh(rate: float) -> int:
    return min(int(rate * 2 ** 32), 2 ** 32 - 1)


def _flash_drop_rng_fwd_impl(q, k, v, seed, scale, keep_prob):
    BH, N, D = q.shape
    Np = _pad_rows(N)
    if Np - N:
        zpad = ((0, 0), (0, Np - N), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)
    b0 = _drop_block(Np)
    kw = dict(scale=scale, n_valid=N, thresh=_drop_rng_thresh(1 - keep_prob),
              inv_keep=1.0 / keep_prob, b0=b0)
    seed_spec = pl.BlockSpec((1, 2), lambda b, i: (0, 0),
                             memory_space=pltpu.SMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_drop_rng, **kw),
        grid=(BH, Np // b0),
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, b0, D), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, Np, D), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, Np, D), lambda b, qi: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, b0, D), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, b0, 1), lambda b, qi: (b, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Np, 1), jnp.float32),
        ],
    )(seed, q, k, v)
    return out[:, :N], lse[:, :N, 0]


def _flash_drop_rng_bwd_impl(q, k, v, seed, o, lse, do, scale, keep_prob):
    BH, N, D = q.shape
    Np = _pad_rows(N)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    lse3 = lse[:, :, None]
    delta3 = delta[:, :, None]
    if Np - N:
        zpad3 = ((0, 0), (0, Np - N), (0, 0))
        q, k, v, do = (jnp.pad(a, zpad3) for a in (q, k, v, do))
        lse3, delta3 = jnp.pad(lse3, zpad3), jnp.pad(delta3, zpad3)
    b0 = _drop_block(Np)
    kw = dict(scale=scale, n_valid=N, thresh=_drop_rng_thresh(1 - keep_prob),
              inv_keep=1.0 / keep_prob, b0=b0)
    seed_spec = pl.BlockSpec((1, 2), lambda b, i: (0, 0),
                             memory_space=pltpu.SMEM)
    qkv_spec_full = pl.BlockSpec((1, Np, D), lambda b, i: (b, 0, 0))
    blk_spec = pl.BlockSpec((1, b0, D), lambda b, i: (b, i, 0))
    row_blk = pl.BlockSpec((1, b0, 1), lambda b, i: (b, i, 0))
    row_full = pl.BlockSpec((1, Np, 1), lambda b, i: (b, 0, 0))

    if not os.environ.get("SIMPLE_TAD_ATTN_BWD_SPLIT"):
        dqt, dk, dv = pl.pallas_call(
            functools.partial(_bwd_merged_kernel_drop_rng, **kw),
            grid=(BH, Np // b0),
            in_specs=[seed_spec, qkv_spec_full, blk_spec, blk_spec,
                      qkv_spec_full, row_full, row_full],
            out_specs=[pl.BlockSpec((1, D, Np), lambda b, i: (b, 0, 0)),
                       blk_spec, blk_spec],
            out_shape=[jax.ShapeDtypeStruct((BH, D, Np), jnp.float32),
                       jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
                       jax.ShapeDtypeStruct((BH, Np, D), q.dtype)],
        )(seed, q, k, v, do, lse3, delta3)
        dq = dqt.transpose(0, 2, 1)[:, :N].astype(q.dtype)
        return dq, dk[:, :N], dv[:, :N]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_drop_rng, **kw),
        grid=(BH, Np // b0),
        in_specs=[seed_spec, blk_spec, qkv_spec_full, qkv_spec_full,
                  blk_spec, row_blk, row_blk],
        out_specs=blk_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
    )(seed, q, k, v, do, lse3, delta3)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_drop_rng, **kw),
        grid=(BH, Np // b0),
        in_specs=[seed_spec, qkv_spec_full, blk_spec, blk_spec,
                  qkv_spec_full, row_full, row_full],
        out_specs=[blk_spec, blk_spec],
        out_shape=[jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
                   jax.ShapeDtypeStruct((BH, Np, D), q.dtype)],
    )(seed, q, k, v, do, lse3, delta3)

    return dq[:, :N], dk[:, :N], dv[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_core_drop_rng(q, k, v, seed, scale, keep_prob):
    out, _ = _flash_drop_rng_fwd_impl(q, k, v, seed, scale, keep_prob)
    return out


def _flash_core_drop_rng_fwd(q, k, v, seed, scale, keep_prob):
    out, lse = _name_residuals(
        *_flash_drop_rng_fwd_impl(q, k, v, seed, scale, keep_prob))
    return out, (q, k, v, seed, out, lse)


def _flash_core_drop_rng_bwd(scale, keep_prob, res, do):
    q, k, v, seed, out, lse = res
    dq, dk, dv = _flash_drop_rng_bwd_impl(q, k, v, seed, out, lse, do,
                                          scale, keep_prob)
    return dq, dk, dv, jnp.zeros_like(seed)


_flash_core_drop_rng.defvjp(_flash_core_drop_rng_fwd,
                            _flash_core_drop_rng_bwd)


# --------------------------------------------------------------- backward ---

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale, n_valid):
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(
        q_ref.dtype)                                         # (Bq, D)
    k = k_ref[0]                                             # (Np, D)
    v = v_ref[0]
    do = do_ref[0]                                           # (Bq, D)
    lse = lse_ref[0]                                         # (Bq, 1)
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Bq, Np)
    if n_valid < k.shape[0]:
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < n_valid, s, NEG_INF)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Bq, Np)
    ds = p * (dp - delta)
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # natural scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, n_valid):
    q_raw = q_ref[0]                                         # (Np, D)
    q = (q_raw.astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]                                             # (Bk, D)
    v = v_ref[0]
    do = do_ref[0]                                           # (Np, D)
    lse = lse_ref[0]                                         # (Np, 1)
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Np, Bk)
    if n_valid < q.shape[0]:
        # mask padded *query* rows: their lse is 0, exp2(s) could explode.
        q_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(q_idx < n_valid, s, NEG_INF)
    p = jnp.exp2(s - lse)                                    # (Np, Bk)
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Bk, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Np, Bk)
    ds = p * (dp - delta)
    dk = jax.lax.dot_general(
        ds.astype(q_raw.dtype), q_raw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (Bk, D)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_merged_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dq_ref, dk_ref, dv_ref, *, scale, n_valid, bk):
    """dq + dk + dv in ONE pass over kv blocks.

    The split dq/dkv kernels each recompute s = qk^T and dp = do v^T, so
    the backward pays 7 matmuls per tile where 5 carry information.  Here
    the grid walks kv blocks; dk/dv write their block and dq accumulates
    across grid steps into a revisited fp32 output (the TPU grid is
    sequential, so the accumulation is well-defined).  Also reads
    q/do/lse/delta once instead of twice.
    """
    i = pl.program_id(1)
    q_raw = q_ref[0]                                         # (Np, D)
    q = (q_raw.astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]                                             # (bk, D)
    v = v_ref[0]
    do = do_ref[0]                                           # (Np, D)
    lse = lse_ref[0]                                         # (Np, 1)
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Np, bk)
    if n_valid < q.shape[0]:
        # mask padded QUERY rows (their lse is 0: exp2 would explode) and
        # padded KV columns (they must not contribute to dq)
        q_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * bk
        s = jnp.where((q_idx < n_valid) & (kv_idx < n_valid), s, NEG_INF)
    p = jnp.exp2(s - lse)                                    # (Np, bk)
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bk, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Np, bk)
    ds = p * (dp - delta)
    dk = jax.lax.dot_general(
        ds.astype(q_raw.dtype), q_raw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (bk, D)
    dq_c = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (Np, D)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dq_ref[0] = dq_c

    @pl.when(i > 0)
    def _accum():
        dq_ref[0] += dq_c


def _bwd_merged_kernel_dt(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dq_ref, dk_ref, dv_ref, *, scale, n_valid, bk):
    """Merged backward with D-MAJOR matmul orientation (the default;
    SIMPLE_TAD_ATTN_BWD_ROWMAJOR=1 restores the row-major form).

    The standard orientation's three output matmuls (dv, dk, dq) are all
    Dh(=64) lanes wide — half the MXU idles on the N axis, same as the
    forward PV before the transposed-PV orientation.  Computing dv^T /
    dk^T as (D, bk) and dq^T as (D, Np) puts the head dim on the SUBLANE
    axis and the long dim on lanes.  dq stays D-major all the way out
    (full-block spec; callers transpose outside, folding into the
    relayout XLA already does); dk/dv transpose back in-kernel because a
    (1, D, bk) output block is illegal for bk not a lane multiple (1568
    has no 128-multiple divisors) — same trade the forward transposed-PV
    makes.
    """
    i = pl.program_id(1)
    q_raw = q_ref[0]                                         # (Np, D)
    q = (q_raw.astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]                                             # (bk, D)
    v = v_ref[0]
    do = do_ref[0]                                           # (Np, D)
    lse = lse_ref[0]                                         # (Np, 1)
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Np, bk)
    if n_valid < q.shape[0]:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * bk
        s = jnp.where((q_idx < n_valid) & (kv_idx < n_valid), s, NEG_INF)
    p = jnp.exp2(s - lse)                                    # (Np, bk)
    dvt = jax.lax.dot_general(
        do, p.astype(do.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (D, bk)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Np, bk)
    ds = p * (dp - delta)
    dkt = jax.lax.dot_general(
        q_raw, ds.astype(q_raw.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (D, bk)
    dqt_c = jax.lax.dot_general(
        k, ds.astype(k.dtype), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (D, Np)
    dk_ref[0] = dkt.T.astype(dk_ref.dtype)
    dv_ref[0] = dvt.T.astype(dv_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dq_ref[0] = dqt_c

    @pl.when(i > 0)
    def _accum():
        dq_ref[0] += dqt_c


def _flash_bwd_impl(q, k, v, o, lse, do, scale, block_q):
    BH, N, D = q.shape
    Np = _pad_rows(N)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    lse3 = lse[:, :, None]                                   # (BH, N, 1)
    delta3 = delta[:, :, None]
    if Np - N:
        zpad3 = ((0, 0), (0, Np - N), (0, 0))
        q, k, v, do = (jnp.pad(a, zpad3) for a in (q, k, v, do))
        lse3, delta3 = jnp.pad(lse3, zpad3), jnp.pad(delta3, zpad3)
    # The backward computes 4 fp32 (block, Np) score tiles (s, p, dp, ds)
    # but Mosaic keeps ~2 live (s reused by p, dp by ds): the measured
    # bq=1568 scoped-vmem OOM was 25.27M = 2 full tiles + operands
    # against the 16M scoped limit, while bq=784 (2 x 4.9M tiles) ran —
    # and ran FASTER: 361.4 vs 370.5 ms/step ViT-B batch-24 (bq=392).
    # Budget: two live fp32 tiles within ~13M.
    target = (int(os.environ.get("SIMPLE_TAD_ATTN_BWD_BQ", "0")) or block_q
              or max(128, (13 * 2 ** 20) // (Np * 8)))
    bq = _pick_block(Np, target)

    if not os.environ.get("SIMPLE_TAD_ATTN_BWD_SPLIT"):
        qkv_full = pl.BlockSpec((1, Np, D), lambda b, i: (b, 0, 0))
        kv_blk = pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0))
        row_full = pl.BlockSpec((1, Np, 1), lambda b, i: (b, 0, 0))
        if not os.environ.get("SIMPLE_TAD_ATTN_BWD_ROWMAJOR"):
            # D-major matmul orientation (head dim on sublanes): 341.0 vs
            # 360.2 ms/step ViT-B batch-24 for the row-major merged form
            dqt, dk, dv = pl.pallas_call(
                functools.partial(_bwd_merged_kernel_dt, scale=scale,
                                  n_valid=N, bk=bq),
                grid=(BH, Np // bq),
                in_specs=[qkv_full, kv_blk, kv_blk, qkv_full, row_full,
                          row_full],
                out_specs=[pl.BlockSpec((1, D, Np), lambda b, i: (b, 0, 0)),
                           kv_blk, kv_blk],
                out_shape=[jax.ShapeDtypeStruct((BH, D, Np), jnp.float32),
                           jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
                           jax.ShapeDtypeStruct((BH, Np, D), q.dtype)],
            )(q, k, v, do, lse3, delta3)
            dq = dqt.transpose(0, 2, 1)[:, :N].astype(q.dtype)
            return dq, dk[:, :N], dv[:, :N]
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_merged_kernel, scale=scale, n_valid=N,
                              bk=bq),
            grid=(BH, Np // bq),
            in_specs=[qkv_full, kv_blk, kv_blk, qkv_full, row_full,
                      row_full],
            out_specs=[qkv_full, kv_blk, kv_blk],
            out_shape=[jax.ShapeDtypeStruct((BH, Np, D), jnp.float32),
                       jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
                       jax.ShapeDtypeStruct((BH, Np, D), q.dtype)],
        )(q, k, v, do, lse3, delta3)
        return dq[:, :N].astype(q.dtype), dk[:, :N], dv[:, :N]

    qkv_spec_full = pl.BlockSpec((1, Np, D), lambda b, i: (b, 0, 0))
    blk_spec = pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0))
    row_blk = pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0))
    row_full = pl.BlockSpec((1, Np, 1), lambda b, i: (b, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, n_valid=N),
        grid=(BH, Np // bq),
        in_specs=[blk_spec, qkv_spec_full, qkv_spec_full, blk_spec,
                  row_blk, row_blk],
        out_specs=blk_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
    )(q, k, v, do, lse3, delta3)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, n_valid=N),
        grid=(BH, Np // bq),
        in_specs=[qkv_spec_full, blk_spec, blk_spec, qkv_spec_full,
                  row_full, row_full],
        out_specs=[blk_spec, blk_spec],
        out_shape=[jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
                   jax.ShapeDtypeStruct((BH, Np, D), q.dtype)],
    )(q, k, v, do, lse3, delta3)

    return dq[:, :N], dk[:, :N], dv[:, :N]


# ------------------------------------------------------------- public api ---

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_core(q, k, v, scale, block_q):
    # primal (no autodiff in flight): fast inference kernel
    return _flash_primal_impl(q, k, v, scale, block_q)


def _flash_core_fwd(q, k, v, scale, block_q):
    out, lse = _name_residuals(*_flash_fwd_impl(q, k, v, scale, block_q))
    return out, (q, k, v, out, lse)


def _flash_core_bwd(scale, block_q, res, do):
    q, k, v, out, lse = res
    return _flash_bwd_impl(q, k, v, out, lse, do, scale, block_q)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(q, k, v, *, scale: float, block_q: int = 0,
                    dropout_mask=None, dropout_seed=None,
                    keep_prob: float = 1.0, out_quant_amax=None):
    """Non-causal fused attention.  q, k, v: (B, N, H, Dh) -> (B, N, H, Dh).

    out_quant_amax: static-quant serving epilogue — the kernel quantizes
    its output against this calibrated absmax and returns int8 (the proj
    GEMM's activation).  Only honored on the packed inference branch
    (no dropout, supported geometry); callers must handle a float return
    on every other path.

    Attention dropout (torch F.dropout semantics on the softmax probs,
    flash_attention_class.py:26-69), two mutually exclusive forms:
      dropout_mask: explicit (B, H, N, N) int8 keep-mask — exact, CPU
        testable, but materializes N^2 bytes per head (slow at scale).
      dropout_seed: (1, 2) int32 — keep bits drawn INSIDE the kernels
        from the TPU hardware PRNG; nothing is materialized.  Production
        training path (452 ms/step at ViT-B batch-24 attn_drop 0.1 vs
        402 without dropout; the mask form costs 844 ms).
    """
    B, N, H, D = q.shape
    if N > MAX_SINGLE_PASS_N:
        return jax.nn.dot_product_attention(q, k, v, scale=scale,
                                            implementation="xla")
    dropping = dropout_mask is not None or dropout_seed is not None
    if (not dropping and not os.environ.get("SIMPLE_TAD_NO_PACKED_ATTN")
            and not os.environ.get("SIMPLE_TAD_SAFE_SOFTMAX")
            and _packed_block_q(_pad_rows(N), H * D, D, block_q) > 0):
        if out_quant_amax is not None:
            out = _flash_primal_packed_q8_impl(
                q.reshape(B, N, H * D), k.reshape(B, N, H * D),
                v.reshape(B, N, H * D), H, float(scale), block_q,
                out_quant_amax)
            return out.reshape(B, N, H, D)
        # transpose-free packed layout (inference primal; grad transposes
        # inside the custom-vjp fwd)
        out = _flash_core_packed(q.reshape(B, N, H * D),
                                 k.reshape(B, N, H * D),
                                 v.reshape(B, N, H * D),
                                 H, float(scale), block_q)
        return out.reshape(B, N, H, D)
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    if dropout_seed is not None:
        out = _flash_core_drop_rng(qt, kt, vt, dropout_seed, float(scale),
                                   float(keep_prob))
    elif dropout_mask is not None:
        mt = dropout_mask.reshape(B * H, N, N)
        out = _flash_core_drop(qt, kt, vt, mt, float(scale),
                               float(keep_prob), block_q)
    else:
        out = _flash_core(qt, kt, vt, float(scale), block_q)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)
