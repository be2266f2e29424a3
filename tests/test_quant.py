"""Int8 inference path: quantized logits track fp32, evaluator integration."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
from simple_tad_tpu.ops.quant import (int8_matmul, quantize_vit_params,
                                      quantize_weight)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, (64, 128)).astype(np.float32)
    w_q, s = quantize_weight(w)
    assert w_q.dtype == np.int8 and s.shape == (128,)
    recon = w_q.astype(np.float32) * s
    assert np.abs(recon - w).max() <= s.max() * 0.51


def test_int8_matmul_close_to_fp32():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1.0, (32, 64)).astype(np.float32)
    w = rng.normal(0, 0.05, (64, 128)).astype(np.float32)
    w_q, s = quantize_weight(w)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w_q),
                                 jnp.asarray(s)))
    want = x @ w
    denom = np.abs(want).mean() + 1e-6
    assert np.abs(got - want).mean() / denom < 0.02


def _model(quant):
    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=64, depth=2,
                    num_heads=2, num_classes=2, attn_impl="naive",
                    quant=quant)
    return VisionTransformer(cfg)


def test_quant_model_tracks_fp32():
    fp = _model(False)
    params = fp.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))
    want = np.asarray(fp.apply({"params": params}, x))

    q = _model(True)
    qparams = quantize_vit_params(params)
    got = np.asarray(q.apply({"params": qparams}, x))
    # int8 w8a8: feature-level quantization noise; logits must track
    assert np.abs(got - want).max() < 0.05, np.abs(got - want).max()
    # rankings preserved
    assert (np.argmax(got, -1) == np.argmax(want, -1)).mean() >= 0.75


def test_evaluator_quant8(tmp_path):
    from simple_tad_tpu.data.frame_datasets import FrameDataset, read_dota_clips
    from simple_tad_tpu.eval.engine import FrameEvaluator
    from tests.fixtures import make_synthetic_dota
    root = str(tmp_path / "d")
    make_synthetic_dota(root, n_clips=1, frames_per_clip=24, h=48, w=64)
    model = VisionTransformer(ViTConfig(
        img_size=32, all_frames=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=2, attn_impl="naive"))
    params = model.init_params(jax.random.PRNGKey(0))
    clips = read_dota_clips(root, "val_split.txt")
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=32)
    view = ds.clip_eval_views()[0]
    base = FrameEvaluator(model, params, batch_size=16,
                          dtype=jnp.float32).score_view(ds, view)
    quant = FrameEvaluator(model, params, batch_size=16, dtype=jnp.float32,
                           quant8=True).score_view(ds, view)
    assert np.abs(base - quant).max() < 0.05


def test_iv2_quant_static_matches_fp():
    """InternVideo2 int8 path (dynamic + calibrated static) tracks the fp
    forward on real-magnitude weights."""
    import dataclasses as dc
    from simple_tad_tpu.models.internvideo2 import IV2Config, InternVideo2
    from simple_tad_tpu.ops.quant import (apply_act_amax,
                                          calibrate_act_amax,
                                          quantize_iv2_params)
    cfg = IV2Config(img_size=28, patch_size=14, embed_dim=64, depth=2,
                    num_heads=2, mlp_ratio=4.0, num_frames=4,
                    attn_pool_num_heads=2, clip_embed_dim=32,
                    drop_path_rate=0.0, init_scale=1.0, attn_impl="naive")
    fp = InternVideo2(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 28, 28, 3))
    params = fp.init(jax.random.PRNGKey(0), x)["params"]
    # magnify so quantization error is observable relative to outputs
    params = jax.tree.map(lambda a: a * 3.0 if a.ndim >= 2 else a, params)
    ref = fp.apply({"params": params}, x)
    qp = quantize_iv2_params(params)

    dyn = InternVideo2(dc.replace(cfg, quant=True))
    y_dyn = dyn.apply({"params": qp}, x)
    calib = InternVideo2(dc.replace(cfg, quant=True, quant_mode="calib"))
    amax = calibrate_act_amax(calib, qp, [x])
    stat = InternVideo2(dc.replace(cfg, quant=True, quant_mode="static"))
    y_st = stat.apply({"params": apply_act_amax(qp, amax)}, x)

    scale = float(jnp.abs(ref).max())
    assert scale > 1e-3   # outputs are non-degenerate
    assert float(jnp.abs(y_dyn - ref).max()) < 0.05 * scale
    assert float(jnp.abs(y_st - ref).max()) < 0.05 * scale


def test_inference_cli_quant8_internvideo2(tmp_path):
    """--quant8 on the inference CLI must dispatch by model family
    (regression: it previously hard-assumed a VisionTransformer and
    crashed with a KeyError on InternVideo2 param trees)."""
    import cv2
    import simple_tad_tpu as st
    from simple_tad_tpu.cli.inference import main
    from simple_tad_tpu.utils.checkpoint import save_weights

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(12):
        cv2.imwrite(str(frames / f"{i:04d}.jpg"),
                    rng.integers(0, 255, (32, 32, 3), np.uint8))
    model = st.create_model("internvideo2_small_patch14_224",
                            num_classes=2, all_frames=8, img_size=28,
                            dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 28, 28, 3)))["params"]
    save_weights(str(tmp_path / "w"), params, "w")
    out = str(tmp_path / "out.csv")
    main(["--ckpt", str(tmp_path / "w" / "w"),
          "--frames_folder", str(frames),
          "--model", "internvideo2_small_patch14_224",
          "--num_frames", "8", "--input_size", "28",
          "--dtype", "float32", "--batched", "--quant8",
          "--output_csv", out])
    import pandas as pd
    df = pd.read_csv(out)
    assert len(df) == 12 - 8 + 1
    assert np.isfinite(df["risk"].to_numpy()).all()


def test_static_quant_drift_bound_vs_bf16():
    """VERDICT r1 #1 'done' criterion: a fixture bounding int8-vs-bf16
    logit drift on the PRODUCTION static-quant path (calibrated scales,
    the exact pipeline bench.py serves).  Head kernel randomized so the
    logits are at realistic scale, not the zero-init default."""
    import jax.numpy as jnp
    from simple_tad_tpu.ops.quant import quantize_and_calibrate

    fp = _model(False)
    params = fp.init_params(jax.random.PRNGKey(0))
    head = dict(params["head"])
    head["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), np.shape(head["kernel"]))
    params = {**params, "head": head}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))
    want = np.asarray(fp.apply({"params": params}, x))

    qmodel, qparams = quantize_and_calibrate(fp, params, [x])
    got = np.asarray(qmodel.apply({"params": qparams}, x))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < max(0.08 * scale, 0.05), \
        (np.abs(got - want).max(), scale)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).mean() >= 0.75


def test_static_quant_int8_attention_drift(monkeypatch):
    """The full int8 serving program WITH the int8 static attention kernel
    (forced on via env; CPU runs it in interpret mode) tracks bf16 logits.
    Geometry chosen so the packed int8 kernel is actually eligible
    (C % 128 == 0, Dh=64)."""
    from jax.experimental.pallas import tpu as pltpu

    from simple_tad_tpu.ops.quant import quantize_and_calibrate

    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=128, depth=2,
                    num_heads=2, num_classes=2, quant=False)
    fp = VisionTransformer(cfg)
    params = fp.init_params(jax.random.PRNGKey(0))
    head = dict(params["head"])
    head["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), np.shape(head["kernel"]))
    params = {**params, "head": head}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))
    want = np.asarray(fp.apply({"params": params}, x))

    monkeypatch.setenv("SIMPLE_TAD_FORCE_INT8_ATTN", "1")
    qmodel, qparams = quantize_and_calibrate(fp, params, [x])
    assert "qkv_amax" in qparams["blocks"]["attn"], \
        "calibration must produce the per-head attention scales"
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(qmodel.apply({"params": qparams}, x))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < max(0.1 * scale, 0.06), \
        (np.abs(got - want).max(), scale)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).mean() >= 0.75


def test_calibrate_quantile_reduce():
    """reduce=<q> clips a freak calibration batch that strict max absorbs."""
    from simple_tad_tpu.ops.quant import (calibrate_act_amax,
                                          quantize_vit_params)
    import dataclasses as dc
    fp = _model(False)
    params = fp.init_params(jax.random.PRNGKey(0))
    qp = quantize_vit_params(params)
    calib = type(fp)(dc.replace(fp.cfg, quant=True, quant_mode="calib"))
    normal = [jax.random.normal(jax.random.PRNGKey(i), (2, 4, 32, 32, 3))
              for i in range(4)]
    freak = [normal[0] * 100.0]
    a_max = calibrate_act_amax(calib, qp, normal + freak)
    a_q = calibrate_act_amax(calib, qp, normal + freak, reduce=0.5)
    top = jax.tree.leaves(a_max)[0]
    med = jax.tree.leaves(a_q)[0]
    assert np.all(np.asarray(med) < np.asarray(top))


_DOTA_ROOT = os.environ.get("SIMPLE_TAD_DOTA_ROOT", "/data/dota")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(_DOTA_ROOT, "val_split.txt")),
    reason="real DoTA dataset not present")
def test_real_data_int8_auc_drift():
    """BASELINE quality gate the moment real data exists: the int8
    static-quant serving path must stay within 0.1 AUC points (0.001
    absolute) of bf16 on a real-DoTA subset."""
    import jax.numpy as jnp

    from simple_tad_tpu.data.frame_datasets import (FrameDataset,
                                                    read_dota_clips)
    from simple_tad_tpu.eval.engine import FrameEvaluator
    import simple_tad_tpu as st

    clips = read_dota_clips(_DOTA_ROOT, "val_split.txt")[:12]
    ds = FrameDataset(clips, mode="test", view_len=16, target_fps=10,
                      orig_fps=10, view_step=1, crop_size=224)
    model = st.create_model("vit_small_patch16_224", num_classes=2,
                            dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    bf = FrameEvaluator(model, params, batch_size=64).evaluate(ds)
    q8 = FrameEvaluator(model, params, batch_size=64,
                        quant8=True).evaluate(ds)
    assert abs(bf.metrics.auroc - q8.metrics.auroc) < 0.001, \
        (bf.metrics.auroc, q8.metrics.auroc)


def test_static_quant_fused_ln_quant_drift(monkeypatch):
    """LN->int8 fused-output path (LayerNormQuant + pre-quantized GEMM
    inputs) tracks bf16 logits at a supported width (C=128)."""
    from jax.experimental.pallas import tpu as pltpu

    from simple_tad_tpu.ops.quant import quantize_and_calibrate

    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=128, depth=2,
                    num_heads=2, num_classes=2, quant=False)
    fp = VisionTransformer(cfg)
    params = fp.init_params(jax.random.PRNGKey(0))
    head = dict(params["head"])
    head["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), np.shape(head["kernel"]))
    params = {**params, "head": head}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))
    want = np.asarray(fp.apply({"params": params}, x))

    monkeypatch.setenv("SIMPLE_TAD_FUSED_LNQ", "force")
    qmodel, qparams = quantize_and_calibrate(fp, params, [x])
    assert "act_amax" in qparams["blocks"]["norm1"], \
        "LN calibration must land in the norm scope"
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(qmodel.apply({"params": qparams}, x))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < max(0.1 * scale, 0.06), \
        (np.abs(got - want).max(), scale)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).mean() >= 0.75


def test_static_quant_int8_attn_out_epilogue(monkeypatch):
    """The attention kernel's int8 output epilogue (packed path forced on
    CPU, interpret mode): whole-model logits track bf16, and the calib
    tree carries the out_amax scale."""
    from jax.experimental.pallas import tpu as pltpu

    from simple_tad_tpu.ops.quant import quantize_and_calibrate

    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=128, depth=2,
                    num_heads=2, num_classes=2, quant=False)
    fp = VisionTransformer(cfg)
    params = fp.init_params(jax.random.PRNGKey(0))
    head = dict(params["head"])
    head["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), np.shape(head["kernel"]))
    params = {**params, "head": head}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))
    want = np.asarray(fp.apply({"params": params}, x))

    monkeypatch.setenv("SIMPLE_TAD_FORCE_PACKED_ATTN", "1")
    monkeypatch.setenv("SIMPLE_TAD_FUSED_LNQ", "force")
    with pltpu.force_tpu_interpret_mode():
        qmodel, qparams = quantize_and_calibrate(fp, params, [x])
        assert "out_amax" in qparams["blocks"]["attn"]
        got = np.asarray(qmodel.apply({"params": qparams}, x))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < max(0.1 * scale, 0.06), \
        (np.abs(got - want).max(), scale)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).mean() >= 0.75


def test_static_quant_deferred_add_lnq_exact(monkeypatch):
    """SIMPLE_TAD_ADD_LNQ (deferred-residual carry: the residual add runs
    inside the next LNQ kernel, ops/ln.py fused_add_layernorm_quant) is
    BIT-IDENTICAL to the plain add + LNQ serving chain — the kernel rounds
    the fp32 sum to the storage dtype before the statistics, exactly like
    the standalone add pass."""
    from jax.experimental.pallas import tpu as pltpu

    from simple_tad_tpu.ops.quant import quantize_and_calibrate

    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=128, depth=2,
                    num_heads=2, num_classes=2, quant=False)
    fp = VisionTransformer(cfg)
    params = fp.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))

    monkeypatch.setenv("SIMPLE_TAD_FUSED_LNQ", "force")
    qmodel, qparams = quantize_and_calibrate(fp, params, [x])
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(qmodel.apply({"params": qparams}, x))
        monkeypatch.setenv("SIMPLE_TAD_ADD_LNQ", "1")
        got = np.asarray(qmodel.apply({"params": qparams}, x))
    np.testing.assert_array_equal(got, base)


def test_static_quant_i8_storage_attention_drift(monkeypatch):
    """The full int8 serving program with int8-STORAGE attention (forced on
    via env; CPU runs the kernel in interpret mode) tracks bf16 logits —
    the round-4 default serving path on supported geometries."""
    from jax.experimental.pallas import tpu as pltpu

    from simple_tad_tpu.ops.quant import quantize_and_calibrate

    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=128, depth=2,
                    num_heads=2, num_classes=2, quant=False)
    fp = VisionTransformer(cfg)
    params = fp.init_params(jax.random.PRNGKey(0))
    head = dict(params["head"])
    head["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), np.shape(head["kernel"]))
    params = {**params, "head": head}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))
    want = np.asarray(fp.apply({"params": params}, x))

    monkeypatch.setenv("SIMPLE_TAD_FORCE_QKV_I8", "1")
    qmodel, qparams = quantize_and_calibrate(fp, params, [x])
    assert "qkv_amax" in qparams["blocks"]["attn"]
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(qmodel.apply({"params": qparams}, x))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < max(0.1 * scale, 0.06), \
        (np.abs(got - want).max(), scale)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).mean() >= 0.75


def test_iv2_static_quant_i8_storage_attention_drift(monkeypatch):
    """IV2 int8 serving with the SEPARATE-operand int8-STORAGE attention
    (q/k quantize after qk_normalization against calibrated per-head
    scales) tracks the bf16 logits — the round-4 IV2 serving path."""
    import dataclasses as dc

    from jax.experimental.pallas import tpu as pltpu

    from simple_tad_tpu.models.internvideo2 import IV2Config, InternVideo2
    from simple_tad_tpu.ops.quant import quantize_and_calibrate

    # embed 128 / 2 heads -> D=64, C=128: the packed-kernel geometry gate
    # (C % 128 == 0) actually engages, so the static apply below really
    # runs flash_attention_i8d rather than silently falling back
    cfg = IV2Config(img_size=28, patch_size=14, embed_dim=128, depth=2,
                    num_heads=2, mlp_ratio=4.0, num_frames=4,
                    attn_pool_num_heads=2, clip_embed_dim=32,
                    drop_path_rate=0.0, init_scale=1.0, attn_impl="auto")
    fp = InternVideo2(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 28, 28, 3))
    params = fp.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(lambda a: a * 3.0 if a.ndim >= 2 else a, params)
    want = np.asarray(fp.apply({"params": params}, x))

    from simple_tad_tpu.ops.attention import i8_storage_attn_sep_supported
    monkeypatch.setenv("SIMPLE_TAD_FORCE_QKV_I8", "1")
    assert i8_storage_attn_sep_supported(17, 2, 64)   # gate engages
    with pltpu.force_tpu_interpret_mode():
        qmodel, qparams = quantize_and_calibrate(fp, params, [x])
        assert "qkv_amax" in qparams["blocks"]["attn"]
        assert qparams["blocks"]["attn"]["qkv_amax"].shape == (2, 3, 2)
        got = np.asarray(qmodel.apply({"params": qparams}, x))
    scale = np.abs(want).max()
    assert scale > 1e-3
    assert np.abs(got - want).max() < max(0.1 * scale, 0.06), \
        (np.abs(got - want).max(), scale)

    # model-level sequence once-padding (engaged above: 17 tokens pad to
    # 24 with garbage rows, keys masked in-kernel) must be EXACT vs the
    # per-layer-padding path — same int8 codes, same math, only the HBM
    # copies differ
    monkeypatch.setenv("SIMPLE_TAD_NO_SEQ_PAD", "1")
    with pltpu.force_tpu_interpret_mode():
        got_np = np.asarray(qmodel.apply({"params": qparams}, x))
    np.testing.assert_allclose(got, got_np, atol=1e-5, rtol=1e-5)


def test_iv2_static_quant_fused_rmsnorm_quant(monkeypatch):
    """Fused RMSNorm->int8 serving path (norm1/norm2 emit the consumer
    GEMM's int8; q/k-norm emits the attention kernel's per-head int8 in
    the same single-read kernel): calibration lands act_amax in the norm
    scopes, logits track bf16, and the fused path stays within one
    quantization step of the unfused int8 program (the only difference
    is fp32-vs-bf16 rounding ahead of the quantize)."""
    from jax.experimental.pallas import tpu as pltpu

    from simple_tad_tpu.models.internvideo2 import IV2Config, InternVideo2
    from simple_tad_tpu.ops.quant import quantize_and_calibrate

    cfg = IV2Config(img_size=28, patch_size=14, embed_dim=128, depth=2,
                    num_heads=2, mlp_ratio=4.0, num_frames=4,
                    attn_pool_num_heads=2, clip_embed_dim=32,
                    drop_path_rate=0.0, init_scale=1.0, attn_impl="auto")
    fp = InternVideo2(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 28, 28, 3))
    params = fp.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(lambda a: a * 3.0 if a.ndim >= 2 else a, params)
    want = np.asarray(fp.apply({"params": params}, x))

    monkeypatch.setenv("SIMPLE_TAD_FORCE_QKV_I8", "1")
    monkeypatch.setenv("SIMPLE_TAD_FUSED_RMSQ", "force")
    with pltpu.force_tpu_interpret_mode():
        qmodel, qparams = quantize_and_calibrate(fp, params, [x])
        assert "act_amax" in qparams["blocks"]["norm1"], \
            "RMSNorm calibration must land in the norm scope"
        assert "act_amax" in qparams["blocks"]["norm2"]
        got = np.asarray(qmodel.apply({"params": qparams}, x))
    scale = np.abs(want).max()
    assert scale > 1e-3
    assert np.abs(got - want).max() < max(0.1 * scale, 0.06), \
        (np.abs(got - want).max(), scale)

    # fused vs unfused int8 program: same calibrated params must produce
    # near-identical logits (rounding site differs by one bf16 cast)
    monkeypatch.setenv("SIMPLE_TAD_NO_FUSED_RMSQ", "1")
    with pltpu.force_tpu_interpret_mode():
        qmodel2, qparams2 = quantize_and_calibrate(fp, params, [x])
        got_uf = np.asarray(qmodel2.apply({"params": qparams2}, x))
    assert np.abs(got - got_uf).max() < 0.05 * scale + 0.02, \
        np.abs(got - got_uf).max()
