"""Parity against goldens EXECUTED from the actual reference code.

tests/goldens/*.npz were produced by scripts/make_goldens.py, which imports
/root/reference's modeling_finetune.py / modeling_pretrain.py /
other_models/{MVD,UMT}/modeling_finetune.py /
other_models/InternVideo2_single_modality/models/internvideo2.py (with the
timm/flash_attn import surface stubbed and use_flash_attn=False so the
pure-torch paths run), fills every parameter deterministically
(tests/golden_utils.param_fill), and records the CPU fp32 logits plus the
parameter name/shape manifest.

Here we rebuild the IDENTICAL torch state dict from the manifest, convert
it with simple_tad_tpu.utils.torch_convert, and assert our flax models
reproduce the reference-produced logits.  Unlike tests/torch_ref.py (the
builder's own restatement), both the key set and the numbers on the
reference side of this comparison come from the reference itself.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple_tad_tpu.models import create_model
from simple_tad_tpu.utils import torch_convert as tc
from tests import golden_utils as gu

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    path = os.path.join(GOLDENS, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} missing — run "
                    "scripts/make_goldens.py")
    return gu.load_golden(path)


def _run_vit(name, model):
    want, manifest, meta = _load(name)
    sd = gu.build_state_dict(manifest)
    params = model.init_params(jax.random.PRNGKey(0))
    loaded = tc.torch_to_vit_params(
        sd, depth=model.cfg.depth, num_classes=meta["num_classes"],
        final_reduction=model.cfg.final_reduction)
    params = tc.merge_params(params, loaded)
    x = gu.input_video(meta["input_seed"], meta["batch"],
                       meta["all_frames"], 224)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # BCTHW -> BTHWC
    got = np.asarray(model.apply({"params": params}, x_j,
                                 deterministic=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_golden_vit_s_fcnorm():
    m = create_model("vit_small_patch16_224", num_classes=2, all_frames=16,
                     attn_impl="xla")
    _run_vit("vit_s_fcnorm.npz", m)


def test_golden_vit_b_gamma():
    m = create_model("vit_base_patch16_224", num_classes=2, all_frames=8,
                     init_values=0.1, attn_impl="xla")
    _run_vit("vit_b_gamma.npz", m)


def test_golden_vit_s_tokens():
    m = create_model("vit_small_patch16_224", num_classes=2, all_frames=8,
                     final_reduction="none", attn_impl="xla")
    _run_vit("vit_s_tokens.npz", m)


def test_golden_mvd_s_cls():
    m = create_model("mvd_vit_small_patch16_224", num_classes=2,
                     all_frames=8, use_cls_token=True, attn_impl="xla")
    _run_vit("mvd_s_cls.npz", m)


def test_golden_umt_b_learnable_pos():
    # frames!=8 turns the UMT table into a learnable parameter
    # (UMT modeling_finetune.py:236-239) — randomized by the fill, so this
    # case gates learnable-pos checkpoint loading
    want, manifest, meta = _load("umt_b.npz")
    assert "pos_embed" in manifest  # reference made it a parameter
    m = create_model("umt_vit_base_patch16_224", num_classes=2,
                     all_frames=4, use_learnable_pos_emb=True,
                     attn_impl="xla")
    _run_vit("umt_b.npz", m)


def test_golden_umt_s_fixed_table():
    # native 8-frame tubelet-1 geometry: table stays a fixed buffer —
    # gates our umt_pos_embed generation end-to-end
    want, manifest, meta = _load("umt_s_8f.npz")
    assert "pos_embed" not in manifest
    from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
    m = VisionTransformer(ViTConfig(
        embed_dim=384, depth=12, num_heads=6, num_classes=2, qkv_bias=True,
        all_frames=8, tubelet_size=1, pos_embed_kind="umt",
        attn_impl="xla"))
    _run_vit("umt_s_8f.npz", m)


def test_golden_mae_s():
    want, manifest, meta = _load("mae_s.npz")
    sd = gu.build_state_dict(manifest)
    model = create_model("pretrain_videomae_small_patch16_224",
                         decoder_depth=8, attn_impl="xla")
    x = gu.input_video(meta["input_seed"], meta["batch"], 16, 224)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    n_patches = 8 * 196
    mask = gu.tube_mask(meta["mask_seed"], meta["batch"], n_patches,
                        meta["n_masked"])
    params = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(mask),
                        meta["n_masked"])["params"]
    loaded = tc.torch_to_mae_params(sd, encoder_depth=12, decoder_depth=8)
    params = tc.merge_params(params, loaded)
    got = np.asarray(model.apply({"params": params}, x_j, jnp.asarray(mask),
                                 meta["n_masked"]))
    np.testing.assert_allclose(got[:, :meta["slice_tokens"]], want,
                               atol=1e-4, rtol=1e-4)


def test_golden_iv2_s():
    want, manifest, meta = _load("iv2_s.npz")
    sd = gu.build_state_dict(manifest)
    model = create_model("internvideo2_small_patch14_224", num_classes=2,
                         num_frames=4, attn_impl="xla", drop_path_rate=0.0)
    params = model.init_params(jax.random.PRNGKey(0))
    loaded = tc.torch_to_iv2_params(sd, depth=12)
    params = tc.merge_params(params, loaded)
    x = gu.input_video(meta["input_seed"], meta["batch"], 4, 224)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    got = np.asarray(model.apply({"params": params}, x_j,
                                 deterministic=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_export_roundtrip_into_reference_model():
    """flax -> torch export loads strict into the ACTUAL reference
    VisionTransformer (modeling_finetune.py:208-335) and reproduces our
    logits — gates vit_params_to_torch_state_dict against the reference
    itself, not our own re-import."""
    if not os.path.exists("/root/reference/modeling_finetune.py"):
        pytest.skip("reference checkout not mounted")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_goldens", os.path.join(os.path.dirname(__file__), "..",
                                     "scripts", "make_goldens.py"))
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)
    mg._install_stubs()
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        mf = mg._import_file("ref_modeling_finetune_rt",
                             "/root/reference/modeling_finetune.py")
    finally:
        sys.path.remove("/root/reference")

    import torch
    model = create_model("vit_small_patch16_224", num_classes=2,
                         all_frames=8, attn_impl="xla")
    params = model.init_params(jax.random.PRNGKey(7))
    sd_np = tc.vit_params_to_torch_state_dict(params)
    ref = mf.vit_small_patch16_224(num_classes=2, all_frames=8,
                                   use_flash_attn=False, init_scale=1.0)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()},
        strict=True)
    assert not missing and not unexpected
    ref.eval()

    x = gu.input_video(42, 1, 8, 224)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        deterministic=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_golden_mvd_mae_s():
    """MVD-style MAE pretrain vs the EXECUTED reference
    (other_models/MVD/modeling_pretrain.py): gates the 3D-sincos encoder
    table (kept frozen at the reference's own values during golden
    generation) plus the shared encoder/decoder pipeline."""
    want, manifest, meta = _load("mvd_mae_s.npz")
    assert not any("pos" in k for k in manifest)   # frozen, not filled
    sd = gu.build_state_dict(manifest)
    model = create_model("pretrain_videomae_mvd_small_patch16_224",
                         decoder_depth=meta["decoder_depth"],
                         attn_impl="xla")
    x = gu.input_video(meta["input_seed"], meta["batch"], 16, 224)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    n_patches = 8 * 196
    mask = gu.tube_mask(meta["mask_seed"], meta["batch"], n_patches,
                        meta["n_masked"])
    params = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(mask),
                        meta["n_masked"])["params"]
    loaded = tc.torch_to_mae_params(sd, encoder_depth=12,
                                    decoder_depth=meta["decoder_depth"])
    params = tc.merge_params(params, loaded)
    got = np.asarray(model.apply({"params": params}, x_j, jnp.asarray(mask),
                                 meta["n_masked"]))
    np.testing.assert_allclose(got[:, :meta["slice_tokens"]], want,
                               atol=1e-4, rtol=1e-4)
