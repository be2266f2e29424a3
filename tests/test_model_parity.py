"""Parity gates: JAX models + torch-checkpoint converter vs independent torch
functional oracle (SURVEY.md §7 step 2 parity gate: max-abs-diff < 1e-4 fp32)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from simple_tad_tpu.models import create_model
from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
from simple_tad_tpu.models.mae import MAEConfig, PretrainVideoMAE, mae_targets
from simple_tad_tpu.models.layers import sincos_pos_embed
from simple_tad_tpu.utils import torch_convert as tc

from tests import torch_ref


def test_sincos_matches_reference_formula():
    n, d = 40, 32
    table = sincos_pos_embed(n, d)[0]
    # explicit-loop restatement of modeling_finetune.py:195-205
    for pos in (0, 1, 7, 39):
        for j in (0, 1, 2, 15, 30, 31):
            ang = pos / np.power(10000.0, 2 * (j // 2) / d)
            want = np.sin(ang) if j % 2 == 0 else np.cos(ang)
            assert abs(table[pos, j] - want) < 1e-6


@pytest.mark.parametrize("gamma", [False, True])
@pytest.mark.parametrize("final_reduction", ["fc_norm", "none"])
def test_vit_forward_matches_torch(gamma, final_reduction):
    dim, depth, heads = 64, 2, 2
    img, frames = 32, 4
    sd = torch_ref.make_vit_state_dict(
        0, dim, depth, heads, num_classes=2, gamma=gamma,
        final_reduction=final_reduction)

    gen = torch.Generator().manual_seed(1)
    x_t = torch.randn(2, 3, frames, img, img, generator=gen)
    with torch.no_grad():
        want = torch_ref.vit_forward(sd, x_t, depth, heads,
                                     final_reduction=final_reduction).numpy()

    cfg = ViTConfig(img_size=img, all_frames=frames, embed_dim=dim,
                    depth=depth, num_heads=heads, num_classes=2,
                    init_values=0.1 if gamma else 0.0,
                    final_reduction=final_reduction, attn_impl="naive")
    model = VisionTransformer(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    sd_np = {k: v.numpy() for k, v in sd.items()}
    loaded = tc.torch_to_vit_params(sd_np, depth=depth, num_classes=2,
                                    final_reduction=final_reduction)
    params = tc.merge_params(params, loaded)

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))  # BCTHW->BTHWC
    got = np.asarray(model.apply({"params": params}, x_j,
                                 deterministic=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_vit_scan_equals_unrolled():
    cfg = dict(img_size=32, all_frames=4, embed_dim=64, depth=3, num_heads=2,
               num_classes=2, attn_impl="naive")
    m_scan = VisionTransformer(ViTConfig(scan_blocks=True, **cfg))
    m_loop = VisionTransformer(ViTConfig(scan_blocks=False, **cfg))
    params = m_scan.init_params(jax.random.PRNGKey(0))
    # restructure stacked -> per-layer for the unrolled model
    loop_params = {k: v for k, v in params.items() if k != "blocks"}
    for i in range(3):
        loop_params[f"blocks_{i}"] = jax.tree.map(lambda a: a[i],
                                                  params["blocks"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    out_scan = m_scan.apply({"params": params}, x)
    out_loop = m_loop.apply({"params": loop_params}, x)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               atol=1e-5, rtol=1e-5)


def test_remap_finetune_keys():
    sd = {"backbone.patch_embed.proj.weight": 1,
          "encoder.norm.weight": 2,
          "encoder.blocks.0.attn.qkv.weight": 3,
          "head.weight": 4}
    out = tc.remap_finetune_keys(sd)
    assert out == {"patch_embed.proj.weight": 1, "fc_norm.weight": 2,
                   "blocks.0.attn.qkv.weight": 3, "head.weight": 4}


def test_mismatched_head_dropped():
    sd_np = {k: v.numpy() for k, v in torch_ref.make_vit_state_dict(
        0, 64, 1, 2, num_classes=400).items()}
    loaded = tc.torch_to_vit_params(sd_np, depth=1, num_classes=2)
    assert "head" not in loaded


def test_mae_forward_matches_torch():
    enc_dim, enc_depth, enc_heads = 64, 2, 2
    dec_dim, dec_depth, dec_heads = 32, 1, 2
    img, frames = 32, 4
    n_patches = (img // 16) ** 2 * (frames // 2)   # 8
    num_masked = 6

    sd = torch_ref.make_mae_state_dict(0, enc_dim, enc_depth, enc_heads,
                                       dec_dim, dec_depth, dec_heads)
    gen = torch.Generator().manual_seed(1)
    x_t = torch.randn(2, 3, frames, img, img, generator=gen)
    mask_np = np.zeros((2, n_patches), bool)
    mask_np[0, [0, 2, 3, 5, 6, 7]] = True
    mask_np[1, [1, 2, 4, 5, 6, 7]] = True
    with torch.no_grad():
        want = torch_ref.mae_forward(
            sd, x_t, torch.from_numpy(mask_np), enc_depth, enc_heads,
            dec_depth, dec_heads, dec_dim).numpy()

    cfg = MAEConfig(img_size=img, all_frames=frames,
                    encoder_embed_dim=enc_dim, encoder_depth=enc_depth,
                    encoder_num_heads=enc_heads, decoder_embed_dim=dec_dim,
                    decoder_depth=dec_depth, decoder_num_heads=dec_heads,
                    attn_impl="naive")
    model = PretrainVideoMAE(cfg)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    params = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(mask_np),
                        num_masked)["params"]
    loaded = tc.torch_to_mae_params({k: v.numpy() for k, v in sd.items()},
                                    encoder_depth=enc_depth,
                                    decoder_depth=dec_depth)
    params = tc.merge_params(params, loaded)
    got = np.asarray(model.apply({"params": params}, x_j,
                                 jnp.asarray(mask_np), num_masked))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_mae_targets_match_torch_rearrange():
    """Targets must equal engine_for_pretraining.py:51-67 exactly."""
    from einops import rearrange
    gen = torch.Generator().manual_seed(3)
    vid_t = torch.rand(2, 3, 4, 32, 32, generator=gen)   # (B,C,T,H,W) in [0,1]
    sq = rearrange(vid_t, "b c (t p0) (h p1) (w p2) -> b (t h w) (p0 p1 p2) c",
                   p0=2, p1=16, p2=16)
    norm = (sq - sq.mean(dim=-2, keepdim=True)) / (
        sq.var(dim=-2, unbiased=True, keepdim=True).sqrt() + 1e-6)
    patches = rearrange(norm, "b n p c -> b n (p c)")
    n = patches.shape[1]
    mask_np = np.zeros((2, n), bool)
    mask_np[:, : n // 2] = True
    want = patches[torch.from_numpy(mask_np)].reshape(2, -1,
                                                      patches.shape[-1]).numpy()

    vid_j = jnp.asarray(vid_t.numpy().transpose(0, 2, 3, 4, 1))
    got = np.asarray(mae_targets(vid_j, jnp.asarray(mask_np), n // 2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_mae_targets_fused_matches_naive_order():
    """The r5 fused target path (bf16 patchify -> masked gather -> fp32
    unnorm+normalize, models/mae.py:mae_targets_fused) must reproduce
    the train step's original order (fp32 unnorm of the FULL video ->
    mae_targets) bitwise: every swapped op pair touches the same element
    values and reduces over the same operand sets."""
    from simple_tad_tpu.models.mae import mae_targets_fused
    from simple_tad_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD
    rng = np.random.default_rng(7)
    video = jnp.asarray(
        rng.normal(size=(2, 4, 32, 32, 3)).astype(np.float32) * 0.5,
        dtype=jnp.bfloat16)
    n = (4 // 2) * (32 // 16) ** 2
    mask_np = np.zeros((2, n), bool)
    for r in range(2):
        mask_np[r, rng.permutation(n)[: n * 3 // 4]] = True
    mask = jnp.asarray(mask_np)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    for normalize in (True, False):
        unnorm = video.astype(jnp.float32) * std + mean
        want = np.asarray(mae_targets(unnorm, mask, n * 3 // 4,
                                      normalize_target=normalize))
        got = np.asarray(mae_targets_fused(video, mask, n * 3 // 4,
                                           mean=mean, std=std,
                                           normalize_target=normalize))
        np.testing.assert_array_equal(got, want)


def test_registry_names_and_shapes():
    m = create_model("vit_small_patch16_224", num_classes=2)
    assert m.cfg.embed_dim == 384 and m.cfg.depth == 12 and m.cfg.num_heads == 6
    m = create_model("vit_huge_patch16_224")
    assert m.cfg.embed_dim == 1280 and m.cfg.depth == 32
    m = create_model("pretrain_videomae_base_patch16_224")
    assert m.cfg.decoder_embed_dim == 384 and m.cfg.decoder_num_heads == 6


def test_learnable_pos_embed_interpolated_on_geometry_change(tmp_path):
    """A learnable-pos checkpoint saved at a different spatial grid is
    bicubic-resampled to the model geometry instead of raising
    (run_frame_finetuning.py:433-458)."""
    import torch as _torch
    from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
    from simple_tad_tpu.utils.torch_convert import load_vit_checkpoint

    dim, depth, heads = 64, 2, 2
    sd = torch_ref.make_vit_state_dict(11, dim, depth, heads, num_classes=2)
    # checkpoint geometry: img 48 (3x3 grid), 4 frames tubelet 2 -> 18 tok
    sd["pos_embed"] = _torch.randn(1, 2 * 3 * 3, dim,
                                   generator=_torch.Generator()
                                   .manual_seed(3)) * 0.02
    path = tmp_path / "ck.pth"
    _torch.save({"model": sd}, str(path))

    model = VisionTransformer(ViTConfig(
        img_size=32, all_frames=4, embed_dim=dim, depth=depth,
        num_heads=heads, num_classes=2, use_learnable_pos_emb=True,
        attn_impl="naive"))
    params = model.init_params(jax.random.PRNGKey(0))
    loaded = load_vit_checkpoint(str(path), model, params)
    assert loaded["pos_embed"].shape == params["pos_embed"].shape
    # resampled, not re-initialized
    assert not np.allclose(np.asarray(loaded["pos_embed"]),
                           np.asarray(params["pos_embed"]))


def test_k710_head_remap():
    """run_finetuning.py:388-400: a K710 head is sliced for nb_classes=400
    and label-map gathered for 600/700; other mismatches still drop."""
    sd_np = {k: v.numpy() for k, v in torch_ref.make_vit_state_dict(
        0, 64, 1, 2, num_classes=710).items()}
    # 400: first rows
    loaded = tc.torch_to_vit_params(sd_np, depth=1, num_classes=400)
    assert loaded["head"]["bias"].shape == (400,)
    np.testing.assert_array_equal(loaded["head"]["bias"],
                                  sd_np["head.bias"][:400])
    np.testing.assert_array_equal(loaded["head"]["kernel"],
                                  sd_np["head.weight"][:400].T)
    # 700: gather by the user-supplied map
    rng = np.random.default_rng(3)
    label_map = rng.permutation(710)[:700].tolist()
    loaded = tc.torch_to_vit_params(sd_np, depth=1, num_classes=700,
                                    head_label_map=label_map)
    np.testing.assert_array_equal(loaded["head"]["bias"],
                                  sd_np["head.bias"][label_map])
    np.testing.assert_array_equal(loaded["head"]["kernel"],
                                  sd_np["head.weight"][label_map].T)
    # 700 without a map, or a non-710 mismatch: dropped as before
    assert "head" not in tc.torch_to_vit_params(sd_np, depth=1,
                                                num_classes=700)
    assert "head" not in tc.torch_to_vit_params(sd_np, depth=1,
                                                num_classes=17)
