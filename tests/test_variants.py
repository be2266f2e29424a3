"""MVD / UMT variant parity: pos-embed formulas vs reference math, forward
vs extended torch oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from simple_tad_tpu.models import create_model
from simple_tad_tpu.models.layers import (sincos_3d_pos_embed,
                                          sincos_pos_embed, umt_pos_embed)
from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
from simple_tad_tpu.utils import torch_convert as tc

from tests import torch_ref


def ref_3d_pos_embed(dim, grid, t):
    """Loop restatement of MVD get_3d_sincos_pos_embed (:24-69)."""
    def emb1d(d, pos):
        omega = 1.0 / 10000 ** (np.arange(d // 2, dtype=float) / (d / 2))
        out = np.outer(pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], 1)

    d_sp, d_t = dim // 4 * 3, dim // 4
    # reference: grid = np.meshgrid(grid_w, grid_h); first concat half
    # encodes grid[0], which is the W-coordinate mesh (meshgrid 'xy').
    grid0, grid1 = np.meshgrid(np.arange(grid, dtype=float),
                               np.arange(grid, dtype=float))
    spatial = np.concatenate([emb1d(d_sp // 2, grid0.reshape(-1)),
                              emb1d(d_sp // 2, grid1.reshape(-1))], 1)
    temporal = emb1d(d_t, np.arange(t, dtype=float))
    temporal = np.repeat(temporal[:, None], grid * grid, 1)
    spatial = np.repeat(spatial[None], t, 0)
    return np.concatenate([temporal, spatial], -1).reshape(1, -1, dim)


def test_3d_pos_embed_matches_reference_math():
    got = sincos_3d_pos_embed(64, 4, 2)
    want = ref_3d_pos_embed(64, 4, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_3d_pos_embed_matches_upstream_module():
    """Run the actual upstream numpy function when the reference checkout
    is mounted; guards against the restated oracle drifting with the impl."""
    import importlib.util
    import os
    path = ("/root/reference/other_models/MVD/modeling_finetune.py")
    if not os.path.exists(path):
        pytest.skip("reference checkout not mounted")
    src = open(path).read()
    ns = {"np": np, "torch": torch}
    # pull just the two pure-numpy helpers out of the file
    import ast
    tree = ast.parse(src)
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in ("get_3d_sincos_pos_embed",
                           "get_2d_sincos_pos_embed_from_grid",
                           "get_1d_sincos_pos_embed_from_grid")]
    exec(compile(ast.Module(body=keep, type_ignores=[]), path, "exec"), ns)
    want = ns["get_3d_sincos_pos_embed"](96, 5, 3).numpy()
    got = sincos_3d_pos_embed(96, 5, 3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_umt_pos_embed_default_geometry_is_plain_sincos():
    # 8 frames, tubelet 1, 224/16 -> n=1568 == pre_n -> plain table
    got = umt_pos_embed(1568, 64, cur_frames=8, patch_size=16)
    want = sincos_pos_embed(1568, 64)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_umt_pos_embed_interpolated_geometry():
    # 4 temporal slots, 2x2 grid (img 32): spatial + temporal interpolation
    got = umt_pos_embed(4 * 4, 64, cur_frames=4, patch_size=16)
    assert got.shape == (1, 16, 64)
    assert np.isfinite(got).all()


def test_mvd_forward_matches_torch_oracle():
    """MVD trunk = VideoMAE blocks + 3D pos embed + optional CLS."""
    dim, depth, heads = 64, 2, 2
    img, frames = 32, 4
    sd = torch_ref.make_vit_state_dict(0, dim, depth, heads, num_classes=2)
    gen = torch.Generator().manual_seed(5)
    sd["cls_token"] = torch.randn(1, 1, dim, generator=gen) * 0.02

    x_t = torch.randn(2, 3, frames, img, img, generator=gen)
    with torch.no_grad():
        t = F.conv3d(x_t, sd["patch_embed.proj.weight"],
                     sd["patch_embed.proj.bias"], stride=(2, 16, 16))
        t = t.flatten(2).transpose(1, 2)
        pos = torch.from_numpy(ref_3d_pos_embed(dim, img // 16,
                                                frames // 2)).float()
        t = t + pos
        cls = sd["cls_token"].expand(t.shape[0], -1, -1)
        t = torch.cat([cls, t], dim=1)
        for i in range(depth):
            t = torch_ref.block_forward(t, sd, f"blocks.{i}.", heads, False)
        feat = t[:, 1:].mean(1)
        feat = F.layer_norm(feat, (dim,), sd["fc_norm.weight"],
                            sd["fc_norm.bias"], eps=1e-6)
        want = F.linear(feat, sd["head.weight"], sd["head.bias"]).numpy()

    cfg = ViTConfig(img_size=img, all_frames=frames, embed_dim=dim,
                    depth=depth, num_heads=heads, num_classes=2,
                    attn_impl="naive", pos_embed_kind="3d",
                    use_cls_token=True)
    model = VisionTransformer(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    loaded = tc.torch_to_vit_params(
        {k: v.numpy() for k, v in sd.items()}, depth=depth, num_classes=2)
    params = tc.merge_params(params, loaded)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    got = np.asarray(model.apply({"params": params}, x_j))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_variant_registry():
    m = create_model("mvd_vit_base_patch16_224", num_classes=2)
    assert m.cfg.pos_embed_kind == "3d" and m.cfg.embed_dim == 768
    m = create_model("umt_vit_base_patch16_224", num_classes=2)
    assert (m.cfg.tubelet_size == 1 and m.cfg.all_frames == 8
            and m.cfg.pos_embed_kind == "umt")
    assert m.cfg.num_patches == 8 * 196


def test_umt_model_forward_shape():
    m = create_model("umt_vit_base_patch16_224", num_classes=2,
                     img_size=32, all_frames=4, attn_impl="naive",
                     depth=1)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 4, 32, 32, 3))
    out = m.apply({"params": params}, x)
    assert out.shape == (1, 2)


def test_mvd_mae_pretrain_registry_and_pos_embed():
    """MVD-style MAE pretrain: encoder uses the 3D sincos table, decoder
    keeps the 1D table (other_models/MVD/modeling_pretrain.py:63-66,:279);
    registered as pretrain_videomae_mvd_* like the reference registry
    (:317-391)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from simple_tad_tpu.models import create_model
    from simple_tad_tpu.models.layers import sincos_3d_pos_embed

    model = create_model("pretrain_videomae_mvd_small_patch16_224",
                         all_frames=4, scan_blocks=True)
    assert model.cfg.pos_embed_kind == "3d"
    n = model.cfg.num_patches
    mask = np.zeros((1, n), bool)
    mask[:, : n // 2] = True
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 4, 224, 224, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray(mask),
                        n // 2)["params"]
    pred = model.apply({"params": params}, x, jnp.asarray(mask), n // 2)
    assert pred.shape == (1, n // 2, 1536)

    # the 3d table really is what the encoder adds: recompute and compare
    # against the 1d default — they must differ
    t3 = sincos_3d_pos_embed(384, 14, 2)
    from simple_tad_tpu.models.layers import sincos_pos_embed
    t1 = sincos_pos_embed(n, 384)
    assert not np.allclose(t3, t1)
