"""InternVideo2 trunk parity vs functional torch oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from simple_tad_tpu.models import create_model
from simple_tad_tpu.models.internvideo2 import InternVideo2, IV2Config
from simple_tad_tpu.utils import torch_convert as tc

from tests.test_variants import ref_3d_pos_embed


def rms(x, w, eps=1e-6):
    v = x.float().pow(2).mean(-1, keepdim=True)
    return w * (x.float() * torch.rsqrt(v + eps))


def iv2_block(x, sd, p, heads, qk_norm=True):
    B, N, C = x.shape
    hd = C // heads
    h = rms(x, sd[f"{p}norm1.weight"])
    qkv = F.linear(h, sd[f"{p}attn.qkv.weight"])
    qkv = qkv.reshape(B, N, 3, C)
    q, k, v = qkv.unbind(2)
    if qk_norm:
        q = rms(q, sd[f"{p}attn.q_norm.weight"])
        k = rms(k, sd[f"{p}attn.k_norm.weight"])
    q = q.reshape(B, N, heads, hd).transpose(1, 2)
    k = k.reshape(B, N, heads, hd).transpose(1, 2)
    v = v.reshape(B, N, heads, hd).transpose(1, 2)
    attn = torch.softmax((q * hd ** -0.5) @ k.transpose(-2, -1), -1)
    o = (attn @ v).transpose(1, 2).reshape(B, N, C)
    o = F.linear(o, sd[f"{p}attn.proj.weight"], sd[f"{p}attn.proj.bias"])
    x = x + o * sd[f"{p}ls1.gamma"]

    h = rms(x, sd[f"{p}norm2.weight"])
    h = F.linear(h, sd[f"{p}mlp.fc1.weight"], sd[f"{p}mlp.fc1.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd[f"{p}mlp.fc2.weight"], sd[f"{p}mlp.fc2.bias"])
    return x + h * sd[f"{p}ls2.gamma"]


def iv2_forward(sd, x, depth, heads, pool_heads, clip_dim):
    # x: (B, C, T, H, W); patch 14 tubelet 1
    t = F.conv3d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=(1, 14, 14))
    B = t.shape[0]
    C = t.shape[1]
    t = t.flatten(3).permute(0, 2, 3, 1).reshape(B, -1, C)
    cls = sd["cls_token"].expand(B, -1, -1)
    t = torch.cat([cls, t], 1)
    t = t + sd["pos_embed"]
    for i in range(depth):
        t = iv2_block(t, sd, f"blocks.{i}.", heads)
    # attention pooling
    xq = F.layer_norm(t.mean(1, keepdim=True), (C,),
                      sd["clip_projector.norm1_q.weight"],
                      sd["clip_projector.norm1_q.bias"], eps=1e-5)
    xk = F.layer_norm(t, (C,), sd["clip_projector.norm1_k.weight"],
                      sd["clip_projector.norm1_k.bias"], eps=1e-5)
    xv = F.layer_norm(t, (C,), sd["clip_projector.norm1_v.weight"],
                      sd["clip_projector.norm1_v.bias"], eps=1e-5)
    hd = C // pool_heads
    q = F.linear(xq, sd["clip_projector.cross_attn.q.weight"],
                 sd["clip_projector.cross_attn.q_bias"])
    k = F.linear(xk, sd["clip_projector.cross_attn.k.weight"],
                 sd["clip_projector.cross_attn.k_bias"])
    v = F.linear(xv, sd["clip_projector.cross_attn.v.weight"],
                 sd["clip_projector.cross_attn.v_bias"])
    q = q.reshape(B, 1, pool_heads, hd).transpose(1, 2) * hd ** -0.5
    k = k.reshape(B, -1, pool_heads, hd).transpose(1, 2)
    v = v.reshape(B, -1, pool_heads, hd).transpose(1, 2)
    attn = torch.softmax(q @ k.transpose(-2, -1), -1)
    o = (attn @ v).transpose(1, 2).reshape(B, 1, C)[:, 0]
    o = F.linear(o, sd["clip_projector.cross_attn.proj.weight"],
                 sd["clip_projector.cross_attn.proj.bias"])
    o = F.layer_norm(o, (clip_dim,), sd["fc_norm.weight"],
                     sd["fc_norm.bias"], eps=1e-5)
    return F.linear(o, sd["head.weight"], sd["head.bias"])


def make_iv2_sd(seed, dim, depth, heads, clip_dim, frames=2, grid=2):
    g = torch.Generator().manual_seed(seed)

    def r(*s):
        return torch.randn(*s, generator=g) * 0.05

    n = frames * grid * grid
    sd = {
        "patch_embed.proj.weight": r(dim, 3, 1, 14, 14),
        "patch_embed.proj.bias": r(dim),
        "cls_token": r(1, 1, dim),
        "pos_embed": r(1, n + 1, dim),
        "fc_norm.weight": 1 + r(clip_dim), "fc_norm.bias": r(clip_dim),
        "head.weight": r(2, clip_dim), "head.bias": r(2),
    }
    for nm in ("q", "k", "v"):
        sd[f"clip_projector.cross_attn.{nm}.weight"] = r(dim, dim)
        sd[f"clip_projector.cross_attn.{nm}_bias"] = r(dim)
    for nm in ("q", "k", "v"):
        sd[f"clip_projector.norm1_{nm}.weight"] = 1 + r(dim)
        sd[f"clip_projector.norm1_{nm}.bias"] = r(dim)
    sd["clip_projector.cross_attn.proj.weight"] = r(clip_dim, dim)
    sd["clip_projector.cross_attn.proj.bias"] = r(clip_dim)
    hid = dim * 4
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            f"{p}norm1.weight": 1 + r(dim), f"{p}norm2.weight": 1 + r(dim),
            f"{p}attn.qkv.weight": r(3 * dim, dim),
            f"{p}attn.q_norm.weight": 1 + r(dim),
            f"{p}attn.k_norm.weight": 1 + r(dim),
            f"{p}attn.proj.weight": r(dim, dim),
            f"{p}attn.proj.bias": r(dim),
            f"{p}ls1.gamma": 0.1 + r(dim) * 0.01,
            f"{p}ls2.gamma": 0.1 + r(dim) * 0.01,
            f"{p}mlp.fc1.weight": r(hid, dim), f"{p}mlp.fc1.bias": r(hid),
            f"{p}mlp.fc2.weight": r(dim, hid), f"{p}mlp.fc2.bias": r(dim),
        })
    return sd


def test_iv2_forward_matches_torch():
    dim, depth, heads, clip_dim = 64, 2, 2, 32
    sd = make_iv2_sd(0, dim, depth, heads, clip_dim)
    gen = torch.Generator().manual_seed(1)
    x_t = torch.randn(2, 3, 2, 28, 28, generator=gen)
    with torch.no_grad():
        want = iv2_forward(sd, x_t, depth, heads, pool_heads=2,
                           clip_dim=clip_dim).numpy()

    cfg = IV2Config(img_size=28, patch_size=14, num_frames=2,
                    embed_dim=dim, depth=depth, num_heads=heads,
                    mlp_ratio=4.0, attn_pool_num_heads=2,
                    clip_embed_dim=clip_dim, num_classes=2,
                    attn_impl="naive", drop_path_rate=0.0)
    model = InternVideo2(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    loaded = tc.torch_to_iv2_params({k: v.numpy() for k, v in sd.items()},
                                    depth=depth)
    params = tc.merge_params(params, loaded)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    got = np.asarray(model.apply({"params": params}, x_j))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_iv2_pos_embed_init_matches_reference():
    """Joint pos-embed param initializes to 3D sincos with zero cls row
    (internvideo2.py:556-584)."""
    cfg = IV2Config(img_size=28, patch_size=14, num_frames=2, embed_dim=64,
                    depth=1, num_heads=2, attn_pool_num_heads=2,
                    clip_embed_dim=32, num_classes=2, attn_impl="naive")
    model = InternVideo2(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    pos = np.asarray(params["pos_embed"])
    assert pos.shape == (1, 9, 64)
    np.testing.assert_allclose(pos[0, 0], 0.0)
    want = ref_3d_pos_embed(64, 2, 2)
    np.testing.assert_allclose(pos[:, 1:], want, atol=1e-6)


def test_iv2_registry():
    m = create_model("internvideo2_1B_patch14_224", num_classes=2)
    assert m.cfg.embed_dim == 1408 and m.cfg.depth == 40
    assert abs(m.cfg.mlp_ratio - 48 / 11) < 1e-9
    m = create_model("internvideo2_small_patch14_224", num_classes=2,
                     all_frames=8)
    assert m.cfg.num_frames == 8 and m.cfg.tubelet_size == 1


def test_sep_pos_embed_init_matches_upstream():
    """sep_pos_embed=True: the spatial/temporal learnable tables initialize
    to the upstream MAE sincos (pos_embed.py get_2d/1d_sincos_pos_embed) —
    runs the actual upstream functions when the checkout is mounted."""
    import ast
    import os

    import dataclasses as dc
    from simple_tad_tpu.models.internvideo2 import IV2Config, InternVideo2

    path = ("/root/reference/other_models/InternVideo2_single_modality/"
            "models/pos_embed.py")
    if not os.path.exists(path):
        pytest.skip("reference checkout not mounted")
    tree = ast.parse(open(path).read())
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in ("get_2d_sincos_pos_embed",
                           "get_1d_sincos_pos_embed",
                           "get_2d_sincos_pos_embed_from_grid",
                           "get_1d_sincos_pos_embed_from_grid")]
    ns = {"np": np}
    exec(compile(ast.Module(body=keep, type_ignores=[]), path, "exec"), ns)

    cfg = IV2Config(img_size=28, patch_size=14, embed_dim=64, depth=1,
                    num_heads=2, mlp_ratio=4.0, num_frames=4,
                    attn_pool_num_heads=2, clip_embed_dim=32,
                    sep_pos_embed=True, drop_path_rate=0.0,
                    attn_impl="naive")
    model = InternVideo2(cfg)
    x = jnp.zeros((1, 4, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    nh = cfg.img_size // cfg.patch_size
    want_sp = ns["get_2d_sincos_pos_embed"](cfg.embed_dim, nh)
    np.testing.assert_allclose(np.asarray(params["pos_embed_spatial"][0]),
                               want_sp, atol=1e-6)
    nt = cfg.num_frames // cfg.tubelet_size
    want_t = ns["get_1d_sincos_pos_embed"](cfg.embed_dim, nt)
    np.testing.assert_allclose(np.asarray(params["pos_embed_temporal"][0]),
                               want_t, atol=1e-6)


def test_iv2_scan_equals_unrolled():
    """scan_blocks=False debug path matches the scanned path (guards the
    IV2Block positional-arg wiring in internvideo2.py's unrolled loop)."""
    kw = dict(img_size=28, patch_size=14, num_frames=2, embed_dim=64,
              depth=3, num_heads=2, mlp_ratio=4.0, attn_pool_num_heads=2,
              clip_embed_dim=32, num_classes=2, attn_impl="naive",
              drop_path_rate=0.0)
    m_scan = InternVideo2(IV2Config(scan_blocks=True, **kw))
    m_loop = InternVideo2(IV2Config(scan_blocks=False, **kw))
    params = m_scan.init_params(jax.random.PRNGKey(0))
    loop_params = {k: v for k, v in params.items() if k != "blocks"}
    for i in range(3):
        loop_params[f"blocks_{i}"] = jax.tree.map(lambda a: a[i],
                                                  params["blocks"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 28, 28, 3))
    out_scan = m_scan.apply({"params": params}, x, deterministic=True)
    out_loop = m_loop.apply({"params": loop_params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               atol=1e-5, rtol=1e-5)
