"""Independent functional PyTorch implementation of the VideoMAE ViT math,
used as the parity oracle for the JAX models + checkpoint converter.

This is NOT the reference repo's code — it is a from-scratch functional
re-statement of the documented math (packed QKV with q/zero-k/v bias,
pre-LN blocks, exact GELU, sincos pos-embed, mean-pool + fc_norm head) so
tests can compare against torch numerics on CPU.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def sincos_table_t(n, d):
    pos = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(d, dtype=np.float64)[None, :]
    ang = pos / np.power(10000.0, 2.0 * np.floor(j / 2.0) / d)
    tab = np.where(np.arange(d) % 2 == 0, np.sin(ang), np.cos(ang))
    return torch.tensor(tab, dtype=torch.float32)[None]


def block_forward(x, sd, pfx, heads, use_gamma):
    B, N, C = x.shape
    hd = C // heads
    scale = hd ** -0.5

    h = F.layer_norm(x, (C,), sd[f"{pfx}norm1.weight"],
                     sd[f"{pfx}norm1.bias"], eps=1e-6)
    qkv_bias = torch.cat([sd[f"{pfx}attn.q_bias"],
                          torch.zeros_like(sd[f"{pfx}attn.v_bias"]),
                          sd[f"{pfx}attn.v_bias"]])
    qkv = F.linear(h, sd[f"{pfx}attn.qkv.weight"], qkv_bias)
    qkv = qkv.reshape(B, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * scale, qkv[1], qkv[2]
    attn = torch.softmax(q @ k.transpose(-2, -1), dim=-1)
    o = (attn @ v).transpose(1, 2).reshape(B, N, C)
    o = F.linear(o, sd[f"{pfx}attn.proj.weight"], sd[f"{pfx}attn.proj.bias"])
    if use_gamma:
        o = o * sd[f"{pfx}gamma_1"]
    x = x + o

    h = F.layer_norm(x, (C,), sd[f"{pfx}norm2.weight"],
                     sd[f"{pfx}norm2.bias"], eps=1e-6)
    h = F.linear(h, sd[f"{pfx}mlp.fc1.weight"], sd[f"{pfx}mlp.fc1.bias"])
    h = F.gelu(h)  # exact erf gelu
    h = F.linear(h, sd[f"{pfx}mlp.fc2.weight"], sd[f"{pfx}mlp.fc2.bias"])
    if use_gamma:
        h = h * sd[f"{pfx}gamma_2"]
    return x + h


def vit_forward(sd, x, depth, heads, final_reduction="fc_norm",
                tubelet=2, patch=16):
    """x: (B, C, T, H, W) -> logits."""
    t = F.conv3d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"],
                 stride=(tubelet, patch, patch))
    t = t.flatten(2).transpose(1, 2)                  # (B, N, C)
    C = t.shape[-1]
    t = t + sincos_table_t(t.shape[1], C)
    use_gamma = "blocks.0.gamma_1" in sd
    for i in range(depth):
        t = block_forward(t, sd, f"blocks.{i}.", heads, use_gamma)
    if final_reduction == "fc_norm":
        t = t.mean(1)
        t = F.layer_norm(t, (C,), sd["fc_norm.weight"], sd["fc_norm.bias"],
                         eps=1e-6)
    else:
        t = F.layer_norm(t, (C,), sd["norm.weight"], sd["norm.bias"],
                         eps=1e-6)
        if final_reduction == "cls":
            t = t[:, 0]
    if "head.weight" in sd:
        t = F.linear(t, sd["head.weight"], sd["head.bias"])
    return t


def mae_forward(sd, x, mask, enc_depth, enc_heads, dec_depth, dec_heads,
                dec_dim, tubelet=2, patch=16):
    """x: (B, C, T, H, W), mask: (B, N) bool -> (B, N_mask, out)."""
    t = F.conv3d(x, sd["encoder.patch_embed.proj.weight"],
                 sd["encoder.patch_embed.proj.bias"],
                 stride=(tubelet, patch, patch))
    t = t.flatten(2).transpose(1, 2)
    B, N, C = t.shape
    t = t + sincos_table_t(N, C)
    t = t[~mask].reshape(B, -1, C)
    for i in range(enc_depth):
        t = block_forward(t, sd, f"encoder.blocks.{i}.", enc_heads, False)
    t = F.layer_norm(t, (C,), sd["encoder.norm.weight"],
                     sd["encoder.norm.bias"], eps=1e-6)
    t = F.linear(t, sd["encoder_to_decoder.weight"])

    pos = sincos_table_t(N, dec_dim).expand(B, -1, -1)
    pos_vis = pos[~mask].reshape(B, -1, dec_dim)
    pos_mask = pos[mask].reshape(B, -1, dec_dim)
    full = torch.cat([t + pos_vis, sd["mask_token"] + pos_mask], dim=1)
    for i in range(dec_depth):
        full = block_forward(full, sd, f"decoder.blocks.{i}.", dec_heads, False)
    n_mask = pos_mask.shape[1]
    full = full[:, -n_mask:]
    full = F.layer_norm(full, (dec_dim,), sd["decoder.norm.weight"],
                        sd["decoder.norm.bias"], eps=1e-6)
    return F.linear(full, sd["decoder.head.weight"], sd["decoder.head.bias"])


def make_vit_state_dict(rng, dim, depth, heads, num_classes=2, tubelet=2,
                        patch=16, in_chans=3, mlp_ratio=4, gamma=False,
                        final_reduction="fc_norm"):
    g = torch.Generator().manual_seed(rng)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {"patch_embed.proj.weight": r(dim, in_chans, tubelet, patch, patch),
          "patch_embed.proj.bias": r(dim)}
    hidden = int(dim * mlp_ratio)
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            f"{p}norm1.weight": 1 + r(dim), f"{p}norm1.bias": r(dim),
            f"{p}norm2.weight": 1 + r(dim), f"{p}norm2.bias": r(dim),
            f"{p}attn.qkv.weight": r(3 * dim, dim),
            f"{p}attn.q_bias": r(dim), f"{p}attn.v_bias": r(dim),
            f"{p}attn.proj.weight": r(dim, dim), f"{p}attn.proj.bias": r(dim),
            f"{p}mlp.fc1.weight": r(hidden, dim), f"{p}mlp.fc1.bias": r(hidden),
            f"{p}mlp.fc2.weight": r(dim, hidden), f"{p}mlp.fc2.bias": r(dim),
        })
        if gamma:
            sd[f"{p}gamma_1"] = 0.1 + r(dim) * 0.01
            sd[f"{p}gamma_2"] = 0.1 + r(dim) * 0.01
    if final_reduction == "fc_norm":
        sd["fc_norm.weight"] = 1 + r(dim)
        sd["fc_norm.bias"] = r(dim)
    else:
        sd["norm.weight"] = 1 + r(dim)
        sd["norm.bias"] = r(dim)
    if num_classes:
        sd["head.weight"] = r(num_classes, dim)
        sd["head.bias"] = r(num_classes)
    return sd


def make_mae_state_dict(rng, enc_dim, enc_depth, enc_heads, dec_dim,
                        dec_depth, dec_heads, tubelet=2, patch=16,
                        in_chans=3, mlp_ratio=4):
    g = torch.Generator().manual_seed(rng)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    out_dim = in_chans * tubelet * patch * patch
    sd = {
        "encoder.patch_embed.proj.weight": r(enc_dim, in_chans, tubelet,
                                             patch, patch),
        "encoder.patch_embed.proj.bias": r(enc_dim),
        "encoder.norm.weight": 1 + r(enc_dim), "encoder.norm.bias": r(enc_dim),
        "encoder_to_decoder.weight": r(dec_dim, enc_dim),
        "mask_token": r(1, 1, dec_dim),
        "decoder.norm.weight": 1 + r(dec_dim), "decoder.norm.bias": r(dec_dim),
        "decoder.head.weight": r(out_dim, dec_dim),
        "decoder.head.bias": r(out_dim),
    }

    def add_blocks(px, dim, depth):
        hidden = int(dim * mlp_ratio)
        for i in range(depth):
            p = f"{px}.blocks.{i}."
            sd.update({
                f"{p}norm1.weight": 1 + r(dim), f"{p}norm1.bias": r(dim),
                f"{p}norm2.weight": 1 + r(dim), f"{p}norm2.bias": r(dim),
                f"{p}attn.qkv.weight": r(3 * dim, dim),
                f"{p}attn.q_bias": r(dim), f"{p}attn.v_bias": r(dim),
                f"{p}attn.proj.weight": r(dim, dim),
                f"{p}attn.proj.bias": r(dim),
                f"{p}mlp.fc1.weight": r(hidden, dim),
                f"{p}mlp.fc1.bias": r(hidden),
                f"{p}mlp.fc2.weight": r(dim, hidden),
                f"{p}mlp.fc2.bias": r(dim),
            })

    add_blocks("encoder", enc_dim, enc_depth)
    add_blocks("decoder", dec_dim, dec_depth)
    return sd
