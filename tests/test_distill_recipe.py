"""Stage-2 masked multi-layer distillation recipe vs torch oracles.

Restates the reference's actual recipe — run_distill.py +
engines/engine_for_pretraining.py:63-143 + internvideo2_distill.py +
internvideo2_teacher.py — independently in functional torch and checks:
the teacher tap surface (K l2-normalized middle features, pre-fc_norm
final feature, pooling attention), the DistillInternVideo2 student
(masked trunk, tap decoders, final decoder), the K>1 masked-alignment
loss, and the attention-mask importance sampling.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from simple_tad_tpu.models import create_model
from simple_tad_tpu.utils import torch_convert as tc

from tests.test_internvideo2 import iv2_block, make_iv2_sd


def _pooling(sd, t, pool_heads, clip_dim):
    """AttentionPoolingBlock (internvideo2_teacher.py:122-129): returns
    (pooled (B, clip_dim), head-mean attention (B, 1, N))."""
    B, N, C = t.shape
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
    return o, attn.mean(1)


def _l2(x):
    return x / x.norm(dim=-1, keepdim=True)


def teacher_taps_forward(sd, x, depth, heads, pool_heads, clip_dim,
                         ret_idx):
    """teacher_internvideo2_stage2_* forward
    (internvideo2_teacher.py:523-588): (z (K,B,N+1,C) l2, final (B,
    clip_dim) l2 pre-fc_norm, attn (B, N))."""
    t = F.conv3d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=(1, 14, 14))
    B, C = t.shape[0], t.shape[1]
    t = t.flatten(3).permute(0, 2, 3, 1).reshape(B, -1, C)
    t = torch.cat([sd["cls_token"].expand(B, -1, -1), t], 1)
    t = t + sd["pos_embed"]
    z = []
    for i in range(depth):
        t = iv2_block(t, sd, f"blocks.{i}.", heads)
        if i in ret_idx:
            z.append(t)
    pooled, attn = _pooling(sd, t, pool_heads, clip_dim)
    return _l2(torch.stack(z)), _l2(pooled), attn[:, 0, 1:]


def _mlp_decoder(sd, p, x, out_dim):
    """MLP_Decoder (internvideo2_distill.py:367-397)."""
    h = F.linear(x, sd[f"{p}head.0.weight"], sd[f"{p}head.0.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd[f"{p}head.2.weight"], sd[f"{p}head.2.bias"])
    h = F.layer_norm(h, (out_dim,), sd[f"{p}norm.weight"],
                     sd[f"{p}norm.bias"], eps=1e-5)
    return _l2(h)


def distill_student_forward(sd, x, mask, depth, heads, pool_heads,
                            clip_dim, ret_idx, t_embed, t_final):
    """DistInternVideo2.forward (internvideo2_distill.py:601-700):
    mask (B, N+1) bool incl CLS slot; returns (x_clip_align
    (K,B,N_vis,t_embed), x_align (B,t_final))."""
    t = F.conv3d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=(1, 14, 14))
    B, C = t.shape[0], t.shape[1]
    t = t.flatten(3).permute(0, 2, 3, 1).reshape(B, -1, C)
    t = torch.cat([sd["cls_token"].expand(B, -1, -1), t], 1)
    t = t + sd["pos_embed"]
    t = t[~mask].reshape(B, -1, C)
    taps = []
    for i in range(depth):
        t = iv2_block(t, sd, f"blocks.{i}.", heads)
        if i in ret_idx:
            taps.append(t)
    x_clip = torch.stack(taps)
    K = x_clip.shape[0]
    clip_pos = sd["clip_pos_embed"].repeat(B, 1, 1)
    x_clip = x_clip + clip_pos[~mask].view(B, -1, C).unsqueeze(0)
    aligned = torch.stack([
        _mlp_decoder(sd, f"clip_decoder.{k}.", x_clip[k], t_embed)
        for k in range(K)])
    pooled, _ = _pooling(sd, t, pool_heads, clip_dim)
    final = _mlp_decoder(sd, "final_clip_decoder.", pooled, t_final)
    return aligned, final


def _add_decoder_sd(sd, g, prefix, in_dim, out_dim):
    def r(*s):
        return torch.randn(*s, generator=g) * 0.05
    sd[f"{prefix}head.0.weight"] = r(in_dim, in_dim)
    sd[f"{prefix}head.0.bias"] = r(in_dim)
    sd[f"{prefix}head.2.weight"] = r(out_dim, in_dim)
    sd[f"{prefix}head.2.bias"] = r(out_dim)
    sd[f"{prefix}norm.weight"] = 1 + r(out_dim)
    sd[f"{prefix}norm.bias"] = r(out_dim)


def _tube_mask_with_cls(B, n_patch, num_masked, seed=0):
    rng = np.random.default_rng(seed)
    mask = np.zeros((B, n_patch + 1), bool)
    for b in range(B):
        mask[b, 1 + rng.permutation(n_patch)[:num_masked]] = True
    return mask


DIM, DEPTH, HEADS, CLIP, POOL = 64, 3, 2, 32, 2
T_EMBED, T_FINAL, K = 96, 48, 2
FRAMES, GRID = 2, 2
N_PATCH = FRAMES * GRID * GRID


def test_teacher_taps_match_torch():
    """InternVideo2.return_taps vs internvideo2_teacher.py:523-588."""
    sd = make_iv2_sd(0, DIM, DEPTH, HEADS, CLIP, frames=FRAMES, grid=GRID)
    ret_idx = (0, 2)
    x_t = torch.randn(2, 3, FRAMES, 28, 28,
                      generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        z_t, fin_t, attn_t = teacher_taps_forward(
            sd, x_t, DEPTH, HEADS, POOL, CLIP, ret_idx)

    model = create_model("internvideo2_small_patch14_224", num_classes=2,
                         img_size=28, all_frames=FRAMES, embed_dim=DIM,
                         depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
                         clip_embed_dim=CLIP, attn_pool_num_heads=POOL,
                         attn_impl="naive", dtype=jnp.float32)
    params = tc.torch_to_iv2_params(
        {k: v.numpy() for k, v in sd.items()}, depth=DEPTH)
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    z, fin, attn = model.apply({"params": params}, x, deterministic=True,
                               return_taps=ret_idx)
    np.testing.assert_allclose(np.asarray(z), z_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fin), fin_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(attn), attn_t.numpy(), atol=2e-5)


def test_distill_student_matches_torch():
    """DistillInternVideo2 vs DistInternVideo2 (masked trunk + K MLP tap
    decoders + attention-pooled final decoder), via the checkpoint
    converter."""
    g = torch.Generator().manual_seed(3)
    sd = make_iv2_sd(0, DIM, DEPTH, HEADS, CLIP, frames=FRAMES, grid=GRID)
    sd["clip_pos_embed"] = torch.randn(1, N_PATCH + 1, DIM,
                                       generator=g) * 0.05
    for k in range(K):
        _add_decoder_sd(sd, g, f"clip_decoder.{k}.", DIM, T_EMBED)
    _add_decoder_sd(sd, g, "final_clip_decoder.", CLIP, T_FINAL)

    num_masked = 6
    mask = _tube_mask_with_cls(2, N_PATCH, num_masked, seed=1)
    x_t = torch.randn(2, 3, FRAMES, 28, 28, generator=g)
    ret_idx = (1, 2)   # last K=2 layers at interval 1, depth 3
    with torch.no_grad():
        mid_t, fin_t = distill_student_forward(
            sd, x_t, torch.from_numpy(mask), DEPTH, HEADS, POOL, CLIP,
            ret_idx, T_EMBED, T_FINAL)

    model = create_model("distill_internvideo2_small_patch14_224",
                         img_size=28, all_frames=FRAMES, embed_dim=DIM,
                         depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
                         clip_embed_dim=CLIP, attn_pool_num_heads=POOL,
                         clip_teacher_embed_dim=T_EMBED,
                         clip_teacher_final_dim=T_FINAL,
                         clip_return_layer=K, clip_student_decoder="mlp",
                         drop_path_rate=0.0, attn_impl="naive",
                         dtype=jnp.float32)
    assert model.cfg.return_index == ret_idx
    params = tc.torch_to_distill_iv2_params(
        {k: v.numpy() for k, v in sd.items()}, depth=DEPTH,
        clip_return_layer=K)
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    mid, fin = model.apply({"params": params}, x, jnp.asarray(mask),
                           num_masked, deterministic=True)
    assert mid.shape == (K, 2, N_PATCH + 1 - num_masked, T_EMBED)
    np.testing.assert_allclose(np.asarray(mid), mid_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fin), fin_t.numpy(), atol=2e-5)


def test_masked_distill_step_loss_oracle_k2():
    """End-to-end oracle of the stage-2 loss with K>1: teacher taps +
    student forward + masked middle/final alignment, restating
    engine_for_pretraining.py:119-143 in torch (targets_clip_middle_vis =
    norm_clip_middle[~clip_bool_masked_pos]; loss = mean(2-2cos) per term,
    summed with clip_loss_ratio)."""
    import optax
    from simple_tad_tpu.cli.distill import make_masked_distill_step
    from simple_tad_tpu.train.steps import TrainState

    g = torch.Generator().manual_seed(5)
    t_sd = make_iv2_sd(11, DIM, DEPTH, HEADS, CLIP, frames=FRAMES,
                       grid=GRID)
    s_sd = make_iv2_sd(22, DIM, DEPTH, HEADS, CLIP, frames=FRAMES,
                       grid=GRID)
    s_sd["clip_pos_embed"] = torch.randn(1, N_PATCH + 1, DIM,
                                         generator=g) * 0.05
    for k in range(K):
        _add_decoder_sd(s_sd, g, f"clip_decoder.{k}.", DIM, DIM)
    _add_decoder_sd(s_sd, g, "final_clip_decoder.", CLIP, CLIP)

    num_masked = 6
    mask_np = _tube_mask_with_cls(2, N_PATCH, num_masked, seed=2)
    x_t = torch.randn(2, 3, FRAMES, 28, 28, generator=g)
    t_ret = (0, 2)   # teacher interval 2: depth 3, K 2 -> [2, 0] sorted
    s_ret = (1, 2)
    ratio = (1.0, 0.5)
    with torch.no_grad():
        z, t_fin, _ = teacher_taps_forward(t_sd, x_t, DEPTH, HEADS, POOL,
                                           CLIP, t_ret)
        s_mid, s_fin = distill_student_forward(
            s_sd, x_t, torch.from_numpy(mask_np), DEPTH, HEADS, POOL,
            CLIP, s_ret, DIM, CLIP)
        # engine_for_pretraining.py:119-122 + 127-143
        Kk, B, _, C_CLIP = z.shape
        cmask = torch.from_numpy(mask_np).unsqueeze(0).repeat(Kk, 1, 1)
        tgt = z[~cmask].reshape(Kk, B, -1, C_CLIP)
        loss_mid = (2 - 2 * (s_mid * tgt).sum(-1)).mean()
        loss_fin = (2 - 2 * (s_fin * t_fin).sum(-1)).mean()
        want = ratio[0] * loss_mid + ratio[1] * loss_fin

    teacher = create_model("internvideo2_small_patch14_224", num_classes=2,
                           img_size=28, all_frames=FRAMES, embed_dim=DIM,
                           depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
                           clip_embed_dim=CLIP, attn_pool_num_heads=POOL,
                           attn_impl="naive", dtype=jnp.float32)
    student = create_model("distill_internvideo2_small_patch14_224",
                           img_size=28, all_frames=FRAMES, embed_dim=DIM,
                           depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
                           clip_embed_dim=CLIP, attn_pool_num_heads=POOL,
                           clip_teacher_embed_dim=DIM,
                           clip_teacher_final_dim=CLIP,
                           clip_return_layer=K, clip_student_decoder="mlp",
                           drop_path_rate=0.0, attn_impl="naive",
                           dtype=jnp.float32)
    t_params = tc.torch_to_iv2_params(
        {k: v.numpy() for k, v in t_sd.items()}, depth=DEPTH)
    s_params = tc.torch_to_distill_iv2_params(
        {k: v.numpy() for k, v in s_sd.items()}, depth=DEPTH,
        clip_return_layer=K)
    tx = optax.sgd(0.0)
    step = make_masked_distill_step(student, teacher, tx,
                                    num_masked=num_masked,
                                    teacher_taps=t_ret, loss_ratio=ratio,
                                    mask_type="tube")
    state = TrainState.create(s_params, tx, jax.random.PRNGKey(0))
    batch = {"video": jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1)),
             "mask": jnp.asarray(mask_np[:, 1:])}
    _, (metrics, _) = step(state, batch, t_params)
    np.testing.assert_allclose(float(metrics["loss"]), float(want),
                               atol=3e-5)
    np.testing.assert_allclose(float(metrics["loss_clip_middle"]),
                               float(loss_mid), atol=3e-5)
    np.testing.assert_allclose(float(metrics["loss_clip_final"]),
                               float(loss_fin), atol=3e-5)


def test_attention_mask_sampling():
    """attention_mask_from_importance == multinomial-without-replacement
    prefix (engine_for_pretraining.py:106-118): exact masked count, CLS
    always visible, importance-monotone retention."""
    from simple_tad_tpu.cli.distill import attention_mask_from_importance

    B, N, num_masked = 64, 32, 24
    rng = np.random.default_rng(0)
    # 8 hot tokens with 100x the importance of the rest
    attn = np.full((B, N), 0.01, np.float32)
    hot = rng.integers(0, N, (B, 8))
    for b in range(B):
        attn[b, hot[b]] = 1.0
    mask = np.asarray(attention_mask_from_importance(
        jnp.asarray(attn), num_masked, jax.random.PRNGKey(1)))
    assert mask.shape == (B, N + 1)
    assert (~mask[:, 0]).all()                       # CLS visible
    assert (mask.sum(1) == num_masked).all()         # exact count
    # hot tokens should be retained (visible) far above the base rate:
    # with 8 visible slots and 100:1 odds, most hot tokens survive
    hot_visible = np.mean([~mask[b, 1 + h] for b in range(B)
                           for h in set(hot[b])])
    base_rate = (N - num_masked) / N
    assert hot_visible > 0.75, hot_visible
    assert hot_visible > base_rate + 0.3


def test_distill_cli_masked_feature_one_epoch(tmp_path):
    """Fixture CLI run of the stage-2 recipe (tube + attention mask
    types) on the synthetic Kinetics source with tiny IV2 trunks."""
    from tests.fixtures import make_synthetic_k700
    from simple_tad_tpu.cli.distill import main
    root = make_synthetic_k700(str(tmp_path / "k"), n_videos=8,
                               frames_per_video=40, fps=30.0, h=48, w=64)
    for mt in ("random", "attention"):
        out = str(tmp_path / f"md_{mt}")
        state = main([
            "--objective", "masked_feature", "--mask_type", mt,
            "--mask_ratio", "0.75",
            "--data_set", "K700", "--data_path", root,
            "--model", "distill_internvideo2_small_patch14_224",
            "--teacher_model", "internvideo2_small_patch14_224",
            "--clip_return_layer", "2", "--clip_teacher_final_dim", "768",
            "--clip_teacher_embed_dim", "0",
            "--input_size", "28", "--num_frames", "4", "--view_fps", "10",
            "--batch_size", "1", "--epochs", "1", "--warmup_epochs", "0",
            "--output_dir", out, "--dtype", "float32",
            "--attn_impl", "naive", "--num_workers", "2",
        ])
        assert int(state.step) > 0
        assert os.path.exists(os.path.join(out, "checkpoint-last"))
