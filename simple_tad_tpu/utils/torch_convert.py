"""PyTorch .pth checkpoint -> JAX pytree converter.

Reproduces the reference's checkpoint-loading surgery bit-exact so released
HuggingFace/MODEL_ZOO checkpoints work directly:

  * model-key unwrapping 'model' | 'module' | raw state dict
    (/root/reference/run_frame_finetuning.py:404-411),
  * key remapping 'backbone.*'->'*', 'encoder.norm'->'fc_norm',
    'encoder.*'->'*' (:419-430),
  * dropping shape-mismatched classifier heads (:414-417),
  * bicubic spatial pos-embed interpolation when geometry differs (:433-458)
    — only relevant for learnable pos-embeds; the fixed sincos table is a
    buffer and is regenerated, never loaded,
  * torch layout -> TPU layout transforms: Linear (out,in)->(in,out)
    transpose; Conv3d tubelet kernel (D,c,t,h,w) -> flattened (t*h*w*c, D)
    matching simple_tad_tpu.models.layers.PatchEmbed's (t,h,w,c) patch
    flatten order; per-block params stacked along a leading depth axis for
    the scanned block stack.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Sequence

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into {name: float32 numpy array}."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = None
    for key in ("model", "module"):
        if isinstance(ckpt, dict) and key in ckpt:
            state = ckpt[key]
            break
    if state is None:
        state = ckpt
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).cpu().numpy()
        else:
            out[k] = np.asarray(v, dtype=np.float32)
    return out


def remap_finetune_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """backbone./encoder. prefix stripping + encoder.norm -> fc_norm."""
    new = {}
    for key, val in sd.items():
        if key.startswith("backbone."):
            new[key[len("backbone."):]] = val
        elif key.startswith("encoder.norm"):
            new[key.replace("encoder.norm", "fc_norm")] = val
        elif key.startswith("encoder."):
            new[key[len("encoder."):]] = val
        else:
            new[key] = val
    return new


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> jax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _conv3d_to_patch_kernel(w: np.ndarray) -> np.ndarray:
    """(D, c, t, h, w) -> (t*h*w*c, D), matching PatchEmbed's flatten order."""
    d = w.shape[0]
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0).reshape(-1, d))


def _stack(per_layer: list) -> np.ndarray:
    return np.stack(per_layer, axis=0)


def _convert_block_stack(sd: Mapping[str, np.ndarray], prefix: str,
                         depth: int) -> Dict[str, Any]:
    """Collect torch 'prefix{i}.' block params into one stacked pytree."""
    def get(i, name):
        return sd[f"{prefix}{i}.{name}"]

    blocks: Dict[str, Any] = {
        "norm1": {"scale": _stack([get(i, "norm1.weight") for i in range(depth)]),
                  "bias": _stack([get(i, "norm1.bias") for i in range(depth)])},
        "norm2": {"scale": _stack([get(i, "norm2.weight") for i in range(depth)]),
                  "bias": _stack([get(i, "norm2.bias") for i in range(depth)])},
        "attn": {
            "qkv_kernel": _stack([_t(get(i, "attn.qkv.weight"))
                                  for i in range(depth)]),
            "proj": {"kernel": _stack([_t(get(i, "attn.proj.weight"))
                                       for i in range(depth)]),
                     "bias": _stack([get(i, "attn.proj.bias")
                                     for i in range(depth)])},
        },
        "mlp": {
            "fc1": {"kernel": _stack([_t(get(i, "mlp.fc1.weight"))
                                      for i in range(depth)]),
                    "bias": _stack([get(i, "mlp.fc1.bias")
                                    for i in range(depth)])},
            "fc2": {"kernel": _stack([_t(get(i, "mlp.fc2.weight"))
                                      for i in range(depth)]),
                    "bias": _stack([get(i, "mlp.fc2.bias")
                                    for i in range(depth)])},
        },
    }
    if f"{prefix}0.attn.q_bias" in sd:
        blocks["attn"]["q_bias"] = _stack(
            [get(i, "attn.q_bias") for i in range(depth)])
        blocks["attn"]["v_bias"] = _stack(
            [get(i, "attn.v_bias") for i in range(depth)])
    if f"{prefix}0.gamma_1" in sd:
        blocks["gamma_1"] = _stack([get(i, "gamma_1") for i in range(depth)])
        blocks["gamma_2"] = _stack([get(i, "gamma_2") for i in range(depth)])
    return blocks


def _remap_710_head(head_w: np.ndarray, head_b: np.ndarray,
                    num_classes: Optional[int],
                    head_label_map: Optional[Sequence[int]]):
    """K710-pretrained 710-row classifier head -> Kinetics finetune head
    (IV2 reference run_finetuning.py:388-400): nb_classes=400 takes the
    first 400 rows; 600/700 gather the rows named by ``head_label_map``
    (the reference's k710/label_mixto{N}.json, a list of 710-space
    indices).  Any other mismatch is returned unchanged for the caller's
    drop-the-head rule."""
    if (num_classes is None or head_w.shape[0] != 710
            or num_classes == 710):
        return head_w, head_b
    if num_classes == 400:
        return head_w[:400], head_b[:400]
    if num_classes in (600, 700):
        if head_label_map is not None:
            idx = np.asarray(head_label_map, np.int64)
            assert idx.shape == (num_classes,), (
                f"label map has {idx.shape[0]} entries, expected "
                f"{num_classes}")
            return head_w[idx], head_b[idx]
        # the IV2 reference ALWAYS remaps 710->600/700 via
        # k710/label_mixto{N}.json; without a map the caller would
        # silently drop the head (fresh random init) — make that visible
        # (ADVICE r3)
        import warnings
        warnings.warn(
            f"710-row pretrained head with nb_classes={num_classes} and no "
            "--head_label_map: the head will be dropped and freshly "
            "initialized. The reference remaps it via "
            "k710/label_mixto{N}.json — pass that list as head_label_map "
            "to reproduce its runs.", stacklevel=3)
    return head_w, head_b


def torch_to_vit_params(sd: Mapping[str, np.ndarray], *, depth: int,
                        num_classes: Optional[int] = None,
                        final_reduction: str = "fc_norm",
                        head_label_map: Optional[Sequence[int]] = None
                        ) -> Dict[str, Any]:
    """Remapped torch state dict -> flax params for VisionTransformer.

    ``num_classes``: expected head width; a mismatched checkpoint head is
    dropped (caller keeps the freshly-initialized head, matching
    run_frame_finetuning.py:414-417) — except a K710-pretrained 710-row
    head, which the IV2 reference reuses for Kinetics finetunes
    (run_finetuning.py:388-400): nb_classes=400 takes the first 400 rows;
    600/700 gather the rows named by ``head_label_map`` (the reference's
    k710/label_mixto{600,700}.json, a plain list of 710-space indices the
    user supplies).  Returns a partial pytree — merge over initialized
    params with merge_params().
    """
    sd = remap_finetune_keys(sd)
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv3d_to_patch_kernel(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        },
        "blocks": _convert_block_stack(sd, "blocks.", depth),
    }
    if final_reduction == "fc_norm":
        if "fc_norm.weight" in sd:
            params["fc_norm"] = {"scale": sd["fc_norm.weight"],
                                 "bias": sd["fc_norm.bias"]}
        elif "norm.weight" in sd:  # some MAE-encoder exports keep 'norm'
            params["fc_norm"] = {"scale": sd["norm.weight"],
                                 "bias": sd["norm.bias"]}
    else:
        if "norm.weight" in sd:
            params["norm"] = {"scale": sd["norm.weight"],
                              "bias": sd["norm.bias"]}
    if "head.weight" in sd:
        head_w, head_b = _remap_710_head(sd["head.weight"], sd["head.bias"],
                                         num_classes, head_label_map)
        if num_classes is None or head_w.shape[0] == num_classes:
            params["head"] = {"kernel": _t(head_w), "bias": head_b}
    if "cls_token" in sd:
        params["cls_token"] = sd["cls_token"]
    if "pos_embed" in sd:
        # learnable pos-embed checkpoints only; sincos is regenerated.
        params["pos_embed"] = sd["pos_embed"]
    return params


def torch_to_mae_params(sd: Mapping[str, np.ndarray], *, encoder_depth: int,
                        decoder_depth: int) -> Dict[str, Any]:
    """Torch state dict -> flax params for PretrainVideoMAE."""
    params: Dict[str, Any] = {
        "encoder_patch_embed": {
            "kernel": _conv3d_to_patch_kernel(
                sd["encoder.patch_embed.proj.weight"]),
            "bias": sd["encoder.patch_embed.proj.bias"],
        },
        "encoder": {
            "blocks": _convert_block_stack(sd, "encoder.blocks.",
                                           encoder_depth),
            "norm": {"scale": sd["encoder.norm.weight"],
                     "bias": sd["encoder.norm.bias"]},
        },
        "encoder_to_decoder": {"kernel": _t(sd["encoder_to_decoder.weight"])},
        "mask_token": sd["mask_token"],
        "decoder": {
            "blocks": _convert_block_stack(sd, "decoder.blocks.",
                                           decoder_depth),
            "norm": {"scale": sd["decoder.norm.weight"],
                     "bias": sd["decoder.norm.bias"]},
        },
        "decoder_head": {"kernel": _t(sd["decoder.head.weight"]),
                         "bias": sd["decoder.head.bias"]},
    }
    return params


def interpolate_pos_embed(pos: np.ndarray, *, num_temporal: int,
                          new_size: int) -> np.ndarray:
    """Bicubic spatial interpolation of a (1, T*H*W, D) pos-embed table.

    Mirrors run_frame_finetuning.py:433-458 (uses torch's bicubic resampler
    for bit parity with the reference surgery).
    """
    import torch
    import torch.nn.functional as F
    d = pos.shape[-1]
    orig_size = int((pos.shape[1] // num_temporal) ** 0.5)
    if orig_size == new_size:
        return pos
    t = torch.from_numpy(pos).reshape(-1, num_temporal, orig_size, orig_size, d)
    t = t.reshape(-1, orig_size, orig_size, d).permute(0, 3, 1, 2)
    t = F.interpolate(t, size=(new_size, new_size), mode="bicubic",
                      align_corners=False)
    t = t.permute(0, 2, 3, 1).reshape(1, -1, d)
    return t.numpy()


def merge_params(init_params: Dict[str, Any],
                 loaded: Dict[str, Any], path: str = "") -> Dict[str, Any]:
    """Overlay ``loaded`` onto ``init_params``, checking shapes; leaves
    missing from ``loaded`` keep their initialization (e.g. a fresh head)."""
    out = {}
    for key, init_val in init_params.items():
        if isinstance(init_val, dict):
            sub = loaded.get(key, {})
            if not isinstance(sub, dict):
                raise ValueError(f"type mismatch at {path}{key}")
            out[key] = merge_params(init_val, sub, f"{path}{key}.")
        elif key in loaded:
            arr = np.asarray(loaded[key])
            if tuple(arr.shape) != tuple(init_val.shape):
                raise ValueError(
                    f"shape mismatch at {path}{key}: ckpt {arr.shape} "
                    f"vs model {tuple(init_val.shape)}")
            out[key] = arr.astype(np.asarray(init_val).dtype)
        else:
            out[key] = init_val
    return out


def load_vit_checkpoint(path: str, model, params: Dict[str, Any],
                        num_classes: Optional[int] = None,
                        head_label_map: Optional[Sequence[int]] = None
                        ) -> Dict[str, Any]:
    """One-call loader: read .pth, remap, convert, merge over init params.
    Returns DEVICE arrays (numpy leaves in a jit arg would re-upload on
    every call)."""
    import jax
    cfg = model.cfg
    sd = load_torch_state_dict(path)
    loaded = torch_to_vit_params(
        sd, depth=cfg.depth,
        num_classes=num_classes if num_classes is not None else cfg.num_classes,
        final_reduction=cfg.final_reduction, head_label_map=head_label_map)
    if "pos_embed" in loaded and not cfg.use_learnable_pos_emb:
        loaded.pop("pos_embed")
    elif "pos_embed" in loaded:
        # checkpoint trained at a different spatial grid: bicubic-resample
        # the learnable table to the model geometry
        # (run_frame_finetuning.py:433-458)
        want = params["pos_embed"].shape
        got = np.asarray(loaded["pos_embed"]).shape
        if tuple(got) != tuple(want):
            nt = cfg.all_frames // cfg.tubelet_size
            loaded["pos_embed"] = interpolate_pos_embed(
                np.asarray(loaded["pos_embed"], np.float32),
                num_temporal=nt, new_size=cfg.img_size // cfg.patch_size)
    return jax.device_put(merge_params(params, loaded))


def _convert_iv2_block_stack(sd: Mapping[str, np.ndarray], prefix: str,
                             depth: int) -> Dict[str, Any]:
    """Collect torch IV2 '{prefix}{i}.' block params (RMSNorm scale-only,
    LayerScale ls1/ls2.gamma, optional qkv bias and q/k-norm) into one
    stacked pytree matching models/internvideo2.py IV2Block."""
    def stack(fmt):
        return _stack([sd[prefix + fmt.format(i)] for i in range(depth)])

    blocks: Dict[str, Any] = {
        "norm1": {"scale": stack("{}.norm1.weight")},
        "norm2": {"scale": stack("{}.norm2.weight")},
        "gamma_1": stack("{}.ls1.gamma"),
        "gamma_2": stack("{}.ls2.gamma"),
        "attn": {
            "qkv": {"kernel": _stack(
                [_t(sd[f"{prefix}{i}.attn.qkv.weight"])
                 for i in range(depth)])},
            "proj": {"kernel": _stack(
                [_t(sd[f"{prefix}{i}.attn.proj.weight"])
                 for i in range(depth)]),
                "bias": stack("{}.attn.proj.bias")},
        },
        "fc1": {"kernel": _stack([_t(sd[f"{prefix}{i}.mlp.fc1.weight"])
                                  for i in range(depth)]),
                "bias": stack("{}.mlp.fc1.bias")},
        "fc2": {"kernel": _stack([_t(sd[f"{prefix}{i}.mlp.fc2.weight"])
                                  for i in range(depth)]),
                "bias": stack("{}.mlp.fc2.bias")},
    }
    if f"{prefix}0.attn.qkv.bias" in sd:
        blocks["attn"]["qkv"]["bias"] = stack("{}.attn.qkv.bias")
    if f"{prefix}0.attn.q_norm.weight" in sd:
        blocks["attn"]["q_norm"] = {
            "scale": stack("{}.attn.q_norm.weight")}
        blocks["attn"]["k_norm"] = {
            "scale": stack("{}.attn.k_norm.weight")}
    return blocks


def torch_to_iv2_params(sd: Mapping[str, np.ndarray], *, depth: int
                        ) -> Dict[str, Any]:
    """Torch state dict -> flax params for InternVideo2
    (other_models/InternVideo2_single_modality/models/internvideo2.py).

    Unlike VideoMAE, the IV2 pos-embed is a learnable parameter and IS
    loaded; RMSNorm layers carry only a weight (scale)."""
    blocks = _convert_iv2_block_stack(sd, "blocks.", depth)

    params: Dict[str, Any] = {
        "patch_kernel": _conv3d_to_patch_kernel(sd["patch_embed.proj.weight"]),
        "patch_bias": sd["patch_embed.proj.bias"],
        "cls_token": sd["cls_token"],
        "blocks": blocks,
        "clip_projector": {
            "norm_q": {"scale": sd["clip_projector.norm1_q.weight"],
                       "bias": sd["clip_projector.norm1_q.bias"]},
            "norm_k": {"scale": sd["clip_projector.norm1_k.weight"],
                       "bias": sd["clip_projector.norm1_k.bias"]},
            "norm_v": {"scale": sd["clip_projector.norm1_v.weight"],
                       "bias": sd["clip_projector.norm1_v.bias"]},
            "q_kernel": _t(sd["clip_projector.cross_attn.q.weight"]),
            "k_kernel": _t(sd["clip_projector.cross_attn.k.weight"]),
            "v_kernel": _t(sd["clip_projector.cross_attn.v.weight"]),
            "q_bias": sd["clip_projector.cross_attn.q_bias"],
            "k_bias": sd["clip_projector.cross_attn.k_bias"],
            "v_bias": sd["clip_projector.cross_attn.v_bias"],
            "proj": {"kernel": _t(sd["clip_projector.cross_attn.proj.weight"]),
                     "bias": sd["clip_projector.cross_attn.proj.bias"]},
        },
        "fc_norm": {"scale": sd["fc_norm.weight"],
                    "bias": sd["fc_norm.bias"]},
    }
    for key in ("pos_embed", "pos_embed_spatial", "pos_embed_temporal",
                "pos_embed_cls"):
        if key in sd:
            params[key] = sd[key]
    if "head.weight" in sd:
        params["head"] = {"kernel": _t(sd["head.weight"]),
                         "bias": sd["head.bias"]}
    return params


def _convert_feature_decoder(sd: Mapping[str, np.ndarray],
                             prefix: str) -> Dict[str, Any]:
    """Linear_Decoder / MLP_Decoder (internvideo2_distill.py:334-397) ->
    models/iv2_distill.py FeatureDecoder.  The MLP variant's Sequential
    indices (head.0 Linear, head.2 Linear) map to fc1/fc2."""
    out: Dict[str, Any] = {
        "norm": {"scale": sd[f"{prefix}norm.weight"],
                 "bias": sd[f"{prefix}norm.bias"]}}
    if f"{prefix}head.weight" in sd:            # Linear_Decoder
        out["head"] = {"kernel": _t(sd[f"{prefix}head.weight"]),
                       "bias": sd[f"{prefix}head.bias"]}
    else:                                       # MLP_Decoder
        out["fc1"] = {"kernel": _t(sd[f"{prefix}head.0.weight"]),
                      "bias": sd[f"{prefix}head.0.bias"]}
        out["fc2"] = {"kernel": _t(sd[f"{prefix}head.2.weight"]),
                      "bias": sd[f"{prefix}head.2.bias"]}
    return out


def torch_to_distill_iv2_params(sd: Mapping[str, np.ndarray], *,
                                depth: int, clip_return_layer: int
                                ) -> Dict[str, Any]:
    """Torch state dict -> flax params for DistillInternVideo2
    (internvideo2_distill.py DistInternVideo2: masked stage-2 student with
    K tap decoders, clip_pos_embed, attention-pooled final decoder)."""
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv3d_to_patch_kernel(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"]},
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "clip_pos_embed": sd["clip_pos_embed"],
        "blocks": _convert_iv2_block_stack(sd, "blocks.", depth),
        "clip_projector": {
            "norm_q": {"scale": sd["clip_projector.norm1_q.weight"],
                       "bias": sd["clip_projector.norm1_q.bias"]},
            "norm_k": {"scale": sd["clip_projector.norm1_k.weight"],
                       "bias": sd["clip_projector.norm1_k.bias"]},
            "norm_v": {"scale": sd["clip_projector.norm1_v.weight"],
                       "bias": sd["clip_projector.norm1_v.bias"]},
            "q_kernel": _t(sd["clip_projector.cross_attn.q.weight"]),
            "k_kernel": _t(sd["clip_projector.cross_attn.k.weight"]),
            "v_kernel": _t(sd["clip_projector.cross_attn.v.weight"]),
            "q_bias": sd["clip_projector.cross_attn.q_bias"],
            "k_bias": sd["clip_projector.cross_attn.k_bias"],
            "v_bias": sd["clip_projector.cross_attn.v_bias"],
            "proj": {"kernel": _t(sd["clip_projector.cross_attn.proj.weight"]),
                     "bias": sd["clip_projector.cross_attn.proj.bias"]},
        },
    }
    for k in range(clip_return_layer):
        params[f"clip_decoder_{k}"] = _convert_feature_decoder(
            sd, f"clip_decoder.{k}.")
    if "final_clip_decoder.norm.weight" in sd:
        params["final_clip_decoder"] = _convert_feature_decoder(
            sd, "final_clip_decoder.")
    return params


def torch_to_iv2_mae_params(sd: Mapping[str, np.ndarray], *,
                            encoder_depth: int, decoder_depth: int,
                            encoder_dim: Optional[int] = None
                            ) -> Dict[str, Any]:
    """Torch state dict -> flax params for PretrainIV2VideoMAE (IV2 DAPT).

    Two accepted formats, mirroring the reference warm-start surgery
    (/root/reference/other_models/InternVideo2_single_modality/
    iv2_run_mae_double_pretraining.py:295-360):

      * a full DAPT checkpoint (keys ``encoder.*``, ``decoder.*``,
        ``encoder_to_decoder.weight``, ``mask_token``) — everything loads;
      * a plain IV2 trunk checkpoint (finetune/distilled; keys
        ``patch_embed.*``, ``blocks.*``, ``pos_embed`` with CLS row,
        ``fc_norm.*``) — encoder-only warm start: the CLS pos row is
        dropped (:347) and ``fc_norm`` maps to the encoder final norm
        (:355-358) when its width matches ``encoder_dim`` (the reference
        relies on non-strict loading to skip the clip-projector-width
        fc_norm of finetune checkpoints).

    Returns a partial pytree for merge_params()."""
    full = "encoder.patch_embed.proj.weight" in sd
    if full:
        params: Dict[str, Any] = {
            "encoder_patch_embed": {
                "kernel": _conv3d_to_patch_kernel(
                    sd["encoder.patch_embed.proj.weight"]),
                "bias": sd["encoder.patch_embed.proj.bias"],
            },
            "encoder_blocks": _convert_iv2_block_stack(
                sd, "encoder.blocks.", encoder_depth),
            "encoder_norm": {"scale": sd["encoder.norm.weight"],
                             "bias": sd["encoder.norm.bias"]},
            "encoder_to_decoder": {
                "kernel": _t(sd["encoder_to_decoder.weight"])},
            "mask_token": sd["mask_token"],
            "decoder": {
                "blocks": _convert_block_stack(sd, "decoder.blocks.",
                                               decoder_depth),
                "norm": {"scale": sd["decoder.norm.weight"],
                         "bias": sd["decoder.norm.bias"]},
            },
            "decoder_head": {"kernel": _t(sd["decoder.head.weight"]),
                             "bias": sd["decoder.head.bias"]},
        }
        for key in ("encoder.pos_embed", "encoder.pos_embed_spatial",
                    "encoder.pos_embed_temporal"):
            if key in sd:
                params[key.split(".", 1)[1]] = sd[key]
        return params

    params = {
        "encoder_patch_embed": {
            "kernel": _conv3d_to_patch_kernel(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        },
        "encoder_blocks": _convert_iv2_block_stack(sd, "blocks.",
                                                   encoder_depth),
    }
    if "pos_embed" in sd:
        pos = np.asarray(sd["pos_embed"])
        # trunk checkpoints carry a CLS pos row; the pretrain encoder has
        # no CLS token (iv2_run_mae_double_pretraining.py:347)
        params["pos_embed"] = pos[:, 1:, :]
    for key in ("pos_embed_spatial", "pos_embed_temporal"):
        if key in sd:
            params[key] = sd[key]
    if "fc_norm.weight" in sd and (
            encoder_dim is None or sd["fc_norm.weight"].shape[0] == encoder_dim):
        params["encoder_norm"] = {"scale": sd["fc_norm.weight"],
                                  "bias": sd["fc_norm.bias"]}
    elif "norm.weight" in sd and (
            encoder_dim is None or sd["norm.weight"].shape[0] == encoder_dim):
        params["encoder_norm"] = {"scale": sd["norm.weight"],
                                  "bias": sd["norm.bias"]}
    return params


def convert_vivit_state_dict(hf_sd: Mapping[str, np.ndarray], *,
                             depth: int = 12, num_temp_vivit: int = 16,
                             num_temp_target: int = 8) -> Dict[str, np.ndarray]:
    """HuggingFace ViViT state dict -> VideoMAE-style torch-naming dict.

    Mirrors /root/reference/other_models/ViViT/ckpt_vivit.py:56-190:
    separate q/k/v projections merge into one packed qkv weight (k bias
    dropped -> implicit zero), layernorm renames, CLS token dropped, and
    the learnable pos-embed loses its CLS slot and is trilinearly
    interpolated from 16 to 8 temporal slots.  Feed the result to
    torch_to_vit_params (with use_learnable_pos_emb=True on the model).
    """
    out: Dict[str, np.ndarray] = {}
    basic = {
        "embeddings.patch_embeddings.projection.weight":
            "patch_embed.proj.weight",
        "embeddings.patch_embeddings.projection.bias":
            "patch_embed.proj.bias",
        "layernorm.weight": "fc_norm.weight",
        "layernorm.bias": "fc_norm.bias",
    }
    per_block = {
        "layernorm_before.weight": "norm1.weight",
        "layernorm_before.bias": "norm1.bias",
        "attention.output.dense.weight": "attn.proj.weight",
        "attention.output.dense.bias": "attn.proj.bias",
        "layernorm_after.weight": "norm2.weight",
        "layernorm_after.bias": "norm2.bias",
        "intermediate.dense.weight": "mlp.fc1.weight",
        "intermediate.dense.bias": "mlp.fc1.bias",
        "output.dense.weight": "mlp.fc2.weight",
        "output.dense.bias": "mlp.fc2.bias",
    }
    for src, dst in basic.items():
        if src in hf_sd:
            out[dst] = np.asarray(hf_sd[src])
    for i in range(depth):
        pre = f"encoder.layer.{i}."
        for src, dst in per_block.items():
            out[f"blocks.{i}.{dst}"] = np.asarray(hf_sd[pre + src])
        q_w = np.asarray(hf_sd[pre + "attention.attention.query.weight"])
        k_w = np.asarray(hf_sd[pre + "attention.attention.key.weight"])
        v_w = np.asarray(hf_sd[pre + "attention.attention.value.weight"])
        out[f"blocks.{i}.attn.qkv.weight"] = np.concatenate(
            [q_w, k_w, v_w], axis=0)
        out[f"blocks.{i}.attn.q_bias"] = np.asarray(
            hf_sd[pre + "attention.attention.query.bias"])
        out[f"blocks.{i}.attn.v_bias"] = np.asarray(
            hf_sd[pre + "attention.attention.value.bias"])

    pos_key = "embeddings.position_embeddings"
    if pos_key in hf_sd:
        import torch
        import torch.nn.functional as F
        pos = torch.from_numpy(np.asarray(hf_sd[pos_key], np.float32))
        pos = pos[:, 1:]                                   # drop CLS slot
        n, d = pos.shape[1], pos.shape[2]
        hw = int(round((n // num_temp_vivit) ** 0.5))
        pos = pos.reshape(1, num_temp_vivit, hw, hw, d).permute(0, 4, 1, 2, 3)
        pos = F.interpolate(pos, size=(num_temp_target, hw, hw),
                            mode="trilinear", align_corners=False)
        pos = pos.permute(0, 2, 3, 4, 1).reshape(1, -1, d)
        out["pos_embed"] = pos.numpy()
    return out


def vit_params_to_torch_state_dict(params: Mapping[str, Any], *,
                                   final_reduction: str = "fc_norm"
                                   ) -> Dict[str, Any]:
    """Inverse converter: flax VisionTransformer params -> torch-named
    state dict (VideoMAE layout), so checkpoints trained here load in the
    reference/timm ecosystem.  Returns numpy arrays keyed by torch names;
    wrap with {'model': {k: torch.tensor(v)}} and torch.save for a .pth.
    """
    import numpy as np

    def t(a):
        return np.ascontiguousarray(np.asarray(a).T)

    out: Dict[str, Any] = {}
    pe = params["patch_embed"]
    kernel = np.asarray(pe["kernel"])                    # (t*p*p*c, D)
    d = kernel.shape[1]
    # infer (t, p, p, c) from the VideoMAE geometry: c=3, t=2, p=16 when
    # rows == 1536; fall back to cube-root heuristics otherwise
    rows = kernel.shape[0]
    c = 3
    tp = rows // c
    if tp == 512:
        tb, p = 2, 16
    elif tp == 196:
        tb, p = 1, 14
    else:
        tb, p = 1, int(round((tp) ** 0.5))
    w = kernel.reshape(tb, p, p, c, d).transpose(4, 3, 0, 1, 2)
    out["patch_embed.proj.weight"] = np.ascontiguousarray(w)
    out["patch_embed.proj.bias"] = np.asarray(pe["bias"])

    blocks = params["blocks"]
    depth = np.asarray(blocks["norm1"]["scale"]).shape[0]
    for i in range(depth):
        pre = f"blocks.{i}."
        out[pre + "norm1.weight"] = np.asarray(blocks["norm1"]["scale"][i])
        out[pre + "norm1.bias"] = np.asarray(blocks["norm1"]["bias"][i])
        out[pre + "norm2.weight"] = np.asarray(blocks["norm2"]["scale"][i])
        out[pre + "norm2.bias"] = np.asarray(blocks["norm2"]["bias"][i])
        out[pre + "attn.qkv.weight"] = t(blocks["attn"]["qkv_kernel"][i])
        if "q_bias" in blocks["attn"]:
            out[pre + "attn.q_bias"] = np.asarray(
                blocks["attn"]["q_bias"][i])
            out[pre + "attn.v_bias"] = np.asarray(
                blocks["attn"]["v_bias"][i])
        out[pre + "attn.proj.weight"] = t(
            blocks["attn"]["proj"]["kernel"][i])
        out[pre + "attn.proj.bias"] = np.asarray(
            blocks["attn"]["proj"]["bias"][i])
        out[pre + "mlp.fc1.weight"] = t(blocks["mlp"]["fc1"]["kernel"][i])
        out[pre + "mlp.fc1.bias"] = np.asarray(
            blocks["mlp"]["fc1"]["bias"][i])
        out[pre + "mlp.fc2.weight"] = t(blocks["mlp"]["fc2"]["kernel"][i])
        out[pre + "mlp.fc2.bias"] = np.asarray(
            blocks["mlp"]["fc2"]["bias"][i])
        if "gamma_1" in blocks:
            out[pre + "gamma_1"] = np.asarray(blocks["gamma_1"][i])
            out[pre + "gamma_2"] = np.asarray(blocks["gamma_2"][i])
    if final_reduction == "fc_norm" and "fc_norm" in params:
        out["fc_norm.weight"] = np.asarray(params["fc_norm"]["scale"])
        out["fc_norm.bias"] = np.asarray(params["fc_norm"]["bias"])
    elif "norm" in params:
        out["norm.weight"] = np.asarray(params["norm"]["scale"])
        out["norm.bias"] = np.asarray(params["norm"]["bias"])
    if "head" in params:
        out["head.weight"] = t(params["head"]["kernel"])
        out["head.bias"] = np.asarray(params["head"]["bias"])
    if "cls_token" in params:
        out["cls_token"] = np.asarray(params["cls_token"])
    if "pos_embed" in params:
        out["pos_embed"] = np.asarray(params["pos_embed"])
    return out


def save_torch_checkpoint(params: Mapping[str, Any], path: str, *,
                          final_reduction: str = "fc_norm") -> None:
    """Write a reference-loadable .pth ({'model': state_dict})."""
    import torch
    sd = vit_params_to_torch_state_dict(params,
                                        final_reduction=final_reduction)
    torch.save({"model": {k: torch.from_numpy(np.array(v, copy=True))
                          for k, v in sd.items()}}, path)


def load_checkpoint_auto(path: str, model, params: Dict[str, Any],
                         head_label_map: Optional[Sequence[int]] = None
                         ) -> Dict[str, Any]:
    """Model-aware .pth loader: dispatches to the right converter for
    VisionTransformer / PretrainVideoMAE / InternVideo2 (the iv2 driver
    family used its own loaders in the reference; one entry point here).

    ``head_label_map``: K710 head remap indices for 600/700-class
    finetunes (run_finetuning.py:388-400; 400-class slicing is automatic).
    """
    import jax
    from simple_tad_tpu.models.internvideo2 import InternVideo2
    from simple_tad_tpu.models.mae import PretrainVideoMAE
    if isinstance(model, InternVideo2):
        sd = load_torch_state_dict(path)
        loaded = torch_to_iv2_params(sd, depth=model.cfg.depth)
        if "head" in loaded and "head" in params:
            nb = np.asarray(params["head"]["bias"]).shape[0]
            w, b = _remap_710_head(
                np.asarray(loaded["head"]["kernel"]).T,
                np.asarray(loaded["head"]["bias"]), nb, head_label_map)
            loaded["head"] = {"kernel": w.T, "bias": b}
            if b.shape[0] != nb:
                loaded.pop("head")
        return jax.device_put(merge_params(params, loaded))
    if isinstance(model, PretrainVideoMAE):
        sd = load_torch_state_dict(path)
        loaded = torch_to_mae_params(
            sd, encoder_depth=model.cfg.encoder_depth,
            decoder_depth=model.cfg.decoder_depth)
        return jax.device_put(merge_params(params, loaded))
    return load_vit_checkpoint(path, model, params,
                               head_label_map=head_label_map)
