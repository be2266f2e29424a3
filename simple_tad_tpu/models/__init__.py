"""Model registry — names mirror the reference timm registry so job configs
translate 1:1 (/root/reference/modeling_finetune.py:338-398,
modeling_pretrain.py:293-387)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp

from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer

# (embed_dim, depth, num_heads) per trunk size
_VIT_SIZES = {
    "small": (384, 12, 6),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
    "huge": (1280, 32, 16),
}

# MAE decoder geometry per trunk size (modeling_pretrain.py:293-387):
# (decoder_embed_dim, decoder_num_heads)
_MAE_DECODER = {
    "small": (192, 3),
    "base": (384, 6),
    "large": (512, 8),
    "huge": (640, 8),
}

_REGISTRY: Dict[str, Any] = {}


def _register_vit():
    for size, (dim, depth, heads) in _VIT_SIZES.items():
        for img in (224, 384, 512):
            name = f"vit_{size}_patch16_{img}"
            _REGISTRY[name] = ("vit", dict(
                img_size=img, patch_size=16, embed_dim=dim, depth=depth,
                num_heads=heads, mlp_ratio=4.0, qkv_bias=True))
    # MVD variants: 3D sincos pos-embed, optional CLS
    # (/root/reference/other_models/MVD/modeling_finetune.py:459-495)
    for size, (dim, depth, heads) in _VIT_SIZES.items():
        _REGISTRY[f"mvd_vit_{size}_patch16_224"] = ("vit", dict(
            img_size=224, patch_size=16, embed_dim=dim, depth=depth,
            num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
            pos_embed_kind="3d"))
    # UMT variants: tubelet 1, 8 frames, interpolated checkpoint pos table
    # (/root/reference/other_models/UMT/modeling_finetune.py)
    for size in ("base", "large"):
        dim, depth, heads = _VIT_SIZES[size]
        _REGISTRY[f"umt_vit_{size}_patch16_224"] = ("vit", dict(
            img_size=224, patch_size=16, embed_dim=dim, depth=depth,
            num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
            tubelet_size=1, all_frames=8, pos_embed_kind="umt"))
    # InternVideo2 single-modality family (patch 14, tubelet 1, 8 frames)
    # (/root/reference/other_models/InternVideo2_single_modality/models/
    #  internvideo2.py:590-666)
    iv2_sizes = {"small": (384, 12, 6, 4.0), "base": (768, 12, 12, 4.0),
                 "large": (1024, 24, 16, 4.0), "1B": (1408, 40, 16, 48 / 11),
                 "6B": (3200, 48, 25, 4.0)}
    for size, (dim, depth, heads, ratio) in iv2_sizes.items():
        _REGISTRY[f"internvideo2_{size}_patch14_224"] = ("iv2", dict(
            img_size=224, patch_size=14, embed_dim=dim, depth=depth,
            num_heads=heads, mlp_ratio=ratio, attn_pool_num_heads=16,
            clip_embed_dim=768))
    for size, (dim, depth, heads) in _VIT_SIZES.items():
        name = f"pretrain_videomae_{size}_patch16_224"
        ddim, dheads = _MAE_DECODER[size]
        _REGISTRY[name] = ("mae", dict(
            img_size=224, patch_size=16, encoder_embed_dim=dim,
            encoder_depth=depth, encoder_num_heads=heads,
            decoder_embed_dim=ddim, decoder_num_heads=dheads,
            decoder_num_classes=1536, mlp_ratio=4.0, qkv_bias=True))
        # MVD-style MAE: encoder pos embed is the fixed 3D sincos table
        # (temporal dim/4 + spatial 3*dim/4), decoder keeps the 1D table
        # (/root/reference/other_models/MVD/modeling_pretrain.py:63-66,
        # :279, registry :317-391)
        _REGISTRY[f"pretrain_videomae_mvd_{size}_patch16_224"] = (
            "mae", dict(
                img_size=224, patch_size=16, encoder_embed_dim=dim,
                encoder_depth=depth, encoder_num_heads=heads,
                decoder_embed_dim=ddim, decoder_num_heads=dheads,
                decoder_num_classes=1536, mlp_ratio=4.0, qkv_bias=True,
                pos_embed_kind="3d"))
    # IV2 DAPT: VideoMAE-style pixel reconstruction on the InternVideo2
    # trunk (patch 14, tubelet 1, bias-free qkv, RMSNorm/QK-norm blocks,
    # LayerScale 1e-5).  The reference registers only the S geometry
    # (internvideo2_pretrain_videomae.py:356-365); the size variants
    # follow the same decoder convention as an extension.
    _REGISTRY["pretrain_videomae_internvideo2_patch14_224"] = (
        "iv2_mae", dict(
            img_size=224, patch_size=14, encoder_embed_dim=384,
            encoder_depth=12, encoder_num_heads=6, decoder_embed_dim=192,
            decoder_num_heads=3, decoder_num_classes=588, mlp_ratio=4.0))
    for size, (dim, depth, heads) in _VIT_SIZES.items():
        ddim, dheads = _MAE_DECODER[size]
        _REGISTRY[f"pretrain_videomae_internvideo2_{size}_patch14_224"] = (
            "iv2_mae", dict(
                img_size=224, patch_size=14, encoder_embed_dim=dim,
                encoder_depth=depth, encoder_num_heads=heads,
                decoder_embed_dim=ddim, decoder_num_heads=dheads,
                decoder_num_classes=588, mlp_ratio=4.0))
    # Stage-2 distillation students: masked IV2 trunk + K tap decoders +
    # attention-pooled final decoder (internvideo2_distill.py:703-740)
    for size in ("small", "base", "large"):
        dim, depth, heads, _ = iv2_sizes[size]
        _REGISTRY[f"distill_internvideo2_{size}_patch14_224"] = (
            "iv2_distill", dict(
                img_size=224, patch_size=14, embed_dim=dim, depth=depth,
                num_heads=heads, mlp_ratio=4.0, attn_pool_num_heads=16,
                clip_embed_dim=768))


_register_vit()


def list_models():
    return sorted(_REGISTRY)


def create_model(name: str, **overrides):
    """Build a model by registry name.  Extra kwargs override config fields.

    Returns a flax Module.  ``create_model('vit_base_patch16_224',
    num_classes=2, dtype=jnp.bfloat16)``.
    """
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {list_models()}")
    kind, base = _REGISTRY[name]
    kw = dict(base)
    kw.update(overrides)

    def _fit(config_cls, mapping):
        fields = {f.name for f in dataclasses.fields(config_cls)}
        return {k: v for k, v in mapping.items() if k in fields}

    if kind == "vit":
        return VisionTransformer(ViTConfig(**_fit(ViTConfig, kw)))
    if kind == "mae":
        from simple_tad_tpu.models.mae import MAEConfig, PretrainVideoMAE
        return PretrainVideoMAE(MAEConfig(**_fit(MAEConfig, kw)))
    if kind == "iv2_mae":
        from simple_tad_tpu.models.mae import (IV2MAEConfig,
                                               PretrainIV2VideoMAE)
        return PretrainIV2VideoMAE(IV2MAEConfig(**_fit(IV2MAEConfig, kw)))
    if kind == "iv2":
        from simple_tad_tpu.models.internvideo2 import (InternVideo2,
                                                        IV2Config)
        if "all_frames" in kw:
            kw.setdefault("num_frames", kw.pop("all_frames"))
        return InternVideo2(IV2Config(**_fit(IV2Config, kw)))
    if kind == "iv2_distill":
        from simple_tad_tpu.models.iv2_distill import (DistillInternVideo2,
                                                       DistillIV2Config)
        if "all_frames" in kw:
            kw.setdefault("num_frames", kw.pop("all_frames"))
        return DistillInternVideo2(
            DistillIV2Config(**_fit(DistillIV2Config, kw)))
    raise KeyError(kind)
