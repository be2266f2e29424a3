"""Generate reference-executed golden fixtures (tests/goldens/*.npz).

Imports the ACTUAL reference code at /root/reference (modeling_finetune.py,
modeling_pretrain.py, other_models/{MVD,UMT}/modeling_finetune.py,
other_models/InternVideo2_single_modality/models/internvideo2.py), stubs
the 4 timm symbols + the flash_attn import surface it needs (the models
are run with use_flash_attn=False so only the pure-torch naive paths
execute), fills every parameter with deterministic values from
tests/golden_utils.param_fill, runs a seeded input on CPU, and dumps the
logits + parameter manifest.

The reference code is EXECUTED, never copied: the npz carries only the
reference's output numbers and its state-dict key/shape manifest.
tests/test_golden_parity.py then rebuilds the identical state dict,
converts it with simple_tad_tpu.utils.torch_convert, and asserts our flax
models reproduce these logits to <1e-4.

Run from the repo root:  python scripts/make_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)

from tests import golden_utils as gu  # noqa: E402


# ---------------------------------------------------------------- stubs
def _install_stubs():
    """timm + flash_attn import stubs (reference imports them at module
    scope; with use_flash_attn=False none of the flash functions run)."""
    import torch.nn as nn

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return nn.init.trunc_normal_(tensor, mean, std, a, b)

    def drop_path(x, drop_prob=0.0, training=False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        rand = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        return x.div(keep) * rand.floor_()

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            return drop_path(x, self.drop_prob, self.training)

    def register_model(fn):
        return fn

    def _unavailable(*a, **k):
        raise RuntimeError("flash_attn stub called — reference model must "
                           "be built with use_flash_attn=False")

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.drop_path = drop_path
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.DropPath = DropPath
    timm_registry = types.ModuleType("timm.models.registry")
    timm_registry.register_model = register_model
    timm.models = timm_models
    timm_models.layers = timm_layers
    timm_models.registry = timm_registry

    fa = types.ModuleType("flash_attn")
    fa_iface = types.ModuleType("flash_attn.flash_attn_interface")
    fa_iface.flash_attn_varlen_qkvpacked_func = _unavailable
    fa_pad = types.ModuleType("flash_attn.bert_padding")
    fa_pad.unpad_input = _unavailable
    fa_pad.pad_input = _unavailable
    fa_mlp = types.ModuleType("flash_attn.modules.mlp")
    fa_mlp.FusedMLP = _unavailable
    fa_rms = types.ModuleType("flash_attn.ops.rms_norm")
    fa_rms.DropoutAddRMSNorm = _unavailable
    fa_modules = types.ModuleType("flash_attn.modules")
    fa_modules.mlp = fa_mlp
    fa_ops = types.ModuleType("flash_attn.ops")
    fa_ops.rms_norm = fa_rms

    for name, mod in [("timm", timm), ("timm.models", timm_models),
                      ("timm.models.layers", timm_layers),
                      ("timm.models.registry", timm_registry),
                      ("flash_attn", fa),
                      ("flash_attn.flash_attn_interface", fa_iface),
                      ("flash_attn.bert_padding", fa_pad),
                      ("flash_attn.modules", fa_modules),
                      ("flash_attn.modules.mlp", fa_mlp),
                      ("flash_attn.ops", fa_ops),
                      ("flash_attn.ops.rms_norm", fa_rms)]:
        sys.modules[name] = mod


def _import_file(modname: str, path: str, package_dir: str | None = None):
    import importlib.util
    if package_dir is not None:
        pkg_name = modname.rsplit(".", 1)[0]
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [package_dir]
            sys.modules[pkg_name] = pkg
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def _fill_and_manifest(model) -> dict:
    manifest = {}
    with torch.no_grad():
        for name, p in model.named_parameters():
            if not p.requires_grad:
                # frozen tables (e.g. MVD pretrain's 3D sincos pos_embed,
                # an nn.Parameter with requires_grad=False) keep the
                # model's OWN values — that is exactly what the golden
                # must gate on the reimplementation side
                continue
            manifest[name] = list(p.shape)
            p.copy_(torch.from_numpy(gu.param_fill(name, tuple(p.shape))))
    return manifest


def _run(model, inputs, out_path, meta, slice_tokens=None):
    model.eval()
    manifest = _fill_and_manifest(model)
    with torch.no_grad():
        out = model(*[torch.from_numpy(a) if isinstance(a, np.ndarray)
                      else a for a in inputs])
    if slice_tokens is not None:
        # keep the fixture small: every kept row still depends on the whole
        # encoder + full decoder attention, so errors anywhere surface here
        out = out[:, :slice_tokens]
        meta = dict(meta, slice_tokens=slice_tokens)
    gu.save_golden(out_path, logits=out.numpy(), manifest=manifest,
                   meta=meta)
    print(f"{out_path}: logits {tuple(out.shape)}  "
          f"params {len(manifest)}  |out| {float(out.abs().mean()):.4f}")


def main():
    _install_stubs()
    torch.manual_seed(0)
    out_dir = os.path.join(REPO, "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)

    sys.path.insert(0, REF)
    mf = _import_file("ref_modeling_finetune",
                      os.path.join(REF, "modeling_finetune.py"))
    # modeling_pretrain does `from modeling_finetune import ...`
    sys.modules["modeling_finetune"] = mf
    mp = _import_file("ref_modeling_pretrain",
                      os.path.join(REF, "modeling_pretrain.py"))

    # --- VideoMAE ViT-S, 16 frames, fc_norm head (modeling_finetune.py:338)
    m = mf.vit_small_patch16_224(
        num_classes=2, all_frames=16, use_flash_attn=False, init_scale=1.0)
    x = gu.input_video(101, 2, 16, 224)
    _run(m, [x], os.path.join(out_dir, "vit_s_fcnorm.npz"),
         dict(model="vit_small_patch16_224", num_classes=2, all_frames=16,
              input_seed=101, batch=2, final_reduction="fc_norm"))

    # --- VideoMAE ViT-B, 8 frames, LayerScale gammas (init_values=0.1)
    m = mf.vit_base_patch16_224(
        num_classes=2, all_frames=8, use_flash_attn=False,
        init_values=0.1, init_scale=1.0)
    x = gu.input_video(102, 1, 8, 224)
    _run(m, [x], os.path.join(out_dir, "vit_b_gamma.npz"),
         dict(model="vit_base_patch16_224", num_classes=2, all_frames=8,
              input_seed=102, batch=1, init_values=0.1,
              final_reduction="fc_norm"))

    # --- VideoMAE ViT-S, 8 frames, final_reduction='none' (token logits)
    m = mf.vit_small_patch16_224(
        num_classes=2, all_frames=8, use_flash_attn=False,
        final_reduction="none", init_scale=1.0)
    x = gu.input_video(103, 1, 8, 224)
    _run(m, [x], os.path.join(out_dir, "vit_s_tokens.npz"),
         dict(model="vit_small_patch16_224", num_classes=2, all_frames=8,
              input_seed=103, batch=1, final_reduction="none"))

    # --- MAE pretrain ViT-S (modeling_pretrain.py:294), 16 frames, 90% mask
    m = mp.pretrain_videomae_small_patch16_224(use_flash_attn=False)
    n_patches = 8 * 196
    n_masked = int(n_patches * 0.9)
    x = gu.input_video(104, 2, 16, 224)
    mask = gu.tube_mask(105, 2, n_patches, n_masked)
    _run(m, [x, torch.from_numpy(mask)],
         os.path.join(out_dir, "mae_s.npz"),
         dict(model="pretrain_videomae_small_patch16_224", input_seed=104,
              batch=2, mask_seed=105, n_masked=n_masked),
         slice_tokens=128)

    # --- MVD ViT-S: 3D sincos pos-embed + CLS token
    # (other_models/MVD/modeling_finetune.py:322-495)
    mvd = _import_file("ref_mvd_modeling_finetune",
                       os.path.join(REF, "other_models/MVD/"
                                    "modeling_finetune.py"))
    m = mvd.mvd_vit_small_patch16_224(
        num_classes=2, all_frames=8, use_flash_attn=False,
        use_cls_token=True, init_scale=1.0)
    x = gu.input_video(106, 1, 8, 224)
    _run(m, [x], os.path.join(out_dir, "mvd_s_cls.npz"),
         dict(model="mvd_vit_small_patch16_224", num_classes=2,
              all_frames=8, input_seed=106, batch=1, use_cls_token=True))

    # --- UMT ViT-B: tubelet 1, 4 frames -> interpolated 1568-pos table
    # (other_models/UMT/modeling_finetune.py:195-239 table + :286-293)
    umt = _import_file("ref_umt_modeling_finetune",
                       os.path.join(REF, "other_models/UMT/"
                                    "modeling_finetune.py"))
    m = umt.vit_base_patch16_224(
        num_classes=2, all_frames=4, tubelet_size=1, use_flash_attn=False,
        init_scale=1.0)
    x = gu.input_video(107, 1, 4, 224)
    _run(m, [x], os.path.join(out_dir, "umt_b.npz"),
         dict(model="umt_vit_base_patch16_224", num_classes=2, all_frames=4,
              tubelet_size=1, input_seed=107, batch=1))

    # --- UMT ViT-S at the native 8-frame/tubelet-1 geometry: n_position ==
    # pre_n_position so the table stays a FIXED buffer — exercises our
    # umt_pos_embed table generation end-to-end (not just learnable load)
    m = umt.vit_small_patch16_224(
        num_classes=2, all_frames=8, tubelet_size=1, use_flash_attn=False,
        init_scale=1.0)
    x = gu.input_video(109, 1, 8, 224)
    _run(m, [x], os.path.join(out_dir, "umt_s_8f.npz"),
         dict(model="umt_vit_small_patch16_224", num_classes=2,
              all_frames=8, tubelet_size=1, input_seed=109, batch=1))

    # --- MVD MAE pretrain ViT-S: 3D sincos encoder table, 1D decoder
    # table (other_models/MVD/modeling_pretrain.py:63-66,:279,:317)
    mvd_mp = _import_file("ref_mvd.modeling_pretrain",
                          os.path.join(REF, "other_models/MVD/"
                                       "modeling_pretrain.py"),
                          package_dir=os.path.join(REF, "other_models/MVD"))
    m = mvd_mp.pretrain_videomae_mvd_small_patch16_224(
        decoder_depth=4, use_flash_attn=False)
    n_patches = 8 * 196
    n_masked = int(n_patches * 0.9)
    x = gu.input_video(110, 1, 16, 224)
    mask = gu.tube_mask(111, 1, n_patches, n_masked)
    _run(m, [x, torch.from_numpy(mask)],
         os.path.join(out_dir, "mvd_mae_s.npz"),
         dict(model="pretrain_videomae_mvd_small_patch16_224",
              input_seed=110, batch=1, mask_seed=111, n_masked=n_masked,
              decoder_depth=4),
         slice_tokens=128)

    # --- InternVideo2-S: RMSNorm/QK-norm/LayerScale/attention-pooling
    # (other_models/InternVideo2_single_modality/models/internvideo2.py:372)
    iv2_dir = os.path.join(REF, "other_models/InternVideo2_single_modality/"
                           "models")
    _import_file("ref_iv2.pos_embed",
                 os.path.join(iv2_dir, "pos_embed.py"), package_dir=iv2_dir)
    _import_file("ref_iv2.flash_attention_class",
                 os.path.join(iv2_dir, "flash_attention_class.py"),
                 package_dir=iv2_dir)
    iv2 = _import_file("ref_iv2.internvideo2",
                       os.path.join(iv2_dir, "internvideo2.py"),
                       package_dir=iv2_dir)
    m = iv2.internvideo2_small_patch14_224(
        num_classes=2, num_frames=4, use_flash_attn=False,
        use_fused_rmsnorm=False, use_fused_mlp=False,
        drop_path_rate=0.0, init_scale=1.0)
    x = gu.input_video(108, 1, 4, 224)
    _run(m, [x], os.path.join(out_dir, "iv2_s.npz"),
         dict(model="internvideo2_small_patch14_224", num_classes=2,
              num_frames=4, input_seed=108, batch=1))


if __name__ == "__main__":
    main()
