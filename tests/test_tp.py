"""Tensor-parallel sharding: spec correctness and numerical parity with the
replicated model on the virtual 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from simple_tad_tpu.models.vit import ViTConfig, VisionTransformer
from simple_tad_tpu.parallel.tp import (make_2d_mesh, shard_params,
                                        vit_param_specs)


def _model():
    cfg = ViTConfig(img_size=32, all_frames=4, embed_dim=64, depth=2,
                    num_heads=2, num_classes=2, attn_impl="naive")
    m = VisionTransformer(cfg)
    return m, m.init_params(jax.random.PRNGKey(0))


def test_param_specs():
    _, params = _model()
    specs = vit_param_specs(params)
    assert specs["blocks"]["attn"]["qkv_kernel"] == P(None, None, "model")
    assert specs["blocks"]["attn"]["proj"]["kernel"] == P(None, "model",
                                                          None)
    assert specs["blocks"]["mlp"]["fc1"]["kernel"] == P(None, None, "model")
    assert specs["blocks"]["mlp"]["fc2"]["kernel"] == P(None, "model", None)
    assert specs["blocks"]["mlp"]["fc2"]["bias"] == P()
    assert specs["blocks"]["norm1"]["scale"] == P()
    assert specs["patch_embed"]["kernel"] == P()
    assert specs["head"]["kernel"] == P()


def test_tp_forward_matches_replicated():
    model, params = _model()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 32, 32, 3))
    want = np.asarray(model.apply({"params": params}, x))

    mesh = make_2d_mesh(8, model_parallel=2)
    sharded = shard_params(mesh, params)
    # the qkv kernel really is split over the model axis
    sh = sharded["blocks"]["attn"]["qkv_kernel"].sharding
    assert not sh.is_fully_replicated

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    got = np.asarray(fwd(sharded, x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
