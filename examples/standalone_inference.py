"""Self-contained single-clip anomaly inference — the dependency-light
correctness reference.

Equivalent of /root/reference/run_inference_simple.py:279-475, which
re-implements the ViT inline so the model definition can be verified
without the framework. This file needs only jax + numpy + cv2 (for
reading frames) and re-states the full VideoMAE ViT forward in ~120 lines
of pure jnp — no flax, no package imports — then prints the risk
probability of one 16-frame window.

Usage:
  python examples/standalone_inference.py --ckpt weights.npz \
      --frames_dir clip_frames/ [--arch small|base|large]

The .npz holds the converted flax params flattened with '/'-joined keys
(see simple_tad_tpu.utils.torch_convert + save_params_npz below).
"""

import argparse
import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

ARCHS = {"small": (384, 12, 6), "base": (768, 12, 12),
         "large": (1024, 24, 16)}
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def save_params_npz(params, path):
    """Flatten a flax params pytree into an npz (helper for exporting)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)
    walk("", params)
    np.savez(path, **flat)


def sincos_table(n, d):
    pos = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(d, dtype=np.float64)[None, :]
    ang = pos / np.power(10000.0, 2.0 * np.floor(j / 2.0) / d)
    t = np.where(np.arange(d) % 2 == 0, np.sin(ang), np.cos(ang))
    return t.astype(np.float32)


def layer_norm(x, scale, bias, eps=1e-6):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def vit_forward(p, video, depth, heads):
    """video: (16, 224, 224, 3) normalized -> (2,) logits.  Pure jnp
    restatement of the VideoMAE ViT (packed QKV, pre-LN, mean+fc_norm)."""
    T, S, _, C = video.shape
    tb, ps = 2, 16
    nt, ng = T // tb, S // ps
    x = video.reshape(nt, tb, ng, ps, ng, ps, C)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6).reshape(nt * ng * ng, -1)
    x = x @ p["patch_embed/kernel"] + p["patch_embed/bias"]
    x = x + sincos_table(x.shape[0], x.shape[1])

    dim = x.shape[1]
    hd = dim // heads
    for i in range(depth):
        b = lambda name: p[f"blocks/{name}"][i]  # noqa: E731
        h = layer_norm(x, b("norm1/scale"), b("norm1/bias"))
        qkv = h @ b("attn/qkv_kernel")
        qkv = qkv + jnp.concatenate(
            [b("attn/q_bias"), jnp.zeros(dim), b("attn/v_bias")])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(-1, heads, hd).transpose(1, 0, 2) * hd ** -0.5
        k = k.reshape(-1, heads, hd).transpose(1, 0, 2)
        v = v.reshape(-1, heads, hd).transpose(1, 0, 2)
        attn = jax.nn.softmax(q @ k.transpose(0, 2, 1), -1)
        o = (attn @ v).transpose(1, 0, 2).reshape(-1, dim)
        x = x + o @ b("attn/proj/kernel") + b("attn/proj/bias")
        h = layer_norm(x, b("norm2/scale"), b("norm2/bias"))
        h = jax.nn.gelu(h @ b("mlp/fc1/kernel") + b("mlp/fc1/bias"),
                        approximate=False)
        x = x + h @ b("mlp/fc2/kernel") + b("mlp/fc2/bias")

    pooled = jnp.mean(x, axis=0)
    pooled = layer_norm(pooled, p["fc_norm/scale"], p["fc_norm/bias"])
    return pooled @ p["head/kernel"] + p["head/bias"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help=".npz flattened params")
    ap.add_argument("--frames_dir", required=True)
    ap.add_argument("--arch", default="small", choices=list(ARCHS))
    args = ap.parse_args()
    import cv2

    dim, depth, heads = ARCHS[args.arch]
    p = dict(np.load(args.ckpt))
    files = sorted(glob.glob(os.path.join(args.frames_dir, "*")))[:16]
    assert len(files) == 16, "need 16 frames"
    frames = []
    for f in files:
        img = cv2.imread(f, cv2.IMREAD_COLOR)
        img = cv2.resize(img, (224, 224), interpolation=cv2.INTER_CUBIC)
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    video = np.stack(frames).astype(np.float32) / 255.0
    video = (video - IMAGENET_MEAN) / IMAGENET_STD

    logits = vit_forward(p, jnp.asarray(video), depth, heads)
    probs = jax.nn.softmax(logits)
    print(f"logits: {np.asarray(logits)}")
    print(f"risk probability: {float(probs[1]):.4f}")


if __name__ == "__main__":
    main()
