"""Streaming frame-by-frame inference over a folder of frames.

Equivalent of /root/reference/run_inference.py (and its self-contained
variant run_inference_simple.py): fill a 16-frame window from the first
frames, then per new frame shift the window and emit a risk probability.

TPU-first: the window shift + forward is one jit'd program; the window
buffer stays on device (the reference re-uploads the full window every
frame).  Also supports scoring a whole folder in batched mode (--batched),
which is how TPUs should run offline video.

Usage:
  python -m simple_tad_tpu.cli.inference --ckpt model.pth \
      --frames_folder /path/to/frames --model vit_small_patch16_224
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def prepare_image(path: str, crop: int = 224) -> np.ndarray:
    """cv2 read -> cubic resize -> RGB uint8 (run_inference.py:15-34)."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"cannot read {path}")
    img = cv2.resize(img, (crop, crop), interpolation=cv2.INTER_CUBIC)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def main(argv=None):
    parser = argparse.ArgumentParser("simple_tad_tpu streaming inference")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--frames_folder", required=True)
    parser.add_argument("--model", default="vit_small_patch16_224")
    parser.add_argument("--num_frames", type=int, default=16)
    parser.add_argument("--input_size", type=int, default=224)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--batched", action="store_true",
                        help="score all windows in batches instead of "
                             "simulating a stream")
    parser.add_argument("--output_csv", default="")
    parser.add_argument("--quant8", action="store_true",
                        help="int8 GEMMs with static scales calibrated "
                             "on the first frames (see ops/quant.py)")
    args = parser.parse_args(argv)

    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import simple_tad_tpu as st
    from simple_tad_tpu.utils.fold_norm import fold_normalization
    from simple_tad_tpu.utils.torch_convert import load_vit_checkpoint

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = st.create_model(args.model, num_classes=2,
                            all_frames=args.num_frames,
                            img_size=args.input_size, dtype=dtype)
    params = model.init_params(jax.random.PRNGKey(0))
    if args.ckpt.endswith(".pth"):
        params = load_vit_checkpoint(args.ckpt, model, params)
    else:
        from simple_tad_tpu.utils.checkpoint import load_weights
        params = load_weights(args.ckpt, params)
    params = fold_normalization(params)

    files = sorted(glob.glob(os.path.join(args.frames_folder, "*")))
    files = [f for f in files if os.path.splitext(f)[1].lower()
             in (".jpg", ".jpeg", ".png")]
    assert len(files) >= args.num_frames, "not enough frames"

    T, S = args.num_frames, args.input_size

    if args.quant8:
        from simple_tad_tpu.ops.quant import quantize_and_calibrate
        first = np.stack([prepare_image(f, S) for f in files[:T]])
        model, params = quantize_and_calibrate(
            model, params, [jnp.asarray(first[None]).astype(dtype)],
            deterministic=True)

    @jax.jit
    def streaming_step(params, window_u8, new_frame_u8):
        """Shift window left, append frame, forward -> (window, risk)."""
        window_u8 = jnp.concatenate(
            [window_u8[1:], new_frame_u8[None]], axis=0)
        logits = model.apply({"params": params},
                             window_u8.astype(dtype)[None],
                             deterministic=True)
        return window_u8, jax.nn.softmax(
            logits.astype(jnp.float32), -1)[0, 1]

    @jax.jit
    def batch_score(params, frames_u8, idx):
        w = jnp.take(frames_u8, idx, axis=0).astype(dtype)
        logits = model.apply({"params": params}, w, deterministic=True)
        return jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1]

    results = []
    if args.batched:
        frames = np.stack([prepare_image(f, S) for f in files])
        n_windows = len(files) - T + 1
        B = 32
        dev_frames = jnp.asarray(frames)
        t0 = time.perf_counter()
        for s in range(0, n_windows, B):
            idx = np.stack([np.arange(i, i + T)
                            for i in range(s, min(s + B, n_windows))])
            if idx.shape[0] < B:
                idx = np.pad(idx, ((0, B - idx.shape[0]), (0, 0)))
            risk = np.asarray(batch_score(params, dev_frames,
                                          jnp.asarray(idx)))
            take = min(B, n_windows - s)
            for j in range(take):
                results.append((files[s + j + T - 1], float(risk[j])))
        dt = time.perf_counter() - t0
        print(f"[batched] {n_windows} windows in {dt:.2f}s "
              f"({n_windows / dt:.1f} windows/s)")
    else:
        window = jnp.asarray(
            np.stack([prepare_image(f, S) for f in files[:T]]))
        # warm up (compile)
        _, risk = streaming_step(params, window, window[-1])
        t0 = time.perf_counter()
        for f in files[T:]:
            frame = jnp.asarray(prepare_image(f, S))
            window, risk = streaming_step(params, window, frame)
            results.append((f, float(risk)))
        dt = time.perf_counter() - t0
        n = max(len(files) - T, 1)
        print(f"[stream] {n} frames in {dt:.2f}s ({n / dt:.1f} FPS)")

    for path, risk in results[:10]:
        print(f"{os.path.basename(path)}  risk={risk:.4f}")
    if args.output_csv:
        import pandas as pd
        pd.DataFrame(results, columns=["frame", "risk"]).to_csv(
            args.output_csv, index=False)
    return results


if __name__ == "__main__":
    main()
