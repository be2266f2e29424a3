"""Prediction visualization: risk-curve overlays and zip->gif export.

Equivalents of /root/reference/anaysis/vis_video_paper.py (annotated
per-frame risk video) and data_tools/zip2gif.py.  Writes annotated JPEG
frames (and optionally an animated GIF via PIL) given predictions.csv.

Usage:
  python -m simple_tad_tpu.cli.visualize overlay \
      --data_path <dota_root> --preds out/predictions.csv \
      --clip <clip_name> --out vis/
  python -m simple_tad_tpu.cli.visualize zip2gif \
      --zip frames/<clip>/images.zip --out clip.gif [--fps 10]
  python -m simple_tad_tpu.cli.visualize paper-figure \
      --data_path <dota_root> --clip <clip_name> --out fig.png \
      --preds a/predictions.csv --name "w/o DAPT" \
      --preds b/predictions.csv --name "w/ DAPT"
"""

from __future__ import annotations

import argparse
import os
import zipfile
from typing import List, Optional

import cv2
import numpy as np


def annotate_frame(img: np.ndarray, risk: float, label: Optional[int],
                   history: List[float], max_history: int = 100
                   ) -> np.ndarray:
    """Draw a risk bar + scrolling risk curve on one BGR frame."""
    h, w = img.shape[:2]
    out = img.copy()
    # risk bar
    bar_w = int(w * 0.25)
    x0, y0 = 10, 10
    cv2.rectangle(out, (x0, y0), (x0 + bar_w, y0 + 16), (60, 60, 60), -1)
    fill = int(bar_w * min(max(risk, 0.0), 1.0))
    color = (0, 0, 255) if risk > 0.5 else (0, 200, 0)
    cv2.rectangle(out, (x0, y0), (x0 + fill, y0 + 16), color, -1)
    cv2.putText(out, f"risk {risk:.2f}", (x0 + bar_w + 8, y0 + 14),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
    if label is not None:
        txt = "ANOMALY" if label else "normal"
        cv2.putText(out, txt, (x0, y0 + 36), cv2.FONT_HERSHEY_SIMPLEX,
                    0.55, (0, 0, 255) if label else (0, 200, 0), 2)
    # scrolling curve along the bottom
    hist = history[-max_history:]
    if len(hist) > 1:
        base = h - 12
        span = int(h * 0.2)
        pts = [(int(w * i / max_history),
                int(base - v * span)) for i, v in enumerate(hist)]
        cv2.polylines(out, [np.asarray(pts, np.int32)], False,
                      (0, 255, 255), 1)
        cv2.line(out, (0, int(base - 0.5 * span)),
                 (int(w * len(hist) / max_history),
                  int(base - 0.5 * span)), (120, 120, 120), 1)
    return out


def overlay_clip(data_path: str, preds_csv: str, clip: str, out_dir: str,
                 gif: Optional[str] = None, fps: int = 10) -> int:
    import pandas as pd
    df = pd.read_csv(preds_csv)
    df = df[df["clip"] == clip].copy()
    if not len(df):
        raise ValueError(f"no predictions for clip {clip!r}")
    logits = df[["logits_safe", "logits_risk"]].to_numpy()
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    df["risk"] = (e / e.sum(axis=1, keepdims=True))[:, 1]
    risk_of = dict(zip(df["filename"], df["risk"]))
    label_of = dict(zip(df["filename"], df["label"]))

    os.makedirs(out_dir, exist_ok=True)
    zpath = os.path.join(data_path, "frames", clip, "images.zip")
    written = 0
    history: List[float] = []
    gif_frames = []
    with zipfile.ZipFile(zpath) as zf:
        for name in sorted(zf.namelist()):
            if name not in risk_of:
                continue
            img = cv2.imdecode(np.frombuffer(zf.read(name), np.uint8),
                               cv2.IMREAD_COLOR)
            history.append(float(risk_of[name]))
            out = annotate_frame(img, history[-1],
                                 int(label_of[name]), history)
            cv2.imwrite(os.path.join(out_dir, name), out)
            if gif is not None:
                gif_frames.append(cv2.cvtColor(out, cv2.COLOR_BGR2RGB))
            written += 1
    if gif is not None and gif_frames:
        _write_gif(gif_frames, gif, fps)
    return written


def _write_gif(rgb_frames: List[np.ndarray], out: str, fps: int = 10):
    from PIL import Image
    ims = [Image.fromarray(f) for f in rgb_frames]
    ims[0].save(out, save_all=True, append_images=ims[1:],
                duration=int(1000 / fps), loop=0)


def zip2gif(zip_path: str, out: str, fps: int = 10, scale: float = 0.5,
            max_frames: int = 200) -> int:
    """data_tools/zip2gif.py equivalent."""
    frames = []
    with zipfile.ZipFile(zip_path) as zf:
        for name in sorted(zf.namelist())[:max_frames]:
            img = cv2.imdecode(np.frombuffer(zf.read(name), np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                continue
            if scale != 1.0:
                img = cv2.resize(img, (0, 0), fx=scale, fy=scale)
            frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    if frames:
        _write_gif(frames, out, fps)
    return len(frames)


def _glue_with_margin(imgs: List[np.ndarray], timestamps: List[float],
                      margin: int = 3) -> np.ndarray:
    """Horizontally glue BGR frames with white gaps, stamping each with its
    timestamp (orange text over a black outline, bottom-right) — the
    reference's glue_with_margin (anaysis/vis_video_paper.py:60-101)."""
    annotated = []
    for img, ts in zip(imgs, timestamps):
        img = img.copy()
        h, w = img.shape[:2]
        text = f"{ts:.1f} s"
        scale = max(w / 400.0, 0.5)
        thick = max(int(round(scale * 1.5)), 1)
        (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX,
                                      scale, thick)
        x, y = w - tw - max(w // 20, 6), h - max(h // 20, 6)
        cv2.putText(img, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX, scale,
                    (0, 0, 0), thick + 2, cv2.LINE_AA)
        cv2.putText(img, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX, scale,
                    (0, 165, 255), thick, cv2.LINE_AA)
        annotated.append(img)
    gap = np.full((annotated[0].shape[0], margin, 3), 255,
                  annotated[0].dtype)
    rows: List[np.ndarray] = []
    for im in annotated:
        rows.extend([im, gap])
    return np.hstack(rows[:-1])


def paper_figure(preds_csvs: List[str], names: List[str], clip: str,
                 data_path: str, out: str, *, frame_times: Optional[
                     List[float]] = None, n_frames: int = 4,
                 fps: float = 10.0) -> str:
    """Multi-model qualitative comparison figure
    (anaysis/vis_video_paper.py:40-253): a strip of timestamped frames from
    the clip on top, every model's softmax risk curve below with the
    ground-truth anomaly window shaded and the 0.5 threshold dashed.

    ``preds_csvs``/``names``: one predictions.csv + legend label per model
    (all scored on the same clip — labels must agree).  ``frame_times``:
    seconds into the clip for the strip frames (default: evenly spaced).
    Output format follows the ``out`` extension (png/pdf).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.gridspec as gridspec
    import matplotlib.pyplot as plt
    import pandas as pd

    assert len(preds_csvs) == len(names) and preds_csvs, \
        "one --name per --preds"
    curves, labels_ref = [], None
    for path in preds_csvs:
        df = pd.read_csv(path)
        df = df[df["clip"] == clip].sort_values("filename")
        if not len(df):
            raise ValueError(f"no predictions for clip {clip!r} in {path}")
        logits = df[["logits_safe", "logits_risk"]].to_numpy()
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        curves.append((e / e.sum(axis=1, keepdims=True))[:, 1])
        labels = df["label"].to_numpy().astype(bool)
        if labels_ref is None:
            labels_ref, frame_names = labels, list(df["filename"])
        else:
            assert len(labels) == len(labels_ref) and (
                labels == labels_ref).all(), \
                f"labels mismatch between {preds_csvs[0]} and {path}"
    T = len(labels_ref)
    time = np.arange(T) / fps

    if frame_times is None:
        frame_times = list(np.linspace(time[0], time[-1],
                                       min(n_frames, T)))
    zpath = os.path.join(data_path, "frames", clip, "images.zip")
    imgs = []
    with zipfile.ZipFile(zpath) as zf:
        for ts in frame_times:
            name = frame_names[min(int(round(ts * fps)), T - 1)]
            imgs.append(cv2.imdecode(np.frombuffer(zf.read(name), np.uint8),
                                     cv2.IMREAD_COLOR))
    glued = _glue_with_margin(imgs, frame_times)

    fig = plt.figure(figsize=(15, 3.7))
    gs = gridspec.GridSpec(2, 1, height_ratios=[3, 2], hspace=0.05)
    ax_img = fig.add_subplot(gs[0, 0])
    ax_img.imshow(cv2.cvtColor(glued, cv2.COLOR_BGR2RGB))
    ax_img.axis("off")

    ax = fig.add_subplot(gs[1, 0])
    palette = ["#8F1A55", "#1A788F", "#1A8F3C", "#8F6B1A", "#4B1A8F"]
    for i, (curve, name) in enumerate(zip(curves, names)):
        ax.plot(time, curve, label=name,
                color=palette[i % len(palette)], lw=2)
    ax.fill_between(time, 0.0, 1.0, where=labels_ref, color="#9B398A",
                    alpha=0.3, transform=ax.get_xaxis_transform())
    ax.axhline(0.5, color="gray", linestyle="--", linewidth=1.5, zorder=1)
    anom = time[labels_ref]
    if anom.size:
        ax.text((anom.min() + anom.max()) / 2, 0.52,
                "ground truth\nanomaly window", ha="center", va="bottom",
                fontsize=10, color="#353535")
    ax.set_xlim(time[0], time[-1])
    ax.set_ylim(-0.015, 1.02)
    ax.set_xlabel("Time (s)", fontsize=12)
    ax.set_ylabel("Risk score", fontsize=14)
    ax.legend(loc="upper left", frameon=False, fontsize=12)
    fig.savefig(out, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return out


def _read_clip_frames(path: str, n: int, stride: int) -> List[np.ndarray]:
    """First window of ``n`` frames at ``stride`` from a video file, an
    images.zip, or a directory of JPEGs — BGR uint8."""
    idx = [i * stride for i in range(n)]
    frames: List[np.ndarray] = []
    if os.path.isdir(path):
        names = sorted(os.listdir(path))
        for i in idx:
            img = cv2.imread(os.path.join(path, names[min(i,
                                                          len(names) - 1)]))
            frames.append(img)
    elif path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            names = sorted(zf.namelist())
            for i in idx:
                frames.append(cv2.imdecode(
                    np.frombuffer(zf.read(names[min(i, len(names) - 1)]),
                                  np.uint8), cv2.IMREAD_COLOR))
    else:
        cap = cv2.VideoCapture(path)
        buf = []
        while len(buf) <= idx[-1]:
            ok, img = cap.read()
            if not ok:
                break
            buf.append(img)
        cap.release()
        if not buf:
            raise IOError(f"no frames decoded from {path}")
        frames = [buf[min(i, len(buf) - 1)] for i in idx]
    return frames


def mae_reconstruction(model_name: str, ckpt: str, video: str, out_dir: str,
                       *, mask_ratio: float = 0.9, decoder_depth: int = 4,
                       num_frames: int = 16, sampling_rate: int = 4,
                       input_size: int = 224, seed: int = 42) -> str:
    """Masked-autoencoder reconstruction images (the reference vis.sh /
    upstream run_videomae_vis.py workflow): tube-mask one clip window,
    predict the masked patches, un-normalize each predicted patch with the
    ORIGINAL patch's mean/std (the training target is per-patch normalized,
    engine_for_pretraining.py:201-217), and write orig / masked / recon
    frame strips."""
    import jax
    import jax.numpy as jnp

    import simple_tad_tpu as st
    from simple_tad_tpu.data.masking import TubeMaskingGenerator
    from simple_tad_tpu.models.mae import mask_partition
    from simple_tad_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD
    from simple_tad_tpu.utils.torch_convert import load_checkpoint_auto

    model = st.create_model(model_name, decoder_depth=decoder_depth,
                            all_frames=num_frames, img_size=input_size,
                            dtype=jnp.float32)
    n_tok = model.cfg.num_patches
    dummy = jnp.zeros((1, num_frames, input_size, input_size, 3),
                      jnp.float32)
    dummy_mask = np.zeros((1, n_tok), bool)
    dummy_mask[:, :max(n_tok // 2, 1)] = True
    params = model.init(jax.random.PRNGKey(0), dummy,
                        jnp.asarray(dummy_mask),
                        int(dummy_mask.sum()))["params"]
    if ckpt:
        params = load_checkpoint_auto(ckpt, model, params)

    bgr = _read_clip_frames(video, num_frames, sampling_rate)
    rgb = np.stack([cv2.cvtColor(cv2.resize(
        f, (input_size, input_size), interpolation=cv2.INTER_CUBIC),
        cv2.COLOR_BGR2RGB) for f in bgr])                # (T, H, W, 3)
    unnorm = rgb.astype(np.float32) / 255.0              # [0, 1]
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    x = (unnorm - mean) / std

    cfg = model.cfg
    p, tb = cfg.patch_size, cfg.tubelet_size
    T, H, W, _ = unnorm.shape
    nt, nh, nw = T // tb, H // p, W // p
    gen = TubeMaskingGenerator((nt, nh, nw), mask_ratio)
    mask = gen(np.random.default_rng(seed)).astype(bool)[None]   # (1, N)
    num_masked = int(mask.sum())

    pred = np.asarray(jax.jit(
        lambda pr, xv, mk: model.apply({"params": pr}, xv, mk, num_masked,
                                       deterministic=True),
        static_argnums=())(params, jnp.asarray(x[None]),
                           jnp.asarray(mask)))           # (1, M, tb*p*p*C)

    # patchify the original, compute per-patch stats, un-normalize pred
    v = unnorm.reshape(nt, tb, nh, p, nw, p, 3)
    v = v.transpose(0, 2, 4, 1, 3, 5, 6).reshape(nt * nh * nw, tb * p * p, 3)
    mu = v.mean(axis=1, keepdims=True)
    var = ((v - mu) ** 2).sum(axis=1, keepdims=True) / (v.shape[1] - 1)
    sd = np.sqrt(var) + 1e-6
    _, mask_idx = mask_partition(jnp.asarray(mask), num_masked)
    midx = np.asarray(mask_idx)[0]
    rec_patches = v.copy()
    pred_p = pred[0].reshape(num_masked, tb * p * p, 3)
    rec_patches[midx] = pred_p * sd[midx] + mu[midx]
    masked_patches = v.copy()
    masked_patches[midx] = 0.5   # gray out masked tubelets

    def unpatch(pt):
        u = pt.reshape(nt, nh, nw, tb, p, p, 3).transpose(0, 3, 1, 4, 2, 5, 6)
        return u.reshape(T, H, W, 3)

    os.makedirs(out_dir, exist_ok=True)
    for name, arr in (("orig", unnorm), ("masked", unpatch(masked_patches)),
                      ("recon", unpatch(rec_patches))):
        strip = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        for t in range(T):
            cv2.imwrite(os.path.join(out_dir, f"{name}_{t:02d}.jpg"),
                        cv2.cvtColor(strip[t], cv2.COLOR_RGB2BGR))
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser("simple_tad_tpu visualization")
    sub = p.add_subparsers(dest="cmd", required=True)
    o = sub.add_parser("overlay")
    o.add_argument("--data_path", required=True)
    o.add_argument("--preds", required=True)
    o.add_argument("--clip", required=True)
    o.add_argument("--out", required=True)
    o.add_argument("--gif", default=None)
    o.add_argument("--fps", type=int, default=10)
    g = sub.add_parser("zip2gif")
    g.add_argument("--zip", required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--fps", type=int, default=10)
    g.add_argument("--scale", type=float, default=0.5)
    pf = sub.add_parser("paper-figure",
                        help="multi-model comparison figure "
                             "(anaysis/vis_video_paper.py)")
    pf.add_argument("--data_path", required=True)
    pf.add_argument("--preds", action="append", required=True,
                    help="predictions.csv (repeat per model)")
    pf.add_argument("--name", action="append", required=True,
                    help="legend label (repeat per model, paired with "
                         "--preds)")
    pf.add_argument("--clip", required=True)
    pf.add_argument("--out", required=True, help="output .png / .pdf")
    pf.add_argument("--frame_times", type=float, nargs="*", default=None,
                    help="seconds into the clip for the strip frames")
    pf.add_argument("--n_frames", type=int, default=4)
    pf.add_argument("--fps", type=float, default=10.0)
    m = sub.add_parser("mae-recon",
                       help="MAE reconstruction strips (reference vis.sh)")
    m.add_argument("--model", default="pretrain_videomae_base_patch16_224")
    m.add_argument("--ckpt", default="")
    m.add_argument("--video", required=True)
    m.add_argument("--output_dir", required=True)
    m.add_argument("--mask_ratio", type=float, default=0.9)
    m.add_argument("--mask_type", default="tube", choices=["tube"])
    m.add_argument("--decoder_depth", type=int, default=4)
    m.add_argument("--num_frames", type=int, default=16)
    m.add_argument("--sampling_rate", type=int, default=4)
    m.add_argument("--input_size", type=int, default=224)
    args = p.parse_args(argv)
    if args.cmd == "overlay":
        n = overlay_clip(args.data_path, args.preds, args.clip, args.out,
                         gif=args.gif, fps=args.fps)
        print(f"annotated {n} frames -> {args.out}")
    elif args.cmd == "zip2gif":
        n = zip2gif(args.zip, args.out, args.fps, args.scale)
        print(f"wrote {n} frames -> {args.out}")
    elif args.cmd == "paper-figure":
        out = paper_figure(args.preds, args.name, args.clip, args.data_path,
                           args.out, frame_times=args.frame_times,
                           n_frames=args.n_frames, fps=args.fps)
        print(f"wrote figure -> {out}")
    elif args.cmd == "mae-recon":
        out = mae_reconstruction(
            args.model, args.ckpt, args.video, args.output_dir,
            mask_ratio=args.mask_ratio, decoder_depth=args.decoder_depth,
            num_frames=args.num_frames, sampling_rate=args.sampling_rate,
            input_size=args.input_size)
        print(f"wrote reconstruction strips -> {out}")


if __name__ == "__main__":
    main()
