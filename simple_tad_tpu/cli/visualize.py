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
    args = p.parse_args(argv)
    if args.cmd == "overlay":
        n = overlay_clip(args.data_path, args.preds, args.clip, args.out,
                         gif=args.gif, fps=args.fps)
        print(f"annotated {n} frames -> {args.out}")
    else:
        n = zip2gif(args.zip, args.out, args.fps, args.scale)
        print(f"wrote {n} frames -> {args.out}")


if __name__ == "__main__":
    main()
