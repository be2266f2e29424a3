"""Dataset preparation / integrity utilities.

Equivalents of /root/reference/data_tools/: frames2zip (pack frame folders
into images.zip), check-zips (CRC scan, dada/check_corrupted_zips.py),
halfsplit (category-stratified half splits, dota/halfsplit.py), and
anno-for-predictions (frame-level annotation CSV for the grouped analysis,
dota/anno_for_predictions.py).

Usage:
  python -m simple_tad_tpu.cli.data_tools frames2zip --src dir/ --dst out/
  python -m simple_tad_tpu.cli.data_tools check-zips --data_path root/
  python -m simple_tad_tpu.cli.data_tools halfsplit --data_path root/ \
      --split val_split.txt
  python -m simple_tad_tpu.cli.data_tools anno-for-predictions \
      --data_set DoTA --data_path root/ --split val_split.txt --out anno.csv
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile
from typing import List


def frames2zip(src: str, dst: str, ext: str = ".jpg") -> int:
    """Pack each <src>/<clip>/*.jpg folder into <dst>/<clip>/images.zip
    (data_tools/frames2zip.py:13-93; store uncompressed — JPEGs don't
    deflate and raw store reads faster)."""
    n = 0
    for clip in sorted(os.listdir(src)):
        clip_dir = os.path.join(src, clip)
        if not os.path.isdir(clip_dir):
            continue
        frames = sorted(f for f in os.listdir(clip_dir)
                        if f.lower().endswith(ext))
        if not frames:
            continue
        out_dir = os.path.join(dst, clip)
        os.makedirs(out_dir, exist_ok=True)
        with zipfile.ZipFile(os.path.join(out_dir, "images.zip"), "w",
                             zipfile.ZIP_STORED) as zf:
            for f in frames:
                zf.write(os.path.join(clip_dir, f), arcname=f)
        n += 1
    return n


def check_videos(root: str, exts=(".mp4", ".mov", ".avi", ".webm")
                 ) -> List[str]:
    """Open every video under root with cv2 and read one frame
    (data_tools/check_kinetics.py equivalent); returns unreadable paths."""
    import cv2
    bad = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if os.path.splitext(f)[1].lower() not in exts:
                continue
            path = os.path.join(dirpath, f)
            cap = cv2.VideoCapture(path)
            ok, _ = cap.read()
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            cap.release()
            if not ok or n <= 0:
                bad.append(path)
    return bad


def check_zips(data_path: str) -> List[str]:
    """CRC-scan every frames/*/images.zip; returns corrupt paths
    (data_tools/dada/check_corrupted_zips.py)."""
    bad = []
    frames_root = os.path.join(data_path, "frames")
    for root, _dirs, files in os.walk(frames_root):
        for f in files:
            if f == "images.zip":
                path = os.path.join(root, f)
                try:
                    with zipfile.ZipFile(path) as zf:
                        if zf.testzip() is not None:
                            bad.append(path)
                except Exception:
                    bad.append(path)
    return bad


def halfsplit(data_path: str, split: str, seed: int = 0):
    """Category-stratified half split of a DoTA split file
    (data_tools/dota/halfsplit.py): writes <split>_half1/2.txt keeping the
    clip-level category distribution balanced."""
    import numpy as np
    from simple_tad_tpu.data.frame_datasets import read_dota_clips
    clips = read_dota_clips(data_path, split)
    by_cat = {}
    for c in clips:
        by_cat.setdefault(c.meta_category or "UK", []).append(c.name)
    rng = np.random.default_rng(seed)
    half1, half2 = [], []
    for cat in sorted(by_cat):
        names = sorted(by_cat[cat])
        rng.shuffle(names)
        half1 += names[: len(names) // 2]
        half2 += names[len(names) // 2:]
    base = os.path.join(data_path, "dataset", os.path.splitext(split)[0])
    for suffix, names in (("_half1.txt", half1), ("_half2.txt", half2)):
        with open(base + suffix, "w") as f:
            f.write("\n".join(sorted(names)) + "\n")
    return sorted(half1), sorted(half2)


def anno_for_predictions(data_set: str, data_path: str, split: str,
                         out_csv: str, view_len: int = 16,
                         view_fps: int = 10):
    """Frame-level annotation CSV consumed by the grouped analysis
    (data_tools/dota/anno_for_predictions.py:31-45)."""
    from simple_tad_tpu.data.frame_datasets import (FrameDataset,
                                                    read_dada_clips,
                                                    read_dota_clips)
    from simple_tad_tpu.eval.analysis import build_frame_annotations
    if data_set == "DoTA":
        clips = read_dota_clips(data_path, split, orig_fps=10)
        orig_fps = 10
    else:
        clips = read_dada_clips(data_path, split, orig_fps=30)
        orig_fps = 30
    ds = FrameDataset(clips, mode="test", view_len=view_len,
                      target_fps=view_fps, orig_fps=orig_fps, view_step=1)
    df = build_frame_annotations(ds)
    df.to_csv(out_csv, index=False)
    return df


def main(argv=None):
    parser = argparse.ArgumentParser("simple_tad_tpu data tools")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("frames2zip")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--ext", default=".jpg")
    p = sub.add_parser("check-zips")
    p.add_argument("--data_path", required=True)
    p = sub.add_parser("check-videos")
    p.add_argument("--data_path", required=True)
    p = sub.add_parser("halfsplit")
    p.add_argument("--data_path", required=True)
    p.add_argument("--split", default="val_split.txt")
    p.add_argument("--seed", type=int, default=0)
    p = sub.add_parser("anno-for-predictions")
    p.add_argument("--data_set", default="DoTA")
    p.add_argument("--data_path", required=True)
    p.add_argument("--split", default="val_split.txt")
    p.add_argument("--out", required=True)
    p = sub.add_parser("prepare-views",
                       help="precompute pretrain view lists (the reference's"
                            " *_prepared datasets, bdd100k.py:164-188)")
    p.add_argument("--data_set", default="DoTA")
    p.add_argument("--data_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--view_fps", type=int, default=10)
    p.add_argument("--sampling_rate", type=int, default=4)
    args = parser.parse_args(argv)

    if args.cmd == "frames2zip":
        n = frames2zip(args.src, args.dst, args.ext)
        print(f"packed {n} clips")
    elif args.cmd == "check-zips":
        bad = check_zips(args.data_path)
        print(f"{len(bad)} corrupt zips")
        for b in bad:
            print(b)
        sys.exit(1 if bad else 0)
    elif args.cmd == "check-videos":
        bad = check_videos(args.data_path)
        print(f"{len(bad)} unreadable videos")
        for b in bad:
            print(b)
        sys.exit(1 if bad else 0)
    elif args.cmd == "halfsplit":
        h1, h2 = halfsplit(args.data_path, args.split, args.seed)
        print(f"half1: {len(h1)} clips, half2: {len(h2)} clips")
    elif args.cmd == "anno-for-predictions":
        df = anno_for_predictions(args.data_set, args.data_path, args.split,
                                  args.out)
        print(f"wrote {len(df)} rows to {args.out}")
    elif args.cmd == "prepare-views":
        from simple_tad_tpu.cli.pretrain import _build_source
        from simple_tad_tpu.data.pretrain_datasets import save_view_list

        class _Cfg:
            num_frames = args.num_frames
            view_fps = args.view_fps
            sampling_rate = args.sampling_rate
        ds = _build_source(args.data_set, args.data_path, _Cfg)
        save_view_list(ds.samples, args.out)
        print(f"wrote {len(ds.samples)} views to {args.out}")


if __name__ == "__main__":
    main()
