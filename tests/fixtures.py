"""Synthetic DoTA-format dataset fixture (SURVEY.md §4): a tiny tree of
JPEG-in-zip clips + JSON annotations that exercises the full eval path
end-to-end on CPU."""

import json
import os
import zipfile

import cv2
import numpy as np


def _frame_image(h, w, t, risky: bool, seed: int) -> np.ndarray:
    """Dashcam-ish synthetic frame: sky/road gradient + moving blob.
    Risky frames get a bright red blob so a trained toy model could
    separate them; pipeline tests only need determinism."""
    rng = np.random.default_rng(seed * 10007 + t)
    img = np.zeros((h, w, 3), np.uint8)
    img[: h // 2] = (135, 170, 200)          # sky
    img[h // 2:] = (90, 90, 95)              # road
    x = int((t * 7) % (w - 10))
    color = (220, 40, 40) if risky else (40, 180, 60)
    cv2.circle(img, (x + 5, h // 2), 6, color, -1)
    img += rng.integers(0, 8, img.shape, dtype=np.uint8)
    return img


def make_synthetic_dota(root: str, *, n_clips: int = 3,
                        frames_per_clip: int = 40, h: int = 72, w: int = 128,
                        split: str = "val_split.txt",
                        prefix: str = "clip") -> str:
    """Build <root>/{dataset/{split,annotations,metadata_*.json},
    frames/<clip>/images.zip}.  Odd clips contain an anomaly window."""
    ds = os.path.join(root, "dataset")
    os.makedirs(os.path.join(ds, "annotations"), exist_ok=True)
    names, meta = [], {}
    for c in range(n_clips):
        name = f"{prefix}_{c:03d}"
        names.append(name)
        has_anomaly = c % 2 == 1
        a_start, a_end = frames_per_clip // 2, frames_per_clip // 2 + 8
        labels = []
        frame_dir = os.path.join(root, "frames", name)
        os.makedirs(frame_dir, exist_ok=True)
        with zipfile.ZipFile(os.path.join(frame_dir, "images.zip"), "w") as zf:
            for t in range(frames_per_clip):
                risky = has_anomaly and a_start <= t <= a_end
                img = _frame_image(h, w, t, risky, seed=c)
                ok, buf = cv2.imencode(".jpg", img)
                assert ok
                zf.writestr(f"{t:06d}.jpg", buf.tobytes())
                labels.append({"image_path": f"frames/{t:06d}.jpg",
                               "accident_id": 3 if risky else 0})
        anno = {"labels": labels, "ego_involve": bool(c % 2),
                "night": bool(c == 2)}
        with open(os.path.join(ds, "annotations", f"{name}.json"), "w") as f:
            json.dump(anno, f)
        meta[name] = {"anomaly_class":
                      ("ego: lateral" if c % 2 else "other: unknown")}
    with open(os.path.join(ds, split), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(ds, "all_split.txt"), "a") as f:
        f.write("\n".join(names) + "\n")
    meta_name = ("metadata_train.json" if "train" in split
                 else "metadata_val.json")
    with open(os.path.join(ds, meta_name), "w") as f:
        json.dump(meta, f)
    return root


def make_synthetic_dota_full(root: str, **kw) -> str:
    """Fixture with both train and val splits (for trainer CLI tests)."""
    make_synthetic_dota(root, split="train_split.txt", prefix="train", **kw)
    return make_synthetic_dota(root, split="val_split.txt", prefix="val",
                               **kw)


def make_synthetic_dada(root: str, *, n_clips: int = 2,
                        frames_per_clip: int = 60, h: int = 48,
                        w: int = 64) -> str:
    """DADA-2000-format fixture: <root>/{DADA2K_my_split/*.txt,
    annotation/full_anno.csv, frames/<type>/<video>/images.zip} with
    %04d.png members at 30 fps (dada.py layout)."""
    import csv
    os.makedirs(os.path.join(root, "DADA2K_my_split"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotation"), exist_ok=True)
    names, rows = [], []
    for c in range(n_clips):
        clip_type = str((c % 2) + 1)       # types 1, 2 (both ego)
        video = str(c + 1)
        name = f"{clip_type}/{video}"
        names.append(name)
        frame_dir = os.path.join(root, "frames", clip_type, video)
        os.makedirs(frame_dir, exist_ok=True)
        has_acc = c % 2 == 1
        st, en = (30, 45) if has_acc else (-1, -1)
        with zipfile.ZipFile(os.path.join(frame_dir, "images.zip"),
                             "w") as zf:
            for t in range(frames_per_clip):
                risky = has_acc and st <= t <= en
                img = _frame_image(h, w, t, risky, seed=c + 100)
                ok, buf = cv2.imencode(".png", img)
                assert ok
                zf.writestr(f"{t:04d}.png", buf.tobytes())
        rows.append({"video": video, "type": clip_type,
                     "whether an accident occurred (1/0)": int(has_acc),
                     "abnormal start frame": st, "abnormal end frame": en,
                     "accident frame": st if has_acc else -1,
                     "light(day,night)1-2": 2 if c == 0 else 1,
                     "texts": "synthetic"})
    import pandas as pd
    pd.DataFrame(rows).to_csv(
        os.path.join(root, "annotation", "full_anno.csv"), index=False)
    for split in ("training.txt", "validation.txt", "all.txt"):
        with open(os.path.join(root, "DADA2K_my_split", split), "w") as f:
            f.write("\n".join(names) + "\n")
    return root


def make_synthetic_k700(root: str, *, n_videos: int = 3,
                        frames_per_video: int = 90, fps: float = 30.0,
                        h: int = 48, w: int = 64) -> str:
    """Kinetics-700 layout: annotations/train.csv + train/{label}/
    {ytid}_{t1:06d}_{t2:06d}.mp4 (kinetics.py _make_dataset_snellius)."""
    import cv2
    ann = os.path.join(root, "annotations")
    os.makedirs(ann, exist_ok=True)
    rows = []
    for i in range(n_videos):
        label = f"class_{i % 2}"
        ytid = f"vid{i:04d}xxxxx"
        t1, t2 = 10 * i, 10 * i + 10
        d = os.path.join(root, "train", label)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{ytid}_{t1:06d}_{t2:06d}.mp4")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
        assert wr.isOpened()
        for t in range(frames_per_video):
            wr.write(_frame_image(h, w, t, risky=False, seed=i))
        wr.release()
        rows.append((label, ytid, t1, t2))
    with open(os.path.join(ann, "train.csv"), "w") as f:
        f.write("label,youtube_id,time_start,time_end,split\n")
        for label, ytid, t1, t2 in rows:
            f.write(f"{label},{ytid},{t1},{t2},train\n")
    return root
