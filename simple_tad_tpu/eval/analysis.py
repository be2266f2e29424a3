"""Offline grouped analysis of predictions.csv: overall / ego / night /
per-category AUCs.

Behavioral reference: /root/reference/anaysis/metrics_dota.py:36-188,
metrics_dada.py, metrics_by_categories.py:17, plus the annotation-building
step data_tools/{dota,dada}/anno_for_predictions.py (which instantiates the
test dataset and dumps per-frame rows).  Here the frame-level annotation
table comes straight from the FrameDataset views — no intermediate CSV is
required — but CSV in/out is supported for interop with reference outputs.

Reported metric triple per group: auroc / aucmcc / mcc05, x100
(the paper's table format).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from simple_tad_tpu.data.frame_datasets import FrameDataset
from simple_tad_tpu.eval.metrics import auc_mcc, mcc_curve

DOTA_CAT_CODES = ("ST", "AH", "LA", "OC", "TC", "VP", "VO", "OO", "UK")


def build_frame_annotations(dataset: FrameDataset):
    """Per-window annotation table {clip, filename, label, ego, night, cat,
    clip_lvl_cat, clip_lvl_ego} — the anno_for_predictions.py equivalent."""
    import pandas as pd
    rows = []
    for view in dataset.clip_eval_views():
        clip = view.clip
        last = view.unique_frames[view.window_idx[:, -1]]
        for i, fname in enumerate(view.frame_names):
            fi = last[i]
            rows.append({
                "clip": clip.name, "filename": fname,
                "label": int(clip.binary_labels[fi]),
                "ego": int(clip.ego), "night": int(clip.night),
                "cat": int(clip.cat_labels[fi]),
                "clip_lvl_cat": clip.meta_category or "UK",
                "clip_lvl_ego": bool(clip.meta_ego)
                if clip.meta_ego is not None else bool(clip.ego),
            })
    return pd.DataFrame(rows)


def _group_metrics(labels: np.ndarray, probs: np.ndarray) -> Dict[str, float]:
    """auroc / aucmcc / mcc05; single-class groups get the reference's
    sentinel AUC (-10 - y, anaysis/metrics.py:55-61)."""
    from sklearn.metrics import roc_auc_score
    labels = np.asarray(labels)
    if len(np.unique(labels)) < 2:
        y = int(labels[0]) if len(labels) else 0
        return {"auroc": -10 - y, "aucmcc": 0.0, "mcc05": 0.0,
                "n": len(labels)}
    mcc = mcc_curve(probs, labels)
    from simple_tad_tpu.eval.metrics import THRESHOLDS
    idx05 = int(np.argmin(np.abs(THRESHOLDS - 0.5)))
    return {"auroc": float(roc_auc_score(labels, probs)),
            "aucmcc": float(np.trapezoid(mcc, THRESHOLDS)),
            "mcc05": float(mcc[idx05]), "n": len(labels)}


def grouped_metrics(preds_df, anno_df=None, *, cat_codes=DOTA_CAT_CODES
                    ) -> Dict[str, Dict[str, float]]:
    """Join predictions with annotations and compute per-group metrics.

    preds_df needs columns {clip, filename, logits_safe, logits_risk,
    label}; anno_df (optional) {clip, filename, ego, night, clip_lvl_cat,
    clip_lvl_ego}.  Returns {group_name: {auroc, aucmcc, mcc05, n}}.
    """
    df = preds_df.copy()
    logits = df[["logits_safe", "logits_risk"]].to_numpy()
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    df["probs"] = (e / e.sum(axis=1, keepdims=True))[:, 1]

    if anno_df is not None:
        keep = [c for c in ("clip", "filename", "ego", "night",
                            "clip_lvl_cat", "clip_lvl_ego")
                if c in anno_df.columns]
        df = df.merge(anno_df[keep], on=["clip", "filename"], how="left")
        df = df.dropna()

    out = {"TOTAL": _group_metrics(df["label"], df["probs"])}
    if "ego" in df.columns:
        for name, sub in (("ego", df[df["ego"] == 1]),
                          ("non-ego", df[df["ego"] == 0])):
            if len(sub):
                out[name] = _group_metrics(sub["label"], sub["probs"])
    if "night" in df.columns:
        for name, sub in (("night", df[df["night"] == 1]),
                          ("day", df[df["night"] == 0])):
            if len(sub):
                out[name] = _group_metrics(sub["label"], sub["probs"])
    if "clip_lvl_cat" in df.columns:
        for code in cat_codes:
            sub = df[df["clip_lvl_cat"] == code]
            if len(sub):
                out[f"cat:{code}"] = _group_metrics(sub["label"],
                                                    sub["probs"])
    return out


def format_group_report(groups: Dict[str, Dict[str, float]]) -> str:
    lines = ["=" * 59, "  Grouped metrics (auroc / aucmcc / mcc05, x100)",
             "-" * 59]
    for name, m in groups.items():
        lines.append(
            f"{name:>12}  n={m['n']:>7}  auroc: {100 * m['auroc']:.1f} | "
            f"aucmcc: {100 * m['aucmcc']:.1f} | mcc05: {100 * m['mcc05']:.1f}")
    return "\n".join(lines)


def show_metrics(preds_dir: str, dataset: Optional[FrameDataset] = None,
                 anno_csv: Optional[str] = None) -> str:
    """metrics_dota.show_metrics equivalent: read predictions.csv, join with
    annotations (from a dataset or a CSV), write group_metrics.txt."""
    import pandas as pd
    preds = pd.read_csv(os.path.join(preds_dir, "predictions.csv"))
    anno = None
    if dataset is not None:
        anno = build_frame_annotations(dataset)
    elif anno_csv is not None:
        anno = pd.read_csv(anno_csv)
    report = format_group_report(grouped_metrics(preds, anno))
    out_file = os.path.join(preds_dir, "group_metrics.txt")
    with open(out_file, "w") as f:
        f.write(report + "\n")
    return report
