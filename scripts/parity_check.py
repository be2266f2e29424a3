"""AUC-parity harness for real DoTA/DADA data + released checkpoints.

Run this first on a machine that has the real dataset and a MODEL_ZOO
.pth (this dev image has neither): it evaluates the checkpoint through
BOTH pixel paths and reports the gate numbers (BASELINE.json: AUC within
0.1 of the published MODEL_ZOO values).

  python scripts/parity_check.py --data_set DoTA --data_path /data/dota \
      --model vit_base_patch16_224 --ckpt simpletad_ft-dota_vm1-b.pth \
      [--expected_auroc 87.9] [--reference_csv ref_predictions.csv]

Modes evaluated:
  strict — cv2 INTER_CUBIC host resize, fp32, unfused normalization
           (bit-closest to the reference pixel path)
  fast   — device bicubic resize, bf16, folded normalization, Pallas
           attention (the production path)
If --reference_csv (a reference-run predictions.csv) is given, per-window
probability deltas are reported too.
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("AUC parity check")
    p.add_argument("--data_set", default="DoTA")
    p.add_argument("--data_path", required=True)
    p.add_argument("--model", default="vit_base_patch16_224")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--view_fps", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument("--expected_auroc", type=float, default=None,
                   help="published MODEL_ZOO AUC-ROC (x100)")
    p.add_argument("--reference_csv", default=None,
                   help="reference-run predictions.csv for per-window diff")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import simple_tad_tpu as st
    from simple_tad_tpu.data.frame_datasets import (FrameDataset,
                                                    read_dada_clips,
                                                    read_dota_clips)
    from simple_tad_tpu.eval.engine import FrameEvaluator
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    from simple_tad_tpu.utils.torch_convert import load_checkpoint_auto
    enable_persistent_cache()

    if args.data_set == "DoTA":
        clips = read_dota_clips(args.data_path, "val_split.txt", orig_fps=10)
        orig_fps = 10
    else:
        clips = read_dada_clips(args.data_path,
                                "DADA2K_my_split/validation.txt",
                                orig_fps=30)
        orig_fps = 30
    model = st.create_model(args.model, num_classes=2,
                            all_frames=args.num_frames, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    params = load_checkpoint_auto(args.ckpt, model, params)
    ds = FrameDataset(clips, mode="test", view_len=args.num_frames,
                      target_fps=args.view_fps, orig_fps=orig_fps,
                      view_step=1, crop_size=model.cfg.img_size)
    print(f"{len(ds)} windows over {len(clips)} clips")

    results = {}
    for name, kwargs in (
        ("strict", dict(dtype=jnp.float32, resize_on_host=True,
                        fold_norm=False)),
        ("fast", dict(dtype=jnp.bfloat16, resize_on_host=False,
                      fold_norm=True)),
    ):
        ev = FrameEvaluator(model, params, batch_size=args.batch_size,
                            **kwargs)
        res = ev.evaluate(ds, exact_metrics=True)
        results[name] = res
        m = res.metrics
        print(f"[{name}] AUC-ROC {100*m.auroc:.2f}  AUC-MCC "
              f"{100*m.mcc_auc:.2f}  MCC@0.5 {100*m.mcc_05:.2f}  "
              f"({res.windows_per_sec:.1f} windows/s)")

    strict_auc = 100 * results["strict"].metrics.auroc
    fast_auc = 100 * results["fast"].metrics.auroc
    print(f"strict-vs-fast AUC delta: {abs(strict_auc - fast_auc):.3f}")
    ok = True
    if args.expected_auroc is not None:
        delta = abs(strict_auc - args.expected_auroc)
        print(f"published {args.expected_auroc:.1f} vs strict "
              f"{strict_auc:.2f}: delta {delta:.3f} "
              f"({'PASS' if delta <= 0.1 else 'FAIL'} at the 0.1 gate)")
        ok = delta <= 0.1

    if args.reference_csv:
        import pandas as pd
        ref = pd.read_csv(args.reference_csv)
        ours = results["strict"].rows
        merged = ours.merge(ref, on=["clip", "filename"],
                            suffixes=("", "_ref"))
        for df in (merged,):
            z = df[["logits_safe", "logits_risk"]].to_numpy()
            zr = df[["logits_safe_ref", "logits_risk_ref"]].to_numpy()
            p1 = np.exp(z - z.max(1, keepdims=True))
            p1 = (p1 / p1.sum(1, keepdims=True))[:, 1]
            p2 = np.exp(zr - zr.max(1, keepdims=True))
            p2 = (p2 / p2.sum(1, keepdims=True))[:, 1]
            d = np.abs(p1 - p2)
            print(f"per-window |risk prob| delta vs reference: "
                  f"mean {d.mean():.5f}  p99 {np.percentile(d, 99):.5f}  "
                  f"max {d.max():.5f}  (n={len(d)})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
