"""Round-5 training-side measurements (VERDICT r4 next #2/#5/#8).

Runs, in one TPU session, the bench.py training rows that have never
been driver-captured: MAE/DAPT-B pretrain step at mask 0.75 and 0.90,
the IV2-B finetune step (8-frame, N=785+CLS geometry), and the ViT-S/L
finetune steps.  Prints one JSON line per row as it lands (a TPU fault
mid-run must not lose earlier rows — CLAUDE.md trap #7).

Usage: python scripts/measure_train.py [rows...]
  rows ∈ {mae, mae90, iv2mae, iv2, vits, vitl, vitb} (default: all
  but iv2mae)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    rows = sys.argv[1:] or ["mae", "mae90", "iv2", "vits", "vitl", "vitb"]
    import bench
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    rng = np.random.default_rng(0)

    for row in rows:
        try:
            if row == "mae":
                cps, ms = bench.bench_mae_step(24, rng)
            elif row == "mae90":
                cps, ms = bench.bench_mae_step(24, rng, mask_ratio=0.90)
            elif row == "iv2mae":
                # the reference's IV2 DAPT recipe geometry (S trunk,
                # 8-frame tubelet-1 patch-14, mask 0.75 -> 512 visible)
                cps, ms = bench.bench_mae_step(
                    24, rng,
                    model_name="pretrain_videomae_internvideo2_patch14_224")
            elif row == "iv2":
                cps, ms = bench.bench_train_step(
                    8, rng, "internvideo2_base_patch14_224", num_frames=8)
            elif row == "vits":
                cps, ms = bench.bench_train_step(24, rng,
                                                 "vit_small_patch16_224")
            elif row == "vitl":
                cps, ms = bench.bench_train_step(12, rng,
                                                 "vit_large_patch16_224")
            elif row == "vitb":
                cps, ms = bench.bench_train_step(24, rng)
            else:
                print(json.dumps({"row": row, "error": "unknown"}),
                      flush=True)
                continue
            print(json.dumps({"row": row, "clips_per_sec": cps,
                              "step_ms": ms}), flush=True)
        except Exception as e:  # noqa: BLE001 — keep later rows alive
            print(json.dumps({"row": row, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
