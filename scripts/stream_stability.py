"""Streaming batch-1 latency stability check (VERDICT r2 #3).

Round-2 published 6.09 ms while the driver captured 7.99 ms — a 31%
spread.  This runs the bench.py streaming protocol (one window scored per
arriving frame, distinct buffers, pipelined) N consecutive times and
reports each measurement plus the relative spread, so the docs can carry a
number that actually reproduces.  Run on a QUIET chip (no concurrent
pytest — relay dispatch inflates ~5x under host CPU load, CLAUDE.md trap
#2).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_runs: int = 3):
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import importlib
    bench = importlib.import_module("bench")
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    vals = []
    for i in range(n_runs):
        rng = np.random.default_rng(100 + i)   # fresh buffers every run
        out = bench.bench_model("vit_base_patch16_224", (96,), True, rng,
                                stream_latency=True)
        vals.append(out["stream_batch1_ms"])
        print(json.dumps({"run": i, "stream_batch1_ms": vals[-1],
                          "b96_windows_per_sec": out["96"]}), flush=True)
    spread = (max(vals) - min(vals)) / min(vals) * 100
    print(json.dumps({"stream_batch1_ms_runs": vals,
                      "spread_pct": round(spread, 1),
                      "stable_within_5pct": spread <= 5.0}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
