"""One-off batch-size sweep for a model's int8 serving point.

bench.py's ViT-B sweep (48/96/192) found 96 best; ViT-S/L and IV2 were
only ever captured at one batch each.  This probes alternatives with the
exact bench.py protocol (distinct buffers, pipelined dispatch, fetch-warm)
so a winner can be adopted into bench.py honestly.

Usage: python scripts/sweep_batch.py vit_small_patch16_224 96 144 192
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) < 3:
        print("usage: python scripts/sweep_batch.py <model_name> "
              "<batch> [<batch> ...]")
        sys.exit(2)
    from simple_tad_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import bench

    name = sys.argv[1]
    batches = tuple(int(b) for b in sys.argv[2:])
    rng = np.random.default_rng(0)
    if name.startswith("internvideo2"):
        for b in batches:
            r = bench.bench_iv2(b, rng, name)
            print(f"RESULT {name} b{b}: {r} clips/s", flush=True)
    else:
        out = bench.bench_model(name, batches, True, rng)
        for b in batches:
            print(f"RESULT {name} b{b}: {out[str(b)]} windows/s", flush=True)


if __name__ == "__main__":
    main()
