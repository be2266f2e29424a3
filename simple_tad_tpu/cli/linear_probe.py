"""InternVideo2 linear / attentive probing CLI.

Equivalent of /root/reference/other_models/InternVideo2_single_modality/
run_linear_probing.py (782 LoC): action-recognition fine-tuning with the
trunk FROZEN — patch embed, positional tables, cls token and all blocks
except the last ``--open_block_num`` take no updates; the attention-pooling
projector ('clip_projector', internvideo2.py:467-475) is frozen unless
``--open_clip_projector``.  The classifier head (and fc_norm) always train:
open_block_num=0 without --open_clip_projector is a pure linear probe;
--open_clip_projector alone is the attentive probe.

The freezing itself is an optimizer update-mask over the scanned param
stack (train/optim.py freeze_mask_tree 'probe;K;P' spec), not parameter
surgery — the forward is identical to finetuning, so remat/jit programs are
shared with cli.class_finetune, which this driver delegates to.

Usage:
  python -m simple_tad_tpu.cli.linear_probe --data_path /data/k400 \
      --anno_train train.csv --nb_classes 400 \
      --model internvideo2_small_patch14_224 --finetune iv2.pth \
      --open_block_num 0 --open_clip_projector --output_dir out/
"""

from __future__ import annotations

import sys


def main(argv=None):
    from simple_tad_tpu.cli import class_finetune
    argv = list(argv if argv is not None else sys.argv[1:])
    has = lambda flag: any(a == flag or a.startswith(flag + "=")  # noqa: E731
                           for a in argv)
    if not has("--open_block_num"):
        argv += ["--open_block_num", "0"]
    if not has("--model"):
        argv += ["--model", "internvideo2_base_patch14_224"]
    if not has("--num_frames"):
        argv += ["--num_frames", "8"]   # IV2 default geometry (8 frames)
    if not has("--layer_decay"):
        # probing has no layer-decay concept: the trunk is frozen
        argv += ["--layer_decay", "1.0"]
    return class_finetune.main(argv)


if __name__ == "__main__":
    main()
