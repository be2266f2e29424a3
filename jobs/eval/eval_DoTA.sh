#!/bin/bash
# Sliding-window evaluation on DoTA -> predictions.csv + stats + plots +
# grouped per-category report.
set -e
DOTA_ROOT=${DOTA_ROOT:-/data/dota}
CKPT=${CKPT:-checkpoints/simpletad_ft-dota_vm1-b_auroc.pth}
OUT=${OUT:-runs/eval_dota_b}

python -m simple_tad_tpu.cli.eval_frames \
    --data_set DoTA --data_path "${DOTA_ROOT}" \
    --model vit_base_patch16_224 --finetune "${CKPT}" \
    --batch_size 96 --output_dir "${OUT}"

python -m simple_tad_tpu.cli.data_tools anno-for-predictions \
    --data_set DoTA --data_path "${DOTA_ROOT}" \
    --split val_split.txt --out "${OUT}/frame_level_anno_val.csv"
python - <<PY
from simple_tad_tpu.eval.analysis import show_metrics
print(show_metrics("${OUT}", anno_csv="${OUT}/frame_level_anno_val.csv"))
PY
