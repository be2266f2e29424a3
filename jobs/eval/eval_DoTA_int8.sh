#!/bin/bash
# Sliding-window evaluation with the int8 w8a8 path (calibrated static
# activation scales; see docs/QUANT.md).  ~15% faster than bf16 on
# ViT-B / +25% on ViT-L; compare AUC against the bf16 run before
# adopting (the 0.1-AUC gate is only validated for bf16).
set -e
DOTA_ROOT=${DOTA_ROOT:-/data/dota}
CKPT=${CKPT:-checkpoints/simpletad_ft-dota_vm1-b_auroc.pth}
OUT=${OUT:-runs/eval_dota_b_int8}

python -m simple_tad_tpu.cli.eval_frames \
    --data_set DoTA --data_path "${DOTA_ROOT}" \
    --model vit_base_patch16_224 --finetune "${CKPT}" \
    --batch_size 96 --quant8 --output_dir "${OUT}"
