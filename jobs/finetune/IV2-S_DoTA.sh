#!/bin/bash
# Frame fine-tuning: InternVideo2-S (8 frames @ 5 fps views, patch 14).
set -e
DOTA_ROOT=${DOTA_ROOT:-/data/dota}
INIT_CKPT=${INIT_CKPT:-checkpoints/internvideo2_s_distilled.pth}
OUT=${OUT:-runs/iv2_s_dota}

python -m simple_tad_tpu.cli.finetune \
    --data_set DoTA --data_path "${DOTA_ROOT}" \
    --model internvideo2_small_patch14_224 --finetune "${INIT_CKPT}" \
    --batch_size 56 --epochs 20 --warmup_epochs 5 \
    --lr 1e-3 --min_lr 1e-6 --weight_decay 0.05 \
    --num_frames 8 --view_fps 5 --sampling_rate 1 \
    --output_dir "${OUT}"
