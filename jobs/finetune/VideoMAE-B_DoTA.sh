#!/bin/bash
# Frame fine-tuning: VideoMAE-B on DoTA — the reference headline config
# (jobs/finetune/VideoMAE-B_DoTA.sh translated 1:1; flags share names).
set -e

DOTA_ROOT=${DOTA_ROOT:-/data/dota}
INIT_CKPT=${INIT_CKPT:-checkpoints/vit_b_k400_1600ep.pth}
OUT=${OUT:-runs/vmae_b_dota}

python -m simple_tad_tpu.cli.finetune \
    --data_set DoTA --data_path "${DOTA_ROOT}" \
    --model vit_base_patch16_224 \
    --finetune "${INIT_CKPT}" \
    --batch_size 56 --epochs 20 --warmup_epochs 5 \
    --lr 1e-3 --min_lr 1e-6 --layer_decay 0.75 --weight_decay 0.05 \
    --drop_path 0.1 --reprob 0.25 \
    --loss crossentropy \
    --num_frames 16 --view_fps 10 --sampling_rate 1 \
    --input_size 224 --num_workers 8 \
    --output_dir "${OUT}" --log_dir "${OUT}/tb"
