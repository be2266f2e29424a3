#!/bin/bash
# Frame fine-tuning: VideoMAE-B on DADA-2000 (30 fps source, 10 fps views).
set -e
DADA_ROOT=${DADA_ROOT:-/data/dada2000}
INIT_CKPT=${INIT_CKPT:-checkpoints/vit_b_k400_1600ep.pth}
OUT=${OUT:-runs/vmae_b_dada2k}

python -m simple_tad_tpu.cli.finetune \
    --data_set DADA2K --data_path "${DADA_ROOT}" \
    --model vit_base_patch16_224 --finetune "${INIT_CKPT}" \
    --batch_size 56 --epochs 20 --warmup_epochs 5 \
    --lr 1e-3 --min_lr 1e-6 --layer_decay 0.75 --weight_decay 0.05 \
    --drop_path 0.1 --reprob 0.25 --loss crossentropy \
    --num_frames 16 --view_fps 10 --sampling_rate 3 \
    --output_dir "${OUT}" --log_dir "${OUT}/tb"
