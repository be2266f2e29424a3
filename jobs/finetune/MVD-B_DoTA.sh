#!/bin/bash
# Frame fine-tuning: translated 1:1 from the reference
# jobs/finetune/MVD-B_DoTA.sh (flag names shared; torchrun/deepspeed wiring
# replaced by the jit/pjit driver; sampling_rate_val as in the original).
set -e

DATA_ROOT=${DATA_ROOT:-/data/dota}
INIT_CKPT=${INIT_CKPT:-checkpoints/init.pth}
OUT=${OUT:-runs/MVD-B_DoTA}

python -m simple_tad_tpu.cli.finetune \
    --data_set DoTA --data_path "${DATA_ROOT}" \
    --model mvd_vit_base_patch16_224 \
    --finetune "${INIT_CKPT}" \
    --loss crossentropy --nb_classes 2 \
    --batch_size 56 --epochs 50 --warmup_epochs 5 \
    --lr 5e-4 --min_lr 1e-6 --opt_betas 0.9 0.999 \
    --layer_decay 0.6 --weight_decay 0.05 --drop_path 0.2 \
    --aa rand-m6-n3-mstd0.5-inc1 --reprob 0.25 \
    --num_frames 16 --sampling_rate 1 --sampling_rate_val 1 \
    --nb_samples_per_epoch 50000 \
    --input_size 224 --num_workers 8 --seed 42 \
    --output_dir "${OUT}" --log_dir "${OUT}/tb"
