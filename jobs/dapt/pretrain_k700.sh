#!/bin/bash
# Kinetics-700 MAE pretraining (jobs/dapt/pretrain_k700.sh equivalent:
# tube mask 0.9, TSN window stride 4, one window per video per epoch,
# ~536685 samples/epoch -> stop around epoch 22).
set -e

K700_ROOT=${K700_ROOT:-/data/kinetics/k700-2020}   # annotations/train.csv
K400_CKPT=${K400_CKPT:-checkpoints/videomae_vits_k400_pretrain_ckpt.pth}
OUT=${OUT:-runs/pretrain_vits_k700}

python -m simple_tad_tpu.cli.pretrain \
    --model pretrain_videomae_small_patch16_224 \
    --data_set K700 --data_path "${K700_ROOT}" \
    --mask_ratio 0.9 --decoder_depth 4 \
    --batch_size 200 --num_frames 16 --sampling_rate 4 \
    --opt_betas 0.9 0.95 \
    --lr 3e-4 --min_lr 3e-5 --warmup_epochs 1 \
    --epochs 38 --stop_at_epoch 23 --save_ckpt_freq 1 \
    --from_ckpt "${K400_CKPT}" \
    --output_dir "${OUT}"
