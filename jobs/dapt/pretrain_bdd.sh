#!/bin/bash
# Single-dataset DAPT: BDD100K masked pre-training (reference
# jobs/dapt/pretrain_bdd.sh: ViT-S, mask 0.75, sampling_rate 16,
# finetune-aligned transforms, 1M samples/epoch).
set -e

BDD_ROOT=${BDD_ROOT:-/data/bdd100k}
OUT=${OUT:-runs/dapt_s_bdd}

python -m simple_tad_tpu.cli.pretrain \
    --model pretrain_videomae_small_patch16_224 \
    --data_set BDD100K --data_path "${BDD_ROOT}" --batch_size 200 \
    --mask_ratio 0.75 --transforms_finetune_align \
    --decoder_depth 4 --sampling_rate 16 --num_frames 16 \
    --lr 3e-4 --min_lr 1e-5 --opt_betas 0.9 0.95 \
    --warmup_epochs 1 --epochs 20 \
    --nb_samples_per_epoch 1000000 \
    --output_dir "${OUT}"
