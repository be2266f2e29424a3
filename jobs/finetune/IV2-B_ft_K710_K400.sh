#!/bin/bash
# InternVideo2-B Kinetics-400 finetune from the K710-finetuned checkpoint
# (second stage of the reference's k710 -> k400 chain; the 710-row head is
# auto-sliced to the first 400 rows on load, run_finetuning.py:388-400).
# Reference: other_models/InternVideo2_single_modality/scripts/finetuning/
# full_tuning/k400/B14_ft_k710_ft_k400_f8.sh (8 frames, lr 2e-5,
# 5 epochs, warmup 1).
set -e
K400_ROOT=${K400_ROOT:-/data/k400}
INIT_CKPT=${INIT_CKPT:-runs/iv2_b_ft_k710/checkpoint-best.pth}
MODEL=${MODEL:-internvideo2_base_patch14_224}
OUT=${OUT:-runs/iv2_b_ft_k710_k400}

python -m simple_tad_tpu.cli.class_finetune \
    --model "${MODEL}" \
    --data_path "${K400_ROOT}" \
    --anno_train "${K400_ROOT}/train.csv" --anno_val "${K400_ROOT}/val.csv" \
    --nb_classes 400 --finetune "${INIT_CKPT}" \
    --batch_size 32 --epochs 5 --warmup_epochs 1 \
    --lr 2e-5 --weight_decay 0.05 --layer_decay 0.75 \
    --opt adamw --opt_betas 0.9 0.999 \
    --num_frames 8 --sparse_sampling \
    --input_size 224 --short_side_size 224 \
    --drop_path 0.1 \
    --test_num_segment 4 --test_num_crop 3 \
    --output_dir "${OUT}"
