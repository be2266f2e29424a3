#!/bin/bash
# InternVideo2-B Kinetics-700 finetune from the K710-finetuned checkpoint.
# The 710-row head is remapped to 700 rows via the reference's
# k710/label_mixto700.json index list — REQUIRED (without it the head is
# dropped and freshly initialized; torch_convert warns).
# Reference: other_models/InternVideo2_single_modality/scripts/finetuning/
# full_tuning/k700/B14_ft_k710_ft_k700_f8.sh (8 frames, lr 2e-5,
# 5 epochs, warmup 1).
set -e
K700_ROOT=${K700_ROOT:-/data/k700}
INIT_CKPT=${INIT_CKPT:-runs/iv2_b_ft_k710/checkpoint-best.pth}
LABEL_MAP=${LABEL_MAP:-k710/label_mixto700.json}
MODEL=${MODEL:-internvideo2_base_patch14_224}
OUT=${OUT:-runs/iv2_b_ft_k710_k700}

python -m simple_tad_tpu.cli.class_finetune \
    --model "${MODEL}" \
    --data_path "${K700_ROOT}" \
    --anno_train "${K700_ROOT}/train.csv" --anno_val "${K700_ROOT}/val.csv" \
    --nb_classes 700 --finetune "${INIT_CKPT}" \
    --head_label_map "${LABEL_MAP}" \
    --batch_size 32 --epochs 5 --warmup_epochs 1 \
    --lr 2e-5 --weight_decay 0.05 --layer_decay 0.75 \
    --opt adamw --opt_betas 0.9 0.999 \
    --num_frames 8 --sparse_sampling \
    --input_size 224 --short_side_size 224 \
    --drop_path 0.1 \
    --test_num_segment 4 --test_num_crop 3 \
    --output_dir "${OUT}"
