#!/bin/bash
# InternVideo2-B supervised K710 post-pretraining finetune (the first
# stage of the reference's k710 -> k400/600/700 chain).
# Reference: other_models/InternVideo2_single_modality/scripts/finetuning/
# full_tuning/k710/B14_ft_k710_f8.sh (run_finetuning.py; 8 frames,
# lr 2e-4, 20 epochs, warmup 4, layer decay 0.75, dp 0.1).
# Delta: num_sample 2 repeat-aug is a train-engine feature not exposed by
# class_finetune; batch doubles instead.
set -e
K710_ROOT=${K710_ROOT:-/data/k710}
INIT_CKPT=${INIT_CKPT:-checkpoints/B14_dist_1B_stage2.pth}
MODEL=${MODEL:-internvideo2_base_patch14_224}
OUT=${OUT:-runs/iv2_b_ft_k710}

python -m simple_tad_tpu.cli.class_finetune \
    --model "${MODEL}" \
    --data_path "${K710_ROOT}" \
    --anno_train "${K710_ROOT}/train.csv" --anno_val "${K710_ROOT}/val.csv" \
    --nb_classes 710 --finetune "${INIT_CKPT}" \
    --batch_size 32 --epochs 20 --warmup_epochs 4 \
    --lr 2e-4 --weight_decay 0.05 --layer_decay 0.75 \
    --opt adamw --opt_betas 0.9 0.999 \
    --num_frames 8 --sparse_sampling \
    --input_size 224 --short_side_size 224 \
    --drop_path 0.1 \
    --test_num_segment 4 --test_num_crop 3 \
    --output_dir "${OUT}"
