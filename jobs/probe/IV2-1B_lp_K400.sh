#!/bin/bash
# InternVideo2-1B linear probing on Kinetics-400 (frozen trunk, 16 frames).
# Reference: other_models/InternVideo2_single_modality/scripts/finetuning/
# linear_probing/k400/1B_lp_k400_f16.sh (run_linear_probing.py).
set -e
K400_ROOT=${K400_ROOT:-/data/k400}
INIT_CKPT=${INIT_CKPT:-checkpoints/1B_pt.pth}
OUT=${OUT:-runs/iv2_1b_lp_k400}

python -m simple_tad_tpu.cli.linear_probe \
    --model internvideo2_1B_patch14_224 \
    --data_path "${K400_ROOT}" \
    --anno_train "${K400_ROOT}/train.csv" --anno_val "${K400_ROOT}/val.csv" \
    --nb_classes 400 --finetune "${INIT_CKPT}" \
    --open_block_num 0 \
    --batch_size 64 --epochs 15 --warmup_epochs 3 \
    --lr 1e-3 --weight_decay 0 --layer_decay 1.0 \
    --opt adamw --opt_betas 0.9 0.999 \
    --num_frames 16 --sparse_sampling \
    --input_size 224 --short_side_size 224 \
    --drop_path 0.0 \
    --test_num_segment 1 --test_num_crop 3 \
    --output_dir "${OUT}"
