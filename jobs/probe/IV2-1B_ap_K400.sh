#!/bin/bash
# InternVideo2-1B attentive probing on Kinetics-400: frozen trunk, the
# attention-pooling clip projector opens (3 epochs, lr 1e-5).
# Reference: other_models/InternVideo2_single_modality/scripts/finetuning/
# attentive_probing/k400/1B_ap_k710_ap_k400_f16.sh (run_linear_probing.py).
# NOTE: the reference initializes this probe from the K710
# attentive-probed checkpoint (k710 -> k400 chain), not the raw 1B
# pretrain — point INIT_CKPT at the K710 AP output to reproduce it.
set -e
K400_ROOT=${K400_ROOT:-/data/k400}
INIT_CKPT=${INIT_CKPT:-checkpoints/1B_ap_k710.pth}
OUT=${OUT:-runs/iv2_1b_ap_k400}

python -m simple_tad_tpu.cli.linear_probe \
    --model internvideo2_1B_patch14_224 \
    --data_path "${K400_ROOT}" \
    --anno_train "${K400_ROOT}/train.csv" --anno_val "${K400_ROOT}/val.csv" \
    --nb_classes 400 --finetune "${INIT_CKPT}" \
    --open_block_num 0 --open_clip_projector \
    --batch_size 64 --epochs 3 --warmup_epochs 0 \
    --lr 1e-5 --min_lr 0 --weight_decay 0 --layer_decay 1.0 \
    --opt adamw --opt_betas 0.9 0.999 \
    --num_frames 16 --sparse_sampling \
    --input_size 224 --short_side_size 224 \
    --drop_path 0.0 \
    --test_num_segment 1 --test_num_crop 3 \
    --output_dir "${OUT}"
