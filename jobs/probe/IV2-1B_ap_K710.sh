#!/bin/bash
# InternVideo2-1B attentive probing on Kinetics-710: frozen trunk, the
# attention-pooling clip projector opens. This is the FIRST probe of the
# reference's k710 -> k400/600/700 attentive-probing chain; its output
# checkpoint initializes the K400/K600/K700 probes.
# Reference: other_models/InternVideo2_single_modality/scripts/finetuning/
# attentive_probing/k710/1B_ap_k710_f16_loadStage2.sh
# (run_linear_probing.py; 16 frames, lr 2e-4, 25 epochs, warmup 5).
set -e
K710_ROOT=${K710_ROOT:-/data/k710}
INIT_CKPT=${INIT_CKPT:-checkpoints/1B_pt.pth}
OUT=${OUT:-runs/iv2_1b_ap_k710}

python -m simple_tad_tpu.cli.linear_probe \
    --model internvideo2_1B_patch14_224 \
    --data_path "${K710_ROOT}" \
    --anno_train "${K710_ROOT}/train.csv" --anno_val "${K710_ROOT}/val.csv" \
    --nb_classes 710 --finetune "${INIT_CKPT}" \
    --open_block_num 0 --open_clip_projector \
    --batch_size 64 --epochs 25 --warmup_epochs 5 \
    --lr 2e-4 --min_lr 0 --weight_decay 0 --layer_decay 1.0 \
    --opt adamw --opt_betas 0.9 0.999 \
    --num_frames 16 --sparse_sampling \
    --input_size 224 --short_side_size 224 \
    --drop_path 0.0 \
    --test_num_segment 1 --test_num_crop 3 \
    --output_dir "${OUT}"
