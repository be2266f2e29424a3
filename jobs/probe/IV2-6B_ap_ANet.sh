#!/bin/bash
# InternVideo2-6B attentive probing on ActivityNet (temporal-interval
# classification, 200 classes, 16 frames).
# Reference: other_models/InternVideo2_single_modality/scripts/finetuning/
# full_tuning/anet/6B_ft_k710_ft_k400_ap_anet_f8.sh (run_linear_probing.py,
# --data_set ANet -> datasets/anet.py interval reader).
# NOTE: the reference chains k710 -> k400 full-tunes before this probe;
# point INIT_CKPT at that chained checkpoint to reproduce it.
set -e
ANET_ROOT=${ANET_ROOT:-/data/anet}
INIT_CKPT=${INIT_CKPT:-checkpoints/6B_ft_k710_ft_k400.pth}
OUT=${OUT:-runs/iv2_6b_ap_anet}

python -m simple_tad_tpu.cli.linear_probe \
    --model internvideo2_6B_patch14_224 \
    --data_set ANet \
    --data_path "${ANET_ROOT}" \
    --anno_train "${ANET_ROOT}/anet_train_video.txt" \
    --anno_val "${ANET_ROOT}/anet_val_video.txt" \
    --nb_classes 200 --finetune "${INIT_CKPT}" \
    --open_block_num 0 --open_clip_projector \
    --batch_size 64 --epochs 40 --warmup_epochs 0 \
    --lr 2e-4 --min_lr 0 --weight_decay 0 --layer_decay 1.0 \
    --opt adamw --opt_betas 0.9 0.999 \
    --num_frames 16 \
    --input_size 224 --short_side_size 224 \
    --drop_path 0.0 --reprob 0.0 \
    --test_num_segment 4 --test_num_crop 3 \
    --output_dir "${OUT}"
