#!/bin/bash
# Distill InternVideo2-B (patch 14, tubelet 1) from the 1B stage-2 teacher
# with the reference's ACTUAL recipe: attention-masked student (ratio 0.8),
# 6 intermediate-layer taps aligned at the visible positions, MLP decoders,
# final-feature alignment, loss ratio 1:1.
# Reference: other_models/InternVideo2_single_modality/scripts/distillation/
# B14_dist_1B_stage2.sh (run_distill.py; lr 1e-3, adamw eps 1e-6
# betas 0.9/0.98, wd 0.05, 8 frames, warmup 20 of 101 epochs,
# clip_teacher_return_interval 3.34 over the 40-layer 1B trunk).
set -e
DATA_ROOT=${DATA_ROOT:-/data/k700}
TEACHER_CKPT=${TEACHER_CKPT:-checkpoints/internvideo2_1B_stage2.pth}
OUT=${OUT:-runs/iv2_b_dist_1b}

python -m simple_tad_tpu.cli.distill \
    --objective masked_feature \
    --mask_type attention --mask_ratio 0.8 \
    --clip_return_layer 6 \
    --clip_teacher_return_interval 3.34 \
    --clip_student_return_interval 1 \
    --clip_teacher_embed_dim 1408 \
    --clip_teacher_final_dim 768 \
    --clip_loss_ratio 1 1 \
    --clip_norm_type l2 \
    --clip_student_decoder mlp \
    --drop_path 0.05 \
    --data_set K700 --data_path "${DATA_ROOT}" \
    --model distill_internvideo2_base_patch14_224 \
    --teacher_model internvideo2_1B_patch14_224 \
    --teacher_ckpt "${TEACHER_CKPT}" \
    --batch_size 128 --epochs 101 --warmup_epochs 20 \
    --lr 1e-3 --weight_decay 0.05 \
    --num_frames 8 --sampling_rate 1 \
    --output_dir "${OUT}"
