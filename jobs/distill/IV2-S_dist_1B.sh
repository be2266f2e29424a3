#!/bin/bash
# Distill InternVideo2-S (patch 14, tubelet 1) from the 1B stage-2 teacher.
# Reference: other_models/InternVideo2_single_modality/scripts/distillation/
# S14_dist_1B_stage2.sh (run_distill.py; lr 1e-3, adamw eps 1e-6
# betas 0.9/0.98, wd 0.05, 8 frames, warmup 20 of 101 epochs).
# Objective: UNSUPERVISED final-feature distillation (l2-cosine loss on the
# clip-projector features, engines/engine_for_pretraining.py:131-143) on
# unlabeled Kinetics video — the reference additionally masks the student
# (mask_ratio 0.8) and taps middle layers; this driver distills the
# unmasked final features (documented delta, cli/distill.py docstring).
set -e
DATA_ROOT=${DATA_ROOT:-/data/k700}
TEACHER_CKPT=${TEACHER_CKPT:-checkpoints/internvideo2_1B_stage2.pth}
OUT=${OUT:-runs/iv2_s_dist_1b}

python -m simple_tad_tpu.cli.distill \
    --objective feature \
    --data_set K700 --data_path "${DATA_ROOT}" \
    --model internvideo2_small_patch14_224 \
    --teacher_model internvideo2_1B_patch14_224 \
    --teacher_ckpt "${TEACHER_CKPT}" \
    --batch_size 128 --epochs 101 --warmup_epochs 20 \
    --lr 1e-3 --weight_decay 0.05 \
    --num_frames 8 --sampling_rate 1 \
    --output_dir "${OUT}"
