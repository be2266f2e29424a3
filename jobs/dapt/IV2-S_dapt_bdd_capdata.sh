#!/bin/bash
# InternVideo2-S domain-adaptive MAE pretraining (DAPT) on BDD100K +
# CAP-DATA — the paper's core recipe applied to the IV2 trunk: pixel
# reconstruction through a patch-14 / tubelet-1 decoder on the
# RMSNorm/QK-norm IV2 encoder, dual-dataset cyclic loader.
# Reference: other_models/InternVideo2_single_modality/
# iv2_run_mae_double_pretraining.py (tube mask 0.75, decoder depth 4,
# lr 3e-4 scaled, adamw betas 0.9/0.95).
set -e
BDD_ROOT=${BDD_ROOT:-/data/bdd100k}
CAP_ROOT=${CAP_ROOT:-/data/capdata}
INIT_CKPT=${INIT_CKPT:-checkpoints/S14_dist_1B_stage2.pth}
OUT=${OUT:-runs/iv2_s_dapt_bdd_capdata}

python -m simple_tad_tpu.cli.pretrain \
    --model pretrain_videomae_internvideo2_small_patch14_224 \
    --data_set BDD100K --data_path "${BDD_ROOT}" \
    --data_set2 DoTA --data_path2 "${CAP_ROOT}" \
    --mask_ratio 0.75 --decoder_depth 4 \
    --batch_size 64 --batch_size2 64 \
    --num_frames 16 --sampling_rate 4 \
    --opt_betas 0.9 0.95 \
    --lr 3e-4 --min_lr 3e-5 --warmup_epochs 1 \
    --epochs 30 --save_ckpt_freq 1 \
    --from_ckpt "${INIT_CKPT}" \
    --output_dir "${OUT}"
