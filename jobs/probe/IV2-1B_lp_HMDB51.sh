#!/bin/bash
# InternVideo2-1B linear probing on HMDB51 (16 frames, raw-frame folders).
# Reference: other_models/InternVideo2_single_modality/scripts/finetuning/
# linear_probing/hmdb51/1B_lp_hmdb51_f16.sh (run_linear_probing.py,
# --data_set HMDB51 --no_use_decord -> HMDBRawFrameClsDataset).
set -e
HMDB_ROOT=${HMDB_ROOT:-/data/hmdb51}
INIT_CKPT=${INIT_CKPT:-checkpoints/internvideo2_1B.pth}
OUT=${OUT:-runs/iv2_1b_lp_hmdb51}

python -m simple_tad_tpu.cli.linear_probe \
    --model internvideo2_1B_patch14_224 \
    --data_set HMDB51_rawframe \
    --data_path "${HMDB_ROOT}" \
    --anno_train "${HMDB_ROOT}/train.csv" \
    --anno_val "${HMDB_ROOT}/val.csv" \
    --nb_classes 51 --finetune "${INIT_CKPT}" \
    --open_block_num 0 --open_clip_projector \
    --batch_size 64 --epochs 20 --warmup_epochs 0 \
    --lr 2e-3 --min_lr 0 --weight_decay 0 --layer_decay 1.0 \
    --opt adamw --opt_betas 0.9 0.999 \
    --num_frames 16 \
    --input_size 224 --short_side_size 224 \
    --drop_path 0.0 --reprob 0.0 \
    --test_num_segment 2 --test_num_crop 1 \
    --output_dir "${OUT}"
