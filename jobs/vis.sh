#!/bin/bash
# MAE reconstruction visualization (reference vis.sh / run_videomae_vis.py):
# masked-autoencoder reconstructions of one clip written as images.
set -e

VIDEO_PATH=${VIDEO_PATH:-/data/demo.mp4}
MODEL_PATH=${MODEL_PATH:-checkpoints/videomae_b_pretrain.pth}
OUT=${OUT:-runs/vis}

python -m simple_tad_tpu.cli.visualize mae-recon \
    --model pretrain_videomae_base_patch16_224 \
    --mask_ratio 0.9 --mask_type tube --decoder_depth 4 \
    --ckpt "${MODEL_PATH}" --video "${VIDEO_PATH}" --output_dir "${OUT}"
