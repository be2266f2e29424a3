#!/bin/bash
# Dual-dataset DAPT (ViT-S): BDD100K + CAP-DATA (reference
# jobs/dapt/pretrain_capdata.sh: b240+b160, sr 16/1, mask 0.75,
# finetune-aligned transforms, stop at epoch 12).
set -e

BDD_ROOT=${BDD_ROOT:-/data/bdd100k}
CAP_ROOT=${CAP_ROOT:-/data/capdata}
K700_CKPT=${K700_CKPT:-checkpoints/vit_s_k700_mae.pth}
OUT=${OUT:-runs/dapt_s_bdd_cap}

python -m simple_tad_tpu.cli.pretrain \
    --model pretrain_videomae_small_patch16_224 \
    --data_set BDD100K --data_path "${BDD_ROOT}" --batch_size 240 \
    --data_set2 DoTA --data_path2 "${CAP_ROOT}" --batch_size2 160 \
    --mask_ratio 0.75 --transforms_finetune_align \
    --decoder_depth 4 --sampling_rate 16 \
    --lr 3e-4 --min_lr 1e-5 --opt_betas 0.9 0.95 \
    --warmup_epochs 1 --epochs 20 --stop_at_epoch 12 \
    --nb_samples_per_epoch 1000000 \
    --from_ckpt "${K700_CKPT}" \
    --output_dir "${OUT}"
