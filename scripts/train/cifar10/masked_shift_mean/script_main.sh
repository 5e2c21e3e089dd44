#!/bin/bash
# CIFAR-10 mean-shift workload (the reference's cifar10 script tree under
# script/train/cifar10/): 32x32, batch 128, linear schedule.
set -e
cd "$(dirname "$0")/../../../.."

python -m masked_diffusion_tpu.cli.main_train_masked \
    --task "train" \
    --content "cifar_masked" \
    --method "mean_shift" \
    --title "shift_mean_linear" \
    --dir_dataset "${MDT_DIR_DATASET:-/nas2/dataset}" \
    --data_name "cifar10" \
    --data_size 32 \
    --data_subset True \
    --data_subset_num "${MDT_SUBSET:-2048}" \
    --batch_size 128 \
    --num_epochs 10000 \
    --optim "adamw" \
    --lr 5e-4 \
    --lr_scheduler "cosine" \
    --lr_warmup_steps 500 \
    --use_ema True \
    --ddpm_num_steps 500 \
    --ddpm_schedule "linear" \
    --select_degrade_pixel "thresholding" \
    --degrade_channel "1-channel" \
    --mean_option "degraded_area" \
    --mean_area "image-wise" \
    --shift_type "1-d_constant" \
    --sample_latent_shape "data" \
    --sampling "momentum" \
    --momentum_adaptive "base_momentum" \
    --sampling_mask_dependency "independent" \
    --sample_num 100 \
    --save_images_epochs 100 \
    --mixed_precision "${MDT_MIXED_PRECISION:-bf16}" \
    --mesh_data "${MDT_MESH_DATA:--1}" \
    --mesh_model "${MDT_MESH_MODEL:-1}" \
    --tp_min_features "${MDT_TP_MIN_FEATURES:-256}" \
    --mesh_spatial "${MDT_MESH_SPATIAL:-False}" \
    --multihost "${MDT_MULTIHOST:-False}" \
    --use_wandb "${MDT_USE_WANDB:-False}" \
    --use_mlflow False
