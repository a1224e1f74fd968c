#!/usr/bin/env bash
# One-shot mask generation + masked finetuning baseline
# (reference: generating_mask.py + main.py --init_mask).
set -e
python -m uvc_tpu.cli.generate_mask \
  --type synflow --model_type deit_small_patch16_224 \
  --sparsity 0.5 --save_file /tmp/synflow_mask.ckpt
python -m uvc_tpu.cli.baseline_train \
  --model_type deit_small_patch16_224 \
  --dataset imagenet --data_dir /data/imagenet \
  --init_mask /tmp/synflow_mask.ckpt \
  --epochs 100 --train_batch_size 1024 \
  --output_dir output/oneshot --name synflow_small \
  "$@"
