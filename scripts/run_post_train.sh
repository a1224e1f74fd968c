#!/usr/bin/env bash
# Stage-2 mask-frozen fine-tuning (reference: UVC/run_post_train.sh).
set -e
python -m uvc_tpu.cli.post_train \
  --model_type deit_tiny_patch16_224 \
  --checkpoint_dir output/uvc_train/debug/deit_tiny_patch16_224_30.ckpt \
  --dataset imagenet --data_dir /data/imagenet \
  --distillation-type soft \
  --distillation-alpha 0.1 \
  --train_batch_size 128 \
  --num_epochs 120 \
  --eval_every 1000 \
  --output_dir finetuning/ft_deit_tiny_patch16_224 \
  --num_workers 64 \
  --learning_rate 1e-4 \
  "$@"
