#!/usr/bin/env bash
# Multi-host launch (reference: 3-node torch.distributed env:// scripts,
# Baseline_pruning/script/omp_base/train_base_omp_master_node.sh).
# Run once per host with HOST_ID=0..N-1; COORDINATOR=<host0-ip>:<port>.
set -e
: "${COORDINATOR:?set COORDINATOR=<host0-ip>:<port>}"
: "${NUM_HOSTS:?set NUM_HOSTS}"
: "${HOST_ID:?set HOST_ID}"
python -m uvc_tpu.cli.joint_train \
  --coordinator "$COORDINATOR" \
  --num_processes "$NUM_HOSTS" \
  --process_id "$HOST_ID" \
  --model_type deit_small_patch16_224 \
  --dataset imagenet --data_dir /data/imagenet \
  --train_batch_size 1024 --num_epochs 30 --budget 0.5 \
  "$@"
