#!/usr/bin/env bash
# TPU-VM training launch (the reference's LSF submit.sh equivalent,
# submit.sh:1-46 requested 1x V100 + conda; here: a TPU VM / slice).
#
# Single host:   bash scripts/train_tpu.sh <main_dir> <run_name> [extra args]
# Multi-host pod: run this on every worker (gcloud compute tpus tpu-vm ssh
#   --worker=all); jax.distributed initializes from TPU metadata and the
#   per-host BatchIterator shards the global batch.
set -euo pipefail
MAIN_DIR=${1:?main_dir}; RUN_NAME=${2:?run_name}; shift 2 || true

python -m autovc_tpu.cli.train \
  --main_dir "$MAIN_DIR" \
  --run_name "$RUN_NAME" \
  --model_type "${MODEL_TYPE:-spmel}" \
  --batch_size "${BATCH_SIZE:-2}" \
  --len_crop "${LEN_CROP:-128}" \
  --num_iters "${NUM_ITERS:-10000000}" \
  --data_parallel "${DATA_PARALLEL:-1}" \
  --model_parallel "${MODEL_PARALLEL:-1}" \
  --checkpoint_step "${CHECKPOINT_STEP:-100}" \
  "$@"
