#!/usr/bin/env bash
# Conversion + synthesis launch (reference submit_voc.sh equivalent).
set -euo pipefail
MAIN_DIR=${1:?main_dir}; RUN_DIR=${2:?run_dir}; OUT_DIR=${3:?out_dir}; shift 3 || true

python -m autovc_tpu.cli.convert --main_dir "$MAIN_DIR" --run_dir "$RUN_DIR" "$@"
RESULTS=$(ls -t "$MAIN_DIR"/*/results_*.pkl | head -1)
python -m autovc_tpu.cli.synthesize --results "$RESULTS" --out_dir "$OUT_DIR" \
  --vocoder "${VOCODER:-hifigan}"
