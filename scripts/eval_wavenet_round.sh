#!/usr/bin/env bash
# WaveNet round evaluation battery (run on the TPU, chip otherwise idle).
#
# Produces, for a given WaveNet checkpoint:
#   1. corpus-mel fidelity (8 utts, VALIDATION_r3 §5.1 protocol)
#   2. converted-mel fidelity (12 utts from the spkv2 all-pairs matrix)
#   3. speaker similarity through the WaveNet audio path (42 pairs)
# Pass a second checkpoint to evaluate as a baseline on the SAME inputs.
#
# Usage: bash scripts/eval_wavenet_round.sh artifacts/wavenet_r4.npz \
#            [artifacts/wavenet_f16.npz] [outputs_prefix]
set -euo pipefail
CKPT=${1:?wavenet ckpt}
BASELINE=${2:-}
PREFIX=${3:-artifacts/wavenet_round}
GEN=artifacts/generator_spmel_spkv2_f16.npz
JUDGE=artifacts/ge2e.npz
RESULTS=/tmp/results_allpairs_spkv2.pkl

if [ ! -f "$RESULTS" ]; then
  python -m autovc_tpu.cli.convert --main_dir _data --artifact "$GEN" \
    --all_pairs --out "$RESULTS"
fi

for ck in "$CKPT" ${BASELINE:+"$BASELINE"}; do
  tag=$(basename "$ck" .npz)
  echo "=== corpus fidelity: $tag"
  python -m autovc_tpu.cli.evaluate_vocoder --spmel_dir _data/spmel \
    --vocoder wavenet --vocoder_ckpt "$ck" --max_utts 8 \
    --out "${PREFIX}_fidelity.json"
  echo "=== converted-mel fidelity: $tag"
  python -m autovc_tpu.cli.evaluate_vocoder --results "$RESULTS" \
    --vocoder wavenet --vocoder_ckpt "$ck" --max_utts 12 \
    --out "${PREFIX}_fidelity.json"
done

echo "=== similarity through the WaveNet audio path"
python -m autovc_tpu.cli.evaluate_conversion --main_dir _data --artifact "$GEN" \
  --dvector_ckpt "$JUDGE" --through audio --vocoder wavenet \
  --vocoder_ckpt "$CKPT" --wavenet_engine pallas \
  --out "${PREFIX}_similarity.json"
