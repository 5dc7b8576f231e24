#!/usr/bin/env bash
# Round-5 endgame, part 2: re-run the three phases that failed in
# round5_endgame.sh with `ModuleNotFoundError: autovc_tpu` (the scripts
# lacked a repo-root sys.path bootstrap when launched detached as
# `python scripts/<name>.py`; fixed in the scripts themselves), then the
# full --runslow test suite for the committed round-end evidence
# (VERDICT r4 item 7). Strictly sequential, single chip, detached.
#
# Waits for part 1 to finish (it owns the chip through the held-out leg
# and the bench phase) before touching the TPU.
#
# Usage: scripts/round5_endgame2.sh [ENDGAME1_PID]
set -u
cd "$(dirname "$0")/.."
E1_PID=${1:-}
STATUS=_runs/endgame_status.txt
mkdir -p _runs
note() { echo "[endgame2] $1 ($(date -u +%H:%M:%S))" | tee -a "$STATUS"; }

phase() { # phase NAME cmd...
  local name=$1; shift
  note "phase $name: start"
  if "$@" > "_runs/endgame2_${name}.log" 2>&1; then
    note "phase $name: OK"
  else
    note "phase $name: FAIL rc=$? (see _runs/endgame2_${name}.log)"
  fi
}

if [ -n "$E1_PID" ]; then
  while kill -0 "$E1_PID" 2>/dev/null; do sleep 30; done
  # pid gone: grace period for the status line, then proceed anyway — a
  # killed part-1 driver must not hang part 2 forever (its phases record
  # their own FAIL lines if the chip is actually still busy)
  for _ in 1 2 3 4; do
    grep -q "endgame complete" "$STATUS" 2>/dev/null && break; sleep 15
  done
  grep -q "endgame complete" "$STATUS" 2>/dev/null \
    || note "part-1 pid gone WITHOUT 'endgame complete'; proceeding"
else
  while ! grep -q "endgame complete" "$STATUS" 2>/dev/null; do sleep 30; done
fi
note "part 1 complete; chip assumed idle"

phase head2head python scripts/score_reference_results.py \
  --vocoder wavenet --wavenet_ckpt artifacts/wavenet_105k.npz \
  --out artifacts/reference_head_to_head_wavenet.json

phase hybrid_parity python scripts/tpu_parity_hybrid.py \
  --out artifacts/hybrid_parity_tpu.json

phase hybrid_bench python scripts/bench_wavenet.py \
  --engines pallas --dtypes bfloat16 --batches 1,16,32,64

# chip now idle for good; the full suite runs on the 8-device virtual
# CPU mesh (safe only because no TPU feeder is live at this point)
phase fullsuite python -m pytest tests/ -q --runslow

note "endgame2 complete"
