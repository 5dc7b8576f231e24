#!/usr/bin/env bash
# Round-5 endgame driver (VERDICT r4 item 8: never leave the round's
# headline claims behind an in-flight process or an interactive session).
# Runs the whole post-leg battery STRICTLY SEQUENTIALLY on the single
# chip, detached from any interactive session:
#
#   0. wait for the WaveNet watchdog leg to finish (_runs/wavenet_r5.npz)
#   1. promote the leg checkpoint into artifacts/wavenet_105k.npz
#   2. WaveNet eval battery: corpus + converted-mel fidelity for the new
#      ckpt AND the 40k baseline on the same inputs, then the 42-pair
#      similarity row through the AR audio path (eval_wavenet_round.sh)
#   3. hybrid HBM-ring kernel: real-TPU parity (tpu_parity_hybrid.py) +
#      pallas bench rows B=16/32/64 bf16 (bench_wavenet.py)
#   4. held-out-speaker zero-shot round (heldout_speaker_round.sh),
#      iteration count passed in by the caller (sized to wall-clock)
#   5. bench.py on the now-idle chip (warm-cache regeneration)
#
# Each phase logs to _runs/endgame_<phase>.log and appends one line to
# _runs/endgame_status.txt; a failed phase records FAIL and the driver
# moves on (later phases do not depend on earlier ones' success, only on
# the chip being free). Usage:
#   scripts/round5_endgame.sh [HELDOUT_ITERS] [WATCHDOG_PID]
set -u
cd "$(dirname "$0")/.."
HELDOUT_ITERS=${1:-250000}
WATCHDOG_PID=${2:-}
STATUS=_runs/endgame_status.txt
mkdir -p _runs
note() { echo "[endgame] $1 ($(date -u +%H:%M:%S))" | tee -a "$STATUS"; }

phase() { # phase NAME cmd...
  local name=$1; shift
  note "phase $name: start"
  if "$@" > "_runs/endgame_${name}.log" 2>&1; then
    note "phase $name: OK"
  else
    note "phase $name: FAIL rc=$? (see _runs/endgame_${name}.log)"
  fi
}

# 0. wait for the watchdog (by pid if given, else by its completion line)
_log_done() {
  grep -qE "\[watchdog\] (complete|trainer exited clean|chip did not recover)" \
    /tmp/wavenet_r5.log 2>/dev/null
}
if [ -n "$WATCHDOG_PID" ]; then
  while kill -0 "$WATCHDOG_PID" 2>/dev/null; do sleep 30; done
  # pid gone: grace period for the completion line, then proceed anyway —
  # an OOM-killed watchdog (or a wiped /tmp log) must not hang the battery
  for _ in 1 2 3 4; do _log_done && break; sleep 15; done
  if ! _log_done; then
    note "watchdog pid gone WITHOUT a completion line; proceeding to battery"
  fi
else
  while ! _log_done; do sleep 30; done
fi
if _log_done; then
  note "watchdog leg finished: $(tail -n 1 /tmp/wavenet_r5.log)"
fi

# 1. promote the checkpoint (EMA params npz written by the trainer)
if [ -f _runs/wavenet_r5.npz ]; then
  cp _runs/wavenet_r5.npz artifacts/wavenet_105k.npz
  note "promoted _runs/wavenet_r5.npz -> artifacts/wavenet_105k.npz"
  CKPT=artifacts/wavenet_105k.npz
else
  note "leg checkpoint missing; battery falls back to artifacts/wavenet_r4.npz"
  CKPT=artifacts/wavenet_r4.npz
fi

# 2. eval battery (new ckpt + 40k baseline, same inputs)
phase battery bash scripts/eval_wavenet_round.sh "$CKPT" \
  artifacts/wavenet_f16.npz artifacts/wavenet_r5

# 2b. iso-vocoder head-to-head: our conversions through OUR WaveNet vs
#     the reference's published 1M-step-WaveNet audio (VERDICT item 5)
phase head2head python scripts/score_reference_results.py \
  --vocoder wavenet --wavenet_ckpt "$CKPT" \
  --out artifacts/reference_head_to_head_wavenet.json

# 3. hybrid kernel on real TPU: parity, then the bench envelope
phase hybrid_parity python scripts/tpu_parity_hybrid.py \
  --out artifacts/hybrid_parity_tpu.json
phase hybrid_bench python scripts/bench_wavenet.py \
  --engines pallas --dtypes bfloat16 --batches 1,16,32,64

# 4. held-out zero-shot round
phase heldout bash scripts/heldout_speaker_round.sh "$HELDOUT_ITERS" 6

# 5. bench headline on the idle chip
phase bench python bench.py

note "endgame complete"
