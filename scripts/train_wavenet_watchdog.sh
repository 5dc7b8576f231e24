#!/usr/bin/env bash
# WaveNet training watchdog: run cli.train_vocoder in a resume loop so a
# trainer death (OOM, tunnel hiccup, kernel fault) costs at most
# --save_every iterations instead of the whole leg.
#
# The trainer checkpoints EMA params to $OUT and the exact train state
# (raw params + Adam moments + schedule count) to $OUT.train_state.npz
# every SAVE_EVERY iters; on death we restart with --init $OUT, which
# restores the state sibling and continues the noam schedule exactly
# (cli/train_vocoder.py:122-133). INIT_STEP must be the noam offset of
# the ORIGINAL warm start and stays constant across restarts: the state
# sibling's metadata records the run-local count, so the effective
# schedule position (count + init_step) survives any number of resumes.
#
# Total-iteration accounting across restarts: the trainer's --num_iters is
# run-local, so each restart would re-run the full budget. We bound the
# loop by checkpoint count instead: every restart reduces the remaining
# budget by the iterations persisted SINCE THIS WATCHDOG'S BASELINE.
# meta_count is cumulative across exact resumes (restore_train_state
# carries the originating run's optimizer count), so when INIT itself has
# a train-state sibling we subtract its count first — otherwise a restart
# after the first crash would credit INIT's prior leg against NUM_ITERS
# and silently under-train.
#
# Usage: scripts/train_wavenet_watchdog.sh OUT INIT INIT_STEP NUM_ITERS \
#            [SAVE_EVERY] [BATCH] [MAX_TIME] [extra train_vocoder args...]
set -u
OUT=${1:?out ckpt}
INIT=${2:?init ckpt}
INIT_STEP=${3:?noam offset of the original warm start}
NUM_ITERS=${4:?run-local iterations to train}
SAVE_EVERY=${5:-2500}
BATCH=${6:-8}
MAX_TIME=${7:-7936}
shift 7 2>/dev/null || shift $#

PYTHON=${PYTHON:-python3}

persisted() {
  # cumulative optimizer count in a train-state sibling (0 if absent).
  # Uses the same interpreter as the trainer; a read error must abort the
  # watchdog rather than let an empty value reach the shell arithmetic.
  local n
  n=$("$PYTHON" - "$1" <<'EOF'
import sys, numpy as np, os
p = sys.argv[1]
if not os.path.exists(p):
    print(0)
else:
    z = np.load(p, allow_pickle=False)
    # cumulative optimizer count (WaveNetTrainer.save_train_state metadata)
    print(int(z["meta_count"]) if "meta_count" in z else 0)
EOF
  ) || { echo "[watchdog] FATAL: could not read train-state metadata from $1" >&2; exit 1; }
  case "$n" in ''|*[!0-9]*) echo "[watchdog] FATAL: bad count '$n' from $1" >&2; exit 1;; esac
  echo "$n"
}

# persisted() runs in a command-substitution subshell, so its internal
# `exit 1` cannot abort the watchdog — every call site must propagate it
BASE=$(persisted "$INIT.train_state.npz") || exit 1
[ "$BASE" -gt 0 ] && echo "[watchdog] INIT carries a prior leg: baseline count $BASE"

attempt=0
while :; do
  attempt=$((attempt + 1))
  if [ -f "$OUT.train_state.npz" ]; then
    cum=$(persisted "$OUT.train_state.npz") || exit 1
    resumable=1
  else
    cum=$BASE
    resumable=0
  fi
  remaining=$((NUM_ITERS - cum + BASE))
  if [ "$remaining" -le 0 ]; then
    echo "[watchdog] complete: $((cum - BASE))/$NUM_ITERS persisted this leg"
    exit 0
  fi
  if [ "$resumable" -eq 1 ]; then
    init="$OUT" # resume exactly from our own latest checkpoint
  else
    init="$INIT"
  fi
  echo "[watchdog] attempt $attempt: init=$init remaining=$remaining ($(date -u +%H:%M:%S))"
  nice -n -5 "$PYTHON" -m autovc_tpu.cli.train_vocoder \
    --main_dir _data --vocoder wavenet \
    --batch_size "$BATCH" --max_time "$MAX_TIME" \
    --init "$init" --init_step "$INIT_STEP" \
    --save_every "$SAVE_EVERY" --num_iters "$remaining" \
    --out "$OUT" "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[watchdog] trainer exited clean"
    exit 0
  fi
  echo "[watchdog] trainer died rc=$rc; probing the chip before resuming"
  bash "$(dirname "$0")/tpu_probe.sh" 20 180 || {
    echo "[watchdog] chip did not recover; giving up"
    exit 1
  }
done
