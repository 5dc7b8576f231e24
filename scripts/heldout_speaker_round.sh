#!/usr/bin/env bash
# Held-out-speaker conversion evidence (VERDICT r3 weak #5): train a fresh
# spmel generator on SIX speakers (_data_heldout, p228 excluded) with the
# round-2 convergence recipe, then score zero-shot conversion over the FULL
# 7-speaker matrix — the 12 pairs touching the never-seen p228 are the
# held-out result. The speaker encoder stays the pretrained-on-everyone
# GE2E (artifacts/ge2e.npz), exactly mirroring the reference's zero-shot
# setup (its encoder was pretrained on thousands of external speakers;
# only the GENERATOR is conversion-model capacity).
#
# Corpus prep (already done if _data_heldout exists):
#   mkdir -p _data_heldout/wavs && for s in p001 p002 p003 p225 p226 p227;
#     do ln -sfn /root/reference/wavs/$s _data_heldout/wavs/$s; done
#   python -m autovc_tpu.cli.make_spect --main_dir _data_heldout --platform cpu
#   python -m autovc_tpu.cli.make_metadata --main_dir _data_heldout \
#       --platform cpu --reuse /root/reference/spmel/train.pkl
#
# Usage: bash scripts/heldout_speaker_round.sh [NUM_ITERS] [BATCH]
set -euo pipefail
cd "$(dirname "$0")/.."
NUM_ITERS=${1:-400000}
BATCH=${2:-6}

# Wall-clock cap (VERDICT r4 item 8: no headline claim may depend on an
# in-flight process at snapshot time). If /tmp/heldout_deadline holds an
# epoch-seconds deadline for the TRAINING leg, shrink NUM_ITERS to fit:
# ~60 train steps/s at B=6 on the v5e (measured: the round-5 225k-iter leg
# ran ~61 min, VALIDATION_r5 §5 — the earlier 90/s estimate overshot the
# deadline by ~45%), minus compile + checkpoint slack. Floor at 20k so a
# late start still produces a generator worth scoring rather than noise.
if [ -f /tmp/heldout_deadline ]; then
  _now=$(date +%s); _deadline=$(cat /tmp/heldout_deadline)
  if [ "$_deadline" -le "$_now" ]; then
    # a deadline in the past is a stale file from an earlier round, not a
    # live cap — ignore it rather than silently flooring a full run to 20k
    echo "[heldout] ignoring stale /tmp/heldout_deadline (already passed)"
  else
    _fit=$(( (_deadline - _now - 180) * 60 ))
    if [ "$_fit" -lt "$NUM_ITERS" ]; then
      [ "$_fit" -ge 20000 ] || _fit=20000
      echo "[heldout] wall-clock cap: $NUM_ITERS -> $_fit iters" \
           "(deadline $(date -u -d "@${_deadline}" +%H:%M:%S) UTC)"
      NUM_ITERS=$_fit
    fi
  fi
fi
RUN=heldout_p228
ART=artifacts/generator_heldout_p228_f16.npz

nice -n -5 python -m autovc_tpu.cli.train \
  --main_dir _data_heldout --run_name "$RUN" \
  --batch_size "$BATCH" --num_iters "$NUM_ITERS" \
  --lr_scheduler CosineDecay --checkpoint_step 5000 --log_step 1000

# cli.train appends a datetime suffix to run_name (main.py:76 parity);
# pick the newest matching run directory under <main_dir>/runs
RUN_DIR=$(ls -dt _data_heldout/runs/${RUN}_* 2>/dev/null | head -1)
[ -n "$RUN_DIR" ] || { echo "no run dir matching _data_heldout/runs/${RUN}_*" >&2; exit 1; }
python -m autovc_tpu.cli.export_ckpt --run_dir "$RUN_DIR" --out "$ART" \
  --use_ema --dtype float16 --platform cpu

for judge in artifacts/ge2e.npz artifacts/ge2e_indep.npz; do
  tag=$(basename "$judge" .npz)
  python -m autovc_tpu.cli.evaluate_conversion --main_dir _data \
    --artifact "$ART" --dvector_ckpt "$judge" \
    --out "artifacts/heldout_p228_${tag}.json"
done

python - <<'EOF'
import json

for tag in ("ge2e", "ge2e_indep"):
    rep = json.load(open(f"artifacts/heldout_p228_{tag}.json"))
    rec = rep["records"]
    def summ(rows):
        ok = sum(bool(r["success"]) for r in rows)
        margins = sorted(r["margin"] for r in rows)
        med = margins[len(margins) // 2] if margins else float("nan")
        return f"{ok}/{len(rows)} (median margin {med:+.2f})"
    unseen = [r for r in rec if "p228" in (r["src"], r["trg"]) and r["src"] != r["trg"]]
    to_unseen = [r for r in unseen if r["trg"] == "p228"]
    from_unseen = [r for r in unseen if r["src"] == "p228"]
    seen = [r for r in rec if "p228" not in (r["src"], r["trg"]) and r["src"] != r["trg"]]
    print(f"[{tag}] seen-only cross pairs: {summ(seen)}")
    print(f"[{tag}] -> p228 (zero-shot target): {summ(to_unseen)}")
    print(f"[{tag}] p228 -> seen (unseen source): {summ(from_unseen)}")
EOF
