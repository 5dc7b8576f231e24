"""Real-TPU parity check for the hybrid HBM-ring pallas WaveNet kernel.

CPU interpret mode executes pallas async copies synchronously, so it cannot
catch DMA hazards or Mosaic layout errors (CLAUDE.md round-2 lesson); this
script runs the SAME comparison as tests/test_vocoder.py::
test_pallas_hybrid_ring_matches_scan on the real chip, twice:

  1. the small 8-layer config at hbm_threshold=4 (4 of 8 layers through
     the HBM/DMA path) — the test's exact geometry;
  2. the production 24-layer config (WaveNetConfig defaults) in bf16 at
     hbm_threshold=16, the placement auto_hbm_threshold picks for B=32 —
     compared against the ALL-VMEM pallas kernel (hbm_threshold=None),
     which computes identical math in the same dtype; only ring placement
     differs, so the outputs must agree to ~0. B kept small (2) so the
     all-VMEM oracle fits; ring placement is batch-independent in the
     kernel, only ring SIZE scales with B.

Prints one JSON line per case. Reference for what this validates:
/root/reference/synthesis.py:53-69 (the AR loop these engines replace).

Usage: python scripts/tpu_parity_hybrid.py [--frames 4] [--out FILE]
"""

from __future__ import annotations

import os
import sys

# Detached drivers run `python scripts/<name>.py`, which puts scripts/ (not
# the repo root) on sys.path; make autovc_tpu importable regardless of cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", default=None, help="append JSON lines here")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from autovc_tpu.config import WaveNetConfig
    from autovc_tpu.vocoder.wavenet import WaveNetVocoder, init_params

    print("devices:", jax.devices())

    cases = []

    # Lane-aligned variant of the unit test's geometry: the hybrid kernel's
    # HBM ring DMAs slice (1, B, R) blocks whose minor dim Mosaic requires
    # to be 128-aligned on real hardware (the r=16 test config compiles in
    # interpret mode but is rejected on v5e; generate_pallas now guards
    # this). Same layer/stack/threshold geometry, R padded to one lane tile.
    small = WaveNetConfig(
        out_channels=12, layers=8, stacks=2, residual_channels=128,
        gate_channels=128, skip_channels=128, cin_channels=80,
        upsample_scales=(4, 4, 4, 4),
    )
    # (name, cfg, threshold, dtype, batch, oracle, tol)
    cases.append(("small_8layer_thr4_vs_scan", small, 4, jnp.float32, 2,
                  "scan", 2e-4))
    prod = WaveNetConfig()
    cases.append(("prod_24layer_thr16_bf16_vs_vmem", prod, 16, jnp.bfloat16,
                  2, "pallas_vmem", 1e-6))

    results = []
    for name, cfg, thr, dtype, b, oracle, tol in cases:
        voc = WaveNetVocoder(cfg, init_params(cfg, jax.random.PRNGKey(5)))
        mel = jnp.asarray(
            np.random.RandomState(3).rand(b, args.frames, 80), jnp.float32
        )
        key = jax.random.PRNGKey(7)
        if oracle == "scan":
            w_ref = np.asarray(
                voc.generate(mel, key=key, dtype=dtype), np.float64
            )
        else:  # all-VMEM pallas: same kernel math, rings resident in VMEM
            w_ref = np.asarray(
                voc.generate(mel, key=key, dtype=dtype, engine="pallas",
                             hbm_threshold=None),
                np.float64,
            )
        w_hyb = np.asarray(
            voc.generate(
                mel, key=key, dtype=dtype, engine="pallas", hbm_threshold=thr
            )
        )
        delta = float(np.max(np.abs(w_hyb.astype(np.float64) - w_ref)))
        rec = {
            "case": name, "dtype": str(dtype.__name__), "batch": b,
            "frames": args.frames, "hbm_threshold": thr,
            "max_abs_delta": delta, "tol": tol, "ok": bool(delta <= tol),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")

    if not all(r["ok"] for r in results):
        raise SystemExit("hybrid-ring parity FAILED on real hardware")
    print("hybrid-ring parity OK on", jax.devices()[0].platform)


if __name__ == "__main__":
    main()
