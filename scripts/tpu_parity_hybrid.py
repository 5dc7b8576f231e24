"""Real-TPU parity check for the hybrid HBM-ring pallas WaveNet kernel.

CPU interpret mode executes pallas async copies synchronously, so it cannot
catch DMA hazards or Mosaic layout errors (CLAUDE.md round-2 lesson); this
script validates the hybrid ring on the real chip with three records:

  1. `small_8layer_thr4_vs_vmem` — the unit test's 8-layer geometry
     (lane-aligned, R=128) at hbm_threshold=4 (4 of 8 layers through the
     HBM/DMA path) vs the ALL-VMEM pallas kernel. Identical math in the
     same dtype; ONLY ring placement differs, so this isolates exactly
     the thing hardware can break — the DMA hazard schedule — and must
     be bit-exact (tol 1e-6).
  2. `small_8layer_pallas_vs_scan_prefix` — pallas vs the scan oracle.
     The two engines compute the same f32 math through different codegen
     (Mosaic kernel vs XLA scan), so MoL logits differ at ULP level, and
     generation is autoregressive with CONTINUOUS sampling (gumbel-max
     mixture pick + logistic inverse-CDF): tiny per-step differences
     feed back and grow chaotically (measured on v5e: first >2e-4 delta
     at sample 620/50 for B=2, growing smoothly — 2.4e-4 at onset — to
     0.26 by sample 1024). The meaningful invariant is therefore PREFIX
     parity: sample-exact agreement (tol 2e-4) for >= 32 samples — a
     full receptive-field cycle (2 stacks x dilations 1..8 ~= 30
     samples), i.e. every layer's ring has wrapped at least once while
     the engines still agree. Max delta and divergence onsets are
     recorded as diagnostics, not gated: post-onset divergence is AR
     chaos, not kernel error (record 1 proves the DMA path bit-exact).
  3. `prod_24layer_thr16_bf16_vs_vmem` — the production 24-layer config
     (WaveNetConfig defaults) in bf16 at hbm_threshold=16, the placement
     auto_hbm_threshold picks for B=32, vs all-VMEM. B kept small (2) so
     the all-VMEM oracle fits; ring placement is batch-independent in
     the kernel, only ring SIZE scales with B. Must be bit-exact.

Prints one JSON line per record. Reference for what this validates:
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
    platform = jax.devices()[0].platform
    if args.platform == "tpu" and platform not in ("tpu", "axon"):
        raise SystemExit(
            f"--platform tpu requested but jax backend is {platform!r}: this "
            "environment latches JAX_PLATFORMS before user code (CLAUDE.md); "
            "records from a CPU run must not masquerade as hardware evidence"
        )

    results = []

    def emit(rec):
        rec = dict(rec, platform=platform)
        print(json.dumps(rec), flush=True)
        results.append(rec)

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
    voc = WaveNetVocoder(small, init_params(small, jax.random.PRNGKey(5)))
    mel = jnp.asarray(np.random.RandomState(3).rand(2, args.frames, 80),
                      jnp.float32)
    key = jax.random.PRNGKey(7)
    w_scan = np.asarray(voc.generate(mel, key=key, dtype=jnp.float32),
                        np.float64)
    w_vmem = np.asarray(
        voc.generate(mel, key=key, dtype=jnp.float32, engine="pallas",
                     hbm_threshold=None),
        np.float64,
    )
    w_hyb = np.asarray(
        voc.generate(mel, key=key, dtype=jnp.float32, engine="pallas",
                     hbm_threshold=4),
        np.float64,
    )

    # Record 1: DMA-schedule isolation — placement is the ONLY difference.
    delta = float(np.max(np.abs(w_hyb - w_vmem)))
    emit({
        "case": "small_8layer_thr4_vs_vmem", "dtype": "float32", "batch": 2,
        "frames": args.frames, "hbm_threshold": 4,
        "max_abs_delta": delta, "tol": 1e-6, "ok": bool(delta <= 1e-6),
    })

    # Record 2: pallas vs scan, prefix-exact until AR chaos onset (see
    # module docstring). Gate: every batch row matches the scan oracle
    # sample-for-sample (tol) for >= min_prefix samples; the divergence
    # onset and magnitude are recorded as diagnostics only.
    tol, min_prefix = 2e-4, 32
    d = np.abs(w_vmem - w_scan)
    n_samples = d.shape[-1]
    first_div, delta_at_div = [], []
    for i in range(d.shape[0]):
        idx = np.nonzero(d[i] > tol)[0]
        first_div.append(int(idx[0]) if idx.size else -1)
        delta_at_div.append(float(d[i, idx[0]]) if idx.size else 0.0)
    prefix = min(n_samples if f < 0 else f for f in first_div)
    emit({
        "case": "small_8layer_pallas_vs_scan_prefix", "dtype": "float32",
        "batch": 2, "frames": args.frames, "n_samples": int(n_samples),
        "max_abs_delta": float(d.max()), "prefix_tol": tol,
        "first_divergence_sample": first_div,
        "delta_at_divergence": delta_at_div,
        "min_prefix": min_prefix,
        "exact_prefix_samples": int(prefix),
        "ok": bool(prefix >= min_prefix),
    })

    # Record 3: production geometry, bf16, auto-chosen placement, vs VMEM.
    prod = WaveNetConfig()
    voc = WaveNetVocoder(prod, init_params(prod, jax.random.PRNGKey(5)))
    mel = jnp.asarray(np.random.RandomState(3).rand(2, args.frames, 80),
                      jnp.float32)
    w_ref = np.asarray(
        voc.generate(mel, key=key, dtype=jnp.bfloat16, engine="pallas",
                     hbm_threshold=None),
        np.float64,
    )
    w_hyb = np.asarray(
        voc.generate(mel, key=key, dtype=jnp.bfloat16, engine="pallas",
                     hbm_threshold=16),
        np.float64,
    )
    delta = float(np.max(np.abs(w_hyb - w_ref)))
    emit({
        "case": "prod_24layer_thr16_bf16_vs_vmem", "dtype": "bfloat16",
        "batch": 2, "frames": args.frames, "hbm_threshold": 16,
        "max_abs_delta": delta, "tol": 1e-6, "ok": bool(delta <= 1e-6),
    })

    if args.out:
        # overwrite, don't append: reruns must not mix stale records into
        # the committed artifact (written before the gate so a failing run
        # still leaves its evidence on disk)
        with open(args.out, "w") as f:
            for rec in results:
                f.write(json.dumps(rec) + "\n")
    if not all(r["ok"] for r in results):
        raise SystemExit("hybrid-ring parity FAILED on real hardware")
    print("hybrid-ring parity OK on", platform)


if __name__ == "__main__":
    main()
