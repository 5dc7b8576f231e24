"""WaveNet generation throughput: scan vs persistent-Pallas engines.

Honest timing through the axon tunnel: every timed iteration fetches a
slice of the result to host (block_until_ready alone may not sync).

Usage: python scripts/bench_wavenet.py [--frames 32] [--batches 1,4,16,64]
           [--engines scan,pallas] [--dtypes float32,bfloat16] [--reps 3]
"""

from __future__ import annotations

import os
import sys

# Detached drivers run `python scripts/<name>.py`, which puts scripts/ (not
# the repo root) on sys.path; make autovc_tpu importable regardless of cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--frames", type=int, default=32, help="mel frames (x256 samples)")
    ap.add_argument("--batches", default="1,4,16")
    ap.add_argument("--engines", default="scan,pallas")
    ap.add_argument("--dtypes", default="float32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--hbm_threshold", default="auto",
        help="pallas ring placement: auto | none | <int> (dilations >= int "
        "keep HBM rings; see ops/pallas_wavenet.py)",
    )
    args = ap.parse_args()
    hbm_threshold = (
        "auto" if args.hbm_threshold == "auto"
        else None if args.hbm_threshold == "none"
        else int(args.hbm_threshold)
    )

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from autovc_tpu.config import Config
    from autovc_tpu.vocoder.wavenet import WaveNetVocoder

    cfg = Config().wavenet
    voc = WaveNetVocoder.from_checkpoint(cfg, None)
    sr = 16000
    rng = np.random.RandomState(0)

    for engine in args.engines.split(","):
        for dt in args.dtypes.split(","):
            dtype = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
            for b in (int(x) for x in args.batches.split(",")):
                # per-row failure tolerance: some configs are DESIGNED to
                # fail (f32 pallas at B>=16 exceeds the 16MB VMEM budget);
                # an uncaught OOM must not truncate the remaining rows
                # (it cost the round-2 table a full re-run).
                try:
                    mel = rng.rand(b, args.frames, 80).astype(np.float32)
                    key = jax.random.PRNGKey(0)
                    kw = {"hbm_threshold": hbm_threshold} if engine == "pallas" else {}
                    t0 = time.time()
                    y = voc.generate(mel, key=key, dtype=dtype, engine=engine, **kw)
                    _ = np.asarray(y[:, :8])  # forces full D2H sync
                    compile_s = time.time() - t0
                    times = []
                    for _ in range(args.reps):
                        t0 = time.time()
                        y = voc.generate(mel, key=key, dtype=dtype, engine=engine, **kw)
                        _ = np.asarray(y[:, :8])
                        times.append(time.time() - t0)
                    best = min(times)
                    n_samples = b * args.frames * 256
                    print(json.dumps({
                        "engine": engine, "dtype": dt, "batch": b,
                        "frames": args.frames,
                        "samples_per_s": round(n_samples / best),
                        "rt_factor_per_stream": round(n_samples / best / sr / b, 2),
                        "best_s": round(best, 3),
                        "compile_s": round(compile_s, 1),
                    }), flush=True)
                except Exception as exc:
                    print(json.dumps({
                        "engine": engine, "dtype": dt, "batch": b,
                        "frames": args.frames,
                        "error": f"{type(exc).__name__}: {str(exc)[:200]}",
                    }), flush=True)


if __name__ == "__main__":
    main()
