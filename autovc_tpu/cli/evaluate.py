"""Evaluation CLI: reconstruction metrics on a corpus.

The reference's convergence criterion is "recon loss ~ 1e-4" (README.md:63),
judged by eye from wandb. This makes it a measurement: eval-mode identity
reconstruction (src -> src) losses over every utterance, reported as
mean/median MSE and L1 — including the mel-recon L1 that the rebuild's
north-star targets track.

Usage: python -m autovc_tpu.cli.evaluate --main_dir DIR --run_dir RUNDIR
           [--model_type spmel|stft] [--use_ema] [--max_utts N]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--main_dir", required=True)
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--model_type", default="spmel", choices=["spmel", "stft"])
    ap.add_argument(
        "--pallas", action="store_true",
        help="Pallas fused LSTM kernels (much faster TPU compiles, inference-only)",
    )
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--max_utts", type=int, default=0, help="0 = all")
    args = ap.parse_args(argv)
    apply_platform(args)

    from autovc_tpu.cli.convert import load_solver_checkpoint
    from autovc_tpu.config import Config, ModelConfig
    from autovc_tpu.convert import Converter
    from autovc_tpu.data.manifest import ConversionSpec, load_train_manifest
    from autovc_tpu.models import build_generator

    restored, step = load_solver_checkpoint(args.run_dir)
    params = restored["ema_params" if args.use_ema else "params"]
    stats = restored["batch_stats"]

    cfg = Config(
        model=ModelConfig(model_type=args.model_type, use_pallas_lstm=args.pallas),
        main_dir=args.main_dir,
    )
    model = build_generator(cfg.model)
    conv = Converter(model, params, stats, cfg)

    feature_dir = os.path.join(args.main_dir, args.model_type)
    entries = load_train_manifest(os.path.join(feature_dir, "train.pkl"))

    paths = []
    for e in entries:
        for rel in e.utterances:
            paths.append((rel, e))
            if args.max_utts and len(paths) >= args.max_utts:
                break
        if args.max_utts and len(paths) >= args.max_utts:
            break

    # identity reconstructions, batched by padded length (fills the MXU),
    # streamed in chunks so a large corpus never sits fully in host memory
    mses, l1s = [], []
    chunk = 64
    for off in range(0, len(paths), chunk):
        specs = [
            ConversionSpec(
                off + k, rel,
                e.embedding,
                np.load(os.path.join(feature_dir, rel)),
                e.speaker_id,
                e.embedding,
                src_speaker=e.speaker_id,
            )
            for k, (rel, e) in enumerate(paths[off : off + chunk])
        ]
        outs = conv.convert_batch(specs, batch_size=8, to_mel=False)
        for s, out in zip(specs, outs):
            mses.append(float(np.mean((out - s.src_features) ** 2)))
            l1s.append(float(np.mean(np.abs(out - s.src_features))))
    n = len(paths)

    report = {
        "step": int(step),
        "utterances": n,
        "recon_mse_mean": float(np.mean(mses)),
        "recon_mse_median": float(np.median(mses)),
        "recon_l1_mean": float(np.mean(l1s)),
        "recon_l1_median": float(np.median(l1s)),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
