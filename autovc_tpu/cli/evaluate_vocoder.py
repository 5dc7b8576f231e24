"""Vocoder fidelity evaluation: mel-L1 between re-extracted and target mel.

The reference ships no quantitative vocoder metric (quality claims live in
the AutoVC paper's listening tests); this CLI makes the vocoder comparison a
measurement. For each input mel it synthesizes a waveform with the selected
vocoder, re-extracts normalized mel features with the SAME frontend that
produced the corpus features (dsp.MelFrontend, no dither), and reports
L1/MSE against the input mel — i.e. how faithfully the vocoder inverts the
feature representation. This is the round-1/round-2 "mel L1 vs target"
number in docs/VALIDATION_r*.md.

Inputs: either --results (a results_*.pkl from `convert`, reference
conversion.py output contract) or --spmel_dir (evaluate on corpus features
directly).

Usage: python -m autovc_tpu.cli.evaluate_vocoder --spmel_dir DIR
           --vocoder hifigan --vocoder_ckpt ckpt.npz [--max_utts N]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_mels(args) -> list:
    if args.results:
        from autovc_tpu.data.manifest import load_results

        return [(name, np.asarray(mel)) for name, mel in load_results(args.results)]
    mels = []
    for spk in sorted(os.listdir(args.spmel_dir)):
        d = os.path.join(args.spmel_dir, spk)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith(".npy"):
                mels.append((f"{spk}/{f[:-4]}", np.load(os.path.join(d, f))))
    return mels


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--results", default=None, help="results_*.pkl from convert")
    ap.add_argument("--spmel_dir", default=None, help="corpus feature dir")
    ap.add_argument(
        "--vocoder", default="griffinlim",
        choices=["griffinlim", "wavenet", "hifigan", "hybrid"],
    )
    ap.add_argument("--vocoder_ckpt", default=None)
    ap.add_argument("--gl_iters", type=int, default=60)
    ap.add_argument(
        "--hybrid_iters", type=int, default=2,
        help="GL refinement iterations for --vocoder hybrid",
    )
    ap.add_argument("--max_utts", type=int, default=0, help="0 = all")
    ap.add_argument(
        "--wavenet_engine",
        default="scan",
        choices=["scan", "pallas"],
        help="autoregressive engine for --vocoder wavenet (scan = f32 "
        "lax.scan; pallas = persistent kernel, bf16, lowest latency)",
    )
    ap.add_argument(
        "--wavenet_bucket",
        type=int,
        default=64,
        help="pad mel length (edge-replication) to a multiple of this many "
        "frames before WaveNet synthesis and trim the waveform back, so N "
        "utterances compile a handful of AR programs instead of N (0 = off; "
        "the AR core is causal, so trimming is faithful up to the "
        "conditioning upsampler's ~2-frame receptive field at the tail)",
    )
    ap.add_argument("--out", default=None, help="also append the JSON line here")
    args = ap.parse_args(argv)
    apply_platform(args)
    assert (args.results is None) != (args.spmel_dir is None), (
        "exactly one of --results / --spmel_dir"
    )
    if args.vocoder in ("hifigan", "wavenet", "hybrid") and not args.vocoder_ckpt:
        ap.error(
            f"--vocoder {args.vocoder} requires --vocoder_ckpt: without one "
            "the model is random-init and its mel-L1 is meaningless"
        )

    import jax.numpy as jnp

    from autovc_tpu.config import Config
    from autovc_tpu.dsp.features import MelFrontend

    cfg = Config()
    frontend = MelFrontend(cfg.audio)
    mels = _load_mels(args)
    if args.max_utts:
        mels = mels[: args.max_utts]
    assert mels, "no input mels found"

    if args.vocoder == "griffinlim":
        from autovc_tpu.vocoder.griffinlim import mel_to_waveform

        def synth_all(feats):
            return [
                np.asarray(mel_to_waveform(jnp.asarray(m), cfg.audio, n_iter=args.gl_iters))
                for m in feats
            ]

    elif args.vocoder in ("hifigan", "hybrid"):
        from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

        voc = HiFiGANVocoder.from_checkpoint(cfg.hifigan, args.vocoder_ckpt)
        if args.vocoder == "hybrid":
            from autovc_tpu.vocoder.hybrid import HybridVocoder

            voc = HybridVocoder(voc, cfg.audio, n_iter=args.hybrid_iters)

        def synth_all(feats):
            return [np.asarray(voc.generate(m)) for m in feats]

    else:
        from autovc_tpu.vocoder.wavenet import WaveNetVocoder

        voc = WaveNetVocoder.from_checkpoint(cfg.wavenet, args.vocoder_ckpt)
        w_dtype = jnp.bfloat16 if args.wavenet_engine == "pallas" else jnp.float32

        def synth_all(feats):
            return [
                voc.generate_bucketed(
                    m,
                    bucket=args.wavenet_bucket,
                    dtype=w_dtype,
                    engine=args.wavenet_engine,
                )
                for m in feats
            ]

    from autovc_tpu.eval.fidelity import mel_fidelity_report

    l1s, mses, mcds = [], [], []
    for name, mel in mels:
        (wav,) = synth_all([mel])
        re_mel = np.asarray(frontend.mel_features(jnp.asarray(wav)))
        rep = mel_fidelity_report(mel, re_mel)
        l1s.append(rep["mel_l1"])
        mses.append(rep["mel_mse"])
        mcds.append(rep["mcd_db"])

    rec = {
        "vocoder": args.vocoder,
        "ckpt": args.vocoder_ckpt,
        "utterances": len(l1s),
        "mel_l1_mean": float(np.mean(l1s)),
        "mel_l1_median": float(np.median(l1s)),
        "mel_mse_mean": float(np.mean(mses)),
        "mcd_db_mean": float(np.mean(mcds)),
        "mcd_db_median": float(np.median(mcds)),
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
