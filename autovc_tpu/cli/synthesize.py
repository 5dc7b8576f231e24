"""Vocoder CLI (reference vocoder.py / synthesis.py).

Reads a results_*.pkl ([(name, mel)]) and writes <name>.wav per entry.

Vocoder selection (README.md:43 lists HiFi-GAN as the pretrained
alternative; vocoder_stft.ipynb used Griffin-Lim):
  --vocoder griffinlim  phase reconstruction from mel via pseudo-inverse
  --vocoder wavenet     autoregressive WaveNet fast-generation scan
  --vocoder hifigan     parallel HiFi-GAN generator (throughput path)
Neural vocoders load weights from --vocoder_ckpt (orbax dir or .npz).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from autovc_tpu.config import Config
from autovc_tpu.data.manifest import load_results
from autovc_tpu.dsp.audio_io import write_wav


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--results", required=True, help="results_*.pkl from convert")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--vocoder", default="griffinlim", choices=["griffinlim", "wavenet", "hifigan"])
    ap.add_argument("--vocoder_ckpt", default=None)
    ap.add_argument("--gl_iters", type=int, default=60)
    ap.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 WaveNet generation (halves HBM weight streaming)",
    )
    ap.add_argument(
        "--wavenet_engine",
        default="scan",
        choices=["scan", "pallas"],
        help="WaveNet engine: scan (lax.scan fast-generation, best at large "
        "--batch) or pallas (persistent kernel, implies bf16; best "
        "per-utterance latency — 2.07x realtime per stream at batch 1)",
    )
    ap.add_argument(
        "--batch", type=int, default=1,
        help="synthesize N conversions per device call (neural vocoders; "
        "WaveNet gains ~90x throughput from batching, measured 6.5k -> 607k "
        "samples/s at batch 64). Mels pad to the group max length and trim "
        "after; padded-tail conditioning touches only the last few frames.",
    )
    args = ap.parse_args(argv)
    apply_platform(args)

    cfg = Config()
    os.makedirs(args.out_dir, exist_ok=True)
    results = load_results(args.results)

    if args.vocoder == "griffinlim":
        from autovc_tpu.vocoder.griffinlim import mel_to_waveform, stft_to_waveform

        def synth(feat):
            # 513-bin results (raw stft-variant output) take the direct
            # Griffin-Lim path (vocoder_stft.ipynb); 80-bin go via mel pinv
            if feat.shape[-1] == cfg.audio.n_stft_bins:
                return stft_to_waveform(feat, cfg.audio, n_iter=args.gl_iters)
            return mel_to_waveform(feat, cfg.audio, n_iter=args.gl_iters)
    elif args.vocoder == "wavenet":
        import jax.numpy as jnp

        from autovc_tpu.vocoder.wavenet import WaveNetVocoder

        voc = WaveNetVocoder.from_checkpoint(cfg.wavenet, args.vocoder_ckpt)
        dt = jnp.bfloat16 if (args.bf16 or args.wavenet_engine == "pallas") else jnp.float32
        if args.batch > 1:
            synth = lambda mel: voc.generate(mel, dtype=dt, engine=args.wavenet_engine)
        else:
            # single-utterance path: bucket lengths so N utterances compile a
            # handful of AR programs instead of N (causal core -> exact trim)
            synth = lambda mel: voc.generate_bucketed(
                mel, dtype=dt, engine=args.wavenet_engine
            )
    else:
        from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

        voc = HiFiGANVocoder.from_checkpoint(cfg.hifigan, args.vocoder_ckpt)
        synth = lambda mel: voc.generate(mel)

    hop = cfg.audio.hop_length
    if args.batch > 1 and args.vocoder in ("wavenet", "hifigan"):
        wavs = batched_synthesis(synth, results, args.batch, hop)
    else:
        wavs = [np.asarray(synth(np.asarray(mel, np.float32))) for _, mel in results]

    readme_lines = [
        "# Synthesized conversions",
        f"vocoder: {args.vocoder}; results: {os.path.abspath(args.results)}",
        "Cross-reference conversion ids against the metadata.log written by",
        "make_metadata (the reference's results/readme.md convention).",
        "",
    ]
    for (name, _), wav in zip(results, wavs):
        peak = np.abs(wav).max()
        if peak > 0.999:  # hparams.py:78-79 rescaling contract
            wav = wav / peak * 0.999
        path = os.path.join(args.out_dir, f"{name}.wav")
        write_wav(path, wav, cfg.audio.sample_rate)  # vocoder.py:22
        dur = wav.shape[-1] / cfg.audio.sample_rate
        readme_lines.append(f"- {name}.wav ({dur:.2f}s)")
        print(f"[synthesize] {path} ({dur:.2f}s)")
    with open(os.path.join(args.out_dir, "readme.md"), "w") as fh:
        fh.write("\n".join(readme_lines) + "\n")


def batched_synthesis(synth, results, batch: int, hop: int) -> list:
    """Group conversions, pad mels to the group max, synthesize one batched
    device call per group, trim each waveform to its own Tc*hop length."""
    wavs: list = [None] * len(results)
    order = sorted(range(len(results)), key=lambda i: results[i][1].shape[0])
    for off in range(0, len(order), batch):
        group = order[off : off + batch]
        tmax = max(results[i][1].shape[0] for i in group)
        mels = np.zeros((len(group), tmax, results[group[0]][1].shape[1]), np.float32)
        for k, i in enumerate(group):
            m = results[i][1]
            mels[k, : m.shape[0]] = m
        out = np.asarray(synth(mels))
        for k, i in enumerate(group):
            wavs[i] = out[k, : results[i][1].shape[0] * hop]
    return wavs


if __name__ == "__main__":
    main()
