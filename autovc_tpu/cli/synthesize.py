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
        dt = jnp.bfloat16 if args.bf16 else jnp.float32
        synth = lambda mel: voc.generate(mel, dtype=dt)
    else:
        from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

        voc = HiFiGANVocoder.from_checkpoint(cfg.hifigan, args.vocoder_ckpt)
        synth = lambda mel: voc.generate(mel)

    readme_lines = [
        "# Synthesized conversions",
        f"vocoder: {args.vocoder}; results: {os.path.abspath(args.results)}",
        "Cross-reference conversion ids against the metadata.log written by",
        "make_metadata (the reference's results/readme.md convention).",
        "",
    ]
    for name, mel in results:
        wav = np.asarray(synth(np.asarray(mel, np.float32)))
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


if __name__ == "__main__":
    main()
