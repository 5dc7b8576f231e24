"""Export an AOT serving bundle (serialized StableHLO programs).

Replaces the reference's deploy-by-rerunning-scripts workflow
(conversion.py + vocoder.py) with a self-describing artifact: a
shape-polymorphic conversion program (any batch, any multiple-of-freq
length), an optional vocoder program, weights, and a manifest, lowered
for cpu+tpu. Load with autovc_tpu.serve.ServingConverter — no flax or
model code needed at serving time.

Usage: python -m autovc_tpu.cli.export_serving --artifact gen.npz --out DIR
           [--hifigan hifigan.npz] [--vocoder_mode hifigan|hybrid]
           [--gl_iters 2] [--platforms cpu,tpu]
           [--model_type spmel|stft] [--compute_dtype float32|bfloat16]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--artifact", required=True, help="generator .npz (cli.export_ckpt)")
    ap.add_argument("--out", required=True, help="output bundle directory")
    ap.add_argument(
        "--hifigan",
        default=None,
        help="HiFi-GAN .npz or torch .pt — add the waveform-synthesis program",
    )
    ap.add_argument(
        "--vocoder_mode",
        default="hifigan",
        choices=["hifigan", "hybrid"],
        help="hybrid bakes Griffin-Lim magnitude projection seeded by the "
        "neural phase into the vocoder program (vocoder/hybrid.py) — the "
        "best measured audio path on converted mels",
    )
    ap.add_argument(
        "--gl_iters", type=int, default=2,
        help="hybrid mode: Griffin-Lim refinement iterations",
    )
    ap.add_argument("--platforms", default="cpu,tpu")
    ap.add_argument("--model_type", default="spmel", choices=["spmel", "stft"])
    ap.add_argument(
        "--compute_dtype",
        default="float32",
        choices=["float32", "bfloat16"],
        help="matmul/conv compute precision of the exported program — "
        "bfloat16 is the benchmarked production configuration",
    )
    args = ap.parse_args(argv)
    apply_platform(args)

    from autovc_tpu.cli.export_ckpt import load_artifact
    from autovc_tpu.config import Config, ModelConfig
    from autovc_tpu.serve import export_converter

    cfg = Config(
        model=ModelConfig(model_type=args.model_type, compute_dtype=args.compute_dtype)
    )
    variables, step = load_artifact(args.artifact)
    hparams = None
    if args.hifigan:
        from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

        hparams = HiFiGANVocoder.from_checkpoint(cfg.hifigan, args.hifigan).params
    out = export_converter(
        variables,
        cfg,
        args.out,
        hifigan_params=hparams,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()),
        gl_iters=args.gl_iters if args.vocoder_mode == "hybrid" else None,
    )
    voc = "none"
    if hparams is not None:
        voc = args.vocoder_mode + (
            f"(gl_iters={args.gl_iters})" if args.vocoder_mode == "hybrid" else ""
        )
    print(f"[export_serving] wrote {out} (generator step {step}, "
          f"compute {args.compute_dtype}, vocoder={voc})")


if __name__ == "__main__":
    main()
