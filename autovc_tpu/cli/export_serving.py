"""Export an AOT serving bundle (serialized StableHLO conversion program).

Replaces the reference's deploy-by-rerunning-scripts workflow
(conversion.py + vocoder.py) with a self-describing artifact: one
shape-polymorphic program (any batch, any multiple-of-freq length),
lowered for cpu+tpu, plus the weights and a manifest. Load with
autovc_tpu.serve.ServingConverter — no flax or model code needed at
serving time.

Usage: python -m autovc_tpu.cli.export_serving --artifact gen.npz --out DIR
           [--hifigan hifigan.npz] [--platforms cpu,tpu] [--model_type spmel]
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
        help="HiFi-GAN .npz — fuse waveform synthesis into the served program",
    )
    ap.add_argument("--platforms", default="cpu,tpu")
    ap.add_argument("--model_type", default="spmel", choices=["spmel", "stft"])
    args = ap.parse_args(argv)
    apply_platform(args)

    import numpy as np

    from autovc_tpu.cli.export_ckpt import load_artifact
    from autovc_tpu.config import Config, ModelConfig
    from autovc_tpu.serve import export_converter
    from autovc_tpu.vocoder.wavenet import unflatten_params

    cfg = Config(model=ModelConfig(model_type=args.model_type))
    variables, step = load_artifact(args.artifact)
    hparams = None
    if args.hifigan:
        hparams = unflatten_params(
            {
                k: v.astype(np.float32) if v.dtype == np.float16 else v
                for k, v in dict(np.load(args.hifigan)).items()
            }
        )
    out = export_converter(
        variables,
        cfg,
        args.out,
        hifigan_params=hparams,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()),
    )
    print(f"[export_serving] wrote {out} (generator step {step}, "
          f"vocoder={'fused' if hparams is not None else 'none'})")


if __name__ == "__main__":
    main()
