"""Conversion CLI (reference conversion.py).

Loads a trained checkpoint + metadata.pkl, runs every conversion, writes
results_<run>.pkl ([(id, mel)], the vocoder input contract) and optional
before/after spectrogram PDFs.

Usage: python -m autovc_tpu.cli.convert --main_dir DIR
           (--run_dir RUNDIR | --artifact FILE.npz)
           [--model_type spmel|stft] [--use_ema] [--pdf]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from autovc_tpu.config import Config, ModelConfig
from autovc_tpu.convert import Converter, run_conversions
from autovc_tpu.data.manifest import load_conversion_metadata
from autovc_tpu.models import build_generator


def load_solver_checkpoint(run_dir: str):
    """Restore the latest orbax checkpoint saved by train.Solver."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(run_dir, "checkpoints"))
    mgr = ocp.CheckpointManager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    restored = mgr.restore(step)["state"]
    return restored, step


class _SeqParallelConverter:
    """Converter facade over SPGenerator: each utterance's time axis is
    sharded across a 1-D 'seq' device mesh (long-utterance path)."""

    def __init__(self, params, stats, cfg, n_devices: int):
        import jax
        from jax.sharding import Mesh

        from autovc_tpu.convert.sequence_parallel import SPGenerator

        devices = np.asarray(jax.devices()[:n_devices])
        self.mesh = Mesh(devices, ("seq",))
        self.sp = SPGenerator(params, stats, cfg.model, self.mesh)
        self.cfg = cfg
        self.n = n_devices
        from autovc_tpu.dsp.mel import mel_filterbank

        self._mel_basis = mel_filterbank(
            cfg.audio.sample_rate, cfg.audio.n_fft, cfg.audio.n_mels,
            cfg.audio.mel_fmin, cfg.audio.mel_fmax,
        )

    def convert(self, spec):
        from autovc_tpu.convert import pad_seq

        x, len_pad = pad_seq(spec.src_features, base=self.cfg.model.freq * self.n)
        _, x_psnt, _ = self.sp(
            x[None], spec.src_embedding[None], spec.trg_embedding[None]
        )
        out = np.asarray(x_psnt[0])
        return out[: out.shape[0] - len_pad] if len_pad else out

    def convert_to_mel(self, spec):
        out = self.convert(spec)
        if self.cfg.model.model_type == "stft":
            out = out @ self._mel_basis
        return out


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--main_dir", required=True)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--run_dir", default=None, help="orbax training run dir")
    src.add_argument(
        "--artifact",
        default=None,
        help="flat .npz artifact (cli.export_ckpt output, e.g. the shipped "
        "artifacts/generator_spmel_*.npz) instead of an orbax run dir",
    )
    ap.add_argument("--model_type", default="spmel", choices=["spmel", "stft", "wav"])
    ap.add_argument(
        "--pallas", action="store_true",
        help="Pallas fused LSTM kernels (much faster TPU compiles, inference-only)",
    )
    ap.add_argument("--use_ema", action="store_true", help="convert with EMA weights")
    ap.add_argument("--pdf", action="store_true", help="save spectrogram PDFs")
    ap.add_argument("--out", default=None, help="results pickle path")
    ap.add_argument("--depth", type=int, default=1, help="ConvTasNet depth (wav model)")
    ap.add_argument(
        "--all_pairs",
        action="store_true",
        help="N x N conversion matrix over all speakers (conversion_temp.py mode)",
    )
    ap.add_argument(
        "--raw",
        action="store_true",
        help="save raw model-domain outputs (e.g. 513-bin STFT for the stft "
        "variant, for direct Griffin-Lim) instead of mel projections",
    )
    ap.add_argument(
        "--seq_devices",
        type=int,
        default=0,
        help="time-shard each utterance over N devices (sequence-parallel "
        "SPGenerator; for utterances beyond one chip's memory)",
    )
    args = ap.parse_args(argv)
    apply_platform(args)

    if args.artifact:
        from autovc_tpu.cli.export_ckpt import load_artifact

        variables, step = load_artifact(args.artifact)
        params, stats = variables["params"], variables["batch_stats"]
        if args.use_ema:
            print("[convert] note: artifacts carry one weight set; --use_ema ignored")
    else:
        restored, step = load_solver_checkpoint(args.run_dir)
        params = restored["ema_params" if args.use_ema else "params"]
        stats = restored["batch_stats"]

    cfg = Config(
        model=ModelConfig(
            model_type=args.model_type, convtas_depth=args.depth,
            use_pallas_lstm=args.pallas,
        ),
        main_dir=args.main_dir,
    )
    model = build_generator(cfg.model)
    if args.model_type == "wav":
        from autovc_tpu.convert import WavConverter

        converter = WavConverter(model, params, stats, cfg)
    elif args.seq_devices > 1:
        converter = _SeqParallelConverter(params, stats, cfg, args.seq_devices)
    else:
        converter = Converter(model, params, stats, cfg)

    feature_dir = os.path.join(args.main_dir, args.model_type)
    if args.all_pairs:
        from autovc_tpu.convert import all_pairs_specs
        from autovc_tpu.data.manifest import load_train_manifest

        entries = load_train_manifest(os.path.join(feature_dir, "train.pkl"))
        specs = all_pairs_specs(entries, feature_dir)
    else:
        specs = load_conversion_metadata(os.path.join(feature_dir, "metadata.pkl"))
    out_path = args.out or os.path.join(
        args.main_dir, args.model_type, f"results_step{step}.pkl"
    )
    if args.raw:
        from autovc_tpu.data.manifest import save_results

        results = [(str(s.conversion_id), converter.convert(s)) for s in specs]
        save_results(out_path, results)
    elif args.all_pairs and args.model_type != "wav" and args.seq_devices <= 1:
        # batched path: one compiled program per length bucket fills the MXU
        from autovc_tpu.data.manifest import save_results

        outs = converter.convert_batch(specs, batch_size=8)
        results = [(str(s.conversion_id), o) for s, o in zip(specs, outs)]
        save_results(out_path, results)
    else:
        results = run_conversions(converter, specs, out_path)

    if args.pdf:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for (name, mel), spec in zip(results, specs):
            fig, axs = plt.subplots(2, 1, sharex=True, figsize=(8, 6))
            src = spec.src_features
            if args.model_type == "stft":
                src = src @ np.asarray(converter._mel_basis)
            elif args.model_type == "wav":
                # source is a waveform; show its mel (conversion_nina.py:123-146)
                import jax.numpy as jnp

                src = np.asarray(
                    converter.frontend.mel_features(jnp.asarray(src[..., 0]))
                )
            axs[0].imshow(src.T * 100 - 100, origin="lower", aspect="auto")
            axs[0].set(title="Original spectrogram")
            axs[1].imshow(mel.T * 100 - 100, origin="lower", aspect="auto")
            axs[1].set(title="Converted spectrogram")
            fig.savefig(
                os.path.join(os.path.dirname(out_path), f"{name}_conversion.pdf")
            )
            plt.close(fig)

    print(f"[convert] wrote {out_path} ({len(results)} conversions, step {step})")


if __name__ == "__main__":
    main()
