"""Vocoder training CLI (capability the reference outsourced to the external
wavenet_vocoder package; its training hyperparameters live in hparams.py).

Trains WaveNet (MoL NLL, noam schedule, EMA) or HiFi-GAN (reconstruction
pretraining) on a corpus of wavs + spmel features, saving .npz checkpoints
consumable by `synthesize --vocoder_ckpt`.

Usage: python -m autovc_tpu.cli.train_vocoder --main_dir DIR --vocoder wavenet
           [--num_iters N] [--batch_size B] [--out ckpt.npz]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_corpus(main_dir: str, audio_sr: int = 16000):
    """All (waveform, mel) pairs from <main_dir>/{wavs,spmel}."""
    from autovc_tpu.dsp import read_wav

    wav_root = None
    for cand in ("wav48_silence_trimmed", "wavs", "wav"):
        p = os.path.join(main_dir, cand)
        if os.path.isdir(p):
            wav_root = p
            break
    assert wav_root, f"no wav dir under {main_dir}"
    mel_root = os.path.join(main_dir, "spmel")

    wavs, mels = [], []
    for spk in sorted(os.listdir(mel_root)):
        spk_mel = os.path.join(mel_root, spk)
        if not os.path.isdir(spk_mel):
            continue
        for f in sorted(os.listdir(spk_mel)):
            if not f.endswith(".npy"):
                continue
            wav_path = os.path.join(wav_root, spk, f[:-4] + ".wav")
            if not os.path.exists(wav_path):
                continue
            x, _ = read_wav(wav_path, audio_sr)
            wavs.append(x)
            mels.append(np.load(os.path.join(spk_mel, f)))
    assert wavs, "no (wav, mel) pairs found — run make_spect first"
    return wavs, mels


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--main_dir", required=True)
    ap.add_argument("--vocoder", default="wavenet", choices=["wavenet", "hifigan"])
    ap.add_argument("--num_iters", type=int, default=200_000)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--max_time", type=int, default=8000, help="wavenet crop samples (hparams.py:150)")
    ap.add_argument("--frames", type=int, default=32, help="hifigan crop frames")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--log_step", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--gan",
        action="store_true",
        help="hifigan: full adversarial objective (MPD+MSD + feature matching "
        "+ mel L1) instead of reconstruction-only pretraining",
    )
    ap.add_argument(
        "--init",
        default=None,
        help="warm-start from an .npz checkpoint (hifigan: generator, e.g. "
        "for --gan fine-tuning; wavenet: params+EMA, fresh optimizer)",
    )
    ap.add_argument(
        "--init_step",
        type=int,
        default=0,
        help="wavenet: offset the noam schedule by this many steps so a "
        "warm-started run continues the decay instead of re-warming",
    )
    ap.add_argument(
        "--save_every",
        type=int,
        default=0,
        help="also checkpoint to --out every N iters (0 = only at the end)",
    )
    ap.add_argument(
        "--feat_weight",
        type=float,
        default=0.0,
        help="hifigan: extra L1 on the framework's normalized mel features — "
        "the exact evaluate_vocoder metric (useful for fidelity polishing)",
    )
    args = ap.parse_args(argv)
    apply_platform(args)

    from autovc_tpu.config import Config

    cfg = Config()
    wavs, mels = load_corpus(args.main_dir, cfg.audio.sample_rate)
    print(f"[train_vocoder] corpus: {len(wavs)} utterances")
    rng = np.random.default_rng(args.seed)
    out = args.out or os.path.join(args.main_dir, f"{args.vocoder}_vocoder.npz")

    if args.vocoder == "wavenet":
        from autovc_tpu.vocoder.train_wavenet import WaveNetTrainer, crop_batch

        trainer = WaveNetTrainer(
            cfg.wavenet, lr=args.lr or 1e-3, seed=args.seed,
            init_step=args.init_step,
        )
        if args.init:
            trainer.load(args.init)
            print(
                f"[train_vocoder] warm-start wavenet from {args.init} "
                f"(noam schedule offset {args.init_step})"
            )
            # exact resume if the sibling train-state exists: raw params +
            # Adam moments + schedule count (load() above keeps the EMA).
            # --init_step must MATCH the run that wrote the state: the
            # effective noam position is count + init_step, and the count
            # leaf only carries steps since that trainer was constructed
            # (restore_train_state validates via the saved metadata).
            if os.path.exists(args.init + ".train_state.npz"):
                trainer.restore_train_state(args.init + ".train_state.npz")
                print(
                    f"[train_vocoder] restored wavenet train state from "
                    f"{args.init}.train_state.npz"
                )

        def batches():
            while True:
                yield crop_batch(
                    wavs, mels, args.batch_size, args.max_time, cfg.audio.hop_length, rng
                )

    else:
        from autovc_tpu.vocoder.train_hifigan import (
            HiFiGANGANTrainer,
            HiFiGANTrainer,
            hifigan_crop_batch,
        )

        init_params = None
        if args.init:
            from autovc_tpu.vocoder.wavenet import unflatten_params

            init_params = unflatten_params(dict(np.load(args.init)))
            print(f"[train_vocoder] warm-start generator from {args.init}")
        if args.gan:
            trainer = HiFiGANGANTrainer(
                cfg.hifigan, cfg.audio, lr=args.lr or 2e-4, seed=args.seed,
                feat_weight=args.feat_weight, generator_params=init_params,
            )
            # resume discriminators + optimizer states if the sibling
            # train-state file exists (written by --save_every below), so an
            # interrupted GAN fine-tune keeps its training dynamics
            if args.init and os.path.exists(args.init + ".train_state.npz"):
                trainer.restore_train_state(args.init + ".train_state.npz")
                print(
                    f"[train_vocoder] restored GAN train state from "
                    f"{args.init}.train_state.npz"
                )
        else:
            trainer = HiFiGANTrainer(
                cfg.hifigan, cfg.audio, lr=args.lr or 2e-4, seed=args.seed,
                feat_weight=args.feat_weight,
            )
            if init_params is not None:
                trainer.params = init_params
                trainer.opt_state = trainer.optimizer.init(trainer.params)

        def batches():
            while True:
                yield hifigan_crop_batch(
                    wavs, mels, args.batch_size, args.frames, cfg.audio.hop_length, rng
                )

    train_fn = trainer.train_gan if (args.vocoder == "hifigan" and args.gan) else trainer.train
    if args.save_every and args.save_every < args.num_iters:
        done = 0
        while done < args.num_iters:
            chunk = min(args.save_every, args.num_iters - done)
            train_fn(batches(), chunk, log_step=args.log_step)
            done += chunk
            trainer.save(out)
            if args.vocoder == "wavenet" or (args.vocoder == "hifigan" and args.gan):
                trainer.save_train_state(out + ".train_state.npz")
            print(f"[train_vocoder] checkpointed {out} @ {done}/{args.num_iters}")
    else:
        train_fn(batches(), args.num_iters, log_step=args.log_step)
        trainer.save(out)
        if args.vocoder == "wavenet" or (args.vocoder == "hifigan" and args.gan):
            trainer.save_train_state(out + ".train_state.npz")
    print(f"[train_vocoder] saved {out}")


if __name__ == "__main__":
    main()
