"""GE2E speaker-encoder training CLI.

Removes the reference's hard dependency on the externally-downloaded
3000000-BL.ckpt (make_metadata.py:43): train a DVector on the corpus's spmel
features and feed the .npz to make_metadata via --dvector_ckpt ge2e.npz.

Usage: python -m autovc_tpu.cli.train_speaker_encoder --main_dir DIR
           [--num_iters N] [--n_speakers 4] [--m_utts 5] [--out ge2e.npz]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--main_dir", required=True)
    ap.add_argument("--num_iters", type=int, default=50_000)
    ap.add_argument(
        "--n_speakers", type=int, default=0,
        help="speakers per batch; 0 = ALL corpus speakers. On small corpora "
        "subsampled batches (e.g. 4 of 7) drive embedding collapse to the "
        "uniform-softmax point loss=ln(N); all-speaker batches train "
        "cleanly (measured round 3)",
    )
    ap.add_argument("--m_utts", type=int, default=5, help="utterances per speaker")
    ap.add_argument("--len_crop", type=int, default=128)
    ap.add_argument("--dim_cell", type=int, default=768)
    ap.add_argument("--dim_emb", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--log_step", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--holdout", type=int, default=0,
        help="exclude the LAST N utterances of every speaker from training "
        "(held-out set for cli.evaluate_speaker_encoder's EER)",
    )
    ap.add_argument(
        "--ce_weight", type=float, default=0.0,
        help="weight of a speaker-ID cross-entropy auxiliary on the "
        "embedding (breaks the GE2E collapse attractor on tiny corpora; "
        "the head is not saved). 0 = pure GE2E",
    )
    args = ap.parse_args(argv)
    apply_platform(args)

    from autovc_tpu.data import UtteranceDataset
    from autovc_tpu.data.manifest import SpeakerEntry
    from autovc_tpu.train.ge2e import GE2ETrainer, sample_ge2e_batch

    mel_dir = os.path.join(args.main_dir, "spmel")
    # build an ad-hoc manifest if train.pkl doesn't exist yet
    if os.path.exists(os.path.join(mel_dir, "train.pkl")):
        ds = UtteranceDataset(mel_dir)
    else:
        entries = []
        for spk in sorted(os.listdir(mel_dir)):
            d = os.path.join(mel_dir, spk)
            if not os.path.isdir(d):
                continue
            utts = [os.path.join(spk, f) for f in sorted(os.listdir(d)) if f.endswith(".npy")]
            entries.append(SpeakerEntry(spk, np.zeros(1, np.float32), utts))
        ds = UtteranceDataset(mel_dir, manifest=entries)

    features = ds.features
    if args.holdout:
        features = [u[: -args.holdout] if len(u) > args.holdout else u for u in features]
        print(f"[train_speaker_encoder] holding out last {args.holdout} utts/speaker")

    n = min(args.n_speakers or ds.num_speakers, ds.num_speakers)
    rng = np.random.default_rng(args.seed)
    use_ce = args.ce_weight > 0
    trainer = GE2ETrainer(
        dim_cell=args.dim_cell, dim_emb=args.dim_emb, lr=args.lr, seed=args.seed,
        n_classes=len(features) if use_ce else 0, ce_weight=args.ce_weight,
    )

    def batches():
        while True:
            yield sample_ge2e_batch(
                features, n, args.m_utts, args.len_crop, rng, return_labels=use_ce
            )

    trainer.train(batches(), args.num_iters, log_step=args.log_step)
    out = args.out or os.path.join(args.main_dir, "ge2e.npz")
    trainer.save(out)
    print(f"[train_speaker_encoder] saved {out}")


if __name__ == "__main__":
    main()
