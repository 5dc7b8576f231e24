"""Speaker-encoder quality gate: verification EER + embedding separation.

The reference's embeddings come from an externally-downloaded 3M-step GE2E
checkpoint it never validates (make_metadata.py:43); ours are trained
in-repo (cli.train_speaker_encoder), so their quality must be MEASURED —
both the zero-shot conditioning and cli.evaluate_conversion's similarity
metric stand on these embeddings.

Protocol: embed utterances with the frozen encoder (deterministic sliding
windows, eval.SpeakerEmbedder), score all utterance pairs by cosine, report
the equal-error-rate and the intra/inter-speaker cosine separation. With
--holdout N, only the LAST N utterances per speaker are used — pair with
train_speaker_encoder --holdout N for an honest held-out number.

Usage: python -m autovc_tpu.cli.evaluate_speaker_encoder --main_dir DIR
           --dvector_ckpt ge2e.npz [--holdout 2] [--out report.json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    import os

    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--main_dir", required=True)
    ap.add_argument("--dvector_ckpt", required=True)
    ap.add_argument(
        "--holdout", type=int, default=0,
        help="use only the LAST N utterances per speaker (held-out set); "
        "0 = all utterances",
    )
    ap.add_argument(
        "--dim_cell", type=int, default=None,
        help="override; inferred from the checkpoint by default",
    )
    ap.add_argument(
        "--dim_emb", type=int, default=None,
        help="override; inferred from the checkpoint by default",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    apply_platform(args)

    from autovc_tpu.data import UtteranceDataset
    from autovc_tpu.eval import (
        SpeakerEmbedder,
        embedding_separation,
        verification_eer,
    )
    from autovc_tpu.train.ge2e import GE2ETrainer

    mel_dir = os.path.join(args.main_dir, "spmel")
    ds = UtteranceDataset(mel_dir)
    embedder = SpeakerEmbedder(
        GE2ETrainer.load_params(args.dvector_ckpt),
        dim_cell=args.dim_cell,
        dim_emb=args.dim_emb,
    )

    embeds, labels, names = [], [], []
    for sid, (entry, utts) in enumerate(zip(ds.entries, ds.features)):
        if args.holdout and len(utts) <= args.holdout:
            # train_speaker_encoder only trims speakers with MORE than
            # `holdout` utterances (train_speaker_encoder.py), so this
            # speaker trained on everything — scoring its utterances as
            # held-out would silently mix train-set trials into the EER
            print(
                f"[evaluate_speaker_encoder] skipping {entry.speaker_id}: "
                f"{len(utts)} utterances <= holdout {args.holdout} "
                f"(all were seen in training)"
            )
            continue
        sel = utts[-args.holdout :] if args.holdout else utts
        rel = entry.utterances[-args.holdout :] if args.holdout else entry.utterances
        for mel, name in zip(sel, rel):
            embeds.append(embedder.embed(np.asarray(mel)))
            labels.append(sid)
            names.append(name)
    embeds = np.stack(embeds)
    labels = np.asarray(labels)
    n_speakers = len(set(labels.tolist()))
    print(
        f"[evaluate_speaker_encoder] {len(embeds)} utterances, "
        f"{n_speakers} speakers"
        + (f" (held-out last {args.holdout}/speaker)" if args.holdout else "")
    )

    eer, thresh = verification_eer(embeds, labels)
    rep = {
        "eer": eer,
        "threshold": thresh,
        "utterances": len(embeds),
        "speakers": n_speakers,
        "holdout": args.holdout,
        **embedding_separation(embeds, labels),
    }
    print(json.dumps(rep))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)
    return rep


if __name__ == "__main__":
    main()
