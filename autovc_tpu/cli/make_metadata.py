"""Metadata/embedding CLI (reference make_metadata.py + main.py:27-33).

Builds <main_dir>/<model_type>/train.pkl and metadata.pkl. Embedding source:
  --dvector_ckpt PATH  torch GE2E checkpoint (the reference's 3000000-BL.ckpt)
  --one_hot            legacy one-hot encoding (old code branch)
  --reuse PATH         copy embeddings from an existing train.pkl
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from autovc_tpu.data.manifest import (
    load_train_manifest,
    save_conversion_metadata,
    save_train_manifest,
)
from autovc_tpu.data.metadata_builder import (
    build_conversion_metadata,
    build_train_manifest,
    embed_speaker,
    one_hot_embeddings,
)

# default conversion list (make_metadata.py:25-34 active entry)
DEFAULT_CONVERSIONS = [(("p225", "001"), "p225")]


def parse_conversions(text: str) -> list[tuple[tuple[str, str], str]]:
    """--conversions 'p225:001:p228,p227:003:p002' -> [((src,sent),trg), ...]"""
    out = []
    for item in text.split(","):
        src, sent, trg = item.strip().split(":")
        out.append(((src, sent), trg))
    return out


def fallback_conversions(feature_dir: str, speakers: list[str]):
    """When the requested utterances don't exist (the bundled corpus has no
    sentence 001), build a default: first utterance of the first speaker,
    converted to the last speaker (p225 -> p228 on the bundled set)."""
    src = speakers[0]
    files = sorted(
        f for f in os.listdir(os.path.join(feature_dir, src)) if f.endswith(".npy")
    )
    sent = files[0][: -len(".npy")].split("_", 1)[1].removesuffix("_mic2")
    trg = speakers[-1] if len(speakers) > 1 else src
    return [((src, sent), trg)]


def build_embeddings(
    main_dir: str,
    source: str,
    dvector_ckpt: str | None = None,
    reuse_path: str | None = None,
    dim_emb: int = 256,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    mel_dir = os.path.join(main_dir, "spmel")  # always mel (make_metadata.py:53-54)
    speakers = sorted(
        d for d in os.listdir(mel_dir) if os.path.isdir(os.path.join(mel_dir, d))
    )
    if source == "one_hot":
        return one_hot_embeddings(speakers, dim_emb)
    if source == "reuse":
        return {e.speaker_id: e.embedding for e in load_train_manifest(reuse_path)}
    if source == "dvector":
        from autovc_tpu.models import DVector

        if dvector_ckpt.endswith(".npz"):
            # GE2E trained by our train_speaker_encoder CLI
            from autovc_tpu.train.ge2e import GE2ETrainer

            tree = GE2ETrainer.load_params(dvector_ckpt)
            params = tree["dvector"]
            dim_cell = int(params["lstm"]["w_hh_l0_fwd"].shape[0])
            dim_emb_ck = int(params["embedding"]["kernel"].shape[1])
            model = DVector(dim_input=80, dim_cell=dim_cell, dim_emb=dim_emb_ck)
        else:
            # reference torch GE2E checkpoint (3000000-BL.ckpt format)
            import torch

            from autovc_tpu.interop import dvector_params_from_torch

            ckpt = torch.load(dvector_ckpt, map_location="cpu")
            sd = ckpt.get("model_b", ckpt)
            params = dvector_params_from_torch(sd)
            model = DVector(dim_input=80, dim_cell=768, dim_emb=dim_emb)
        apply_fn = lambda x: model.apply({"params": params}, x)
        rng = np.random.default_rng(seed)
        return {s: embed_speaker(apply_fn, mel_dir, s, rng) for s in speakers}
    raise ValueError(f"unknown embedding source {source!r}")


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--main_dir", required=True)
    ap.add_argument("--model_type", default="spmel", choices=["spmel", "stft", "wav"])
    ap.add_argument("--dvector_ckpt", default=None)
    ap.add_argument("--one_hot", action="store_true")
    ap.add_argument("--reuse", default=None, help="existing train.pkl to copy embeddings from")
    ap.add_argument("--dim_emb", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--conversions",
        default=None,
        help="comma-separated src:sentence:trg triples (default: reference list, "
        "with auto-fallback to available utterances)",
    )
    args = ap.parse_args(argv)
    apply_platform(args)

    if args.one_hot:
        source = "one_hot"
    elif args.reuse:
        source = "reuse"
    elif args.dvector_ckpt:
        source = "dvector"
    else:
        # auto: reuse the model-type dir's own train.pkl embeddings if present
        existing = os.path.join(args.main_dir, "spmel", "train.pkl")
        if os.path.exists(existing):
            source, args.reuse = "reuse", existing
        else:
            source = "one_hot"
            print("[make_metadata] no d-vector ckpt; falling back to one-hot embeddings")

    embeddings = build_embeddings(
        args.main_dir, source, args.dvector_ckpt, args.reuse, args.dim_emb, args.seed
    )

    feature_dir = os.path.join(args.main_dir, args.model_type)
    entries = build_train_manifest(feature_dir, embeddings)
    save_train_manifest(os.path.join(feature_dir, "train.pkl"), entries)

    speaker_info = None
    info_path = os.path.join(args.main_dir, "speaker_info.txt")
    if not os.path.exists(info_path):
        info_path = "speaker_info.txt"
    if os.path.exists(info_path):
        import pandas as pd

        speaker_info = pd.read_csv(info_path, sep=r"\s+")

    if args.conversions:
        conversions = parse_conversions(args.conversions)
    else:
        conversions = DEFAULT_CONVERSIONS
        # auto-fallback when the default utterances aren't in this corpus
        ok = all(
            any(
                os.path.exists(os.path.join(feature_dir, s, f"{s}_{t}{suf}.npy"))
                for suf in ("_mic2", "")
            )
            for (s, t), _ in conversions
        )
        if not ok:
            speakers = sorted(e.speaker_id for e in entries)
            conversions = fallback_conversions(feature_dir, speakers)
            print(f"[make_metadata] default conversions unavailable; using {conversions}")

    txt_dir = os.path.join(args.main_dir, "txt")
    specs = build_conversion_metadata(
        feature_dir,
        embeddings,
        conversions,
        txt_dir=txt_dir if os.path.isdir(txt_dir) else None,
        speaker_info=speaker_info,
        log_path=os.path.join(feature_dir, "metadata.log"),
    )
    save_conversion_metadata(os.path.join(feature_dir, "metadata.pkl"), specs)
    print(f"[make_metadata] wrote train.pkl ({len(entries)} speakers) and metadata.pkl")


if __name__ == "__main__":
    main()
