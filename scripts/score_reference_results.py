"""Head-to-head: the reference's own published conversions vs ours,
scored by the SAME GE2E judge under the SAME protocol.

The reference repo ships its trained model's converted audio
(results/mel/spmel_{0..7}.wav, reference results/readme.md:1-2) but the
metadata.log the readme points at is absent. The pairing is recoverable:
make_metadata.py:25-34 lists exactly 8 subject_conversions (7 commented +
1 active) in written order, matching the 8 numbered wavs. The mapping is
validated empirically here: each wav's nearest speaker centroid must be
consistent with the inferred pairing (identity conversions in particular
must land on their own speaker).

For each reference wav: 16 kHz load -> framework mel front-end -> GE2E
embedding -> cosine to target vs source centroid (the exact
cli.evaluate_conversion metric). For ours: the same (src_spk -> trg_spk)
pairs converted with the shipped generator artifact. Where the bundled
corpus carries the EXACT source sentence the reference converted
(p002_020 for files 0-2, p227_003 for file 7) we use it and report those
pairs as the iso-sentence "clean subset"; elsewhere a different sentence
of the same source speaker stands in (zero-shot speaker transfer is
sentence-independent and the judge scores speaker identity only).

Audio path: --vocoder wavenet synthesizes our conversions through OUR
trained autoregressive WaveNet — the same vocoder class as the
reference's 1M-step checkpoint (reference vocoder.py:17-22) — making the
comparison iso-vocoder-class; griffinlim/hifigan rows kept for the
vocoder-invariance picture (VALIDATION_r3 §2a).

Usage: python scripts/score_reference_results.py [--platform cpu]
           [--vocoder griffinlim|hifigan|wavenet|none] [--out JSON]
"""

from __future__ import annotations

import os
import sys

# Detached drivers run `python scripts/<name>.py`, which puts scripts/ (not
# the repo root) on sys.path; make autovc_tpu importable regardless of cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np

# (source speaker, source sentence, target speaker) in the written order of
# reference make_metadata.py:25-34
REF_PAIRS = [
    ("p002", "020", "p002"),
    ("p002", "020", "p227"),
    ("p002", "020", "p003"),
    ("p003", "4019", "p002"),
    ("p225", "001", "p225"),
    ("p225", "001", "p227"),
    ("p227", "001", "p225"),
    ("p227", "003", "p002"),
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--main_dir", default="_data")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--artifact", default="artifacts/generator_spmel_spkv2_f16.npz")
    ap.add_argument("--dvector_ckpt", default="artifacts/ge2e.npz")
    ap.add_argument(
        "--vocoder",
        default="griffinlim",
        choices=["griffinlim", "hifigan", "wavenet", "none"],
        help="audio path for OUR conversions (none = mel path only)",
    )
    ap.add_argument("--vocoder_ckpt", default="artifacts/hifigan.npz")
    ap.add_argument(
        "--wavenet_ckpt",
        default="artifacts/wavenet_105k.npz",
        help="committed continued-training checkpoint (see artifacts/README.md)",
    )
    ap.add_argument(
        "--wavenet_engine", default="pallas", choices=["pallas", "scan"]
    )
    ap.add_argument("--gl_iters", type=int, default=60)
    ap.add_argument(
        "--variant",
        default="mel",
        choices=["mel", "stft"],
        help="which reference results folder to score (our side always "
        "converts with the spmel generator artifact)",
    )
    ap.add_argument("--out", default="artifacts/reference_head_to_head.json")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from autovc_tpu.cli.export_ckpt import load_artifact
    from autovc_tpu.config import Config
    from autovc_tpu.convert import Converter
    from autovc_tpu.data.manifest import ConversionSpec, load_train_manifest
    from autovc_tpu.dsp.audio_io import read_wav
    from autovc_tpu.dsp.features import MelFrontend
    from autovc_tpu.eval import (
        SpeakerEmbedder,
        load_speaker_mels,
        speaker_centroids,
        similarity_record,
    )
    from autovc_tpu.models import build_generator
    from autovc_tpu.train.ge2e import GE2ETrainer

    cfg = Config()
    mel_dir = os.path.join(args.main_dir, "spmel")
    entries = load_train_manifest(os.path.join(mel_dir, "train.pkl"))
    by_id = {e.speaker_id: e for e in entries}

    embedder = SpeakerEmbedder(GE2ETrainer.load_params(args.dvector_ckpt))
    centroids = speaker_centroids(
        embedder, load_speaker_mels(mel_dir, entries, 10)
    )
    frontend = MelFrontend(cfg.audio)

    # ---- side A: the reference's published conversions.
    # Pairing evidence beyond the list order: conversion output length equals
    # the source utterance's mel length x hop (padding stripped,
    # conversion.py:97-100) — spmel_{0,1,2} are exactly T=299 = the bundled
    # p002_020.npy, and {4,5} share one source length as the list predicts.
    ref_records = []
    prefix = {"mel": "spmel", "stft": "stft"}[args.variant]
    for i, (src, sent, trg) in enumerate(REF_PAIRS):
        path = os.path.join(
            args.reference, "results", args.variant, f"{prefix}_{i}.wav"
        )
        wav, _ = read_wav(path, cfg.audio.sample_rate)
        mel = np.asarray(frontend.mel_features(jnp.asarray(wav)))
        rec = similarity_record(embedder, centroids, mel, src=src, trg=trg)
        e = embedder.embed(mel)
        nearest = max(centroids, key=lambda s: float(e @ centroids[s]))
        src_feat = os.path.join(mel_dir, src, f"{src}_{sent}.npy")
        out_t = wav.shape[0] // cfg.audio.hop_length
        src_t = int(np.load(src_feat).shape[0]) if os.path.exists(src_feat) else None
        rec.update(
            {"file": f"{prefix}_{i}.wav", "sentence": sent, "nearest": nearest,
             "identity": src == trg, "out_frames": out_t,
             "src_frames_if_bundled": src_t,
             "length_match": (src_t == out_t) if src_t is not None else None}
        )
        ref_records.append(rec)
        lm = {True: " len==src", False: " len!=src", None: ""}[rec["length_match"]]
        print(
            f"[ref ] {prefix}_{i} {src}_{sent}->{trg}: cos_trg {rec['cos_trg']:.3f} "
            f"cos_src {rec['cos_src']:.3f} margin {rec['margin']:+.3f} "
            f"nearest {nearest}{lm}"
        )

    # ---- side B: ours, same speaker pairs, shipped generator artifact
    variables, step = load_artifact(args.artifact)
    model = build_generator(cfg.model)
    converter = Converter(model, variables["params"], variables["batch_stats"], cfg)

    synth = None
    if args.vocoder == "hifigan":
        from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

        voc = HiFiGANVocoder.from_checkpoint(cfg.hifigan, args.vocoder_ckpt)
        synth = voc.generate
    elif args.vocoder == "wavenet":
        import jax.numpy as _jnp

        from autovc_tpu.vocoder.wavenet import WaveNetVocoder

        wnv = WaveNetVocoder.from_checkpoint(cfg.wavenet, args.wavenet_ckpt)
        wn_dtype = (
            _jnp.bfloat16 if args.wavenet_engine == "pallas" else _jnp.float32
        )
        synth = lambda m: wnv.generate_bucketed(
            np.asarray(m), bucket=64, dtype=wn_dtype, engine=args.wavenet_engine
        )
    elif args.vocoder == "griffinlim":
        from autovc_tpu.vocoder.griffinlim import mel_to_waveform

        synth = lambda m: mel_to_waveform(jnp.asarray(m), cfg.audio, n_iter=args.gl_iters)

    our_records = []
    for i, (src, sent, trg) in enumerate(REF_PAIRS):
        src_entry, trg_entry = by_id[src], by_id[trg]
        # iso-sentence where the corpus bundles the reference's exact source
        # utterance; otherwise another sentence of the same speaker stands in
        exact_rel = os.path.join(src, f"{src}_{sent}.npy")
        exact = os.path.exists(os.path.join(mel_dir, exact_rel))
        rel = exact_rel if exact else src_entry.utterances[0]
        feats = np.load(os.path.join(mel_dir, rel))
        spec = ConversionSpec(
            i, os.path.splitext(os.path.basename(rel))[0],
            src_entry.embedding, feats, trg, trg_entry.embedding,
        )
        mel_out = converter.convert_to_mel(spec)
        rec = similarity_record(embedder, centroids, mel_out, src=src, trg=trg)
        rec.update(
            {"src_utt": spec.src_name, "through": "mel",
             "identity": src == trg, "exact_sentence": exact}
        )
        if synth is not None:
            wav = np.asarray(synth(mel_out))
            mel_rt = np.asarray(frontend.mel_features(jnp.asarray(wav)))
            rec_a = similarity_record(embedder, centroids, mel_rt, src=src, trg=trg)
            rec["audio_cos_trg"] = rec_a["cos_trg"]
            rec["audio_cos_src"] = rec_a["cos_src"]
            rec["audio_margin"] = rec_a["margin"]
            rec["audio_success"] = rec_a["success"]
        our_records.append(rec)
        a = f" | audio margin {rec['audio_margin']:+.3f}" if synth else ""
        print(
            f"[ours] {spec.src_name}->{trg}: cos_trg {rec['cos_trg']:.3f} "
            f"margin {rec['margin']:+.3f}{a}"
        )

    def cross(records, key="margin", success_key="success", clean=False):
        xs = [r for r in records if not r["identity"]]
        if clean:
            xs = [r for r in xs if r.get("exact_sentence")]
        if not xs:
            return {"n": 0}
        return {
            "n": len(xs),
            "success": sum(bool(r[success_key]) for r in xs),
            "mean_margin": float(np.mean([r[key] for r in xs])),
            "median_margin": float(np.median([r[key] for r in xs])),
        }

    summary = {
        "judge": args.dvector_ckpt,
        "generator": args.artifact,
        "generator_step": step,
        "our_vocoder": args.vocoder,
        "pairing_evidence": {
            "length_matches": [r["file"] for r in ref_records if r["length_match"]],
            "identity_nearest_ok": [
                r["nearest"] == r["trg"] for r in ref_records if r["identity"]
            ],
        },
        # clean = the pairs where OUR side converts the reference's exact
        # source sentence, applied to BOTH sides for an iso-sentence slice
        "reference_cross": cross(ref_records),
        "reference_cross_clean": cross(
            [
                dict(r, exact_sentence=o.get("exact_sentence", False))
                for r, o in zip(ref_records, our_records)
            ],
            clean=True,
        ),
        "ours_cross_mel": cross(our_records),
        "ours_cross_mel_clean": cross(our_records, clean=True),
        "reference_records": ref_records,
        "our_records": our_records,
    }
    if synth is not None:
        summary["ours_cross_audio"] = cross(
            our_records, key="audio_margin", success_key="audio_success"
        )
        summary["ours_cross_audio_clean"] = cross(
            our_records, key="audio_margin", success_key="audio_success", clean=True
        )
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if not k.endswith("_records")}, indent=1))


if __name__ == "__main__":
    main()
