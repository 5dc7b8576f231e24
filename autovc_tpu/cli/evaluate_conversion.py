"""Conversion-quality evaluation: speaker similarity over the all-pairs matrix.

The reference's only conversion-quality check was listening to
results/{mel,stft}/*.wav (reference results/readme.md:1-2). This CLI makes
it a measurement: run the original AutoVC N x N conversion matrix
(reference conversion_temp.py:82-101), re-embed every converted output with
a GE2E d-vector encoder, and report the cosine of each output's embedding
to the TARGET speaker centroid vs the SOURCE centroid. A conversion
succeeded when the output is closer to the target — zero-shot voice
conversion, quantified.

Two measurement paths:
  --through mel    embed the converted mel directly (isolates the
                   generator's conversion quality from the vocoder)
  --through audio  converted mel -> vocoder -> waveform -> re-extracted mel
                   -> embedding (the full production path)

Identity pairs (src == trg) double as content checks: reconstruction L1
against the source features.

Usage: python -m autovc_tpu.cli.evaluate_conversion --main_dir DIR
           --artifact artifacts/generator_spmel.npz --dvector_ckpt ge2e.npz
           [--through mel|audio] [--vocoder hifigan --vocoder_ckpt V.npz]
           [--utterance_index 0] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--main_dir", required=True)
    ap.add_argument("--artifact", required=True, help="generator .npz (cli.export_ckpt)")
    ap.add_argument("--dvector_ckpt", required=True, help="GE2E .npz (cli.train_speaker_encoder)")
    ap.add_argument("--model_type", default="spmel", choices=["spmel", "stft"])
    ap.add_argument("--through", default="mel", choices=["mel", "audio"])
    ap.add_argument(
        "--vocoder",
        default="hifigan",
        choices=["griffinlim", "hifigan", "hybrid", "wavenet"],
    )
    ap.add_argument("--vocoder_ckpt", default=None)
    ap.add_argument("--gl_iters", type=int, default=60)
    ap.add_argument(
        "--wavenet_engine",
        default="pallas",
        choices=["scan", "pallas"],
        help="autoregressive engine for --vocoder wavenet (pallas = persistent "
        "kernel, bf16, best per-utterance latency; scan = f32 lax.scan)",
    )
    ap.add_argument("--utterance_index", type=int, default=0)
    ap.add_argument("--centroid_utts", type=int, default=10, help="utterances per centroid")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--out", default=None, help="write the full JSON report here")
    args = ap.parse_args(argv)
    apply_platform(args)
    if (
        args.through == "audio"
        and args.vocoder in ("hifigan", "hybrid", "wavenet")
        and not args.vocoder_ckpt
    ):
        ap.error(f"--through audio with --vocoder {args.vocoder} requires --vocoder_ckpt")

    import jax.numpy as jnp

    from autovc_tpu.cli.export_ckpt import load_artifact
    from autovc_tpu.config import Config, ModelConfig
    from autovc_tpu.convert import Converter, all_pairs_specs
    from autovc_tpu.data.manifest import load_train_manifest
    from autovc_tpu.eval import (
        SpeakerEmbedder,
        load_speaker_mels,
        similarity_record,
        speaker_centroids,
        summarize_similarity,
    )
    from autovc_tpu.models import build_generator
    from autovc_tpu.train.ge2e import GE2ETrainer

    cfg = Config(model=ModelConfig(model_type=args.model_type), main_dir=args.main_dir)
    feature_dir = os.path.join(args.main_dir, args.model_type)
    mel_dir = os.path.join(args.main_dir, "spmel")  # embeddings are always mel
    entries = load_train_manifest(os.path.join(mel_dir, "train.pkl"))

    # --- the similarity yardstick: OUR encoder, real-utterance centroids
    embedder = SpeakerEmbedder(GE2ETrainer.load_params(args.dvector_ckpt))
    print(f"[evaluate_conversion] building centroids for {len(entries)} speakers")
    mels_by_spk = load_speaker_mels(mel_dir, entries, args.centroid_utts)
    centroids = speaker_centroids(embedder, mels_by_spk)

    # --- the conversion matrix with the TRAINED generator (conditioned on the
    # train.pkl embeddings it was trained with)
    variables, step = load_artifact(args.artifact)
    model = build_generator(cfg.model)
    converter = Converter(model, variables["params"], variables["batch_stats"], cfg)
    specs = all_pairs_specs(entries, feature_dir, args.utterance_index)
    print(f"[evaluate_conversion] converting {len(specs)} pairs (generator step {step})")
    converted = converter.convert_batch(specs, batch_size=args.batch_size, to_mel=True)

    # --- optional audio round-trip (vocoder -> waveform -> mel re-extraction)
    if args.through == "audio":
        from autovc_tpu.dsp.features import MelFrontend

        frontend = MelFrontend(cfg.audio)
        if args.vocoder in ("hifigan", "hybrid"):
            from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

            voc = HiFiGANVocoder.from_checkpoint(cfg.hifigan, args.vocoder_ckpt)
            if args.vocoder == "hybrid":
                from autovc_tpu.vocoder.hybrid import HybridVocoder

                voc = HybridVocoder(voc, cfg.audio)
            synth = voc.generate
        elif args.vocoder == "wavenet":
            from autovc_tpu.vocoder.wavenet import WaveNetVocoder

            voc = WaveNetVocoder.from_checkpoint(cfg.wavenet, args.vocoder_ckpt)
            engine = args.wavenet_engine
            w_dtype = jnp.bfloat16 if engine == "pallas" else jnp.float32
            # bucketed: the 42-pair matrix compiles a handful of AR programs
            # instead of one per distinct utterance length
            synth = lambda m: voc.generate_bucketed(m, dtype=w_dtype, engine=engine)

        else:
            from autovc_tpu.vocoder.griffinlim import mel_to_waveform

            synth = lambda m: mel_to_waveform(
                jnp.asarray(m), cfg.audio, n_iter=args.gl_iters
            )
        print(f"[evaluate_conversion] audio path via {args.vocoder}")
        converted = [
            np.asarray(frontend.mel_features(jnp.asarray(np.asarray(synth(m)))))
            for m in converted
        ]

    # --- score: cross pairs by speaker similarity, identity pairs by recon.
    # Outputs are mel (convert_batch(to_mel=True) projects stft -> 80 bins),
    # so stft source features must go through the SAME mel basis before any
    # comparison — raw 513-bin STFT against 80-bin mel would broadcast-error.
    def _src_mel(spec):
        if args.model_type == "stft":
            return np.asarray(jnp.asarray(spec.src_features) @ converter._mel_basis)
        return spec.src_features

    records, recon_l1 = [], []
    for spec, mel_out in zip(specs, converted):
        src_mel = _src_mel(spec)
        if spec.trg_speaker == _src_speaker(spec):
            n = min(mel_out.shape[0], src_mel.shape[0])
            recon_l1.append(float(np.abs(mel_out[:n] - src_mel[:n]).mean()))
        records.append(
            similarity_record(
                embedder,
                centroids,
                mel_out,
                src=_src_speaker(spec),
                trg=spec.trg_speaker,
                orig_mel=src_mel,
            )
        )

    summary = summarize_similarity(records)
    summary.update(
        {
            "through": args.through,
            "vocoder": args.vocoder if args.through == "audio" else None,
            "generator_step": step,
            "identity_recon_l1_mean": float(np.mean(recon_l1)) if recon_l1 else None,
        }
    )
    report = {"summary": summary, "records": records}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"[evaluate_conversion] report -> {args.out}")
    return report


def _src_speaker(spec) -> str:
    """Source speaker id: the spec's explicit field when the constructor knew
    it, else parsed from '<spk>_<utt>' names (stripping a VCTK '_mic2' suffix
    first so 'p225_001_mic2' resolves to 'p225', not 'p225_001')."""
    if getattr(spec, "src_speaker", None):
        return spec.src_speaker
    name = spec.src_name
    name = name.removesuffix("_mic2").removesuffix("_mic1")
    return name.rsplit("_", 1)[0]


if __name__ == "__main__":
    main()
