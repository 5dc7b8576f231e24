"""Speaker-embedding + manifest construction (reference make_metadata.py).

Builds train.pkl and metadata.pkl/metadata.log from a feature tree. Speaker
embeddings come from one of:
- a GE2E DVector (params imported from the reference's 3000000-BL.ckpt via
  autovc_tpu.interop.dvector_params_from_torch, when the user has it) —
  embeddings are ALWAYS computed from the spmel features regardless of
  model_type (make_metadata.py:53-54, preserved quirk);
- one-hot identity vectors (the reference's legacy speaker_embed=False
  branch, old code/make_metadata_old.py:68-72);
- an existing train.pkl (reuse, e.g. the bundled reference embeddings).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from autovc_tpu.data.manifest import ConversionSpec, SpeakerEntry


def embed_speaker(
    apply_fn,
    mel_dir: str,
    speaker: str,
    rng: np.random.Generator,
    num_uttrs: int = 10,
    len_crop: int = 128,
) -> np.ndarray:
    """Mean d-vector over `num_uttrs` random len_crop crops
    (make_metadata.py:66-81), resampling utterances shorter than the crop."""
    files = sorted(
        f for f in os.listdir(os.path.join(mel_dir, speaker)) if f.endswith(".npy")
    )
    assert len(files) >= num_uttrs, f"{speaker}: need >= {num_uttrs} utterances"
    idx = rng.choice(len(files), size=num_uttrs, replace=False)
    embs = []
    candidates = np.delete(np.arange(len(files)), idx)
    for i in idx:
        mel = np.load(os.path.join(mel_dir, speaker, files[i]))
        while mel.shape[0] < len_crop and len(candidates):
            alt = int(rng.choice(candidates))
            candidates = np.delete(candidates, np.argwhere(candidates == alt))
            mel = np.load(os.path.join(mel_dir, speaker, files[alt]))
        if mel.shape[0] < len_crop:
            # every candidate exhausted and still short (all clips < ~2 s):
            # zero-pad to the crop like the training dataset does rather than
            # aborting the whole corpus on rng.integers(high <= 0)
            mel = np.pad(mel, ((0, len_crop - mel.shape[0]), (0, 0)))
        left = int(rng.integers(0, mel.shape[0] - len_crop + 1))
        crop = mel[None, left : left + len_crop].astype(np.float32)
        embs.append(np.asarray(apply_fn(jnp.asarray(crop)))[0])
    return np.mean(embs, axis=0).astype(np.float32)


def one_hot_embeddings(speakers: list[str], dim: int | None = None) -> dict[str, np.ndarray]:
    """Legacy one-hot speaker encoding (old code/make_metadata_old.py:68-72)."""
    dim = dim or len(speakers)
    out = {}
    for i, s in enumerate(sorted(speakers)):
        v = np.zeros(dim, np.float32)
        v[i] = 1.0
        out[s] = v
    return out


def build_train_manifest(
    feature_dir: str,
    embeddings: dict[str, np.ndarray],
) -> list[SpeakerEntry]:
    """train.pkl rows: [speaker, emb, relpaths...] (make_metadata.py:58-89)."""
    entries = []
    for speaker in sorted(os.listdir(feature_dir)):
        spk_dir = os.path.join(feature_dir, speaker)
        if not os.path.isdir(spk_dir) or speaker not in embeddings:
            continue
        files = sorted(f for f in os.listdir(spk_dir) if f.endswith(".npy"))
        entries.append(
            SpeakerEntry(
                speaker_id=speaker,
                embedding=embeddings[speaker],
                utterances=[os.path.join(speaker, f) for f in files],
            )
        )
    return entries


def build_conversion_metadata(
    feature_dir: str,
    embeddings: dict[str, np.ndarray],
    subject_conversions: list[tuple[tuple[str, str], str]],
    txt_dir: str | None = None,
    speaker_info: "object | None" = None,
    log_path: str | None = None,
) -> list[ConversionSpec]:
    """metadata.pkl + human-readable metadata.log (make_metadata.py:100-133).

    subject_conversions: [((src_speaker, sentence), trg_speaker), ...]
    """
    specs = []
    log_lines = []
    for i, ((src, sent), trg) in enumerate(subject_conversions):
        # prefer the _mic2 variant like the reference's try/except
        for suffix in ("_mic2", ""):
            p = os.path.join(feature_dir, src, f"{src}_{sent}{suffix}.npy")
            if os.path.exists(p):
                feats = np.load(p)
                break
        else:
            raise FileNotFoundError(f"features for {src}_{sent} under {feature_dir}")

        log_lines.append(f"CONVERSION FILENAME: {i} " + "#" * 40 + "\n")
        if txt_dir:
            tp = os.path.join(txt_dir, src, f"{src}_{sent}.txt")
            if os.path.exists(tp):
                with open(tp) as fh:
                    sentence = '"' + fh.readline().rstrip("\n").rstrip() + '"'
                log_lines.append(f"Converting from sentence no. {sent} : {sentence}")
        if speaker_info is not None:
            for label, spk in (("Uttered by the speaker:", src), ("To the speaker:", trg)):
                log_lines.append(label)
                log_lines.append(
                    speaker_info[speaker_info["ID"] == spk].to_string(index=False)
                )
        log_lines.append("")

        specs.append(
            ConversionSpec(
                conversion_id=i,
                src_name=f"{src}_{sent}",
                src_embedding=embeddings[src],
                src_features=feats,
                trg_speaker=trg,
                trg_embedding=embeddings[trg],
                src_speaker=src,
            )
        )
    if log_path:
        with open(log_path, "w") as fh:
            fh.write("\n".join(log_lines))
    return specs
