"""Manifest file contracts, byte-compatible with the reference.

train.pkl (make_metadata.py:84-89): a pickled list where each row is
    [speaker_id: str, embedding: np.ndarray (256,), relpath1: str, ...]

metadata.pkl (make_metadata.py:125-128): a pickled list where each row is
    [conversion_id: int,
     [src_name: str, src_emb (256,), src_features (T, F)],
     [trg_speaker: str, trg_emb (256,)]]

We read/write these exact structures for interop, while exposing typed
wrappers internally.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass

import numpy as np


@dataclass
class SpeakerEntry:
    speaker_id: str
    embedding: np.ndarray  # (dim_emb,)
    utterances: list[str]  # feature-relative paths


@dataclass
class ConversionSpec:
    conversion_id: int
    src_name: str  # e.g. 'p225_001'
    src_embedding: np.ndarray
    src_features: np.ndarray  # (T, F)
    trg_speaker: str
    trg_embedding: np.ndarray
    # source speaker id when the constructor knows it; consumers fall back to
    # parsing src_name (which mis-handles e.g. VCTK '_mic2' suffixes) only
    # when this is None (reference results pkls don't carry it)
    src_speaker: str | None = None


def load_train_manifest(path: str) -> list[SpeakerEntry]:
    with open(path, "rb") as f:
        raw = pickle.load(f)
    entries = []
    for row in raw:
        entries.append(
            SpeakerEntry(
                speaker_id=row[0],
                embedding=np.asarray(row[1], dtype=np.float32),
                utterances=[str(p) for p in row[2:]],
            )
        )
    return entries


def save_train_manifest(path: str, entries: list[SpeakerEntry]) -> None:
    raw = [[e.speaker_id, np.asarray(e.embedding, np.float32), *e.utterances] for e in entries]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(raw, f)


def load_conversion_metadata(path: str) -> list[ConversionSpec]:
    with open(path, "rb") as f:
        raw = pickle.load(f)
    specs = []
    for row in raw:
        specs.append(
            ConversionSpec(
                conversion_id=int(row[0]),
                src_name=str(row[1][0]),
                src_embedding=np.asarray(row[1][1], np.float32),
                src_features=np.asarray(row[1][2], np.float32),
                trg_speaker=str(row[2][0]),
                trg_embedding=np.asarray(row[2][1], np.float32),
            )
        )
    return specs


def save_conversion_metadata(path: str, specs: list[ConversionSpec]) -> None:
    raw = [
        [
            s.conversion_id,
            [s.src_name, np.asarray(s.src_embedding, np.float32), np.asarray(s.src_features, np.float32)],
            [s.trg_speaker, np.asarray(s.trg_embedding, np.float32)],
        ]
        for s in specs
    ]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(raw, f)


def save_results(path: str, results: list[tuple[str, np.ndarray]]) -> None:
    """results_<id>.pkl contract (conversion.py:117-121): list of (name, mel)."""
    with open(path, "wb") as f:
        pickle.dump(results, f)


def load_results(path: str) -> list[tuple[str, np.ndarray]]:
    with open(path, "rb") as f:
        return pickle.load(f)
