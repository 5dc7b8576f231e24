"""Data pipeline (reference L2: data_loader.py, make_metadata.py contracts)."""

from autovc_tpu.data.manifest import (
    load_train_manifest,
    save_train_manifest,
    load_conversion_metadata,
    save_conversion_metadata,
    SpeakerEntry,
    ConversionSpec,
)
from autovc_tpu.data.dataset import UtteranceDataset, BatchIterator

__all__ = [
    "load_train_manifest",
    "save_train_manifest",
    "load_conversion_metadata",
    "save_conversion_metadata",
    "SpeakerEntry",
    "ConversionSpec",
    "UtteranceDataset",
    "BatchIterator",
]
