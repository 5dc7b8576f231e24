"""In-RAM utterance dataset + batch iterator (reference data_loader.py).

Sampling semantics preserved exactly:
- dataset "length" is the number of speakers (data_loader.py:83-85)
- an epoch is a shuffled pass over speakers, batched with drop_last
  (data_loader.py:96-101)
- each sample draws a random utterance of that speaker and a random
  len_crop-frame crop, zero-padded on the right when short
  (data_loader.py:61-80)

TPU-first differences:
- features load into RAM with a thread pool (numpy .npy reads release the
  GIL) instead of fork+Manager processes (data_loader.py:26-36)
- the iterator emits fixed-shape numpy batches ready for jax.device_put, and
  supports per-host sharding for multi-host data parallelism: host h of H
  takes batch rows [h*B/H, (h+1)*B/H) of the same deterministic stream.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from autovc_tpu.data.manifest import SpeakerEntry, load_train_manifest


class UtteranceDataset:
    def __init__(
        self,
        root_dir: str,
        manifest: str | list[SpeakerEntry] = "train.pkl",
        use_native: bool | None = None,
    ):
        if isinstance(manifest, str):
            manifest = load_train_manifest(os.path.join(root_dir, manifest))
        self.entries = manifest
        self.root_dir = root_dir

        if use_native is None:
            from autovc_tpu.runtime import native_available

            use_native = native_available()

        if use_native:
            # C++ threaded load; features become zero-copy views into the store
            from autovc_tpu.runtime import FeatureStore

            self._store = FeatureStore()
            all_paths = [
                os.path.join(root_dir, p) for e in manifest for p in e.utterances
            ]
            ids = self._store.load_npy_batch(all_paths)
            assert (ids >= 0).all(), "native .npy load failed"
            self.features = []
            k = 0
            for e in manifest:
                self.features.append(
                    [self._store.view(int(ids[k + j])) for j in range(len(e.utterances))]
                )
                k += len(e.utterances)
        else:

            def _load(entry: SpeakerEntry):
                return [np.load(os.path.join(root_dir, p)) for p in entry.utterances]

            with ThreadPoolExecutor(max_workers=min(16, max(1, len(manifest)))) as pool:
                self.features = list(pool.map(_load, manifest))

    @property
    def num_speakers(self) -> int:
        return len(self.entries)

    @property
    def feature_dim(self) -> int:
        return self.features[0][0].shape[-1]

    def embedding(self, speaker_index: int) -> np.ndarray:
        return self.entries[speaker_index].embedding

    def sample(self, speaker_index: int, len_crop: int, rng: np.random.Generator):
        """Random utterance + random crop for one speaker
        (data_loader.py:61-80)."""
        utts = self.features[speaker_index]
        u = utts[int(rng.integers(0, len(utts)))]
        t = u.shape[0]
        if t < len_crop:
            out = np.zeros((len_crop,) + u.shape[1:], u.dtype)
            out[:t] = u
            return out
        if t > len_crop:
            left = int(rng.integers(0, t - len_crop))
            return u[left : left + len_crop]
        return u


class BatchIterator:
    """Infinite deterministic batch stream.

    Yields (x (B, len_crop, F), emb (B, dim_emb)) numpy float32 batches.
    `host_index`/`host_count` shard each global batch across hosts; every host
    draws from the same seeded stream so shards are consistent without
    communication (the standard per-host input pipeline for multi-host TPU).
    """

    def __init__(
        self,
        dataset: UtteranceDataset,
        batch_size: int,
        len_crop: int,
        seed: int = 0,
        host_index: int = 0,
        host_count: int = 1,
    ):
        assert batch_size % host_count == 0
        if batch_size > dataset.num_speakers:
            raise ValueError(
                f"batch_size {batch_size} > num_speakers {dataset.num_speakers} "
                "(an epoch samples distinct speakers, reference data_loader.py:83-101)"
            )
        self.ds = dataset
        self.batch_size = batch_size
        self.len_crop = len_crop
        self.rng = np.random.default_rng(seed)
        self.host_index = host_index
        self.host_count = host_count
        self._epoch_order: list[int] = []

    def _next_speakers(self) -> list[int]:
        while len(self._epoch_order) < self.batch_size:
            # new epoch: shuffled speakers; leftover partial batch dropped
            # (drop_last=True, data_loader.py:100)
            self._epoch_order = list(self.rng.permutation(self.ds.num_speakers))
        out = self._epoch_order[: self.batch_size]
        self._epoch_order = self._epoch_order[self.batch_size :]
        if len(self._epoch_order) < self.batch_size:
            self._epoch_order = []
        return out

    def __iter__(self):
        return self

    def __next__(self):
        speakers = self._next_speakers()
        xs, embs = [], []
        lo = self.host_index * (self.batch_size // self.host_count)
        hi = lo + self.batch_size // self.host_count
        for pos, s in enumerate(speakers):
            x = self.ds.sample(s, self.len_crop, self.rng)  # draw for stream parity
            if lo <= pos < hi:
                xs.append(x)
                embs.append(self.ds.embedding(s))
        x = np.stack(xs).astype(np.float32)
        if x.ndim == 2:  # wav features stored (L,) -> (B, L, 1)
            x = x[..., None]
        return x, np.stack(embs).astype(np.float32)
