"""Data pipeline tests against the bundled reference train.pkl + features."""

import numpy as np
import pytest

from autovc_tpu.data import BatchIterator, UtteranceDataset, load_train_manifest


@pytest.fixture(scope="module")
def spmel_dataset(reference_dir):
    return UtteranceDataset(reference_dir + "/spmel")


def test_train_manifest_contract(reference_dir):
    entries = load_train_manifest(reference_dir + "/spmel/train.pkl")
    assert len(entries) == 7
    for e in entries:
        assert e.embedding.shape == (256,)
        assert len(e.utterances) >= 10
        # embeddings are L2-normalized GE2E outputs (averaged, so |v| <= 1)
        assert 0.5 < np.linalg.norm(e.embedding) <= 1.0 + 1e-5


def test_dataset_loads_features(spmel_dataset):
    ds = spmel_dataset
    assert ds.num_speakers == 7
    assert ds.feature_dim == 80
    rng = np.random.default_rng(0)
    x = ds.sample(0, 128, rng)
    assert x.shape == (128, 80)
    assert x.dtype == np.float32


def test_sample_pads_short_utterances(spmel_dataset):
    rng = np.random.default_rng(1)
    x = spmel_dataset.sample(0, 4096, rng)  # longer than any utterance
    assert x.shape == (4096, 80)
    assert (x[-1] == 0).all()  # right-padded with zeros (data_loader.py:70-73)


def test_batch_iterator_shapes_and_determinism(spmel_dataset):
    it1 = BatchIterator(spmel_dataset, batch_size=2, len_crop=128, seed=7)
    it2 = BatchIterator(spmel_dataset, batch_size=2, len_crop=128, seed=7)
    for _ in range(5):
        x1, e1 = next(it1)
        x2, e2 = next(it2)
        assert x1.shape == (2, 128, 80) and e1.shape == (2, 256)
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(e1, e2)


def test_batch_iterator_epoch_has_distinct_speakers(spmel_dataset):
    """An epoch is a permutation of speakers with drop_last — 7 speakers at
    batch 2 -> 3 batches of distinct speakers per epoch."""
    it = BatchIterator(spmel_dataset, batch_size=2, len_crop=128, seed=3)
    embs = [tuple(np.round(e, 5)) for _ in range(3) for e in next(it)[1]]
    assert len(set(embs)) == 6  # 6 distinct speakers across one epoch


def test_host_sharded_iterators_partition_global_batch(spmel_dataset):
    full = BatchIterator(spmel_dataset, batch_size=2, len_crop=128, seed=9)
    h0 = BatchIterator(spmel_dataset, batch_size=2, len_crop=128, seed=9, host_index=0, host_count=2)
    h1 = BatchIterator(spmel_dataset, batch_size=2, len_crop=128, seed=9, host_index=1, host_count=2)
    xf, ef = next(full)
    x0, e0 = next(h0)
    x1, e1 = next(h1)
    np.testing.assert_array_equal(np.concatenate([x0, x1]), xf)
    np.testing.assert_array_equal(np.concatenate([e0, e1]), ef)


def test_batch_size_exceeding_speakers_raises(spmel_dataset):
    with pytest.raises(ValueError):
        BatchIterator(spmel_dataset, batch_size=16, len_crop=128)


def test_embed_speaker_pads_when_all_utterances_short(tmp_path):
    """A speaker whose every clip is shorter than len_crop embeds via
    zero-padding instead of crashing rng.integers(high <= 0)."""
    from autovc_tpu.data.metadata_builder import embed_speaker

    d = tmp_path / "short_spk"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(d / f"u{i}.npy", rng.random((40 + i, 80), np.float32))

    def apply_fn(x):
        # stand-in d-vector head: mean over time -> (B, 4)
        return np.asarray(x).mean(axis=1)[:, :4]

    emb = embed_speaker(apply_fn, str(tmp_path), "short_spk", rng,
                        num_uttrs=3, len_crop=128)
    assert emb.shape == (4,) and np.isfinite(emb).all()
