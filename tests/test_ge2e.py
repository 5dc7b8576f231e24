"""GE2E speaker-encoder training tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autovc_tpu.train.ge2e import GE2ETrainer, ge2e_softmax_loss, sample_ge2e_batch


def test_ge2e_loss_prefers_clustered_embeddings():
    rng = np.random.RandomState(0)
    n, m, d = 4, 5, 16
    # clustered: per-speaker direction + small noise
    dirs = rng.randn(n, 1, d)
    clustered = dirs + 0.05 * rng.randn(n, m, d)
    clustered /= np.linalg.norm(clustered, axis=-1, keepdims=True)
    scattered = rng.randn(n, m, d)
    scattered /= np.linalg.norm(scattered, axis=-1, keepdims=True)

    w, b = jnp.asarray(10.0), jnp.asarray(-5.0)
    l_c = float(ge2e_softmax_loss(jnp.asarray(clustered, jnp.float32), w, b))
    l_s = float(ge2e_softmax_loss(jnp.asarray(scattered, jnp.float32), w, b))
    assert l_c < l_s


def test_ge2e_batch_sampler(reference_dir):
    from autovc_tpu.data import UtteranceDataset

    ds = UtteranceDataset(reference_dir + "/spmel")
    rng = np.random.default_rng(0)
    batch = sample_ge2e_batch(ds.features, n_speakers=4, m_utts=3, len_crop=64, rng=rng)
    assert batch.shape == (4, 3, 64, 80)
    assert np.isfinite(batch).all()


def test_ge2e_training_separates_speakers(reference_dir, tmp_path):
    """A tiny DVector trained with GE2E on a fixed batch set learns to
    separate those speakers (loss drops well below ln(N)=ln(4); the
    similarity margin on the trained speakers turns positive)."""
    from autovc_tpu.data import UtteranceDataset
    from autovc_tpu.models.dvector import DVector

    ds = UtteranceDataset(reference_dir + "/spmel")
    rng = np.random.default_rng(1)
    fixed = [sample_ge2e_batch(ds.features, 4, 3, 64, rng) for _ in range(2)]

    trainer = GE2ETrainer(dim_cell=64, dim_emb=16, lr=3e-3)

    def batches():
        i = 0
        while True:
            yield fixed[i % 2]
            i += 1

    def margin(params, batch):
        model = DVector(dim_cell=64, dim_emb=16)
        n, m = batch.shape[:2]
        e = model.apply(
            {"params": params["dvector"]}, jnp.asarray(batch.reshape(n * m, 64, 80))
        )
        e = np.asarray(e).reshape(n, m, -1)
        cent = e.mean(1)
        cent /= np.linalg.norm(cent, axis=-1, keepdims=True)
        sim = np.einsum("nmd,kd->nmk", e, cent)
        own = np.mean([sim[i, :, i].mean() for i in range(n)])
        other = np.mean(
            [sim[i, :, k].mean() for i in range(n) for k in range(n) if k != i]
        )
        return own - other

    m0 = margin(trainer.params, fixed[0])
    trainer.train(batches(), num_iters=60, log_step=20)
    m1 = margin(trainer.params, fixed[0])
    assert trainer.history[-1] < 0.9 * np.log(4), trainer.history
    assert m1 > m0, f"margin did not improve: {m0} -> {m1}"

    trainer.save(str(tmp_path / "ge2e.npz"))
    loaded = GE2ETrainer.load_params(str(tmp_path / "ge2e.npz"))
    assert "dvector" in loaded and "w" in loaded


def test_ce_auxiliary_breaks_symmetry_and_is_not_saved(tmp_path):
    """The speaker-ID cross-entropy head trains alongside GE2E (labels fed
    through sample_ge2e_batch return_labels) and is excluded from the saved
    checkpoint (consumers always load pure DVector params)."""
    rng = np.random.RandomState(3)
    nprng = np.random.default_rng(3)
    # synthetic 6-speaker corpus: per-speaker spectral template + noise
    feats = []
    for s in range(6):
        tpl = rng.rand(1, 80).astype(np.float32)
        feats.append([
            np.clip(tpl + 0.1 * rng.randn(96, 80), 0, 1).astype(np.float32)
            for _ in range(4)
        ])

    trainer = GE2ETrainer(
        dim_cell=32, dim_emb=8, lr=1e-3, seed=0, n_classes=6, ce_weight=1.0
    )
    assert "cls" in trainer.params

    def batches():
        while True:
            yield sample_ge2e_batch(feats, 4, 3, 32, nprng, return_labels=True)

    last = trainer.train(batches(), num_iters=40, log_step=20)
    assert np.isfinite(last)

    trainer.save(str(tmp_path / "ge2e_ce.npz"))
    loaded = GE2ETrainer.load_params(str(tmp_path / "ge2e_ce.npz"))
    assert "cls" not in loaded and "dvector" in loaded and "w" in loaded
