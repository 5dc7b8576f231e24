"""Quality-evaluation metrics (autovc_tpu.eval).

The reference verified conversion quality by listening
(reference results/readme.md:1-2); autovc_tpu.eval replaces ears with
numbers. These tests pin the metric implementations on constructed
embeddings where the right answer is known analytically.
"""

import numpy as np
import pytest

from autovc_tpu.eval import (
    SpeakerEmbedder,
    embedding_separation,
    similarity_record,
    speaker_centroids,
    summarize_similarity,
    verification_eer,
)


def _clustered_embeddings(n_spk=4, m=6, d=32, noise=0.05, seed=0):
    rng = np.random.RandomState(seed)
    anchors = rng.standard_normal((n_spk, d))
    anchors /= np.linalg.norm(anchors, axis=-1, keepdims=True)
    es, labels = [], []
    for s in range(n_spk):
        for _ in range(m):
            e = anchors[s] + noise * rng.standard_normal(d)
            es.append(e / np.linalg.norm(e))
            labels.append(s)
    return np.asarray(es, np.float64), np.asarray(labels)


def test_verification_eer_separable_clusters_is_zero():
    es, labels = _clustered_embeddings(noise=0.02)
    eer, thresh = verification_eer(es, labels)
    assert eer == 0.0
    # the threshold actually separates: every same-pair above, diff-pair below
    sims = es @ es.T
    iu = np.triu_indices(len(es), k=1)
    same = (labels[:, None] == labels[None, :])[iu]
    assert sims[iu][same].min() >= thresh >= sims[iu][~same].max()


def test_verification_eer_random_embeddings_near_chance():
    rng = np.random.RandomState(1)
    es = rng.standard_normal((48, 16))
    es /= np.linalg.norm(es, axis=-1, keepdims=True)
    labels = np.repeat(np.arange(8), 6)
    eer, _ = verification_eer(es, labels)
    assert 0.25 < eer < 0.75  # chance is 0.5; loose bounds for a small trial set


def test_verification_eer_requires_both_pair_kinds():
    es, _ = _clustered_embeddings(n_spk=2, m=3)
    with pytest.raises(AssertionError):
        verification_eer(es, np.zeros(len(es), int))  # only same-speaker pairs


def test_embedding_separation_orders_clusters():
    es, labels = _clustered_embeddings(noise=0.05)
    rep = embedding_separation(es, labels)
    assert rep["intra_speaker_cos_mean"] > 0.9
    assert rep["separation"] > 0.5
    assert rep["inter_speaker_cos_mean"] < rep["intra_speaker_cos_mean"]


class _StubEmbedder:
    """Deterministic embedder: mel's first row IS the (unit) embedding."""

    def embed(self, mel):
        v = np.asarray(mel)[0]
        return v / np.linalg.norm(v)


def _unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def test_similarity_record_success_and_margin():
    centroids = {"a": _unit([1, 0, 0]), "b": _unit([0, 1, 0])}
    # converted output embedding close to target b, far from source a
    mel = np.asarray([[0.1, 0.9, 0.0], [0, 0, 0]], np.float64)
    rec = similarity_record(_StubEmbedder(), centroids, mel, src="a", trg="b")
    assert rec["success"] and rec["margin"] > 0
    assert rec["cos_trg"] == pytest.approx(float(_unit(mel[0]) @ centroids["b"]))
    # failed conversion: output still sounds like the source
    mel_bad = np.asarray([[0.95, 0.05, 0.0], [0, 0, 0]], np.float64)
    rec2 = similarity_record(_StubEmbedder(), centroids, mel_bad, src="a", trg="b")
    assert not rec2["success"] and rec2["margin"] < 0


def test_summarize_similarity_excludes_identity_pairs():
    centroids = {"a": _unit([1, 0, 0]), "b": _unit([0, 1, 0])}
    emb = _StubEmbedder()
    recs = [
        similarity_record(emb, centroids, np.asarray([[0.1, 0.9, 0.0]]), "a", "b"),
        similarity_record(emb, centroids, np.asarray([[0.9, 0.1, 0.0]]), "a", "b"),
        similarity_record(emb, centroids, np.asarray([[1.0, 0.0, 0.0]]), "a", "a"),
    ]
    s = summarize_similarity(recs)
    assert s["pairs"] == 2  # identity pair excluded
    assert s["success_rate"] == pytest.approx(0.5)
    assert s["mean_margin"] == pytest.approx(
        np.mean([recs[0]["margin"], recs[1]["margin"]])
    )


def test_speaker_embedder_windows_and_centroids():
    emb = SpeakerEmbedder(
        _tiny_dvector_params(), dim_cell=16, dim_emb=8, len_crop=32, stride=16
    )
    # short utterance: one zero-padded window
    w = emb._windows(np.ones((20, 80), np.float32))
    assert w.shape == (1, 32, 80) and w[0, 20:].sum() == 0
    # long utterance: stride windows + forced tail coverage
    w = emb._windows(np.ones((100, 80), np.float32))
    assert w.shape[0] == 6 and w.shape[1:] == (32, 80)  # 5 stride starts + tail
    e = emb.embed(np.random.RandomState(0).rand(100, 80).astype(np.float32))
    assert e.shape == (8,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-5)

    cents = speaker_centroids(
        emb,
        {
            "s1": [np.random.RandomState(i).rand(64, 80).astype(np.float32) for i in range(2)],
            "s2": [np.random.RandomState(9).rand(40, 80).astype(np.float32)],
        },
    )
    assert set(cents) == {"s1", "s2"}
    for c in cents.values():
        np.testing.assert_allclose(np.linalg.norm(c), 1.0, rtol=1e-5)


def _tiny_dvector_params():
    import jax
    import jax.numpy as jnp

    from autovc_tpu.models.dvector import DVector

    model = DVector(dim_input=80, dim_cell=16, dim_emb=8)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))["params"]


# --- fidelity metrics (eval/fidelity.py) ---


def test_mcd_zero_for_identical_and_invariant_to_c0():
    from autovc_tpu.eval.fidelity import mel_cepstral_distortion

    rng = np.random.RandomState(0)
    mel = rng.rand(50, 80).astype(np.float32)
    assert mel_cepstral_distortion(mel, mel) == 0.0
    # a constant offset across ALL mel bands lives entirely in c0 (excluded):
    assert mel_cepstral_distortion(mel, mel + 0.03) == pytest.approx(0.0, abs=1e-4)
    # a band-dependent (envelope) change registers
    tilt = np.linspace(0, 0.05, 80, dtype=np.float32)[None, :]
    assert mel_cepstral_distortion(mel, mel + tilt) > 0.1


def test_mcd_scales_with_distortion_and_handles_length_mismatch():
    from autovc_tpu.eval.fidelity import mel_cepstral_distortion, mel_fidelity_report

    rng = np.random.RandomState(1)
    mel = rng.rand(40, 80).astype(np.float32)
    small = mel_cepstral_distortion(mel, mel + 0.01 * rng.rand(40, 80))
    big = mel_cepstral_distortion(mel, mel + 0.1 * rng.rand(40, 80))
    assert 0 < small < big
    rep = mel_fidelity_report(mel, np.vstack([mel, mel[:5]]))  # longer hyp
    assert rep["mel_l1"] == 0.0 and rep["mcd_db"] == 0.0


def test_src_speaker_prefers_explicit_field_and_handles_mic_suffix():
    from autovc_tpu.cli.evaluate_conversion import _src_speaker
    from autovc_tpu.data.manifest import ConversionSpec

    emb = np.zeros(4, np.float32)
    feats = np.zeros((8, 80), np.float32)
    explicit = ConversionSpec(0, "p225_001_mic2", emb, feats, "p228", emb,
                              src_speaker="p225")
    assert _src_speaker(explicit) == "p225"
    # legacy specs (reference results pkls) lack the field: parse falls back
    legacy = ConversionSpec(0, "p225_001_mic2", emb, feats, "p228", emb)
    assert _src_speaker(legacy) == "p225"
    plain = ConversionSpec(0, "p225_003", emb, feats, "p228", emb)
    assert _src_speaker(plain) == "p225"


def test_dvector_for_params_infers_dims():
    import jax

    from autovc_tpu.models.dvector import DVector, dvector_for_params

    small = DVector(dim_input=80, dim_cell=64, dim_emb=32, num_layers=2)
    params = small.init(jax.random.PRNGKey(0), np.zeros((1, 16, 80), np.float32))["params"]
    m = dvector_for_params(params)
    assert (m.dim_input, m.dim_cell, m.dim_emb, m.num_layers) == (80, 64, 32, 2)
    # unknown tree -> reference defaults
    d = dvector_for_params({"not": "a dvector"})
    assert (d.dim_cell, d.dim_emb, d.num_layers) == (768, 256, 3)


def test_verification_eer_interpolates_between_steps():
    # construct scores where FAR/FRR cross between two thresholds: the
    # interpolated EER must lie strictly between the two step values
    emb = np.array([[1.0, 0.0], [0.99, 0.14], [0.9, 0.43], [0.0, 1.0],
                    [0.14, 0.99], [0.43, 0.9]], np.float64)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = np.array([0, 0, 0, 1, 1, 1])
    eer, thr = verification_eer(emb, labels)
    assert 0.0 <= eer <= 1.0 and np.isfinite(thr)
