"""Conversion pipeline tests (reference conversion.py semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autovc_tpu.config import Config, ModelConfig
from autovc_tpu.convert import Converter, bucket_length, pad_seq, run_conversions
from autovc_tpu.data.manifest import (
    ConversionSpec,
    load_results,
    load_train_manifest,
)
from autovc_tpu.models import build_generator


def test_pad_seq_matches_reference():
    x = np.zeros((100, 80), np.float32)
    padded, len_pad = pad_seq(x, base=32)
    assert padded.shape == (128, 80) and len_pad == 28
    x = np.zeros((128, 80), np.float32)
    padded, len_pad = pad_seq(x, base=32)
    assert padded.shape == (128, 80) and len_pad == 0


def test_bucket_length():
    assert bucket_length(100) == 256
    assert bucket_length(256) == 256
    assert bucket_length(257) == 512


@pytest.fixture(scope="module")
def converter_and_specs(reference_dir):
    cfg = Config(model=ModelConfig(model_type="spmel"))
    model = build_generator(cfg.model)
    entries = load_train_manifest(reference_dir + "/spmel/train.pkl")
    by_id = {e.speaker_id: e for e in entries}
    src, trg = by_id["p225"], by_id["p228"]
    feats = np.load(reference_dir + "/spmel/p225/" + "p225_003.npy")
    spec = ConversionSpec(0, "p225_003", src.embedding, feats, "p228", trg.embedding)

    x = jnp.zeros((1, 128, 80))
    emb = jnp.zeros((1, 256))
    variables = model.init(jax.random.PRNGKey(0), x, emb, emb, train=False)
    conv = Converter(model, variables["params"], variables.get("batch_stats", {}), cfg)
    return conv, [spec]


def test_conversion_output_shape_strips_padding(converter_and_specs):
    conv, specs = converter_and_specs
    out = conv.convert(specs[0])
    assert out.shape == specs[0].src_features.shape  # (T, 80), pad stripped
    assert np.isfinite(out).all()


def test_run_conversions_results_contract(tmp_path, converter_and_specs):
    conv, specs = converter_and_specs
    path = str(tmp_path / "results_test.pkl")
    results = run_conversions(conv, specs, path)
    loaded = load_results(path)
    assert len(loaded) == 1
    name, mel = loaded[0]
    assert name == "0"
    np.testing.assert_array_equal(mel, results[0][1])


def test_stft_conversion_projects_to_mel(reference_dir):
    cfg = Config(model=ModelConfig(model_type="stft"))
    model = build_generator(cfg.model)
    x = jnp.zeros((1, 128, 513))
    emb = jnp.zeros((1, 256))
    variables = model.init(jax.random.PRNGKey(0), x, emb, emb, train=False)
    conv = Converter(model, variables["params"], variables.get("batch_stats", {}), cfg)
    feats = np.abs(np.random.RandomState(0).randn(100, 513)).astype(np.float32)
    emb_np = np.random.RandomState(1).randn(256).astype(np.float32)
    spec = ConversionSpec(0, "x_1", emb_np, feats, "y", emb_np)
    mel = conv.convert_to_mel(spec)
    assert mel.shape == (100, 80)  # projected via mel basis (conversion.py:102)


def test_griffinlim_vocoder_roundtrip(reference_dir):
    """mel -> waveform via the Griffin-Lim fallback vocoder is finite and of
    the expected length (T*hop)."""
    from autovc_tpu.vocoder import mel_to_waveform

    mel = np.load(reference_dir + "/spmel/p225/p225_003.npy")[:64]
    wav = np.asarray(mel_to_waveform(jnp.asarray(mel), n_iter=8))
    assert wav.shape[0] == (64 - 1) * 256
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() > 1e-5  # produced actual signal


def test_wav_converter_roundtrip(reference_dir):
    """Wav-model conversion (conversion_nina.py parity): waveform in,
    waveform out, mel re-extracted for the vocoder."""
    from autovc_tpu.convert import WavConverter
    from autovc_tpu.config import AudioConfig, wav_len_crop

    cfg = Config(model=ModelConfig(model_type="wav", convtas_depth=1))
    model = build_generator(cfg.model)
    L = wav_len_crop(AudioConfig())
    x0 = jnp.zeros((1, L, 1))
    emb = jnp.zeros((1, 256))
    variables = model.init(jax.random.PRNGKey(0), x0, emb, emb, train=False)
    conv = WavConverter(model, variables["params"], variables.get("batch_stats", {}), cfg)

    rng = np.random.RandomState(0)
    feats = rng.randn(40000, 1).astype(np.float32)  # arbitrary length
    e = rng.randn(256).astype(np.float32)
    from autovc_tpu.data.manifest import ConversionSpec

    spec = ConversionSpec(0, "x_1", e, feats, "y", e)
    wav = conv.convert(spec)
    assert wav.shape[0] == conv.valid_length(40000)
    assert np.isfinite(wav).all()
    mel = conv.convert_to_mel(spec)
    assert mel.shape[1] == 80
    assert np.isfinite(mel).all()


def test_all_pairs_specs(reference_dir):
    from autovc_tpu.convert import all_pairs_specs
    from autovc_tpu.data.manifest import load_train_manifest

    entries = load_train_manifest(reference_dir + "/spmel/train.pkl")
    specs = all_pairs_specs(entries, reference_dir + "/spmel")
    assert len(specs) == 49  # 7 x 7 conversion matrix (conversion_temp.py)
    assert specs[0].src_name.startswith("p001")
    assert {s.trg_speaker for s in specs[:7]} == {e.speaker_id for e in entries}


def test_convert_batch_matches_single(reference_dir, converter_and_specs):
    """Batched conversion == per-spec conversion, across mixed lengths."""
    conv, _ = converter_and_specs
    entries = load_train_manifest(reference_dir + "/spmel/train.pkl")
    by_id = {e.speaker_id: e for e in entries}
    specs = []
    for i, (spk, utt) in enumerate(
        [("p225", "p225_003"), ("p226", "p226_023"), ("p228", "p228_003")]
    ):
        feats = np.load(f"{reference_dir}/spmel/{spk}/{utt}.npy")
        specs.append(
            ConversionSpec(i, utt, by_id[spk].embedding, feats, "p228", by_id["p228"].embedding)
        )
    singles = [conv.convert_to_mel(s) for s in specs]
    batched = conv.convert_batch(specs, batch_size=2)
    for s, b in zip(singles, batched):
        assert s.shape == b.shape
        np.testing.assert_allclose(b, s, atol=2e-5)
