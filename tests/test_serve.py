"""AOT serving bundle: export -> deserialize -> call parity.

The exported program is shape-polymorphic (b, 32*t, n_bins); these tests
verify (a) the serialized artifact reproduces the live model bit-exactly,
(b) one artifact serves multiple batch sizes and lengths, (c) the
pad/strip convention matches the Converter's reference-faithful padding,
and (d) the vocoder-fused bundle returns hop_size-scaled waveforms.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autovc_tpu.config import Config, HiFiGANConfig, ModelConfig
from autovc_tpu.models import build_generator
from autovc_tpu.serve import ServingConverter, export_converter


@pytest.fixture(scope="module")
def generator_setup():
    cfg = Config(model=ModelConfig(model_type="spmel"))
    model = build_generator(cfg.model)
    x = jnp.zeros((1, 128, cfg.model.n_bins))
    emb = jnp.zeros((1, cfg.model.dim_emb))
    variables = model.init(jax.random.PRNGKey(0), x, emb, emb, train=False)
    return cfg, model, dict(variables)


def test_export_roundtrip_parity(tmp_path, generator_setup):
    cfg, model, variables = generator_setup
    bundle = export_converter(variables, cfg, str(tmp_path / "bundle"), platforms=("cpu",))
    srv = ServingConverter(bundle)

    rng = np.random.RandomState(1)
    x = rng.rand(2, 96, 80).astype(np.float32)
    eo = rng.rand(2, 256).astype(np.float32)
    et = rng.rand(2, 256).astype(np.float32)

    got = np.asarray(srv(x, eo, et))
    _, want, _ = model.apply(variables, jnp.asarray(x), jnp.asarray(eo),
                             jnp.asarray(et), train=False)
    np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=1e-6)


def test_polymorphic_shapes_one_artifact(tmp_path, generator_setup):
    cfg, model, variables = generator_setup
    bundle = export_converter(variables, cfg, str(tmp_path / "bundle"), platforms=("cpu",))
    srv = ServingConverter(bundle)
    for b, t in [(1, 32), (3, 160), (2, 512)]:
        out = np.asarray(srv(np.zeros((b, t, 80), np.float32),
                             np.zeros((b, 256), np.float32),
                             np.zeros((b, 256), np.float32)))
        assert out.shape == (b, t, 80)
        assert np.isfinite(out).all()


def test_non_multiple_of_freq_rejected(tmp_path, generator_setup):
    cfg, model, variables = generator_setup
    bundle = export_converter(variables, cfg, str(tmp_path / "bundle"), platforms=("cpu",))
    srv = ServingConverter(bundle)
    with pytest.raises(Exception):
        srv(np.zeros((1, 100, 80), np.float32),
            np.zeros((1, 256), np.float32), np.zeros((1, 256), np.float32))


def test_convert_pads_and_strips_like_reference(tmp_path, generator_setup):
    cfg, model, variables = generator_setup
    bundle = export_converter(variables, cfg, str(tmp_path / "bundle"), platforms=("cpu",))
    srv = ServingConverter(bundle)
    feats = np.random.RandomState(2).rand(100, 80).astype(np.float32)
    emb = np.zeros((256,), np.float32)
    out = srv.convert(feats, emb, emb)
    assert out.shape == feats.shape
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_vocoder_fused_bundle(tmp_path, generator_setup):
    cfg, model, variables = generator_setup
    hcfg = HiFiGANConfig()
    from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

    voc = HiFiGANVocoder(hcfg)  # random init is fine: shapes drive the test
    bundle = export_converter(
        variables, cfg, str(tmp_path / "bundle_voc"),
        hifigan_params=dict(voc.params), platforms=("cpu",),
    )
    srv = ServingConverter(bundle)
    feats = np.random.RandomState(3).rand(50, 80).astype(np.float32)
    emb = np.zeros((256,), np.float32)
    wav = srv.convert(feats, emb, emb)
    assert wav.shape == (50 * cfg.audio.hop_length,)
    assert np.isfinite(wav).all()
