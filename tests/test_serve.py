"""AOT serving bundle: export -> deserialize -> call parity.

The exported conversion program is shape-polymorphic (b, 32*t, n_bins);
these tests verify (a) the serialized artifacts reproduce the live pipeline
bit-exactly on real corpus utterances, (b) one artifact serves multiple
batch sizes and lengths, (c) the pad/strip convention matches the
Converter's reference-faithful padding, and (d) the vocoder program in a
fused bundle matches HiFiGANVocoder.generate on the pad-stripped features
(the live pipeline's staging).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autovc_tpu.config import Config, HiFiGANConfig, ModelConfig
from autovc_tpu.convert import ConversionSpec, Converter, pad_seq
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


@pytest.fixture(scope="module")
def bundle(tmp_path_factory, generator_setup):
    cfg, model, variables = generator_setup
    out = str(tmp_path_factory.mktemp("serve") / "bundle")
    return export_converter(variables, cfg, out, platforms=("cpu",))


def test_real_utterance_parity_vs_live_pipeline(bundle, generator_setup, reference_dir):
    """Serving output == Converter.convert on a real corpus utterance."""
    cfg, model, variables = generator_setup
    srv = ServingConverter(bundle)

    feats = np.load(reference_dir + "/spmel/p225/p225_003.npy")
    rng = np.random.RandomState(1)
    eo = rng.rand(256).astype(np.float32)
    et = rng.rand(256).astype(np.float32)

    got = srv.convert(feats, eo, et)

    conv = Converter(model, variables["params"], variables.get("batch_stats", {}), cfg)
    spec = ConversionSpec(0, "p225_003", eo, feats, "p228", et)
    want = conv.convert(spec)
    assert got.shape == want.shape == feats.shape
    np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=1e-6)


def test_polymorphic_shapes_one_artifact(bundle):
    srv = ServingConverter(bundle)
    for b, t in [(1, 32), (3, 160), (2, 512)]:
        out = np.asarray(srv(np.zeros((b, t, 80), np.float32),
                             np.zeros((b, 256), np.float32),
                             np.zeros((b, 256), np.float32)))
        assert out.shape == (b, t, 80)
        assert np.isfinite(out).all()


def test_non_multiple_of_freq_rejected(bundle):
    srv = ServingConverter(bundle)
    # the 32*t symbolic constraint is the error, not an incidental failure
    with pytest.raises(ValueError, match="remainder"):
        srv(np.zeros((1, 100, 80), np.float32),
            np.zeros((1, 256), np.float32), np.zeros((1, 256), np.float32))


@pytest.mark.slow
def test_vocoder_fused_bundle_matches_live_staging(tmp_path, generator_setup):
    """Fused bundle == Converter.convert (strip pad) + HiFiGANVocoder.generate."""
    cfg, model, variables = generator_setup
    from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

    voc = HiFiGANVocoder(HiFiGANConfig())  # random init: staging drives the test
    bundle = export_converter(
        variables, cfg, str(tmp_path / "bundle_voc"),
        hifigan_params=dict(voc.params), platforms=("cpu",),
    )
    srv = ServingConverter(bundle)

    # T=100 is NOT a freq multiple: exercises the strip-before-vocode staging
    feats = np.random.RandomState(3).rand(100, 80).astype(np.float32)
    emb = np.zeros((256,), np.float32)
    wav = srv.convert(feats, emb, emb)
    assert wav.shape == (100 * cfg.audio.hop_length,)

    conv = Converter(model, variables["params"], variables.get("batch_stats", {}), cfg)
    mel = conv.convert(ConversionSpec(0, "t", emb, feats, "t", emb))
    want = np.asarray(voc.generate(np.asarray(mel)))
    np.testing.assert_allclose(wav, want, rtol=0, atol=1e-5)


def test_http_server_roundtrip(bundle, generator_setup, reference_dir):
    """cli.serve handler: npz request -> npy converted features, errors -> 400."""
    import io
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from autovc_tpu.cli.serve import make_handler

    cfg, model, variables = generator_setup
    srv = ServingConverter(bundle)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv, threading.Lock()))
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{port}"
        assert urllib.request.urlopen(base + "/healthz").read() == b"ok"
        import json as _json

        manifest = _json.loads(urllib.request.urlopen(base + "/manifest").read())
        assert manifest["n_bins"] == 80 and manifest["with_vocoder"] is False

        feats = np.load(reference_dir + "/spmel/p225/p225_003.npy")
        emb = np.zeros((256,), np.float32)
        buf = io.BytesIO()
        np.savez(buf, features=feats, emb_org=emb, emb_trg=emb)
        resp = urllib.request.urlopen(base + "/convert", data=buf.getvalue())
        out = np.load(io.BytesIO(resp.read()))
        want = srv.convert(feats, emb, emb)
        np.testing.assert_allclose(out, want, rtol=0, atol=0)

        # malformed request -> 400 with a reason, server stays up
        bad = io.BytesIO()
        np.savez(bad, features=np.zeros((4, 3), np.float32), emb_org=emb, emb_trg=emb)
        try:
            urllib.request.urlopen(base + "/convert", data=bad.getvalue())
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"features must be" in e.read()
        assert urllib.request.urlopen(base + "/healthz").read() == b"ok"
    finally:
        httpd.shutdown()
        httpd.server_close()
