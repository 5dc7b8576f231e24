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


@pytest.mark.slow
def test_hybrid_vocoder_bundle_matches_live_hybrid(tmp_path, generator_setup):
    """gl_iters export == Converter + HybridVocoder staging (fusion-level
    tolerance: one exported program vs three jit programs reorders f32
    FFT/matmul reductions; measured ~1e-4 on real weights)."""
    cfg, model, variables = generator_setup
    from autovc_tpu.vocoder.hifigan import HiFiGANVocoder
    from autovc_tpu.vocoder.hybrid import HybridVocoder

    voc = HiFiGANVocoder(HiFiGANConfig())
    bundle = export_converter(
        variables, cfg, str(tmp_path / "bundle_hybrid"),
        hifigan_params=dict(voc.params), platforms=("cpu",), gl_iters=2,
    )
    srv = ServingConverter(bundle)
    assert srv.manifest["vocoder_mode"] == "hybrid"
    assert srv.manifest["gl_iters"] == 2

    feats = np.random.RandomState(5).rand(96, 80).astype(np.float32)
    emb = np.zeros((256,), np.float32)
    wav = srv.convert(feats, emb, emb)

    conv = Converter(model, variables["params"], variables.get("batch_stats", {}), cfg)
    mel = conv.convert(ConversionSpec(0, "t", emb, feats, "t", emb))
    hyb = HybridVocoder(voc, cfg.audio, n_iter=2)
    want = np.asarray(hyb.generate(np.asarray(mel)))
    assert wav.shape == want.shape
    np.testing.assert_allclose(wav, want, rtol=0, atol=5e-4)


def test_microbatcher_matches_solo_bucketed_calls(bundle):
    """A batched row == the same request run solo at the same bucket padding,
    for mixed lengths landing in different buckets."""
    import threading

    from autovc_tpu.cli.serve import MicroBatcher
    from autovc_tpu.convert import bucket_length

    srv = ServingConverter(bundle)
    # generous window: the 1-core CI host schedules threads slowly
    batcher = MicroBatcher(srv, window_s=1.0, max_batch=8, bucket=128)
    try:
        rng = np.random.RandomState(7)
        reqs = [
            (rng.rand(t, 80).astype(np.float32),
             rng.rand(256).astype(np.float32),
             rng.rand(256).astype(np.float32))
            for t in (100, 128, 97, 300)
        ]
        results = [None] * len(reqs)
        threads = [
            threading.Thread(
                target=lambda i=i, r=r: results.__setitem__(
                    i, batcher.convert(*r)
                )
            )
            for i, r in enumerate(reqs)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        # the window batched the concurrent requests (grouped by bucket)
        assert max(batcher.batch_sizes) >= 2

        for (feats, eo, et), got in zip(reqs, results):
            tb = bucket_length(feats.shape[0], srv.manifest["freq"], 128)
            x = np.pad(feats, ((0, tb - feats.shape[0]), (0, 0)))
            want = np.asarray(srv(x[None], eo[None], et[None]))[0, : feats.shape[0]]
            assert got.shape == feats.shape
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    finally:
        batcher.close()


def test_microbatcher_error_isolated_to_group(bundle):
    """A failing group fails its requests with the error; the dispatcher
    keeps serving later requests."""
    from autovc_tpu.cli.serve import MicroBatcher

    srv = ServingConverter(bundle)
    batcher = MicroBatcher(srv, window_s=0.0, max_batch=4, bucket=128)
    try:
        bad = np.zeros((64, 80), np.float32)
        with pytest.raises(Exception):
            # wrong embedding rank -> stack/call fails inside the group
            batcher.convert(bad, np.zeros((2, 256), np.float32),
                            np.zeros((256,), np.float32))
        ok = batcher.convert(bad, np.zeros((256,), np.float32),
                             np.zeros((256,), np.float32))
        assert ok.shape == (64, 80)
    finally:
        batcher.close()


def test_http_server_batched_roundtrip(bundle):
    """Concurrent HTTP /convert requests through a MicroBatcher come back
    correct per request."""
    import io
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from autovc_tpu.cli.serve import MicroBatcher, make_handler

    srv = ServingConverter(bundle)
    batcher = MicroBatcher(srv, window_s=0.1, max_batch=8, bucket=128)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(srv, threading.Lock(), batcher)
    )
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        rng = np.random.RandomState(11)
        reqs = [(rng.rand(t, 80).astype(np.float32),
                 rng.rand(256).astype(np.float32),
                 rng.rand(256).astype(np.float32)) for t in (90, 90, 200)]
        outs = [None] * len(reqs)

        def post(i):
            feats, eo, et = reqs[i]
            buf = io.BytesIO()
            np.savez(buf, features=feats, emb_org=eo, emb_trg=et)
            resp = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/convert", data=buf.getvalue()
            )
            outs[i] = np.load(io.BytesIO(resp.read()))

        threads = [threading.Thread(target=post, args=(i,)) for i in range(len(reqs))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        for (feats, eo, et), got in zip(reqs, outs):
            want = batcher.convert(feats, eo, et)
            assert got.shape == feats.shape
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


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
