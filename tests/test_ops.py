"""Pallas kernel tests (interpret mode on CPU; same code compiles to Mosaic
on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autovc_tpu.ops import lstm_sequence, mel_normalize


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_lstm_matches_scan(reverse):
    """The pallas sequence kernel == layers.LSTM's lax.scan recurrence."""
    from autovc_tpu.models.layers import _lstm_scan

    rng = np.random.RandomState(0)
    b, t, h = 8, 40, 128
    xproj = jnp.asarray(rng.randn(b, t, 4 * h) * 0.3, jnp.float32)
    w_hh = jnp.asarray(rng.randn(h, 4 * h) * 0.2, jnp.float32)

    ref = _lstm_scan(
        xproj, w_hh, jnp.zeros((b, h)), jnp.zeros((b, h)), reverse=reverse
    )
    out = lstm_sequence(xproj, w_hh, reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_lstm_odd_batch_padding():
    """Batch sizes below the sublane tile still work (padding by caller)."""
    from autovc_tpu.models.layers import _lstm_scan

    rng = np.random.RandomState(1)
    b, t, h = 2, 10, 32
    # pad batch to 8 as the integration layer would
    xproj = jnp.asarray(rng.randn(8, t, 4 * h) * 0.3, jnp.float32)
    w_hh = jnp.asarray(rng.randn(h, 4 * h) * 0.2, jnp.float32)
    ref = _lstm_scan(xproj, w_hh, jnp.zeros((8, h)), jnp.zeros((8, h)), False)
    out = lstm_sequence(xproj, w_hh, interpret=True)
    np.testing.assert_allclose(np.asarray(out[:b]), np.asarray(ref[:b]), atol=1e-5)


def test_pallas_mel_matches_reference_math(reference_dir):
    """Fused kernel == mel_from_stft_mag + normalize_db on real magnitudes."""
    from autovc_tpu.dsp import mel_filterbank, read_wav, stft_magnitude
    from autovc_tpu.dsp.features import mel_from_stft_mag, normalize_db

    x, _ = read_wav(reference_dir + "/wavs/p225/p225_003.wav")
    mag = stft_magnitude(jnp.asarray(x[:40960], jnp.float32))  # (161, 513)
    basis = jnp.asarray(mel_filterbank())

    ref = normalize_db(mel_from_stft_mag(mag, basis))
    out = mel_normalize(mag, basis, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_layers_lstm_pallas_path_matches_scan_path():
    """LSTM(use_pallas=True) == LSTM(use_pallas=False) with shared params."""
    from autovc_tpu.models.layers import LSTM

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 24, 16), jnp.float32)
    ref_model = LSTM(hidden=32, num_layers=2, bidirectional=True)
    variables = ref_model.init(jax.random.PRNGKey(0), x)
    ref = ref_model.apply(variables, x)
    fast = LSTM(hidden=32, num_layers=2, bidirectional=True, use_pallas=True).apply(
        variables, x
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_generator_pallas_path_matches_default():
    """build_generator(use_pallas_lstm=True) forward == default path."""
    from autovc_tpu.config import ModelConfig
    from autovc_tpu.models import build_generator

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 64, 80), jnp.float32)
    emb = jnp.asarray(rng.randn(1, 256), jnp.float32)

    ref_model = build_generator(ModelConfig())
    variables = ref_model.init(jax.random.PRNGKey(0), x, emb, emb, train=False)
    ref = ref_model.apply(variables, x, emb, emb, train=False)

    fast_model = build_generator(ModelConfig(use_pallas_lstm=True))
    out = fast_model.apply(variables, x, emb, emb, train=False)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pallas_lstm_gate_split_path():
    """Large-H path (gate-split kernel) == scan reference."""
    from autovc_tpu.models.layers import _lstm_scan
    from autovc_tpu.ops.pallas_lstm import _lstm_sequence

    rng = np.random.RandomState(4)
    b, t, h = 8, 20, 64
    xproj = jnp.asarray(rng.randn(b, t, 4 * h) * 0.2, jnp.float32)
    w_hh = jnp.asarray(rng.randn(h, 4 * h) * 0.1, jnp.float32)
    ref = _lstm_scan(xproj, w_hh, jnp.zeros((b, h)), jnp.zeros((b, h)), False)

    # force the split path regardless of size by monkeypatching the chooser
    import autovc_tpu.ops.pallas_lstm as pk

    out, hn, cn = pk._lstm_chunk_split(
        jnp.swapaxes(xproj, 0, 1), w_hh, jnp.zeros((b, h)), jnp.zeros((b, h)), True
    )
    out = jnp.swapaxes(out, 0, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(ref[:, -1]), atol=1e-5)


def test_pallas_lstm_chunked_matches_unchunked():
    from autovc_tpu.ops.pallas_lstm import lstm_sequence

    rng = np.random.RandomState(5)
    xproj = jnp.asarray(rng.randn(8, 50, 4 * 32) * 0.2, jnp.float32)
    w_hh = jnp.asarray(rng.randn(32, 4 * 32) * 0.2, jnp.float32)
    a = lstm_sequence(xproj, w_hh, interpret=True, chunk=16)
    b_ = lstm_sequence(xproj, w_hh, interpret=True, chunk=1000)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)


@pytest.mark.slow
def test_pallas_lstm_gradients_match_scan():
    """Custom-VJP backward == jax.grad through the scan reference, for
    grads w.r.t. x-projections AND the recurrent weights, across chunk
    boundaries (chunk=8 < T)."""
    from autovc_tpu.models.layers import _lstm_scan
    from autovc_tpu.ops.pallas_lstm import _lstm_sequence

    rng = np.random.RandomState(7)
    b, t, h = 8, 20, 32
    xproj = jnp.asarray(rng.randn(b, t, 4 * h) * 0.3, jnp.float32)
    w_hh = jnp.asarray(rng.randn(h, 4 * h) * 0.2, jnp.float32)
    cot = jnp.asarray(rng.randn(b, t, h), jnp.float32)

    def ref_loss(xp, w):
        out = _lstm_scan(xp, w, jnp.zeros((b, h)), jnp.zeros((b, h)), False)
        return jnp.sum(out * cot)

    def pallas_loss(xp, w):
        out = _lstm_sequence(xp, w, reverse=False, interpret=True, chunk=8)
        return jnp.sum(out * cot)

    ref_dx, ref_dw = jax.grad(ref_loss, argnums=(0, 1))(xproj, w_hh)
    out_dx, out_dw = jax.grad(pallas_loss, argnums=(0, 1))(xproj, w_hh)
    np.testing.assert_allclose(np.asarray(out_dx), np.asarray(ref_dx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_dw), np.asarray(ref_dw), atol=2e-4)


@pytest.mark.slow
def test_pallas_lstm_reverse_gradients():
    from autovc_tpu.models.layers import _lstm_scan
    from autovc_tpu.ops.pallas_lstm import _lstm_sequence

    rng = np.random.RandomState(8)
    b, t, h = 8, 12, 16
    xproj = jnp.asarray(rng.randn(b, t, 4 * h) * 0.3, jnp.float32)
    w_hh = jnp.asarray(rng.randn(h, 4 * h) * 0.2, jnp.float32)

    def ref_loss(xp):
        return jnp.sum(
            _lstm_scan(xp, w_hh, jnp.zeros((b, h)), jnp.zeros((b, h)), True) ** 2
        )

    def pallas_loss(xp):
        return jnp.sum(_lstm_sequence(xp, w_hh, reverse=True, interpret=True) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(pallas_loss)(xproj)),
        np.asarray(jax.grad(ref_loss)(xproj)),
        atol=2e-5,
    )


@pytest.mark.slow
def test_layers_lstm_pallas_trainable():
    """The flax LSTM with use_pallas=True produces the same parameter
    gradients as the scan path (the custom VJP makes pallas trainable)."""
    from autovc_tpu.models.layers import LSTM

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 24, 16), jnp.float32)
    ref_model = LSTM(hidden=32, num_layers=2, bidirectional=True)
    variables = ref_model.init(jax.random.PRNGKey(1), x)
    fast_model = LSTM(hidden=32, num_layers=2, bidirectional=True, use_pallas=True)

    def loss(model, p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    g_ref = jax.grad(lambda p: loss(ref_model, p))(variables["params"])
    g_fast = jax.grad(lambda p: loss(fast_model, p))(variables["params"])

    def flat(tree):
        return {
            "/".join(str(p) for p in path): leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    fr, ff = flat(g_ref), flat(g_fast)
    assert fr.keys() == ff.keys()
    for k in fr:
        np.testing.assert_allclose(
            np.asarray(ff[k]), np.asarray(fr[k]), atol=5e-4, err_msg=k
        )


def test_pallas_lstm_bf16_forward_and_grad():
    """bf16 x-projections work through the fused kernel (stores cast to the
    ref dtype) and gradients stay finite."""
    from autovc_tpu.ops.pallas_lstm import _lstm_sequence

    rng = np.random.RandomState(10)
    b, t, h = 8, 10, 16
    xproj = jnp.asarray(rng.randn(b, t, 4 * h) * 0.3, jnp.bfloat16)
    w_hh = jnp.asarray(rng.randn(h, 4 * h) * 0.2, jnp.float32)
    out = _lstm_sequence(xproj, w_hh, interpret=True)
    assert out.dtype == jnp.bfloat16
    g = jax.grad(lambda xp: jnp.sum(_lstm_sequence(xp, w_hh, interpret=True).astype(jnp.float32)))(xproj)
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


@pytest.mark.slow
def test_pallas_split_gradients_match_scan():
    """Gate-split custom VJP == jax.grad through the scan reference (dx AND
    dW), across chunk boundaries. This is the decoder-H=1024 training path;
    tested at small H by calling the split chunk directly."""
    from autovc_tpu.models.layers import _lstm_scan
    from autovc_tpu.ops.pallas_lstm import _lstm_chunk_split

    rng = np.random.RandomState(11)
    b, t, h = 8, 20, 32
    xproj = jnp.asarray(rng.randn(b, t, 4 * h) * 0.3, jnp.float32)
    w_hh = jnp.asarray(rng.randn(h, 4 * h) * 0.2, jnp.float32)
    cot = jnp.asarray(rng.randn(b, t, h), jnp.float32)

    def ref_loss(xp, w):
        out = _lstm_scan(xp, w, jnp.zeros((b, h)), jnp.zeros((b, h)), False)
        return jnp.sum(out * cot)

    def split_loss(xp, w):
        xt = jnp.swapaxes(xp, 0, 1)
        # two chunks exercise the (dhn, dcn) cotangent seam between calls
        o1, h1, c1 = _lstm_chunk_split(xt[:12], w, jnp.zeros((b, h)), jnp.zeros((b, h)), True)
        o2, _, _ = _lstm_chunk_split(xt[12:], w, h1, c1, True)
        out = jnp.swapaxes(jnp.concatenate([o1, o2], axis=0), 0, 1)
        return jnp.sum(out * cot)

    ref_dx, ref_dw = jax.grad(ref_loss, argnums=(0, 1))(xproj, w_hh)
    out_dx, out_dw = jax.grad(split_loss, argnums=(0, 1))(xproj, w_hh)
    np.testing.assert_allclose(np.asarray(out_dx), np.asarray(ref_dx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_dw), np.asarray(ref_dw), atol=2e-4)


@pytest.mark.slow
def test_pallas_split_gradients_h1024():
    """The real decoder size: H=1024 (w_hh 16MB > the 8MB VMEM gate, so
    lstm_sequence auto-routes to the gate-split kernel) trains and matches
    the scan gradients."""
    from autovc_tpu.models.layers import _lstm_scan
    from autovc_tpu.ops.pallas_lstm import _lstm_sequence

    rng = np.random.RandomState(12)
    b, t, h = 4, 6, 1024
    xproj = jnp.asarray(rng.randn(b, t, 4 * h) * 0.1, jnp.float32)
    w_hh = jnp.asarray(rng.randn(h, 4 * h) * 0.02, jnp.float32)

    def ref_loss(xp, w):
        return jnp.sum(
            _lstm_scan(xp, w, jnp.zeros((b, h)), jnp.zeros((b, h)), False) ** 2
        )

    def pallas_loss(xp, w):
        return jnp.sum(_lstm_sequence(xp, w, interpret=True) ** 2)

    assert w_hh.size * 4 > 8 * 1024 * 1024  # really exercises the split path
    ref_dx, ref_dw = jax.grad(ref_loss, argnums=(0, 1))(xproj, w_hh)
    out_dx, out_dw = jax.grad(pallas_loss, argnums=(0, 1))(xproj, w_hh)
    np.testing.assert_allclose(np.asarray(out_dx), np.asarray(ref_dx), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_dw), np.asarray(ref_dw), atol=5e-4)
