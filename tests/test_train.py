"""Training engine tests: loss parity with the reference formulas, smoke
training on the bundled corpus, checkpoint/resume, EMA, schedules, and
multi-device data parallelism on the virtual CPU mesh."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autovc_tpu.config import Config, ModelConfig, TrainConfig
from autovc_tpu.data import BatchIterator, UtteranceDataset
from autovc_tpu.parallel import make_mesh
from autovc_tpu.train import Solver, cosine_annealing, ReduceLROnPlateau
from autovc_tpu.train.state import ema_update


LEN_CROP = 64  # short crop (still a multiple of freq=32) keeps CPU tests fast


def tiny_cfg(tmp_path, *, checkpoint_step=10_000, log_step=2, **train_kw):
    train = TrainConfig(
        batch_size=2, len_crop=LEN_CROP, log_step=log_step,
        checkpoint_step=checkpoint_step, num_iters=10, **train_kw,
    )
    return Config(
        model=ModelConfig(model_type="spmel"),
        train=train,
        main_dir=str(tmp_path),
        run_name="t",
    )


@pytest.fixture(scope="module")
def spmel_iter(reference_dir):
    ds = UtteranceDataset(reference_dir + "/spmel")
    return lambda seed=0: BatchIterator(ds, batch_size=2, len_crop=LEN_CROP, seed=seed)


@pytest.mark.slow
def test_smoke_train_loss_decreases(tmp_path, spmel_iter):
    cfg = tiny_cfg(tmp_path)
    solver = Solver(cfg, spmel_iter(), run_dir=str(tmp_path / "run"))
    solver.train(num_iters=20)
    first, last = solver.history[0], solver.history[-1]
    assert last["g_loss"] < first["g_loss"], f"loss did not decrease: {first} -> {last}"
    # eval-mode loss is finite and computable
    x, emb = next(spmel_iter(seed=99))
    assert np.isfinite(solver.eval_loss(x, emb)["g_loss"])


@pytest.mark.slow
def test_checkpoint_resume_restores_step_and_params(tmp_path, spmel_iter):
    cfg = tiny_cfg(tmp_path, checkpoint_step=5)
    run_dir = str(tmp_path / "run")
    s1 = Solver(cfg, spmel_iter(), run_dir=run_dir)
    s1.train(num_iters=5)
    s1.ckptr.wait_until_finished()
    p_saved = jax.tree_util.tree_leaves(s1.state.params)[0]

    s2 = Solver(cfg, spmel_iter(), run_dir=run_dir)
    assert int(s2.state.step) == 5
    p_restored = jax.tree_util.tree_leaves(s2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p_saved), np.asarray(p_restored))


def test_ema_is_real_average():
    p = {"w": jnp.ones((3,))}
    e = {"w": jnp.zeros((3,))}
    out = ema_update(e, p, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1 * np.ones(3), rtol=1e-6)


def test_cosine_annealing_matches_torch_formula():
    # lr(0)=base, lr(T)=eta_min, lr(T/2)=base/2
    assert float(cosine_annealing(0, 10000)) == pytest.approx(1.0)
    assert float(cosine_annealing(10000, 10000)) == pytest.approx(0.0, abs=1e-6)
    assert float(cosine_annealing(5000, 10000)) == pytest.approx(0.5, rel=1e-5)


def test_plateau_reduces_after_patience():
    pl = ReduceLROnPlateau(factor=0.5, patience=2)
    scale = 1.0
    pl.step(1.0)  # best=1.0
    for _ in range(3):
        scale = pl.step(1.0)  # no improvement
    assert scale == pytest.approx(0.5)


@pytest.mark.slow
def test_wav_variant_trains(tmp_path, reference_dir):
    """End-to-end wav-variant step: synthetic waveform features at the real
    crop length contract (33536 -> latent 128)."""
    from autovc_tpu.config import AudioConfig, wav_len_crop

    L = wav_len_crop(AudioConfig())  # 33536
    rng = np.random.default_rng(0)

    class FakeIter:
        def __iter__(self):
            return self

        def __next__(self):
            return (
                rng.normal(size=(2, L, 1)).astype(np.float32),
                rng.normal(size=(2, 256)).astype(np.float32),
            )

    cfg = Config(
        model=ModelConfig(model_type="wav", convtas_depth=1),
        train=TrainConfig(batch_size=2, len_crop=L, log_step=100, checkpoint_step=100),
        main_dir=str(tmp_path),
        run_name="w",
    )
    solver = Solver(cfg, FakeIter(), run_dir=str(tmp_path / "runw"))
    m = None
    state0 = jax.tree_util.tree_leaves(solver.state.params)[0].copy()
    solver.train(num_iters=2)
    assert int(solver.state.step) == 2
    state1 = jax.tree_util.tree_leaves(solver.state.params)[0]
    assert not np.allclose(np.asarray(state0), np.asarray(state1))


def _max_param_diff(pa, pb) -> float:
    """Max-abs difference over EVERY leaf of two param trees (a wrong sharding
    rule anywhere in the tree must fail the comparison, not just leaf 0)."""
    la = jax.tree_util.tree_leaves(pa)
    lb = jax.tree_util.tree_leaves(pb)
    assert len(la) == len(lb)
    return max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) for a, b in zip(la, lb)
    )


def _run_mesh(tmp_path, name, batch_iter, data, model, num_iters=3, batch_size=2):
    cfg = tiny_cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=batch_size)
    )
    mesh = make_mesh(data=data, model=model, devices=jax.devices()[: data * model])
    s = Solver(cfg, batch_iter, run_dir=str(tmp_path / name), mesh=mesh)
    s.train(num_iters=num_iters)
    return s.state.params


class _SyntheticIter:
    """Deterministic (B, T, 80)/(B, 256) stream (batch 8 exceeds the
    7-speaker reference iterator's per-epoch distinct-speaker contract)."""

    def __init__(self, batch_size, seed=0):
        self.b = batch_size
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        return self

    def __next__(self):
        x = self.rng.random((self.b, LEN_CROP, 80)).astype(np.float32)
        emb = self.rng.standard_normal((self.b, 256)).astype(np.float32)
        return x, emb


@pytest.mark.slow
def test_data_parallel_8wide_matches_single_device(tmp_path):
    """DP over the full 8-device CPU mesh computes the same params as 1
    device (identical global batch stream; XLA's psum gradient all-reduce
    must equal the dense sum)."""
    p1 = _run_mesh(tmp_path, "dp1", _SyntheticIter(8), data=1, model=1, batch_size=8)
    p8 = _run_mesh(tmp_path, "dp8", _SyntheticIter(8), data=8, model=1, batch_size=8)
    assert _max_param_diff(p1, p8) < 1e-3


@pytest.mark.slow
def test_tensor_parallel_matches_single_device(tmp_path, spmel_iter):
    """TP=2 (params sharded over 'model' by _TP_RULES) must produce the same
    trained params as the dense single-device run — proves the sharding
    rules preserve numerics through 3 full train steps."""
    p1 = _run_mesh(tmp_path, "tp1", spmel_iter(), data=1, model=1)
    p2 = _run_mesh(tmp_path, "tp2", spmel_iter(), data=1, model=2)
    assert _max_param_diff(p1, p2) < 1e-3


@pytest.mark.slow
def test_dp_tp_combined_matches_single_device(tmp_path, spmel_iter):
    """The 2x2 (data x model) mesh — DP batch sharding + TP param sharding
    together — matches the dense run."""
    p1 = _run_mesh(tmp_path, "dt1", spmel_iter(), data=1, model=1)
    p4 = _run_mesh(tmp_path, "dt4", spmel_iter(), data=2, model=2)
    assert _max_param_diff(p1, p4) < 1e-3


def test_loss_formula_matches_reference_composition(spmel_iter):
    """total = id + id_psnt + lambda_cd*cd (solver_encoder.py:243)."""
    from autovc_tpu.train.step import loss_fn
    from autovc_tpu.models import build_generator

    cfg = Config(model=ModelConfig(model_type="spmel"), train=TrainConfig(lambda_cd=2.5))
    model = build_generator(cfg.model)
    x, emb = next(spmel_iter())
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(emb), jnp.asarray(emb))
    total, (m, _) = loss_fn(
        model, cfg, variables["params"], variables.get("batch_stats", {}),
        jnp.asarray(x), jnp.asarray(emb),
    )
    expect = m["g_loss_id"] + m["g_loss_id_psnt"] + 2.5 * m["g_loss_cd"]
    assert float(total) == pytest.approx(float(expect), rel=1e-6)


def test_speaker_consistency_auxiliary(spmel_iter):
    """lambda_spk adds a frozen-d-vector cosine term on within-batch
    cross-conversions: metric present and finite, total composes, gradients
    flow into the generator, and lambda_spk=0 reproduces the reference
    objective exactly."""
    from autovc_tpu.models import build_generator
    from autovc_tpu.models.dvector import DVector
    from autovc_tpu.train.step import loss_fn

    cfg0 = Config(model=ModelConfig(model_type="spmel"), train=TrainConfig())
    cfg1 = Config(
        model=ModelConfig(model_type="spmel"),
        train=TrainConfig(lambda_spk=0.5, spk_ckpt="unused-here"),
    )
    model = build_generator(cfg0.model)
    x, emb = next(spmel_iter())
    x, emb = jnp.asarray(x), jnp.asarray(emb)
    variables = model.init(jax.random.PRNGKey(0), x, emb, emb)
    dvec = DVector()
    dvec_params = dvec.init(jax.random.PRNGKey(1), x)["params"]
    params, stats = variables["params"], variables.get("batch_stats", {})

    total0, (m0, _) = loss_fn(model, cfg0, params, stats, x, emb)
    total1, (m1, _) = loss_fn(
        model, cfg1, params, stats, x, emb, spk=(dvec, dvec_params)
    )
    assert "g_loss_spk" not in m0
    assert np.isfinite(float(m1["g_loss_spk"]))
    assert 0.0 <= float(m1["g_loss_spk"]) <= 2.0  # 1 - cos in [0, 2]
    assert float(total1) == pytest.approx(
        float(total0) + 0.5 * float(m1["g_loss_spk"]), rel=1e-5
    )
    # gradient flows through the conversion into the generator
    g = jax.grad(
        lambda p: cfg1.train.lambda_spk
        * loss_fn(model, cfg1, p, stats, x, emb, spk=(dvec, dvec_params))[1][0][
            "g_loss_spk"
        ]
    )(params)
    gnorm = float(
        jnp.sqrt(
            sum(jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(g))
        )
    )
    assert gnorm > 0.0, "speaker-consistency loss produced zero gradients"


def test_windowed_embed_matches_eval_protocol():
    """train.step.windowed_embed is a jit-traceable twin of
    eval.SpeakerEmbedder.embed (128-frame windows, stride 64, tail window,
    mean-then-normalize) — lambda_spk v2 optimizes exactly the quantity
    cli.evaluate_conversion measures."""
    from autovc_tpu.eval import SpeakerEmbedder
    from autovc_tpu.models.dvector import DVector
    from autovc_tpu.train.step import windowed_embed

    dvec = DVector(dim_cell=64, dim_emb=16)
    params = dvec.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 80)))["params"]
    embedder = SpeakerEmbedder(params, dim_cell=64, dim_emb=16)
    rng = np.random.default_rng(0)
    for t in (300, 256, 128, 100):  # multi-window w/ tail, exact, one, pad
        mel = rng.standard_normal((t, 80)).astype(np.float32)
        e_eval = embedder.embed(mel)
        e_step = np.asarray(windowed_embed(dvec, params, jnp.asarray(mel)[None]))[0]
        np.testing.assert_allclose(e_eval, e_step, atol=2e-5)


def test_speaker_consistency_windowed_protocol(spmel_iter):
    """lambda_spk v2: hinge on the eval's margin criterion against
    eval-protocol centroids, speakers recovered from the conditioning rows.
    Composition holds, the margin metric is reported, gradients flow, and
    same-speaker pairs are masked out (loss exactly 0)."""
    from autovc_tpu.models import build_generator
    from autovc_tpu.models.dvector import DVector
    from autovc_tpu.train.step import SpeakerAux, loss_fn

    cfg0 = Config(model=ModelConfig(model_type="spmel"), train=TrainConfig())
    cfg1 = Config(
        model=ModelConfig(model_type="spmel"),
        train=TrainConfig(lambda_spk=0.1, spk_ckpt="unused-here", spk_margin=0.5),
    )
    assert cfg1.train.spk_protocol == "windowed"  # the default
    model = build_generator(cfg0.model)
    x, _ = next(spmel_iter())
    x = jnp.asarray(x)
    rng = np.random.default_rng(3)
    table = rng.standard_normal((2, 256)).astype(np.float32)
    table /= np.linalg.norm(table, axis=-1, keepdims=True)
    cents = rng.standard_normal((2, 256)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=-1, keepdims=True)
    emb = jnp.asarray(table)  # batch rows ARE the table rows (as in training)
    variables = model.init(jax.random.PRNGKey(0), x, emb, emb)
    params, stats = variables["params"], variables.get("batch_stats", {})
    dvec = DVector()
    dvec_params = dvec.init(jax.random.PRNGKey(1), x)["params"]
    aux = SpeakerAux(dvec, dvec_params, jnp.asarray(table), jnp.asarray(cents))

    total0, (m0, _) = loss_fn(model, cfg0, params, stats, x, emb)
    total1, (m1, _) = loss_fn(model, cfg1, params, stats, x, emb, spk=aux)
    assert np.isfinite(float(m1["g_loss_spk"]))
    assert 0.0 <= float(m1["g_loss_spk"]) <= cfg1.train.spk_margin + 2.0
    assert np.isfinite(float(m1["g_spk_margin"]))
    assert float(total1) == pytest.approx(
        float(total0) + 0.1 * float(m1["g_loss_spk"]), rel=1e-5
    )
    # hinge consistency: loss >= margin_target - measured_margin (hinge of mean)
    assert (
        float(m1["g_loss_spk"])
        >= max(0.0, 0.5 - float(m1["g_spk_margin"])) - 1e-4
    )
    # gradients flow through the conversion into the generator
    g = jax.grad(
        lambda p: loss_fn(model, cfg1, p, stats, x, emb, spk=aux)[1][0][
            "g_loss_spk"
        ]
    )(params)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(g)))
    )
    assert gnorm > 0.0
    # a same-speaker batch (both rows = table row 0) is fully masked
    emb_same = jnp.tile(emb[:1], (2, 1))
    _, (m_same, _) = loss_fn(model, cfg1, params, stats, x, emb_same, spk=aux)
    assert float(m_same["g_loss_spk"]) == 0.0


@pytest.mark.slow
def test_spectrogram_figure_logging(tmp_path, spmel_iter):
    """Reference-style original/reconstructed figure dumps
    (solver_encoder.py:348-412)."""
    cfg = tiny_cfg(tmp_path)
    cfg = Config(model=cfg.model, train=dataclasses.replace(cfg.train, log_spectrograms=True),
                 main_dir=cfg.main_dir, run_name=cfg.run_name)
    solver = Solver(cfg, spmel_iter(), run_dir=str(tmp_path / "figrun"))
    solver.train(num_iters=2)
    figs = list((tmp_path / "figrun" / "figures").glob("*.png"))
    assert figs, "no spectrogram figures written"


def test_step_timer_summary():
    from autovc_tpu.train.profiler import StepTimer
    import time as _t

    st = StepTimer(skip_first=1)
    for _ in range(5):
        st.tick()
        _t.sleep(0.01)
    s = st.summary()
    assert s["steps_per_sec"] > 0
    assert s["step_ms_p50"] >= 5


@pytest.mark.slow
def test_bf16_compute_path_trains(tmp_path, spmel_iter):
    """bfloat16 compute (params f32) runs and produces finite f32 losses."""
    cfg = Config(
        model=ModelConfig(model_type="spmel", compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=2, len_crop=LEN_CROP, log_step=1,
                          checkpoint_step=10_000),
        main_dir=str(tmp_path), run_name="bf16",
    )
    solver = Solver(cfg, spmel_iter(), run_dir=str(tmp_path / "bf16"))
    solver.train(num_iters=2)
    assert np.isfinite(solver.history[-1]["g_loss"])
    # params stayed float32
    leaf = jax.tree_util.tree_leaves(solver.state.params)[0]
    assert leaf.dtype == jnp.float32


def test_prefetcher_preserves_stream(tmp_path, spmel_iter):
    from autovc_tpu.data.prefetch import DevicePrefetcher
    from autovc_tpu.parallel import make_mesh, batch_sharding

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    it_a, it_b = spmel_iter(seed=5), spmel_iter(seed=5)
    pf = DevicePrefetcher(it_a, batch_sharding(mesh))
    for _ in range(4):
        xa, ea = next(pf)
        xb, eb = next(it_b)
        np.testing.assert_array_equal(np.asarray(xa), xb)
        np.testing.assert_array_equal(np.asarray(ea), eb)
    pf.close()


@pytest.mark.slow
def test_transient_data_errors_are_retried(tmp_path, spmel_iter):
    good = spmel_iter()

    class FlakyIter:
        def __init__(self):
            self.n = 0

        def __iter__(self):
            return self

        def __next__(self):
            self.n += 1
            if self.n in (2, 4):
                raise OSError("transient read failure")
            return next(good)

    cfg = tiny_cfg(tmp_path)
    solver = Solver(cfg, spmel_iter(), run_dir=str(tmp_path / "flaky"))
    solver.data_iter = FlakyIter()
    solver.train(num_iters=3, prefetch=0)
    assert int(solver.state.step) == 3


def test_prefetcher_forwards_errors_and_continues(spmel_iter):
    """A transient iterator error surfaces once; subsequent next() calls
    keep delivering fresh batches (no permanent worker death)."""
    from autovc_tpu.data.prefetch import DevicePrefetcher
    from autovc_tpu.parallel import make_mesh, batch_sharding

    good = spmel_iter(seed=11)

    class Flaky:
        def __init__(self):
            self.n = 0

        def __iter__(self):
            return self

        def __next__(self):
            self.n += 1
            if self.n == 2:
                raise OSError("transient")
            return next(good)

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    pf = DevicePrefetcher(Flaky(), batch_sharding(mesh), depth=1)
    got, errs = 0, 0
    for _ in range(5):
        try:
            next(pf)
            got += 1
        except OSError:
            errs += 1
    assert errs == 1 and got == 4
    pf.close()


def test_prefetcher_signals_end_of_stream(spmel_iter):
    from autovc_tpu.data.prefetch import DevicePrefetcher
    from autovc_tpu.parallel import make_mesh, batch_sharding

    class Finite:
        def __init__(self, inner, n):
            self.inner, self.left = inner, n

        def __iter__(self):
            return self

        def __next__(self):
            if self.left == 0:
                raise StopIteration
            self.left -= 1
            return next(self.inner)

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    pf = DevicePrefetcher(Finite(spmel_iter(seed=12), 3), batch_sharding(mesh))
    out = list(pf)
    assert len(out) == 3
    pf.close()


@pytest.mark.slow
def test_nonfinite_loss_does_not_checkpoint_poisoned_state(tmp_path, spmel_iter):
    """NaN loss aborts WITHOUT writing a checkpoint (the params already
    absorbed the bad update; resume must come from the last good save)."""

    class NaNIter:
        def __iter__(self):
            return self

        def __next__(self):
            x = np.full((2, LEN_CROP, 80), np.nan, np.float32)
            return x, np.zeros((2, 256), np.float32)

    cfg = tiny_cfg(tmp_path, log_step=1)
    solver = Solver(cfg, spmel_iter(), run_dir=str(tmp_path / "nan2"))
    solver.data_iter = NaNIter()
    with pytest.raises(FloatingPointError):
        solver.train(num_iters=3, prefetch=0)
    solver.ckptr.wait_until_finished()
    assert solver.ckptr.latest_step() is None  # nothing poisoned was saved


def test_short_crop_batches_are_padded():
    from autovc_tpu.vocoder.train_wavenet import crop_batch
    from autovc_tpu.vocoder.train_hifigan import hifigan_crop_batch

    rng = np.random.default_rng(0)
    w = [np.ones(1000, np.float32)]  # shorter than the 2048-sample crop
    m = [np.ones((4, 80), np.float32)]
    x, c = crop_batch(w, m, batch_size=2, max_time=2048, hop=256, rng=rng)
    assert x.shape == (2, 2048, 1) and c.shape == (2, 8, 80)
    mm, yy = hifigan_crop_batch(w, m, 2, frames=8, hop=256, rng=rng)
    assert mm.shape == (2, 8, 80) and yy.shape == (2, 2048)


def test_filtfilt_rejects_short_input():
    from autovc_tpu.dsp import butter_highpass, butter_highpass_sos, filtfilt, sos_filtfilt

    b, a = butter_highpass()
    with pytest.raises(ValueError):
        filtfilt(b, a, jnp.zeros(10))
    with pytest.raises(ValueError):
        sos_filtfilt(butter_highpass_sos(), jnp.zeros(10))


@pytest.mark.slow
def test_watch_histograms_logged(tmp_path, spmel_iter):
    """cfg.train.watch_step drives the wandb.watch-equivalent observer:
    param AND grad histograms land in the JSONL stream (train/watch.py)."""
    import json

    cfg = tiny_cfg(tmp_path, watch_step=2)
    solver = Solver(cfg, spmel_iter(), run_dir=str(tmp_path / "watch"))
    solver.train(num_iters=2)
    recs = [json.loads(l) for l in open(solver.metrics.path)]
    hists = [r for r in recs if "histograms" in r]
    assert hists, "no histogram records written"
    names = set(hists[-1]["histograms"])
    assert any(n.startswith("param/") for n in names)
    assert any(n.startswith("grad/") for n in names)
    one = next(iter(hists[-1]["histograms"].values()))
    assert sum(one["counts"]) > 0 and np.isfinite(one["rms"])


def test_periodic_saves_skip_while_previous_in_flight(tmp_path, spmel_iter):
    """Through a tunnel-attached TPU an orbax save can take 80-98 s wall;
    periodic saves must SKIP (not block the train loop) while the previous
    background save is still running, final saves (wait=True) must block,
    and a failed background save must fail fast at the next save point."""
    import threading
    import time

    cfg = tiny_cfg(tmp_path)
    solver = Solver(cfg, spmel_iter(), run_dir=str(tmp_path / "skip"))
    calls = []
    gate = threading.Event()

    def slow_save(step, state):
        calls.append(step)
        gate.wait(10.0)

    solver._orbax_save = slow_save
    solver.save(1)  # starts the background save (blocked on gate)
    t0 = time.time()
    solver.save(2)  # previous in flight: skipped, returns immediately
    assert time.time() - t0 < 1.0
    assert solver._saves_skipped == 1
    gate.set()
    solver.save(3, wait=True)  # blocks until the slot frees, then saves
    solver._save_thread.join()
    assert calls == [1, 3]
    assert solver._saves_skipped == 0  # reported and reset on the next save

    # fail-fast: a background save error surfaces at the NEXT save, not at
    # the end of a multi-hour run
    def bad_save(step, state):
        raise RuntimeError("disk full")

    solver._orbax_save = bad_save
    solver.save(4)
    solver._save_thread.join()
    with pytest.raises(RuntimeError, match="disk full"):
        solver.save(5)
