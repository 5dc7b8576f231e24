"""Vocoder tests.

The load-bearing one: the cached fast-generation scan must produce, at every
step, EXACTLY the logits that the teacher-forced full-sequence forward
produces on the generated waveform — this proves the circular dilation
buffers implement the same causal dilated-conv stack.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autovc_tpu.config import HiFiGANConfig, WaveNetConfig
from autovc_tpu.vocoder.wavenet import (
    WaveNetVocoder,
    _generate_scan,
    apply,
    discretized_mol_loss,
    flatten_params,
    init_params,
    sample_from_mol,
    unflatten_params,
    upsample_conditioning,
)

TINY = WaveNetConfig(
    out_channels=12,  # 4 mixtures
    layers=6,
    stacks=2,
    residual_channels=16,
    gate_channels=16,
    skip_channels=8,
    cin_channels=80,
    upsample_scales=(4, 4, 4, 4),
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(TINY, jax.random.PRNGKey(0))


def test_dilations():
    assert TINY.dilations() == (1, 2, 4, 1, 2, 4)
    full = WaveNetConfig()
    assert full.dilations()[:6] == (1, 2, 4, 8, 16, 32)
    assert len(full.dilations()) == 24


def test_upsample_conditioning_shape(tiny_params):
    c = jnp.asarray(np.random.RandomState(0).rand(2, 10, 80), jnp.float32)
    up = upsample_conditioning(tiny_params, TINY, c)
    assert up.shape == (2, 2560, 80)


def test_teacher_forced_forward_shape(tiny_params):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 512, 1)), jnp.float32)
    c = jnp.asarray(rng.rand(2, 2, 80), jnp.float32)
    logits = apply(tiny_params, TINY, x, c)
    assert logits.shape == (2, 512, TINY.out_channels)


def test_causality(tiny_params):
    """Changing x[t0:] must not affect logits[:t0]."""
    rng = np.random.RandomState(2)
    x1 = rng.uniform(-1, 1, (1, 256, 1)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 128:] = 0.5
    c = jnp.asarray(rng.rand(1, 1, 80), jnp.float32)
    l1 = apply(tiny_params, TINY, jnp.asarray(x1), c)
    l2 = apply(tiny_params, TINY, jnp.asarray(x2), c)
    np.testing.assert_allclose(np.asarray(l1[:, :128]), np.asarray(l2[:, :128]), atol=1e-5)
    assert np.abs(np.asarray(l1[:, 129:]) - np.asarray(l2[:, 129:])).max() > 1e-4


def test_fast_generation_matches_teacher_forced(tiny_params):
    """Scan logits at step t == apply() logits on the generated sequence."""
    rng = np.random.RandomState(3)
    mel = jnp.asarray(rng.rand(1, 2, 80), jnp.float32)  # 512 samples
    length = 2 * 256
    cond = upsample_conditioning(tiny_params, TINY, mel)[:, :length]
    wav, scan_logits = _generate_scan(
        tiny_params, TINY, cond, jax.random.PRNGKey(7), length
    )
    tf_logits = apply(tiny_params, TINY, wav[..., None], mel)
    np.testing.assert_allclose(
        np.asarray(scan_logits), np.asarray(tf_logits), atol=2e-4
    )


def test_generate_interface_and_length(tiny_params):
    voc = WaveNetVocoder(TINY, tiny_params)
    mel = np.random.RandomState(4).rand(3, 80).astype(np.float32)
    wav = voc.generate(mel)
    assert wav.shape == (3 * 256,)  # Tc * hop (synthesis.py:52-55)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_mol_sampling_statistics():
    """With a single sharp mixture, samples concentrate at its mean."""
    k = 4
    logits = np.full((1000, 3 * k), -20.0, np.float32)
    logits[:, 0] = 10.0  # mixture 0 dominates
    logits[:, k] = 0.3  # mean
    logits[:, 2 * k] = -7.0  # log scale (very sharp)
    out = np.asarray(sample_from_mol(jnp.asarray(logits), jax.random.PRNGKey(0), -32.0))
    assert abs(out.mean() - 0.3) < 0.01
    assert out.std() < 0.02


def test_mol_loss_decreases_for_better_fit():
    rng = np.random.RandomState(5)
    target = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 100)), jnp.float32)
    k = 10
    good = np.zeros((2, 100, 3 * k), np.float32)
    good[..., k] = np.asarray(target)  # mixture 0 mean == target
    good[..., 2 * k] = -7.0
    good[..., 0] = 5.0
    bad = np.zeros((2, 100, 3 * k), np.float32)
    l_good = float(discretized_mol_loss(jnp.asarray(good), target))
    l_bad = float(discretized_mol_loss(jnp.asarray(bad), target))
    assert l_good < l_bad


def test_mol_loss_matches_nll_gradient_training(tiny_params):
    """One gradient step on the MoL loss reduces it (the vocoder is
    trainable — a capability the reference outsourced to the external pkg)."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 256, 1)), jnp.float32)
    c = jnp.asarray(rng.rand(1, 1, 80), jnp.float32)

    def loss(p):
        return discretized_mol_loss(apply(p, TINY, x, c), x[..., 0])

    l0, g = jax.value_and_grad(loss)(tiny_params)
    p1 = jax.tree_util.tree_map(lambda p, gg: p - 1e-3 * gg, tiny_params, g)
    l1 = loss(p1)
    assert float(l1) < float(l0)


def test_params_flatten_roundtrip(tiny_params):
    flat = flatten_params(tiny_params)
    rt = unflatten_params(flat)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_flatten_with_path(tiny_params)[0],
        jax.tree_util.tree_flatten_with_path(rt)[0],
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_hifigan_shapes_and_determinism():
    from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

    cfg = HiFiGANConfig(upsample_initial_channel=64)
    voc = HiFiGANVocoder(cfg)
    mel = np.random.RandomState(7).rand(5, 80).astype(np.float32)
    w1 = np.asarray(voc.generate(mel))
    w2 = np.asarray(voc.generate(mel))
    assert w1.shape == (5 * 256,)
    np.testing.assert_array_equal(w1, w2)
    assert np.abs(w1).max() <= 1.0


def test_hifigan_batched():
    from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

    cfg = HiFiGANConfig(upsample_initial_channel=64)
    voc = HiFiGANVocoder(cfg)
    mel = np.random.RandomState(8).rand(2, 4, 80).astype(np.float32)
    wav = np.asarray(voc.generate(mel))
    assert wav.shape == (2, 4 * 256)


def test_wavenet_trainer_warm_start_roundtrip(tmp_path):
    """trainer.load() warm-starts params AND ema from a saved checkpoint
    (f16 storage up-cast to f32) — the continued-training path."""
    from autovc_tpu.vocoder.train_wavenet import WaveNetTrainer, flatten_params

    t1 = WaveNetTrainer(TINY, seed=0)
    ckpt = str(tmp_path / "wn.npz")
    flat = {k: v.astype(np.float16) for k, v in flatten_params(t1.ema).items()}
    np.savez(ckpt, **flat)

    t2 = WaveNetTrainer(TINY, seed=1, init_step=4000)
    t2.load(ckpt)
    a = jax.tree_util.tree_leaves(t1.ema)
    b = jax.tree_util.tree_leaves(t2.params)
    assert all(x.dtype == jnp.float32 for x in b)
    assert max(float(jnp.abs(x - y).max()) for x, y in zip(a, b)) < 1e-3


def test_wavenet_train_state_roundtrip(tmp_path):
    """save_train_state/restore_train_state resume RAW params + Adam moments
    + schedule count exactly, so an interrupted run continues bit-identically."""
    from autovc_tpu.vocoder.train_wavenet import WaveNetTrainer

    rng = np.random.default_rng(0)

    def batches():
        while True:
            x = rng.standard_normal((1, 256, 1)).astype(np.float32) * 0.1
            c = rng.standard_normal((1, 1, TINY.cin_channels)).astype(np.float32)
            yield x, c

    t1 = WaveNetTrainer(TINY, seed=0)
    it = batches()
    t1.train(it, 2, log_step=10)
    st = str(tmp_path / "wn.npz.train_state.npz")
    t1.save_train_state(st)

    t2 = WaveNetTrainer(TINY, seed=3)
    t2.restore_train_state(st)
    for a, b in zip(
        jax.tree_util.tree_leaves((t1.params, t1.opt_state)),
        jax.tree_util.tree_leaves((t2.params, t2.opt_state)),
    ):
        assert float(jnp.abs(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)).max()) == 0.0

    # run-local count is exposed by name so external tooling (the training
    # watchdog's remaining-budget arithmetic) never parses opt-state leaves
    assert t1.opt_count() == 2
    assert int(np.load(st)["meta_count"]) == 2
    assert t2.opt_count() == 2


def test_wavenet_train_state_init_step_mismatch(tmp_path):
    """The effective noam position is count + the ORIGINATING trainer's
    init_step closure; restoring into a trainer built with a different
    init_step would silently shift the lr schedule (regression: the r3b
    resume would have run at ~1.9x the intended lr). The saved metadata
    must reject the mismatch and accept the match."""
    import pytest

    from autovc_tpu.vocoder.train_wavenet import WaveNetTrainer

    t1 = WaveNetTrainer(TINY, seed=0, init_step=40000)
    st = str(tmp_path / "wn.npz.train_state.npz")
    t1.save_train_state(st)

    t2 = WaveNetTrainer(TINY, seed=1, init_step=0)
    with pytest.raises(ValueError, match="init_step=40000"):
        t2.restore_train_state(st)

    t3 = WaveNetTrainer(TINY, seed=1, init_step=40000)
    t3.restore_train_state(st)  # matching closure: accepted


def test_crop_batch_hop_alignment():
    """max_time not a multiple of hop (the reference's 8000 @ hop 256) must
    round DOWN so waveform length == frames*hop — the teacher-forced forward
    adds upsampled conditioning to the sample stream (regression: the 8000
    default crashed cli.train_vocoder with 8000-vs-7936 shapes)."""
    from autovc_tpu.vocoder.train_wavenet import crop_batch

    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(20000).astype(np.float32),
            rng.standard_normal(3000).astype(np.float32)]  # shorter than crop
    mels = [rng.standard_normal((78, 80)).astype(np.float32),
            rng.standard_normal((11, 80)).astype(np.float32)]
    x, c = crop_batch(wavs, mels, batch_size=4, max_time=8000, hop=256, rng=rng)
    assert x.shape == (4, 7936, 1)
    assert c.shape == (4, 31, 80)
    assert c.shape[1] * 256 == x.shape[1]


@pytest.mark.slow
def test_wavenet_trainer_loss_decreases(tmp_path, reference_dir):
    """Tiny WaveNet learns on a real utterance: NLL decreases and the EMA
    checkpoint round-trips through WaveNetVocoder.from_checkpoint."""
    from autovc_tpu.dsp import read_wav
    from autovc_tpu.vocoder.train_wavenet import WaveNetTrainer, crop_batch

    x, _ = read_wav(reference_dir + "/wavs/p225/p225_003.wav")
    mel = np.load(reference_dir + "/spmel/p225/p225_003.npy")
    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield crop_batch([x], [mel], batch_size=2, max_time=2048, hop=256, rng=rng)

    trainer = WaveNetTrainer(TINY, lr=5e-3, warmup=10)
    trainer.train(batches(), num_iters=30, log_step=10)
    assert trainer.history[-1] < trainer.history[0], trainer.history

    ckpt = str(tmp_path / "wn.npz")
    trainer.save(ckpt)
    voc = WaveNetVocoder.from_checkpoint(TINY, ckpt)
    wav = voc.generate(mel[:2].astype(np.float32))
    assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.slow
def test_hifigan_trainer_loss_decreases(tmp_path, reference_dir):
    from autovc_tpu.dsp import read_wav
    from autovc_tpu.vocoder.train_hifigan import HiFiGANTrainer, hifigan_crop_batch
    from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

    x, _ = read_wav(reference_dir + "/wavs/p228/p228_003.wav")
    mel = np.load(reference_dir + "/spmel/p228/p228_003.npy")
    rng = np.random.default_rng(1)
    cfg = HiFiGANConfig(upsample_initial_channel=32)

    def batches():
        while True:
            yield hifigan_crop_batch([x], [mel], 2, frames=16, hop=256, rng=rng)

    trainer = HiFiGANTrainer(cfg, lr=1e-3)
    trainer.train(batches(), num_iters=20, log_step=5)
    assert trainer.history[-1] < trainer.history[0], trainer.history

    ckpt = str(tmp_path / "hg.npz")
    trainer.save(ckpt)
    voc = HiFiGANVocoder.from_checkpoint(cfg, ckpt)
    wav = voc.generate(mel[:4].astype(np.float32))
    assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.slow
def test_hifigan_gan_training_step(reference_dir):
    """Adversarial fine-tuning runs: D learns (loss drops), G stays finite,
    mel term keeps improving or holding."""
    from autovc_tpu.dsp import read_wav
    from autovc_tpu.vocoder.train_hifigan import HiFiGANGANTrainer, hifigan_crop_batch

    x, _ = read_wav(reference_dir + "/wavs/p227/p227_003.wav")
    mel = np.load(reference_dir + "/spmel/p227/p227_003.npy")
    rng = np.random.default_rng(2)
    cfg = HiFiGANConfig(upsample_initial_channel=32)

    def batches():
        while True:
            yield hifigan_crop_batch([x], [mel], 2, frames=8, hop=256, rng=rng)

    trainer = HiFiGANGANTrainer(cfg, lr=2e-4)
    trainer.train_gan(batches(), num_iters=6, log_step=2)
    hist = trainer.gan_history
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    assert hist[-1]["d_loss"] < hist[0]["d_loss"]  # D learns real-vs-fake


@pytest.mark.slow
def test_hifigan_gan_train_state_roundtrip(tmp_path):
    """save_train_state/restore_train_state preserve discriminators and both
    optimizer states exactly, so an interrupted GAN fine-tune resumes with
    identical training dynamics (not re-initialized Adam moments/MPD/MSD).
    Optimizer states are perturbed in place instead of trained — value-level
    restore coverage without the multi-minute GAN-step compile."""
    from autovc_tpu.vocoder.train_hifigan import HiFiGANGANTrainer

    cfg = HiFiGANConfig(upsample_initial_channel=32)

    a = HiFiGANGANTrainer(cfg, lr=2e-4, seed=5)
    counter = [0]

    def perturb(x):
        counter[0] += 1
        r = np.random.RandomState(counter[0]).standard_normal(np.shape(x))
        return jnp.asarray(r, jnp.asarray(x).dtype)

    a.opt_state = jax.tree_util.tree_map(perturb, a.opt_state)
    a.d_opt_state = jax.tree_util.tree_map(perturb, a.d_opt_state)
    state_path = str(tmp_path / "hg.npz.train_state.npz")
    a.save_train_state(state_path)

    b = HiFiGANGANTrainer(cfg, lr=2e-4, seed=99)  # different init
    b.params = a.params  # generator ckpt restored separately (trainer.save)
    b.opt_state = b.optimizer.init(b.params)
    b.restore_train_state(state_path)

    for pa, pb in zip(
        jax.tree_util.tree_leaves(a.d_params), jax.tree_util.tree_leaves(b.d_params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for oa, ob in zip(
        jax.tree_util.tree_leaves(a.opt_state), jax.tree_util.tree_leaves(b.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
    for oa, ob in zip(
        jax.tree_util.tree_leaves(a.d_opt_state),
        jax.tree_util.tree_leaves(b.d_opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_pallas_generation_matches_scan(tiny_params):
    """The persistent Pallas generation kernel (f32 weights, interpret mode)
    reproduces the scan engine sample-for-sample: same key -> same uniform
    stream -> identical autoregressive trajectory."""
    from autovc_tpu.vocoder.wavenet import WaveNetVocoder

    voc = WaveNetVocoder(TINY, tiny_params)
    mel = jnp.asarray(np.random.RandomState(0).rand(2, 4, 80), jnp.float32)
    key = jax.random.PRNGKey(42)
    w_scan = np.asarray(voc.generate(mel, key=key))
    w_pallas = np.asarray(voc.generate(mel, key=key, engine="pallas"))
    assert w_scan.shape == w_pallas.shape == (2, 4 * 256)
    np.testing.assert_allclose(w_pallas, w_scan, atol=2e-4)


def test_pallas_hybrid_ring_matches_scan():
    """The hybrid-ring kernel (large-dilation rings in HBM via async DMA,
    ops/pallas_wavenet.py::_wavenet_kernel_hybrid) reproduces the scan
    engine exactly like the all-VMEM kernel does. An 8-layer (1,2,4,8)x2
    config with threshold=4 pushes 4 of the 8 layers (d=4, d=8) through
    the HBM/DMA path while d=1,2 stay in VMEM rings."""
    from autovc_tpu.vocoder.wavenet import WaveNetVocoder

    cfg = WaveNetConfig(
        out_channels=12, layers=8, stacks=2, residual_channels=16,
        gate_channels=16, skip_channels=8, cin_channels=80,
        upsample_scales=(4, 4, 4, 4),
    )
    voc = WaveNetVocoder(cfg, init_params(cfg, jax.random.PRNGKey(5)))
    mel = jnp.asarray(np.random.RandomState(3).rand(2, 4, 80), jnp.float32)
    key = jax.random.PRNGKey(7)
    w_scan = np.asarray(voc.generate(mel, key=key))
    w_hybrid = np.asarray(
        voc.generate(mel, key=key, engine="pallas", hbm_threshold=4)
    )
    assert w_scan.shape == w_hybrid.shape == (2, 4 * 256)
    np.testing.assert_allclose(w_hybrid, w_scan, atol=2e-4)

    # thresholds below 4 violate the hazard-free prefetch schedule
    with pytest.raises(AssertionError, match="hbm_threshold"):
        voc.generate(mel, key=key, engine="pallas", hbm_threshold=2)


def test_auto_hbm_threshold():
    """Ring-placement chooser for the production 24-layer dilation set:
    B<=16 bf16 fits VMEM entirely; B=32 bf16 / B=16 f32 spill d>=16 and
    B=64 bf16 spills d>=8 once the hybrid path's DMA staging blocks are
    charged against the budget alongside the resident rings; absurd
    batches raise."""
    from autovc_tpu.vocoder.wavenet import auto_hbm_threshold

    dils = WaveNetConfig().dilations()  # (1..32) x 4 stacks, 504 slots
    assert auto_hbm_threshold(dils, 16, 2, 512) is None
    assert auto_hbm_threshold(dils, 32, 2, 512) == 16
    assert auto_hbm_threshold(dils, 16, 4, 512) == 16
    assert auto_hbm_threshold(dils, 64, 2, 512) == 8
    with pytest.raises(ValueError, match="scan engine"):
        auto_hbm_threshold(dils, 4096, 4, 512)
    # lane-misaligned residual channels can't spill to HBM (the ring DMAs
    # slice (1, B, R) blocks; Mosaic requires R % 128 == 0 on real TPU) —
    # fits-resident still returns None, must-spill raises toward scan
    assert auto_hbm_threshold(dils, 2, 2, 16) is None
    with pytest.raises(ValueError, match="residual_channels"):
        auto_hbm_threshold(dils, 512, 4, 80)


def test_hybrid_ring_lane_alignment_guard():
    """generate_pallas rejects the hybrid path outside interpret mode when
    residual_channels isn't a multiple of 128: the HBM ring DMAs copy
    (1, B, R) slot slices whose minor dim Mosaic requires lane-aligned
    (observed on real v5e: 'Slice shape along dimension 2 must be aligned
    to tiling (128), but is 16'). Raised at trace time, before any
    compile, so this is testable on the CPU backend."""
    from autovc_tpu.ops.pallas_wavenet import generate_pallas, pack_weights

    cfg = WaveNetConfig(
        out_channels=12, layers=8, stacks=2, residual_channels=16,
        gate_channels=16, skip_channels=8, cin_channels=80,
        upsample_scales=(4, 4, 4, 4),
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    packed = pack_weights(params, cfg.layers, dtype=jnp.float32)
    cond = jnp.zeros((2, 32, cfg.cin_channels), jnp.float32)
    uniforms = jnp.full((2, 32, cfg.out_channels // 3 + 1), 0.5, jnp.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        generate_pallas(
            packed, tuple(cfg.dilations()), cond, uniforms,
            interpret=False, hbm_threshold=4,
        )


def test_wavenet_trainer_nonfinite_sentinel():
    """A non-finite NLL halts training with an error BEFORE the CLI's
    save_every loop can overwrite a good checkpoint with poisoned params
    (the Solver's rule, applied to the vocoder trainers)."""
    from autovc_tpu.vocoder.train_wavenet import WaveNetTrainer

    t = WaveNetTrainer(TINY, seed=0)

    def batches():
        while True:
            x = np.full((1, 256, 1), np.nan, np.float32)
            c = np.zeros((1, 1, 80), np.float32)
            yield x, c

    with pytest.raises(RuntimeError, match="non-finite"):
        t.train(batches(), num_iters=1, log_step=1)


def test_generate_bucketed_trims_and_matches_prefix(tiny_params):
    """generate_bucketed pads mel to a bucket multiple and trims the
    waveform to the true length. The AR core is causal, so the kept region
    matches the unbucketed generation everywhere except the tail samples
    whose CONDITIONING windows overlap the pad (the upsampler's receptive
    field, ~2 mel frames)."""
    voc = WaveNetVocoder(TINY, tiny_params)
    mel = np.random.default_rng(3).random((5, 80)).astype(np.float32)
    hop = TINY.hop_size

    w_plain = np.asarray(voc.generate(jnp.asarray(mel)))
    w_buck = voc.generate_bucketed(mel, bucket=8)
    assert w_buck.shape == (5 * hop,)
    # all but the last 2 frames of samples are bit-equal to the unbucketed run
    keep = (5 - 2) * hop
    np.testing.assert_allclose(w_buck[:keep], w_plain[:keep], atol=1e-6)
    # bucket=0 disables padding entirely
    w_off = voc.generate_bucketed(mel, bucket=0)
    np.testing.assert_allclose(w_off, w_plain, atol=0)
