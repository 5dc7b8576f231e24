"""HiFi-GAN generator pretraining (reconstruction losses).

Trains the parallel vocoder on (mel, waveform) pairs with the standard
non-adversarial objectives — L1 log-mel reconstruction plus multi-resolution
STFT (spectral-convergence + log-magnitude) — which gets a usable vocoder
without discriminators; adversarial fine-tuning can be layered on later.
Everything is differentiable jnp (our own STFT/mel ops), one jitted donated
step.
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from autovc_tpu.config import AudioConfig, HiFiGANConfig
from autovc_tpu.dsp.mel import mel_filterbank
from autovc_tpu.dsp.stft import stft_magnitude
from autovc_tpu.vocoder.hifigan import HiFiGANGenerator
from autovc_tpu.vocoder.wavenet import flatten_params

_RESOLUTIONS = ((512, 128), (1024, 256), (2048, 512))


def multi_resolution_stft_loss(y_hat: jax.Array, y: jax.Array) -> jax.Array:
    """Sum over resolutions of spectral convergence + log-STFT-magnitude L1."""
    total = 0.0
    for n_fft, hop in _RESOLUTIONS:
        m_hat = stft_magnitude(y_hat, n_fft, hop)
        m = stft_magnitude(y, n_fft, hop)
        sc = jnp.linalg.norm(m - m_hat) / (jnp.linalg.norm(m) + 1e-6)
        mag = jnp.mean(jnp.abs(jnp.log(m + 1e-5) - jnp.log(m_hat + 1e-5)))
        total = total + sc + mag
    return total / len(_RESOLUTIONS)


def log_mel_l1(y_hat: jax.Array, y: jax.Array, basis: jax.Array, audio: AudioConfig):
    mh = stft_magnitude(y_hat, audio.n_fft, audio.hop_length) @ basis
    m = stft_magnitude(y, audio.n_fft, audio.hop_length) @ basis
    return jnp.mean(jnp.abs(jnp.log(mh + 1e-5) - jnp.log(m + 1e-5)))


def feature_mel_l1(y_hat: jax.Array, y: jax.Array, basis: jax.Array, audio: AudioConfig):
    """L1 on the FRAMEWORK's normalized mel features (normalize_db of mel) —
    the exact metric `cli.evaluate_vocoder` reports, so training can optimize
    the yardstick directly (the dB clamp compresses differently from plain
    log, so log-mel L1 alone leaves this metric on the table)."""
    from autovc_tpu.dsp.features import normalize_db

    mh = stft_magnitude(y_hat, audio.n_fft, audio.hop_length) @ basis
    m = stft_magnitude(y, audio.n_fft, audio.hop_length) @ basis
    fh = normalize_db(mh, audio.ref_level_db, audio.min_level_db)
    f = normalize_db(m, audio.ref_level_db, audio.min_level_db)
    return jnp.mean(jnp.abs(fh - f))


class HiFiGANTrainer:
    def __init__(
        self,
        cfg: HiFiGANConfig,
        audio: AudioConfig = AudioConfig(),
        lr: float = 2e-4,
        mel_weight: float = 45.0 / 45.0,
        feat_weight: float = 0.0,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.audio = audio
        self.model = HiFiGANGenerator(cfg)
        mel0 = jnp.zeros((1, 16, cfg.in_channels), jnp.float32)
        self.params = self.model.init(jax.random.PRNGKey(seed), mel0)["params"]
        self.optimizer = optax.adamw(lr, b1=0.8, b2=0.99, weight_decay=0.0)
        self.opt_state = self.optimizer.init(self.params)
        self.history: list[float] = []
        basis = jnp.asarray(
            mel_filterbank(audio.sample_rate, audio.n_fft, audio.n_mels,
                           audio.mel_fmin, audio.mel_fmax)
        )

        def step_fn(params, opt_state, mel, y):
            def loss_fn(p):
                y_hat = self.model.apply({"params": p}, mel)
                loss = (
                    mel_weight * log_mel_l1(y_hat, y, basis, audio)
                    + multi_resolution_stft_loss(y_hat, y)
                )
                if feat_weight:
                    loss = loss + feat_weight * feature_mel_l1(y_hat, y, basis, audio)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step_fn, donate_argnums=(0, 1))

    def train(self, batches: Iterator, num_iters: int, log_step: int = 50):
        t0 = time.time()
        loss = float("nan")
        for i in range(1, num_iters + 1):
            mel, y = next(batches)
            self.params, self.opt_state, loss_j = self._step(
                self.params, self.opt_state, jnp.asarray(mel), jnp.asarray(y)
            )
            if i % log_step == 0 or i == num_iters:
                loss = float(loss_j)
                if not np.isfinite(loss):
                    # halt BEFORE the caller's save() can overwrite a good
                    # checkpoint with poisoned params (Solver's rule)
                    raise RuntimeError(
                        f"[hifigan] non-finite loss at iter {i}; refusing to "
                        f"continue — resume from the last saved checkpoint"
                    )
                self.history.append(loss)
                print(
                    f"[hifigan] iter {i}/{num_iters} loss {loss:.4f} "
                    f"({(time.time() - t0) / i:.2f}s/it)",
                    flush=True,
                )
        return loss

    def save(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez(path, **flatten_params(self.params))


class HiFiGANGANTrainer(HiFiGANTrainer):
    """Adversarial fine-tuning: generator (mel L1 x45 + adversarial + feature
    matching x2) against MPD+MSD discriminators — the full HiFi-GAN
    objective, layered on top of the reconstruction pretrainer."""

    def __init__(
        self,
        cfg: HiFiGANConfig,
        audio: AudioConfig = AudioConfig(),
        lr: float = 2e-4,
        mel_weight: float = 45.0,
        fm_weight: float = 2.0,
        feat_weight: float = 0.0,
        seed: int = 0,
        generator_params=None,
    ):
        super().__init__(cfg, audio, lr=lr, seed=seed)
        if generator_params is not None:  # warm start from pretraining
            self.params = generator_params
            self.opt_state = self.optimizer.init(self.params)

        from autovc_tpu.vocoder.discriminators import (
            HiFiGANDiscriminators,
            discriminator_loss,
            feature_matching_loss,
            generator_adversarial_loss,
        )

        self.disc = HiFiGANDiscriminators()
        y0 = jnp.zeros((1, 2048), jnp.float32)
        self.d_params = self.disc.init(jax.random.PRNGKey(seed + 1), y0)["params"]
        self.d_optimizer = optax.adamw(lr, b1=0.8, b2=0.99)
        self.d_opt_state = self.d_optimizer.init(self.d_params)
        self.gan_history: list[dict] = []

        basis = jnp.asarray(
            mel_filterbank(audio.sample_rate, audio.n_fft, audio.n_mels,
                           audio.mel_fmin, audio.mel_fmax)
        )

        def gan_step(g_params, g_opt, d_params, d_opt, mel, y):
            # --- discriminator update (generator frozen)
            y_hat = self.model.apply({"params": g_params}, mel)

            def d_loss_fn(dp):
                real_s, _ = self.disc.apply({"params": dp}, y)
                fake_s, _ = self.disc.apply({"params": dp}, jax.lax.stop_gradient(y_hat))
                return discriminator_loss(real_s, fake_s)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
            d_updates, d_opt = self.d_optimizer.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, d_updates)

            # --- generator update (discriminator frozen)
            def g_loss_fn(gp):
                y_hat = self.model.apply({"params": gp}, mel)
                fake_s, fake_f = self.disc.apply({"params": d_params}, y_hat)
                _, real_f = self.disc.apply({"params": d_params}, y)
                adv = generator_adversarial_loss(fake_s)
                fm = feature_matching_loss(real_f, fake_f)
                mel_l = log_mel_l1(y_hat, y, basis, audio)
                g = adv + fm_weight * fm + mel_weight * mel_l
                if feat_weight:
                    g = g + feat_weight * feature_mel_l1(y_hat, y, basis, audio)
                return g, (adv, fm, mel_l)

            (g_loss, (adv, fm, mel_l)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(g_params)
            g_updates, g_opt = self.optimizer.update(g_grads, g_opt, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            metrics = {"d_loss": d_loss, "g_loss": g_loss, "adv": adv, "fm": fm, "mel": mel_l}
            return g_params, g_opt, d_params, d_opt, metrics

        self._gan_step = jax.jit(gan_step, donate_argnums=(0, 1, 2, 3))

    def save_train_state(self, path: str):
        """Persist the full GAN training state (discriminators + both
        optimizer states) alongside the generator checkpoint, so an
        interrupted adversarial fine-tune resumes with identical dynamics
        instead of silently re-initializing MPD/MSD and Adam moments."""
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        g_opt = jax.tree_util.tree_leaves(self.opt_state)
        d_opt = jax.tree_util.tree_leaves(self.d_opt_state)
        np.savez(
            path,
            **{f"d/{k}": v for k, v in flatten_params(self.d_params).items()},
            **{f"g_opt/{i:04d}": np.asarray(v) for i, v in enumerate(g_opt)},
            **{f"d_opt/{i:04d}": np.asarray(v) for i, v in enumerate(d_opt)},
        )

    def restore_train_state(self, path: str):
        from autovc_tpu.vocoder.wavenet import unflatten_params

        z = dict(np.load(path))
        self.d_params = unflatten_params(
            {k[2:]: v for k, v in z.items() if k.startswith("d/")}
        )
        for attr, pref in (("opt_state", "g_opt/"), ("d_opt_state", "d_opt/")):
            keys = sorted(k for k in z if k.startswith(pref))
            treedef = jax.tree_util.tree_structure(getattr(self, attr))
            setattr(
                self,
                attr,
                jax.tree_util.tree_unflatten(
                    treedef, [jnp.asarray(z[k]) for k in keys]
                ),
            )

    def train_gan(self, batches: Iterator, num_iters: int, log_step: int = 50):
        t0 = time.time()
        for i in range(1, num_iters + 1):
            mel, y = next(batches)
            (self.params, self.opt_state, self.d_params, self.d_opt_state, m) = (
                self._gan_step(
                    self.params, self.opt_state, self.d_params, self.d_opt_state,
                    jnp.asarray(mel), jnp.asarray(y),
                )
            )
            if i % log_step == 0 or i == num_iters:
                rec = {k: float(v) for k, v in m.items()}
                if not all(np.isfinite(v) for v in rec.values()):
                    raise RuntimeError(
                        f"[hifigan-gan] non-finite metric at iter {i} "
                        f"({rec}); refusing to continue — resume from the "
                        f"last saved checkpoint"
                    )
                self.gan_history.append(rec)
                print(
                    f"[hifigan-gan] iter {i}/{num_iters} "
                    + " ".join(f"{k}={v:.3f}" for k, v in rec.items())
                    + f" ({(time.time() - t0) / i:.2f}s/it)",
                    flush=True,
                )
        return self.gan_history[-1] if self.gan_history else {}


def hifigan_crop_batch(wavs, mels, batch_size, frames, hop, rng):
    """(mel (B, frames, 80), wav (B, frames*hop)) aligned random crops."""
    ms, ys = [], []
    for _ in range(batch_size):
        i = int(rng.integers(0, len(wavs)))
        w, m = wavs[i], mels[i]
        max_f = min(m.shape[0], w.shape[0] // hop) - frames
        f0 = int(rng.integers(0, max(1, max_f)))
        xm = m[f0 : f0 + frames]
        xw = w[f0 * hop : (f0 + frames) * hop]
        if xm.shape[0] < frames:  # utterance shorter than the crop window
            xm = np.pad(xm, ((0, frames - xm.shape[0]), (0, 0)))
        if xw.shape[0] < frames * hop:
            xw = np.pad(xw, (0, frames * hop - xw.shape[0]))
        ms.append(xm)
        ys.append(xw)
    return np.stack(ms).astype(np.float32), np.stack(ys).astype(np.float32)
