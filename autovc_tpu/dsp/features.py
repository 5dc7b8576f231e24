"""Feature pipelines: waveform -> {spmel, stft, wav} training features.

This is the TPU-native equivalent of the reference's per-file numpy loop
(make_spect.py:50-94): one jit-compiled function per variant, batched over
utterances, with the mel projection fused into the STFT as a single MXU
matmul. Host-side pieces (filter design, mel basis, the per-speaker-seeded
dither stream) are trace-time constants / numpy, exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from autovc_tpu.config import AudioConfig
from autovc_tpu.dsp.filters import butter_highpass, butter_highpass_sos, filtfilt, sos_filtfilt
from autovc_tpu.dsp.mel import mel_filterbank
from autovc_tpu.dsp.stft import stft_magnitude

# min_level = exp(-100/20 * ln 10) = 1e-5 (make_spect.py:52)
_MIN_LEVEL = 1e-5


def normalize_db(mag: jax.Array, ref_db: float = 16.0, min_db: float = -100.0) -> jax.Array:
    """dB-normalize to [0, 1]: clip((20*log10(max(1e-5, m)) - ref + 100)/100)
    (make_spect.py:82-86)."""
    db = 20.0 * jnp.log10(jnp.maximum(_MIN_LEVEL, mag)) - ref_db
    return jnp.clip((db - min_db) / -min_db, 0.0, 1.0)


def denormalize_db(s: jax.Array, ref_db: float = 16.0, min_db: float = -100.0) -> jax.Array:
    """Inverse of normalize_db (up to the clip): [0,1] -> linear magnitude."""
    db = s * -min_db + min_db + ref_db
    return jnp.power(10.0, db / 20.0)


def robust_scale(x: jax.Array, q_low: float = 5.0, q_high: float = 95.0) -> jax.Array:
    """Per-utterance robust scaling: (x - median) / (q95 - q5), matching
    sklearn.RobustScaler(quantile_range=(5,95)).fit_transform on a 1-D
    waveform (make_spect.py:88). Runs on device via jnp.percentile."""
    med = jnp.median(x, axis=-1, keepdims=True)
    lo = jnp.percentile(x, q_low, axis=-1, keepdims=True)
    hi = jnp.percentile(x, q_high, axis=-1, keepdims=True)
    return (x - med) / (hi - lo)


def dither_reference(n: int, speaker_seed: int, n_prior: int = 0) -> np.ndarray:
    """The reference's dither noise stream: per-speaker RandomState(seed) where
    seed = int(speaker_dir[1:]), consuming prng.rand(len) per file in sorted
    order (make_spect.py:68,76). `n_prior` is the total sample count of files
    processed earlier for the same speaker (to position the stream)."""
    prng = np.random.RandomState(speaker_seed)
    if n_prior:
        prng.rand(n_prior)
    return ((prng.rand(n) - 0.5) * 1e-6).astype(np.float64)


def mel_from_stft_mag(mag: jax.Array, mel_basis: jax.Array) -> jax.Array:
    """(..., T, n_bins) @ (n_bins, n_mels) — the MXU hot path of extraction."""
    return jnp.matmul(mag, mel_basis.astype(mag.dtype))


class MelFrontend:
    """Stateful-constant holder for the feature pipeline.

    Precomputes filter coefficients and the mel basis once (host, float64)
    and exposes jitted extraction functions. dtype=float64 gives bit-level
    parity with the scipy/librosa reference chain (use on CPU with jax x64);
    float32 is the on-device production path.
    """

    def __init__(self, audio: AudioConfig = AudioConfig(), dtype=jnp.float32):
        self.audio = audio
        self.dtype = dtype
        self.b, self.a = butter_highpass(
            audio.highpass_cutoff_hz, audio.sample_rate, audio.highpass_order
        )
        self.sos = butter_highpass_sos(
            audio.highpass_cutoff_hz, audio.sample_rate, audio.highpass_order
        )
        self.mel_basis = mel_filterbank(
            audio.sample_rate,
            audio.n_fft,
            audio.n_mels,
            audio.mel_fmin,
            audio.mel_fmax,
            dtype=np.float64,
        )
        self._mel_basis_dev = None  # device/dtype-cast copy, built lazily

    def highpass_dither(self, wav: jax.Array, noise: jax.Array | None) -> jax.Array:
        """filtfilt highpass then y*0.96 + noise (make_spect.py:74-76).

        float64 uses the transfer-function form (bit-parity with scipy's
        filtfilt in the reference); float32 uses the biquad cascade, which is
        the only numerically stable single-precision formulation.
        """
        wav = jnp.asarray(wav, self.dtype)
        if self.dtype == jnp.float64:
            y = filtfilt(self.b, self.a, wav)
        else:
            y = sos_filtfilt(self.sos, wav)
        if noise is None:
            return y
        return y * 0.96 + jnp.asarray(noise, self.dtype)

    def mel_features(self, wav: jax.Array, noise: jax.Array | None = None) -> jax.Array:
        """wav (..., L) -> normalized mel (..., T, 80) — the 'spmel' variant."""
        w = self.highpass_dither(wav, noise)
        mag = stft_magnitude(w, self.audio.n_fft, self.audio.hop_length)
        if self._mel_basis_dev is None:
            # cache the device/dtype cast: this runs eagerly (only the STFT
            # is jitted), so re-uploading the (513, 80) basis per call would
            # cost an H2D transfer per utterance through the tunnel
            self._mel_basis_dev = jnp.asarray(self.mel_basis, self.dtype)
        m = mel_from_stft_mag(mag, self._mel_basis_dev)
        return normalize_db(m, self.audio.ref_level_db, self.audio.min_level_db)

    def stft_features(self, wav: jax.Array, noise: jax.Array | None = None) -> jax.Array:
        """wav (..., L) -> normalized |STFT| (..., T, 513) — the 'stft' variant."""
        w = self.highpass_dither(wav, noise)
        mag = stft_magnitude(w, self.audio.n_fft, self.audio.hop_length)
        return normalize_db(mag, self.audio.ref_level_db, self.audio.min_level_db)

    def legacy_stft_features(self, wav: jax.Array, noise: jax.Array | None = None) -> jax.Array:
        """wav (..., L) -> normalized |STFT| (..., T, 257) — the legacy 512-pt
        variant ("old code/make_spect_old.py":19-66: pySTFT fft_length=512,
        same highpass/dither/dB chain). Pinned against the bundled
        test_data/STFT goldens in tests/test_dsp.py."""
        w = self.highpass_dither(wav, noise)
        mag = stft_magnitude(w, self.audio.legacy_n_fft, self.audio.hop_length)
        return normalize_db(mag, self.audio.ref_level_db, self.audio.min_level_db)

    def wav_features(self, wav: jax.Array, noise: jax.Array | None = None) -> jax.Array:
        """wav (..., L) -> robust-scaled waveform (..., L, 1) — the 'wav' variant."""
        w = self.highpass_dither(wav, noise)
        return robust_scale(w, *self.audio.robust_quantile_range)[..., None]

    def extract(self, model_type: str, wav: jax.Array, noise=None) -> jax.Array:
        if model_type == "spmel":
            return self.mel_features(wav, noise)
        if model_type == "stft":
            return self.stft_features(wav, noise)
        if model_type == "wav":
            return self.wav_features(wav, noise)
        if model_type == "legacy":
            return self.legacy_stft_features(wav, noise)
        raise ValueError(f"unknown model_type {model_type!r}")
