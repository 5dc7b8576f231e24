"""Griffin-Lim mel vocoder (the reference's notebook fallback,
vocoder_stft.ipynb cell 0 / istft.ipynb cells 4-6, as a first-class module).

mel (T, 80 normalized) -> denormalize -> pseudo-inverse mel basis -> linear
magnitude (T, 513) -> Griffin-Lim phase reconstruction -> waveform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from autovc_tpu.config import AudioConfig
from autovc_tpu.dsp.features import denormalize_db
from autovc_tpu.dsp.mel import mel_filterbank
from autovc_tpu.dsp.stft import griffin_lim


@functools.lru_cache(maxsize=4)
def _pinv_basis(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, dtype=np.float64)  # (bins, mels)
    return np.linalg.pinv(fb).astype(np.float32)  # (mels, bins)


def mel_to_linear(mel: jax.Array, audio: AudioConfig = AudioConfig()) -> jax.Array:
    """Normalized mel (..., T, n_mels) -> linear magnitude (..., T, bins)."""
    inv = jnp.asarray(
        _pinv_basis(audio.sample_rate, audio.n_fft, audio.n_mels, audio.mel_fmin, audio.mel_fmax)
    )
    mag_mel = denormalize_db(mel, audio.ref_level_db, audio.min_level_db)
    return jnp.maximum(mag_mel @ inv, 0.0)


def mel_to_waveform(
    mel: jax.Array,
    audio: AudioConfig = AudioConfig(),
    n_iter: int = 60,
    key: jax.Array | None = None,
) -> jax.Array:
    """Normalized mel (T, n_mels) -> waveform via Griffin-Lim."""
    lin = mel_to_linear(jnp.asarray(mel), audio)
    return griffin_lim(lin, audio.n_fft, audio.hop_length, n_iter=n_iter, key=key)


def stft_to_waveform(
    stft_norm: jax.Array,
    audio: AudioConfig = AudioConfig(),
    n_iter: int = 60,
    key: jax.Array | None = None,
) -> jax.Array:
    """Normalized |STFT| (T, n_fft//2+1) -> waveform — the stft-variant's
    direct Griffin-Lim path (reference vocoder_stft.ipynb cell 0 ran
    librosa.griffinlim on the converted STFT magnitudes)."""
    mag = denormalize_db(jnp.asarray(stft_norm), audio.ref_level_db, audio.min_level_db)
    return griffin_lim(mag, audio.n_fft, audio.hop_length, n_iter=n_iter, key=key)
