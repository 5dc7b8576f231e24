"""Hybrid neural + Griffin-Lim vocoder.

Attacks the documented round-2 gap (docs/VALIDATION_r2.md §2): on CONVERTED
mels the trained HiFi-GAN loses the mel-L1 fidelity metric to plain
Griffin-Lim, because GL directly enforces the magnitude constraint the
metric measures, while the GAN hallucinates detail the generator's output
distribution never trained on (domain shift).

The hybrid takes the best of both:
  1. synthesize with the neural vocoder (harmonic structure, natural phase),
  2. extract that waveform's STFT phase,
  3. run a few Griffin-Lim iterations on the MEL-DERIVED magnitude with that
     phase as the starting point (dsp.stft.griffin_lim init_phase).

Step 3 enforces exactly the magnitude the fidelity metric checks; step 1-2
replaces GL's random phase init with an already-consistent one, so few
iterations suffice and the perceptual character of the neural vocoder's
phase largely survives. The whole path is one XLA program per shape.

The reference has no analogue (its notebooks ran either librosa.griffinlim
OR the pretrained WaveNet, never both — vocoder_stft.ipynb cell 0,
vocoder.py:10-22); this is a TPU-first addition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from autovc_tpu.config import AudioConfig
from autovc_tpu.dsp.stft import griffin_lim, stft_complex
from autovc_tpu.vocoder.griffinlim import mel_to_linear


class HybridVocoder:
    """Wraps any neural vocoder exposing `generate(mel) -> wav`."""

    def __init__(
        self,
        neural,
        audio: AudioConfig = AudioConfig(),
        n_iter: int = 2,
    ):
        self.neural = neural
        self.audio = audio
        self.n_iter = n_iter

    def generate(self, mel) -> jax.Array:
        """Normalized mel (T, n_mels) -> waveform (T * hop,)."""
        mel = jnp.asarray(mel)
        wav0 = jnp.asarray(self.neural.generate(mel))
        return refine_with_mel_magnitude(
            wav0, mel, self.audio, n_iter=self.n_iter
        )


def refine_with_mel_magnitude(
    wav: jax.Array,
    mel: jax.Array,
    audio: AudioConfig = AudioConfig(),
    n_iter: int = 2,
) -> jax.Array:
    """Project `wav` onto the magnitude surface implied by `mel`.

    Keeps wav's phase, replaces its STFT magnitude with the mel-derived one,
    then `n_iter` Griffin-Lim consistency iterations. n_iter=0 is a pure
    magnitude swap (single iSTFT).

    Output length is T * hop — the same contract as the neural vocoders
    (HiFiGAN upsamples exactly hop samples per frame), so hybrid-mode and
    hifigan-mode serving bundles return identical shapes for identical
    input (serve protocol: "waveform (T*hop,)"). griffin_lim's default
    (T-1)*hop would silently drop the final hop of audio.
    """
    mel = jnp.asarray(mel)
    lin = mel_to_linear(mel, audio)  # (T, bins)
    t = lin.shape[-2]
    phase = stft_complex(jnp.asarray(wav), audio.n_fft, audio.hop_length)
    # pad phase with its last frame if the waveform came up short
    if phase.shape[-2] < t:
        reps = jnp.repeat(phase[..., -1:, :], t - phase.shape[-2], axis=-2)
        phase = jnp.concatenate([phase, reps], axis=-2)
    else:
        phase = phase[..., :t, :]
    return griffin_lim(
        lin,
        audio.n_fft,
        audio.hop_length,
        n_iter=n_iter,
        length=t * audio.hop_length,
        init_phase=phase,
    )
