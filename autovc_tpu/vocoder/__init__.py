"""Waveform synthesis (reference synthesis.py / vocoder.py / hparams.py).

- wavenet:    autoregressive WaveNet with cached fast-generation lax.scan
- hifigan:    parallel HiFi-GAN generator (the >=50x-RT throughput path)
- griffinlim: mel -> linear -> Griffin-Lim phase reconstruction fallback
"""

from autovc_tpu.vocoder.griffinlim import mel_to_linear, mel_to_waveform

__all__ = ["mel_to_linear", "mel_to_waveform"]
