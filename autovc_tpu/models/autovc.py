"""The AutoVC content-bottleneck autoencoder family, TPU-native.

Re-implements the reference's Generator (model_vc_mel.py:41-203) as one
parameterized flax model covering all three variants:

- spmel: n_bins=80   (model_vc_mel.py)
- stft : n_bins=513  (model_vc_stft.py — the reference does module surgery on
         a Generator; here n_bins is just a constructor argument, which also
         fixes the reference's latent forward() AttributeError
         model_vc_stft.py:44-46 by construction)
- wav  : ConvTasNet-style learned front/back-end around the core
         (model_vc_wav.py:60-103), selected via GeneratorWav below.

Key TPU-first differences from the reference (semantics preserved):
- (B, T, C) channels-last layout everywhere (lane axis = channels).
- The bottleneck code sampling loop (model_vc_mel.py:77-79) is a reshape:
  forward states at block ends, backward states at block starts.
- Code upsampling-by-repetition (model_vc_mel.py:186-190) is jnp.repeat.
- BiLSTM/LSTM are scan cells with hoisted input projections (layers.LSTM).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from autovc_tpu.models.layers import BatchNorm, ConvNorm, LSTM, LinearNorm


class Encoder(nn.Module):
    """Content encoder with information bottleneck (model_vc_mel.py:41-81).

    (B, T, n_bins) + (B, dim_emb) -> codes (B, T//freq, 2*dim_neck)
    """

    dim_neck: int = 32
    freq: int = 32
    channels: int = 512
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, c_org, train: bool = True):
        b, t, _ = x.shape
        h = jnp.concatenate(
            [x, jnp.broadcast_to(c_org[:, None, :], (b, t, c_org.shape[-1]))], axis=-1
        )
        for i in range(3):
            h = ConvNorm(self.channels, 5, w_init_gain="relu", dtype=self.dtype, name=f"conv{i}")(h)
            h = BatchNorm(dtype=self.dtype, name=f"bn{i}")(h, use_running_average=not train)
            h = nn.relu(h)
        out = LSTM(
            self.dim_neck, num_layers=2, bidirectional=True, dtype=self.dtype,
            use_pallas=self.use_pallas, name="blstm",
        )(h)

        # bottleneck by time-downsampling (model_vc_mel.py:74-79):
        # per freq-block, keep forward state at the block END and backward
        # state at the block START.
        assert t % self.freq == 0, f"sequence length {t} not a multiple of freq {self.freq}"
        nb = t // self.freq
        fwd = out[..., : self.dim_neck].reshape(b, nb, self.freq, self.dim_neck)
        bwd = out[..., self.dim_neck :].reshape(b, nb, self.freq, self.dim_neck)
        return jnp.concatenate([fwd[:, :, -1], bwd[:, :, 0]], axis=-1)  # (B, nb, 2*neck)


class Decoder(nn.Module):
    """Autoregressive-free spectrogram decoder (model_vc_mel.py:84-122).

    (B, T, 2*dim_neck + dim_emb) -> (B, T, n_bins)
    """

    n_bins: int = 80
    dim_pre: int = 512
    lstm_dim: int = 1024
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = LSTM(self.dim_pre, num_layers=1, dtype=self.dtype, use_pallas=self.use_pallas, name="lstm1")(x)
        for i in range(3):
            h = ConvNorm(self.dim_pre, 5, w_init_gain="relu", dtype=self.dtype, name=f"conv{i}")(h)
            h = BatchNorm(dtype=self.dtype, name=f"bn{i}")(h, use_running_average=not train)
            h = nn.relu(h)
        h = LSTM(self.lstm_dim, num_layers=2, dtype=self.dtype, use_pallas=self.use_pallas, name="lstm2")(h)
        return LinearNorm(self.n_bins, dtype=self.dtype, name="proj")(h)


class Postnet(nn.Module):
    """5-conv residual refiner (model_vc_mel.py:125-169): tanh on the first
    four BN'd convs, linear+BN last."""

    n_bins: int = 80
    channels: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = x
        for i in range(4):
            gain = "tanh"
            h = ConvNorm(self.channels, 5, w_init_gain=gain, dtype=self.dtype, name=f"conv{i}")(h)
            h = BatchNorm(dtype=self.dtype, name=f"bn{i}")(h, use_running_average=not train)
            h = jnp.tanh(h)
        h = ConvNorm(self.n_bins, 5, w_init_gain="linear", dtype=self.dtype, name="conv4")(h)
        h = BatchNorm(dtype=self.dtype, name="bn4")(h, use_running_average=not train)
        return h


class Generator(nn.Module):
    """AutoVC generator (model_vc_mel.py:172-203), parameterized over n_bins.

    __call__(x, c_org, c_trg) -> (x_identic, x_identic_psnt, codes_flat)
      x_identic      (B, T, n_bins)  decoder output
      x_identic_psnt (B, T, n_bins)  decoder output + postnet residual
      codes_flat     (B, T//freq * 2*dim_neck)  content codes (flattened)
    encode(x, c_org) -> codes_flat — the c_trg=None branch of the reference
    forward, used for the content-consistency loss (solver_encoder.py:235).

    (The reference returns (B, 1, T, bins) with a stray unsqueeze that its
    solver immediately squeezes away; we keep clean (B, T, bins).)
    """

    dim_neck: int = 32
    dim_emb: int = 256
    dim_pre: int = 512
    freq: int = 32
    n_bins: int = 80
    dtype: Any = None
    use_pallas: bool = False

    def setup(self):
        self.encoder = Encoder(
            self.dim_neck, self.freq, dtype=self.dtype, use_pallas=self.use_pallas
        )
        self.decoder = Decoder(
            self.n_bins, self.dim_pre, dtype=self.dtype, use_pallas=self.use_pallas
        )
        self.postnet = Postnet(self.n_bins, dtype=self.dtype)

    def encode(self, x, c_org, train: bool = True):
        codes = self.encoder(x, c_org, train=train)  # (B, nb, 2*neck)
        b = codes.shape[0]
        return codes.reshape(b, -1)

    def decode(self, codes, c_trg, t: int, train: bool = True):
        """codes (B, nb, 2*neck) + target embedding -> spectrogram pair."""
        b, nb, _ = codes.shape
        code_exp = jnp.repeat(codes, t // nb, axis=1)  # (B, T, 2*neck)
        dec_in = jnp.concatenate(
            [code_exp, jnp.broadcast_to(c_trg[:, None, :], (b, t, c_trg.shape[-1]))],
            axis=-1,
        )
        x_identic = self.decoder(dec_in, train=train)
        x_psnt = x_identic + self.postnet(x_identic, train=train)
        return x_identic, x_psnt

    def __call__(self, x, c_org, c_trg, train: bool = True):
        codes = self.encoder(x, c_org, train=train)
        x_identic, x_psnt = self.decode(codes, c_trg, x.shape[1], train=train)
        b = codes.shape[0]
        return x_identic, x_psnt, codes.reshape(b, -1)
