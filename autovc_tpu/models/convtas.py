"""ConvTasNet-style learned waveform front/back-end and the raw-waveform
generator (reference model_vc_wav.py).

The front-end strides the waveform into a 512-channel latent at the mel frame
rate (k=1024, s=256 — deliberately mirroring the STFT contract); the back-end
transposed-convs it back to a waveform. The AutoVC core runs between them.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from autovc_tpu.models.autovc import Decoder, Encoder
from autovc_tpu.models.layers import BatchNorm, ConvTranspose1d, PReLU


class ConvTasEncoder(nn.Module):
    """Waveform -> latent (model_vc_wav.py:11-33): strided conv then
    `depth` x [Conv(k3,p1) + PReLU + BN]."""

    depth: int = 1
    channels: int = 512
    kernel: int = 1024
    stride: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: (B, L, 1) -> (B, T, C) with T = (L - kernel)//stride + 1
        h = nn.Conv(
            self.channels,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            padding="VALID",
            dtype=self.dtype,
            name="conv_in",
        )(x)
        for i in range(self.depth):
            h = nn.Conv(
                self.channels, kernel_size=(3,), padding=[(1, 1)], dtype=self.dtype,
                name=f"conv{i}",
            )(h)
            h = PReLU(name=f"prelu{i}")(h)
            h = BatchNorm(dtype=self.dtype, name=f"bn{i}")(h, use_running_average=not train)
        return h


class ConvTasDecoder(nn.Module):
    """Latent -> waveform (model_vc_wav.py:36-58): `depth` x
    [ConvTranspose(k3,s1,p1) + PReLU + BN], then ConvTranspose(k1024,s256)."""

    depth: int = 1
    channels: int = 512
    kernel: int = 1024
    stride: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = x
        for i in range(self.depth):
            h = ConvTranspose1d(
                self.channels, kernel_size=3, stride=1, padding=1, dtype=self.dtype,
                name=f"convT{i}",
            )(h)
            h = PReLU(name=f"prelu{i}")(h)
            h = BatchNorm(dtype=self.dtype, name=f"bn{i}")(h, use_running_average=not train)
        # (B, T, C) -> (B, (T-1)*stride + kernel, 1)
        return ConvTranspose1d(
            1, kernel_size=self.kernel, stride=self.stride, padding=0, dtype=self.dtype,
            name="convT_out",
        )(h)


class GeneratorWav(nn.Module):
    """Raw-waveform AutoVC (model_vc_wav.py:60-103).

    __call__(x, c_org, c_trg) with x (B, L, 1) returns
      (x_latent, x_identic, x_decoder, codes_flat):
      x_latent   (B, T, C)  front-end latent (the reference's x_CTencoder)
      x_identic  (B, L, 1)  reconstructed waveform
      x_decoder  (B, T, C)  core decoder output (latent-matching loss target)
      codes_flat (B, nb*2*neck)
    encode(x, c_org) -> codes_flat (content-consistency branch).
    """

    dim_neck: int = 32
    dim_emb: int = 256
    dim_pre: int = 512
    freq: int = 32
    depth: int = 1
    channels: int = 512
    dtype: Any = None
    use_pallas: bool = False

    def setup(self):
        self.tas_encoder = ConvTasEncoder(self.depth, self.channels, dtype=self.dtype)
        self.encoder = Encoder(
            self.dim_neck, self.freq, dtype=self.dtype, use_pallas=self.use_pallas
        )
        self.decoder = Decoder(
            self.channels, self.dim_pre, dtype=self.dtype, use_pallas=self.use_pallas
        )
        self.tas_decoder = ConvTasDecoder(self.depth, self.channels, dtype=self.dtype)

    def _latent(self, x, train: bool):
        assert x.ndim == 3 and x.shape[-1] == 1, "GeneratorWav expects (B, L, 1)"
        return self.tas_encoder(x, train=train)  # (B, T, C)

    def encode(self, x, c_org, train: bool = True):
        lat = self._latent(x, train=train)
        codes = self.encoder(lat, c_org, train=train)
        return codes.reshape(codes.shape[0], -1)

    def __call__(self, x, c_org, c_trg, train: bool = True):
        lat = self._latent(x, train=train)
        b, t, _ = lat.shape
        codes = self.encoder(lat, c_org, train=train)
        nb = codes.shape[1]
        code_exp = jnp.repeat(codes, t // nb, axis=1)
        dec_in = jnp.concatenate(
            [code_exp, jnp.broadcast_to(c_trg[:, None, :], (b, t, c_trg.shape[-1]))],
            axis=-1,
        )
        x_decoder = self.decoder(dec_in, train=train)  # (B, T, C)
        x_identic = self.tas_decoder(x_decoder, train=train)  # (B, L, 1)
        return lat, x_identic, x_decoder, codes.reshape(b, -1)
