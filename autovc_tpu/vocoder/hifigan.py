"""HiFi-GAN generator — the parallel (non-autoregressive) vocoder.

The reference README names a pretrained HiFi-GAN as the drop-in alternative
to WaveNet (README.md:43). This is the V1 generator topology (Kong et al.
2020): mel -> Conv(k7) -> 4x [transposed-conv upsample + multi-receptive-
field fusion resblocks] -> Conv(k7) -> tanh. Upsample rates (8,8,2,2)
multiply to hop_length 256, matching the feature contract.

TPU notes: everything is feed-forward convs — one jit, fully parallel over
time, so synthesis cost is ~constant per sample regardless of length. This
is the >=50x-realtime path; WaveNet remains for parity with the reference's
autoregressive quality.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from autovc_tpu.config import HiFiGANConfig
from autovc_tpu.models.layers import ConvTranspose1d


def _leaky(x, slope):
    return jax.nn.leaky_relu(x, negative_slope=slope)


class ResBlock1(nn.Module):
    """HiFi-GAN V1 resblock: 3x [dilated conv + conv], kernel k."""

    channels: int
    kernel: int
    dilations: tuple[int, ...]
    slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = _leaky(x, self.slope)
            h = nn.Conv(
                self.channels,
                (self.kernel,),
                kernel_dilation=(d,),
                padding=[(d * (self.kernel - 1) // 2,) * 2],
                name=f"conv1_{i}",
            )(h)
            h = _leaky(h, self.slope)
            h = nn.Conv(
                self.channels,
                (self.kernel,),
                padding=[((self.kernel - 1) // 2,) * 2],
                name=f"conv2_{i}",
            )(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    cfg: HiFiGANConfig = HiFiGANConfig()

    @nn.compact
    def __call__(self, mel):
        """mel (B, T, 80) -> waveform (B, T*prod(rates))."""
        c = self.cfg
        h = nn.Conv(c.upsample_initial_channel, (7,), padding=[(3, 3)], name="pre")(mel)
        ch = c.upsample_initial_channel
        for i, (rate, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch //= 2
            h = _leaky(h, c.leaky_relu_slope)
            h = ConvTranspose1d(
                ch, kernel_size=k, stride=rate, padding=(k - rate) // 2, name=f"up{i}"
            )(h)
            acc = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes, c.resblock_dilations)):
                y = ResBlock1(ch, rk, rd, c.leaky_relu_slope, name=f"res{i}_{j}")(h)
                acc = y if acc is None else acc + y
            h = acc / len(c.resblock_kernel_sizes)
        h = _leaky(h, c.leaky_relu_slope)
        h = nn.Conv(1, (7,), padding=[(3, 3)], name="post")(h)
        return jnp.tanh(h)[..., 0]


class HiFiGANVocoder:
    """User-facing wrapper mirroring WaveNetVocoder's interface."""

    def __init__(self, cfg: HiFiGANConfig, params: Any | None = None, seed: int = 0):
        self.cfg = cfg
        self.model = HiFiGANGenerator(cfg)
        if params is None:
            print("[hifigan] no checkpoint given; using random initialization")
            mel = jnp.zeros((1, 16, cfg.in_channels), jnp.float32)
            params = self.model.init(jax.random.PRNGKey(seed), mel)["params"]
        self.params = params
        self._apply = jax.jit(lambda p, m: self.model.apply({"params": p}, m))

    @classmethod
    def from_checkpoint(cls, cfg: HiFiGANConfig, path: str | None):
        if path is None:
            return cls(cfg)
        if path.endswith((".pt", ".pth", ".ckpt")):
            # public torch HiFi-GAN generator checkpoint (the pretrained
            # vocoder the reference README points at)
            import torch

            from autovc_tpu.interop.hifigan_import import hifigan_params_from_torch

            ckpt = torch.load(path, map_location="cpu", weights_only=True)
            sd = ckpt.get("generator", ckpt.get("state_dict", ckpt))
            return cls(cfg, hifigan_params_from_torch(sd, cfg))
        flat = dict(np.load(path))
        from autovc_tpu.vocoder.wavenet import unflatten_params

        return cls(cfg, unflatten_params(flat))

    def generate(self, mel: np.ndarray) -> jax.Array:
        """mel (T, 80) or (B, T, 80) -> waveform (T*256,) / (B, T*256)."""
        mel = jnp.asarray(mel, jnp.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        wav = self._apply(self.params, mel)
        return wav[0] if squeeze else wav
