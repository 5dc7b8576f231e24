"""HiFi-GAN discriminators: multi-period (MPD) + multi-scale (MSD).

Standard HiFi-GAN adversarial setup (Kong et al. 2020), used by
train_hifigan's GAN mode to fine-tune the generator past the reconstruction
pretraining. LSGAN objectives + feature matching.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _leaky(x, slope=0.1):
    return jax.nn.leaky_relu(x, negative_slope=slope)


class PeriodDiscriminator(nn.Module):
    """Reshapes the waveform into (T/p, p) frames and applies 2-D convs."""

    period: int

    @nn.compact
    def __call__(self, y):
        # y: (B, T) -> (B, T/p, p, 1)
        b, t = y.shape
        pad = (-t) % self.period
        y = jnp.pad(y, ((0, 0), (0, pad)), mode="reflect" if t > 1 else "constant")
        y = y.reshape(b, (t + pad) // self.period, self.period, 1)

        feats = []
        ch = 32
        h = y
        for i in range(4):
            h = nn.Conv(ch, (5, 1), strides=(3, 1), padding=[(2, 2), (0, 0)], name=f"conv{i}")(h)
            h = _leaky(h)
            feats.append(h)
            ch = min(ch * 4, 1024)
        h = nn.Conv(1024, (5, 1), padding=[(2, 2), (0, 0)], name="conv4")(h)
        h = _leaky(h)
        feats.append(h)
        out = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], name="post")(h)
        return out.reshape(b, -1), feats


class ScaleDiscriminator(nn.Module):
    """1-D conv stack on a (possibly pooled) waveform."""

    @nn.compact
    def __call__(self, y):
        # y: (B, T) -> (B, T, 1)
        h = y[..., None]
        feats = []
        specs = [
            (128, 15, 1),
            (128, 41, 2),
            (256, 41, 2),
            (512, 41, 4),
            (1024, 41, 4),
            (1024, 5, 1),
        ]
        for i, (ch, k, s) in enumerate(specs):
            h = nn.Conv(
                ch, (k,), strides=(s,), padding=[(k // 2, k // 2)], name=f"conv{i}"
            )(h)
            h = _leaky(h)
            feats.append(h)
        out = nn.Conv(1, (3,), padding=[(1, 1)], name="post")(h)
        return out.reshape(y.shape[0], -1), feats


def _avg_pool(y, k=4, s=2):
    return nn.avg_pool(y[..., None], (k,), strides=(s,), padding="SAME")[..., 0]


class HiFiGANDiscriminators(nn.Module):
    """MPD (periods 2,3,5,7,11) + MSD (3 scales)."""

    periods: tuple[int, ...] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y):
        """y: (B, T) -> (list of score vectors, list of feature lists)."""
        scores, feats = [], []
        for p in self.periods:
            s, f = PeriodDiscriminator(p, name=f"mpd{p}")(y)
            scores.append(s)
            feats.append(f)
        h = y
        for i in range(3):
            s, f = ScaleDiscriminator(name=f"msd{i}")(h)
            scores.append(s)
            feats.append(f)
            h = _avg_pool(h)
        return scores, feats


def discriminator_loss(real_scores, fake_scores):
    """LSGAN: real -> 1, fake -> 0."""
    loss = 0.0
    for r, f in zip(real_scores, fake_scores):
        loss = loss + jnp.mean((r - 1.0) ** 2) + jnp.mean(f**2)
    return loss


def generator_adversarial_loss(fake_scores):
    """LSGAN: fake -> 1."""
    loss = 0.0
    for f in fake_scores:
        loss = loss + jnp.mean((f - 1.0) ** 2)
    return loss


def feature_matching_loss(real_feats, fake_feats):
    loss = 0.0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            loss = loss + jnp.mean(jnp.abs(r - f))
    return loss
