"""Training losses (reference solver_encoder.py:227-290, sisdr_loss.py).

- recon MSE (L_recon / L_recon0), content L1 (L_content)
- negative SDR family (snr / sisdr / sdsdr), asteroid-compatible, WITH the
  eps stabilizer the reference's inline wav-branch SI-SNR omitted
  (solver_encoder.py:281-287 vs sisdr_loss.py:71,82-84 — SURVEY §7 fix list).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def mse(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.mean((a - b) ** 2)


def l1(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.mean(jnp.abs(a - b))


def neg_sdr(
    est: jnp.ndarray,
    target: jnp.ndarray,
    sdr_type: str = "sisdr",
    zero_mean: bool = True,
    take_log: bool = True,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Negative (SI-)SDR loss over (B, T) waveforms (sisdr_loss.py:58-86).

    sdr_type: 'snr' | 'sisdr' | 'sdsdr'. Returns scalar if reduction='mean',
    else per-batch (B,).
    """
    assert sdr_type in ("snr", "sisdr", "sdsdr")
    assert est.shape == target.shape
    if zero_mean:
        target = target - jnp.mean(target, axis=1, keepdims=True)
        est = est - jnp.mean(est, axis=1, keepdims=True)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(est * target, axis=1, keepdims=True)
        s_energy = jnp.sum(target**2, axis=1, keepdims=True) + EPS
        scaled_target = dot * target / s_energy
    else:
        scaled_target = target
    if sdr_type in ("sdsdr", "snr"):
        e_noise = est - target
    else:
        e_noise = est - scaled_target
    ratio = jnp.sum(scaled_target**2, axis=1) / (jnp.sum(e_noise**2, axis=1) + EPS)
    losses = 10.0 * jnp.log10(ratio + EPS) if take_log else ratio
    if reduction == "mean":
        losses = jnp.mean(losses)
    return -losses


def si_snr_loss(est: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """The wav-variant training SI-SNR (solver_encoder.py:281-287 semantics:
    no zero-meaning, mean over batch) with eps stabilization added."""
    return neg_sdr(est, target, "sisdr", zero_mean=False, take_log=True, reduction="mean")
