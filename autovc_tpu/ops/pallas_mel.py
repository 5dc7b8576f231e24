"""Fused mel-projection + dB-normalize kernel (Pallas/Mosaic).

The feature-extraction hot path after the rFFT: |STFT| (T, 513) @ mel_basis
(513, 80) on the MXU, immediately followed by the log/clip normalization on
the VPU — one VMEM round trip instead of two XLA ops
(make_spect.py:81-83 semantics).

Tiles over time; the 513-bin contraction dim and 80-mel lane dim are padded
to hardware tiles by the caller-visible wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MIN_LEVEL = 1e-5


def _kernel(mag_ref, basis_ref, out_ref, *, ref_db, min_db):
    m = jnp.dot(mag_ref[:], basis_ref[:], preferred_element_type=jnp.float32)
    db = 20.0 * jnp.log10(jnp.maximum(_MIN_LEVEL, m)) - ref_db
    out_ref[:] = jnp.clip((db - min_db) / -min_db, 0.0, 1.0)


@functools.partial(
    jax.jit, static_argnames=("ref_db", "min_db", "tile_t", "interpret")
)
def mel_normalize(
    mag: jax.Array,
    mel_basis: jax.Array,
    ref_db: float = 16.0,
    min_db: float = -100.0,
    tile_t: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """mag (T, n_bins) -> normalized mel (T, n_mels), fused."""
    t, n_bins = mag.shape
    n_mels = mel_basis.shape[1]

    # pad to hardware tiles: time to tile_t, bins to 128 lanes, mels to 128
    tp = -(-t // tile_t) * tile_t
    kp = -(-n_bins // 128) * 128
    np_ = -(-n_mels // 128) * 128
    mag_p = jnp.pad(mag, ((0, tp - t), (0, kp - n_bins)))
    basis_p = jnp.pad(mel_basis.astype(mag.dtype), ((0, kp - n_bins), (0, np_ - n_mels)))

    out = pl.pallas_call(
        functools.partial(_kernel, ref_db=ref_db, min_db=min_db),
        grid=(tp // tile_t,),
        in_specs=[
            pl.BlockSpec((tile_t, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, np_), mag.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * kp * np_,
            bytes_accessed=(tp * kp + kp * np_ + tp * np_) * 4,
            transcendentals=tp * np_,
        ),
        interpret=interpret,
    )(mag_p, basis_p)
    return out[:t, :n_mels]
