"""IIR filtering: Butterworth design + scipy-compatible zero-phase filtfilt.

The reference removes drifting noise with a 5th-order 30 Hz Butterworth
highpass applied zero-phase via scipy.signal.filtfilt (make_spect.py:30-34,74).
Filter *design* is a trace-time host computation (scipy, float64 constants);
the *filtering* runs on device as a forward+backward ``lax.scan`` over a
direct-form-II-transposed recurrence, with scipy's default odd-reflection
padding (padtype='odd', padlen=3*max(len(a),len(b))) reproduced exactly.

A recurrence of order 5 over T samples is sequential by nature; on TPU we
vmap it over the batch axis so the VPU processes B utterances per scan step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _scipy_signal


def butter_highpass(
    cutoff_hz: float = 30.0, fs: int = 16_000, order: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Butterworth highpass transfer-function coefficients (b, a), float64."""
    nyq = 0.5 * fs
    b, a = _scipy_signal.butter(order, cutoff_hz / nyq, btype="high", analog=False)
    return np.asarray(b, np.float64), np.asarray(a, np.float64)


def lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions for a step input (scipy.signal.lfilter_zi).

    Solves (I - A) zi = B for the DF2T state-space companion form, host-side
    in float64 — a trace-time constant.
    """
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    n = max(len(a), len(b))
    a0 = a[0]
    a = np.r_[a, np.zeros(n - len(a))] / a0
    b = np.r_[b, np.zeros(n - len(b))] / a0
    # transposed companion matrix of the denominator (DF2T state update)
    A = np.zeros((n - 1, n - 1))
    A[:, 0] = -a[1:n]
    A[:-1, 1:] = np.eye(n - 2)
    B = b[1:n] - a[1:n] * b[0]
    zi = np.linalg.solve(np.eye(n - 1) - A, B)
    return zi


def lfilter(
    b: jax.Array, a: jax.Array, x: jax.Array, zi: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """Direct-form-II-transposed IIR filter as a lax.scan.

    x: (..., L); zi: (..., order) or None (zeros). Returns (y, zf).
    Leading axes are handled by vmap inside scan (state is (..., order)).
    """
    b = jnp.asarray(b, x.dtype)
    a = jnp.asarray(a, x.dtype)
    order = b.shape[0] - 1
    if zi is None:
        zi = jnp.zeros(x.shape[:-1] + (order,), x.dtype)

    b0 = b[0]
    b_rest = b[1:]  # (order,)
    a_rest = a[1:]  # (order,)

    def step(z, xn):
        # xn: (...,) ; z: (..., order)
        y = b0 * xn + z[..., 0]
        shifted = jnp.concatenate(
            [z[..., 1:], jnp.zeros(z.shape[:-1] + (1,), z.dtype)], axis=-1
        )
        z_new = shifted + b_rest * xn[..., None] - a_rest * y[..., None]
        return z_new, y

    xt = jnp.moveaxis(x, -1, 0)  # time-major for scan
    zf, yt = jax.lax.scan(step, zi, xt)
    return jnp.moveaxis(yt, 0, -1), zf


@functools.partial(jax.jit, static_argnames=("padlen",))
def _filtfilt_jit(b, a, zi_unit, x, padlen: int):
    # odd extension (scipy.signal._arraytools.odd_ext)
    left = 2.0 * x[..., :1] - x[..., padlen:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2 : -padlen - 2 : -1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    y, _ = lfilter(b, a, ext, zi=zi_unit * ext[..., :1])
    y = y[..., ::-1]
    y, _ = lfilter(b, a, y, zi=zi_unit * y[..., :1])
    y = y[..., ::-1]
    return y[..., padlen:-padlen]


def filtfilt(
    b: np.ndarray, a: np.ndarray, x: jax.Array, padlen: int | None = None
) -> jax.Array:
    """Zero-phase forward-backward filter matching scipy.signal.filtfilt
    defaults (method='pad', padtype='odd').

    NOTE: the transfer-function form of a high-order lowcut filter is badly
    conditioned; use float64 inputs for scipy parity. The float32 production
    path is :func:`sos_filtfilt` (cascaded biquads, stable at single
    precision).
    """
    if padlen is None:
        padlen = 3 * max(len(a), len(b))
    zi = lfilter_zi(b, a)
    x = jnp.asarray(x)
    if x.shape[-1] <= padlen:  # scipy raises here too; numpy slicing would
        # otherwise clamp silently and return garbage
        raise ValueError(
            f"input length {x.shape[-1]} must exceed padlen {padlen}"
        )
    return _filtfilt_jit(
        jnp.asarray(b, x.dtype), jnp.asarray(a, x.dtype), jnp.asarray(zi, x.dtype), x, padlen
    )


def butter_highpass_sos(
    cutoff_hz: float = 30.0, fs: int = 16_000, order: int = 5
) -> np.ndarray:
    """Butterworth highpass as second-order sections (stable in float32)."""
    nyq = 0.5 * fs
    return _scipy_signal.butter(
        order, cutoff_hz / nyq, btype="high", analog=False, output="sos"
    )


def _sosfilt(sos: jax.Array, x: jax.Array, zi: jax.Array) -> jax.Array:
    """Cascaded-biquad DF2T filter as one lax.scan over time.

    sos: (n_sections, 6); x: (..., L); zi: (..., n_sections, 2).
    All sections advance within a single scan step (the cascade is sequential
    per sample, but the VPU processes the whole batch per step).
    """
    n_sections = sos.shape[0]
    b = sos[:, :3]
    a = sos[:, 3:]  # a[:,0] == 1 after scipy normalization

    def step(z, xn):
        y = xn
        z_out = []
        for s in range(n_sections):  # static unroll (5th order -> 3 sections)
            zs = z[..., s, :]
            y_new = b[s, 0] * y + zs[..., 0]
            z0 = b[s, 1] * y - a[s, 1] * y_new + zs[..., 1]
            z1 = b[s, 2] * y - a[s, 2] * y_new
            z_out.append(jnp.stack([z0, z1], axis=-1))
            y = y_new
        return jnp.stack(z_out, axis=-2), y

    xt = jnp.moveaxis(x, -1, 0)
    _, yt = jax.lax.scan(step, zi, xt)
    return jnp.moveaxis(yt, 0, -1)


@functools.partial(jax.jit, static_argnames=("padlen",))
def _sos_filtfilt_jit(sos, zi_unit, x, padlen: int):
    left = 2.0 * x[..., :1] - x[..., padlen:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2 : -padlen - 2 : -1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    y = _sosfilt(sos, ext, zi_unit * ext[..., 0][..., None, None])
    y = y[..., ::-1]
    y = _sosfilt(sos, y, zi_unit * y[..., 0][..., None, None])
    y = y[..., ::-1]
    return y[..., padlen:-padlen]


def sos_filtfilt(sos: np.ndarray, x: jax.Array, padlen: int | None = None) -> jax.Array:
    """Zero-phase filtering via second-order sections (scipy.sosfiltfilt
    semantics: odd padding, steady-state zi scaled by the edge sample).
    Numerically stable in float32 — the on-device production path."""
    sos = np.asarray(sos, np.float64)
    if padlen is None:
        padlen = 3 * (2 * len(sos) + 1 - min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum()))
    zi = _scipy_signal.sosfilt_zi(sos)  # (n_sections, 2), host float64
    x = jnp.asarray(x)
    if x.shape[-1] <= padlen:
        raise ValueError(
            f"input length {x.shape[-1]} must exceed padlen {padlen}"
        )
    return _sos_filtfilt_jit(
        jnp.asarray(sos, x.dtype),
        jnp.asarray(zi, x.dtype),
        x,
        int(padlen),
    )
