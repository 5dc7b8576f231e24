"""STFT / iSTFT / Griffin-Lim as jit-compiled JAX ops.

Matches the reference ``pySTFT`` (make_spect.py:36-48): reflect-pad n_fft//2
on both sides, hop-strided 1024-sample frames, periodic Hann window, |rfft|.
Frame extraction is expressed as a reshape-free gather over a static index
grid (XLA lowers it to an efficient strided load); the windowing, rfft and
the downstream mel matmul all fuse under jit.

Also provides inverse transforms the reference only had in notebooks
(istft.ipynb, vocoder_stft.ipynb): weighted-overlap-add iSTFT and a
fixed-iteration Griffin-Lim as a lax.fori_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window — scipy.signal.get_window('hann', N, fftbins=True)."""
    n = np.arange(n_fft, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)
    return w.astype(dtype)


def num_frames(n_samples: int, n_fft: int = 1024, hop: int = 256) -> int:
    """Frame count after reflect-padding n_fft//2 both sides (make_spect.py:38-41):
    (n + 2*(n_fft//2) - (n_fft - hop)) // hop == (n + hop) // hop for even n_fft."""
    padded = n_samples + 2 * (n_fft // 2)
    return (padded - (n_fft - hop)) // hop


def frame_signal(x: jax.Array, n_fft: int = 1024, hop: int = 256) -> jax.Array:
    """Reflect-pad and slice into overlapping frames.

    x: (..., L) -> (..., T, n_fft) with T = num_frames(L).
    """
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = num_frames(x.shape[-1] - 2 * pad, n_fft, hop)
    # jnp (not np) arange: t may be a symbolic dimension under jax.export
    # shape polymorphism; XLA constant-folds the iota for concrete shapes.
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft_complex(x: jax.Array, n_fft: int = 1024, hop: int = 256) -> jax.Array:
    """Complex STFT, frames-major: (..., L) -> (..., T, n_fft//2+1)."""
    frames = frame_signal(x, n_fft, hop)
    window = jnp.asarray(hann_window(n_fft, dtype=np.float64).astype(x.dtype))
    return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft_magnitude(x: jax.Array, n_fft: int = 1024, hop: int = 256) -> jax.Array:
    """|STFT|, frames-major (T, bins) — the reference's pySTFT returns the
    (bins, T) transpose; we keep time-major throughout (TPU lane dim = bins)."""
    return jnp.abs(stft_complex(x, n_fft, hop))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "length"))
def istft(
    spec: jax.Array,
    n_fft: int = 1024,
    hop: int = 256,
    length: int | None = None,
) -> jax.Array:
    """Weighted-overlap-add inverse of ``stft_complex``.

    spec: (..., T, n_fft//2+1) complex -> (..., L) real with
    L = (T-1)*hop (center padding removed), or `length` if given.
    """
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    window = jnp.asarray(hann_window(n_fft, dtype=np.float64).astype(frames.dtype))
    frames = frames * window

    t = spec.shape[-2]
    out_len = n_fft + (t - 1) * hop
    batch_shape = frames.shape[:-2]

    # scatter-add via segment trick: one-hot matmul would be wasteful; use
    # lax.scan-free overlap-add with dynamic_update_slice in a fori_loop is
    # sequential — instead reshape into hop-phase lanes.
    # n_fft/hop is an integer overlap factor for our contract (1024/256 = 4).
    assert n_fft % hop == 0, "istft requires n_fft divisible by hop"
    k = n_fft // hop

    # pad frame count so it divides k, then sum k phase-shifted streams
    pad_t = (-t) % k
    frames_p = jnp.pad(frames, [(0, 0)] * len(batch_shape) + [(0, pad_t), (0, 0)])
    tp = t + pad_t
    total = jnp.zeros(batch_shape + (out_len + pad_t * hop + n_fft,), frames.dtype)
    wsum = jnp.zeros((out_len + pad_t * hop + n_fft,), jnp.float32)
    w2 = (window.astype(jnp.float32)) ** 2
    for phase in range(k):
        sub = frames_p[..., phase::k, :]  # (..., tp//k, n_fft)
        n_sub = sub.shape[-2]
        # frames within a phase stream are non-overlapping (stride k*hop = n_fft)
        flat = sub.reshape(batch_shape + (n_sub * n_fft,))
        start = phase * hop
        total = jax.lax.dynamic_update_slice_in_dim(
            total,
            jax.lax.dynamic_slice_in_dim(total, start, n_sub * n_fft, axis=-1) + flat,
            start,
            axis=-1,
        )
        # window-sum counts REAL frames only: the zero frames padded in to
        # make t divide k contribute nothing to `total`, but tiling w2 over
        # them inflates wsum where a phantom overlaps the real tail —
        # attenuating the last hop of audio whenever t % k != 0
        n_real = (t - phase + k - 1) // k if phase < t else 0
        if n_real:
            ones = jnp.tile(w2, n_real)
            wsum = jax.lax.dynamic_update_slice_in_dim(
                wsum,
                jax.lax.dynamic_slice_in_dim(wsum, start, n_real * n_fft, axis=-1)
                + ones,
                start,
                axis=-1,
            )

    total = total[..., :out_len]
    wsum = wsum[:out_len]
    y = total / jnp.maximum(wsum, 1e-10).astype(total.dtype)
    # strip the reflect-pad centering
    pad = n_fft // 2
    if length is None:
        return y[..., pad : out_len - pad]
    # librosa semantics: return EXACTLY `length` samples. Samples beyond
    # (t-1)*hop up to out_len - pad are real overlap-add output (the last
    # frame spans them), so length = t*hop — the neural vocoders' contract —
    # returns signal, not zeros; a mere [..., :length] trim on the stripped
    # (t-1)*hop buffer would silently come up one hop short.
    extra = pad + length - out_len
    if extra > 0:  # request beyond the WOLA buffer: zero-fill the tail
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, extra)])
    return y[..., pad : pad + length]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_iter", "length"))
def griffin_lim(
    mag: jax.Array,
    n_fft: int = 1024,
    hop: int = 256,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
    key: jax.Array | None = None,
    init_phase: jax.Array | None = None,
) -> jax.Array:
    """Griffin-Lim phase reconstruction (librosa-style with momentum).

    mag: (..., T, bins) magnitude -> (..., L) waveform. The reference used
    librosa.griffinlim in vocoder_stft.ipynb cell 0 as the cheap
    phase-reconstruction vocoder; here it is a fixed-trip-count fori_loop so
    the whole reconstruction compiles to one XLA program.

    init_phase: optional (..., T, bins) complex unit phasors to start from
    instead of random phase — e.g. the phase of a neural vocoder's output
    (vocoder.hybrid), which converges in far fewer iterations.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    t = mag.shape[-2]
    out_len = (t - 1) * hop if length is None else length

    if init_phase is not None:
        angles = (
            init_phase / jnp.maximum(jnp.abs(init_phase), 1e-16)
        ).astype(jnp.complex64)
    else:
        angles = jnp.exp(
            2j * jnp.pi * jax.random.uniform(key, mag.shape).astype(jnp.float32)
        ).astype(jnp.complex64)
    mag_c = mag.astype(jnp.complex64)

    def body(_, carry):
        angles, tprev = carry
        full = mag_c * angles
        inv = istft(full, n_fft, hop, length=out_len)
        rebuilt = stft_complex(inv, n_fft, hop)[..., :t, :]
        tnew = rebuilt - (momentum / (1.0 + momentum)) * tprev
        angles = tnew / jnp.maximum(jnp.abs(tnew), 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, jnp.zeros_like(mag_c)))
    return istft(mag_c * angles, n_fft, hop, length=out_len)
