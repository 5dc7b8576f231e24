"""Core neural layers, designed for the TPU compilation model.

Equivalents of the reference's torch building blocks (model_vc_mel.py:7-38:
LinearNorm/ConvNorm; nn.BatchNorm1d; nn.LSTM), rebuilt as flax modules:

- Convs run channels-last (B, T, C) so the channel axis is the TPU lane axis.
- LSTMs are `lax.scan` cells with the input projection hoisted OUT of the
  scan: x @ W_ih over all timesteps is one big MXU matmul; the scan carries
  only the (B, 4H) recurrent matmul. This is the standard cuDNN-class
  formulation for XLA.
- Parameter layouts are chosen so reference torch checkpoints map over by
  simple transposes (see autovc_tpu/interop); gate order is torch's
  (i, f, g, o).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def xavier_uniform(gain: float = 1.0):
    """torch.nn.init.xavier_uniform_ with an explicit gain
    (torch's calculate_gain: linear=1, relu=sqrt(2), tanh=5/3)."""
    def init(key, shape, dtype=jnp.float32):
        # flax conv kernels are (k..., in, out): fan_in = prod(k)*in, fan_out = prod(k)*out
        receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
        a = gain * float(np.sqrt(6.0 / (fan_in + fan_out)))
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


GAINS = {"linear": 1.0, "relu": float(np.sqrt(2.0)), "tanh": 5.0 / 3.0, "sigmoid": 1.0}


class LinearNorm(nn.Module):
    """Dense with torch-style xavier-uniform init (model_vc_mel.py:7-17)."""

    features: int
    use_bias: bool = True
    w_init_gain: str = "linear"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform(GAINS[self.w_init_gain]),
            dtype=self.dtype,
        )(x)


class ConvNorm(nn.Module):
    """1-D conv over (B, T, C) with 'same' odd-kernel padding
    (model_vc_mel.py:20-38)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    w_init_gain: str = "linear"
    padding: Any = None  # None -> torch default int(dilation*(k-1)/2)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.padding is None:
            assert self.kernel_size % 2 == 1
            pad = int(self.dilation * (self.kernel_size - 1) / 2)
        else:
            pad = self.padding
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(pad, pad)] if isinstance(pad, int) else pad,
            kernel_dilation=(self.dilation,),
            use_bias=self.use_bias,
            kernel_init=xavier_uniform(GAINS[self.w_init_gain]),
            dtype=self.dtype,
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm over (B, T) per channel — torch BatchNorm1d semantics
    (eps 1e-5, running-stat momentum 0.1 -> flax momentum 0.9).

    use_fast_variance=False: the stable two-pass var = E[(x-mean)^2], like
    torch — NOT flax's default E[x^2] - E[x]^2, whose cancellation amplifies
    reduction-order rounding (a ~1e-7 relative delta in a cross-device mean
    becomes ~4e-3 absolute in var when activations have large means; measured
    on the 2-process-DP-vs-single-process seam, tests/test_multihost.py)."""

    use_running_average: bool | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis=-1,
            dtype=self.dtype,
            use_fast_variance=False,
        )(x)


def _lstm_scan(xproj, w_hh, h0, c0, reverse: bool = False):
    """Scan an LSTM over time given precomputed input projections.

    xproj: (B, T, 4H) = x @ W_ih + b   (the hoisted MXU matmul)
    w_hh:  (H, 4H)
    returns hidden sequence (B, T, H).
    Gate order is torch's: i, f, g, o.
    """
    hdim = w_hh.shape[0]

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ w_hh  # (B, 4H)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    xt = jnp.swapaxes(xproj, 0, 1)  # time-major (T, B, 4H)
    (_, _), hs = jax.lax.scan(step, (h0, c0), xt, reverse=reverse)
    del hdim
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


class LSTM(nn.Module):
    """Multi-layer (optionally bidirectional) LSTM over (B, T, C).

    Matches torch.nn.LSTM(batch_first=True) numerics: per layer and direction,
    parameters w_ih (in, 4H), w_hh (H, 4H), bias (4H,) (= torch b_ih + b_hh);
    zero initial state. Returns the top layer's hidden sequence:
    (B, T, H) or (B, T, 2H) with forward features first (torch layout).
    """

    hidden: int
    num_layers: int = 1
    bidirectional: bool = False
    dtype: Any = None
    # Pallas fused sequence kernel (ops.pallas_lstm): weights pinned in VMEM
    # across the time loop. Opt-in; numerically identical to the scan path.
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        compute_dtype = self.dtype or x.dtype
        scale = 1.0 / np.sqrt(self.hidden)

        def uinit(key, shape, dtype=jnp.float32):
            # torch LSTM default init: U(-1/sqrt(H), 1/sqrt(H))
            return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

        h = x
        for layer in range(self.num_layers):
            outs = []
            directions = ["fwd", "bwd"] if self.bidirectional else ["fwd"]
            in_dim = h.shape[-1]
            for d in directions:
                w_ih = self.param(f"w_ih_l{layer}_{d}", uinit, (in_dim, 4 * self.hidden))
                w_hh = self.param(f"w_hh_l{layer}_{d}", uinit, (self.hidden, 4 * self.hidden))
                b = self.param(f"b_l{layer}_{d}", uinit, (4 * self.hidden,))
                xproj = h.astype(compute_dtype) @ w_ih.astype(compute_dtype) + b.astype(
                    compute_dtype
                )
                # pallas handles every hidden size: <=8MB w_hh uses the
                # VMEM-resident kernel; larger (decoder H=1024 -> 16MB)
                # auto-routes to the gate-split kernel, whose custom VJP
                # streams dgates and does the dW contraction as one XLA
                # matmul (ops/pallas_lstm._split_bwd_rule)
                if self.use_pallas:
                    from autovc_tpu.ops.pallas_lstm import lstm_sequence

                    pad_b = (-B) % 8  # sublane tile
                    xp = jnp.pad(xproj, ((0, pad_b), (0, 0), (0, 0))) if pad_b else xproj
                    seq = lstm_sequence(xp, w_hh.astype(compute_dtype), reverse=(d == "bwd"))
                    outs.append(seq[:B])
                else:
                    h0 = jnp.zeros((B, self.hidden), compute_dtype)
                    c0 = jnp.zeros((B, self.hidden), compute_dtype)
                    outs.append(
                        _lstm_scan(
                            xproj, w_hh.astype(compute_dtype), h0, c0, reverse=(d == "bwd")
                        )
                    )
            h = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        return h


class PReLU(nn.Module):
    """PReLU with a single shared slope (torch nn.PReLU() default, init 0.25)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, a * x)


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv over (B, T, C) matching torch.nn.ConvTranspose1d
    (stride s, padding p): out_len = (in-1)*s - 2p + k."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        scale = 1.0 / np.sqrt(in_ch * self.kernel_size)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -scale, scale),
            (self.kernel_size, self.features, in_ch),  # (k, out, in): torch-friendly
        )
        dtype = self.dtype or x.dtype
        # torch's ConvTranspose is the gradient of conv: equivalent to
        # lax.conv_transpose with transpose_kernel=True and (k, out, in) kernel.
        y = jax.lax.conv_transpose(
            x.astype(dtype),
            kernel.astype(dtype),
            strides=(self.stride,),
            padding=[(self.kernel_size - 1 - self.padding, self.kernel_size - 1 - self.padding)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            transpose_kernel=True,
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -scale, scale),
                (self.features,),
            )
            y = y + bias.astype(dtype)
        return y
