"""Fused LSTM sequence kernel (Pallas/Mosaic).

The recurrence h_t = f(x_proj_t, h_{t-1}) is the serial bottleneck of every
model in this framework (encoder BLSTM, decoder LSTMs, the GE2E d-vector).
XLA's lax.scan re-materializes the recurrent weight operand per iteration
from HBM; this kernel instead runs the WHOLE sequence as one pallas_call with
a grid over time, keeping
  - w_hh (H, 4H) resident in VMEM for the entire sequence (constant
    index_map -> fetched once),
  - the (h, c) carry in VMEM scratch (TPU grids execute sequentially, so
    scratch persists across grid steps),
while x-projections stream in per step and hidden outputs stream out.

The input projection x @ w_ih (the big MXU matmul) stays OUTSIDE the kernel
where XLA tiles it best — same hoisting as layers.LSTM.

Gate order matches torch/layers.LSTM: i, f, g, o.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(xproj_ref, w_hh_ref, out_ref, h_scratch, c_scratch, *, hidden):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    gates = xproj_ref[0] + jnp.dot(
        h_scratch[:], w_hh_ref[:], preferred_element_type=jnp.float32
    )  # (B, 4H)
    i_g = gates[:, :hidden]
    f_g = gates[:, hidden : 2 * hidden]
    g_g = gates[:, 2 * hidden : 3 * hidden]
    o_g = gates[:, 3 * hidden :]
    c = jax.nn.sigmoid(f_g) * c_scratch[:] + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
    h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
    c_scratch[:] = c
    h_scratch[:] = h
    out_ref[0] = h


def lstm_sequence(xproj, w_hh, reverse: bool = False, interpret: bool | None = None):
    """See _lstm_sequence; interpret=None auto-selects interpreter mode off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _lstm_sequence(xproj, w_hh, reverse=reverse, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def _lstm_sequence(
    xproj: jax.Array,
    w_hh: jax.Array,
    reverse: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Run an LSTM over precomputed input projections.

    xproj: (B, T, 4H) = x @ w_ih + b;  w_hh: (H, 4H).
    Returns hidden sequence (B, T, H). reverse=True scans right-to-left
    (the backward direction of a BLSTM).
    """
    b, t, h4 = xproj.shape
    hidden = h4 // 4
    xt = jnp.swapaxes(xproj, 0, 1)  # (T, B, 4H)
    if reverse:
        xt = xt[::-1]

    out = pl.pallas_call(
        functools.partial(_lstm_kernel, hidden=hidden),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, hidden), xproj.dtype),
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xt, w_hh)

    if reverse:
        out = out[::-1]
    return jnp.swapaxes(out, 0, 1)  # (B, T, H)
