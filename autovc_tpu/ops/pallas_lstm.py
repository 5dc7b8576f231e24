"""Fused LSTM sequence kernel (Pallas/Mosaic).

The recurrence h_t = f(x_proj_t, h_{t-1}) is the serial bottleneck of every
model in this framework (encoder BLSTM, decoder LSTMs, the GE2E d-vector).
XLA's lax.scan re-materializes the recurrent weight operand per iteration
from HBM; this kernel instead runs the sequence as pallas_calls with a grid
over time, keeping
  - w_hh (H, 4H) resident in VMEM for the whole call (constant index_map ->
    fetched once),
  - the (h, c) carry in VMEM scratch (TPU grids execute sequentially, so
    scratch persists across grid steps),
while x-projections stream in per step and hidden outputs stream out.

Long sequences are processed in fixed-size time chunks with the (h, c)
carry passed between calls — this bounds each call's output buffer so XLA
can't blow the 16MB scoped-VMEM budget by pinning a whole-sequence output
on-chip (observed with T=512, H=1024 inside larger programs).

Measured on the tunneled v5e: ~equal steady-state runtime to the XLA scan,
but ~500x faster to compile (1.2s vs 566s) — which is why conversion exposes
it via --pallas. Training works too: a custom VJP runs the backward
recurrence as a reversed-grid kernel (gate activations recomputed from the
stored h/c sequences; dW_hh accumulated in VMEM scratch).

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


def _cell_step(xproj_t, w_hh, h_prev, c_prev, hidden):
    """One LSTM cell update in float32 (inputs may be bf16)."""
    gates = xproj_t.astype(jnp.float32) + jnp.dot(
        h_prev, w_hh, preferred_element_type=jnp.float32
    )  # (B, 4H)
    i_g = gates[:, :hidden]
    f_g = gates[:, hidden : 2 * hidden]
    g_g = gates[:, 2 * hidden : 3 * hidden]
    o_g = gates[:, 3 * hidden :]
    c = jax.nn.sigmoid(f_g) * c_prev + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
    h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
    return h, c


def _lstm_kernel(xproj_ref, w_hh_ref, h0_ref, c0_ref, out_ref,
                 hn_ref, cn_ref, h_scratch, c_scratch, *, hidden):
    """Inference forward: no cell-state residual output."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        h_scratch[:] = h0_ref[:]
        c_scratch[:] = c0_ref[:]

    h, c = _cell_step(xproj_ref[0], w_hh_ref[:], h_scratch[:], c_scratch[:], hidden)
    c_scratch[:] = c
    h_scratch[:] = h
    out_ref[0] = h.astype(out_ref.dtype)

    @pl.when(t == nt - 1)
    def _final():
        hn_ref[:] = h
        cn_ref[:] = c


def _lstm_kernel_train(xproj_ref, w_hh_ref, h0_ref, c0_ref, out_ref, c_out_ref,
                       hn_ref, cn_ref, h_scratch, c_scratch, *, hidden):
    """Training forward: additionally streams the cell-state sequence (the
    custom-VJP residual). Kept separate so pure inference doesn't pay the
    extra VMEM->HBM output traffic (a pallas_call output can't be DCE'd)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        h_scratch[:] = h0_ref[:]
        c_scratch[:] = c0_ref[:]

    h, c = _cell_step(xproj_ref[0], w_hh_ref[:], h_scratch[:], c_scratch[:], hidden)
    c_scratch[:] = c
    h_scratch[:] = h
    out_ref[0] = h.astype(out_ref.dtype)
    c_out_ref[0] = c

    @pl.when(t == nt - 1)
    def _final():
        hn_ref[:] = h
        cn_ref[:] = c


def _lstm_kernel_split(xproj_ref, w_hh_ref, h0_ref, c0_ref, out_ref, hn_ref, cn_ref,
                       h_scratch, c_scratch, g_scratch, *, hidden):
    """Gate-split variant: grid (T, 4); step (t, j) computes gate j's
    preactivation with a (H, H) weight block (4x smaller VMEM footprint than
    the full (H, 4H) matrix — needed for H=1024 where w_hh alone is 16MB)."""
    t = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(0)

    @pl.when(jnp.logical_and(t == 0, j == 0))
    def _init():
        h_scratch[:] = h0_ref[:]
        c_scratch[:] = c0_ref[:]

    g_scratch[j] = xproj_ref[0, 0] + jnp.dot(
        h_scratch[:], w_hh_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(j == 3)
    def _update():
        i_g, f_g, g_g, o_g = g_scratch[0], g_scratch[1], g_scratch[2], g_scratch[3]
        c = jax.nn.sigmoid(f_g) * c_scratch[:] + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
        h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
        c_scratch[:] = c
        h_scratch[:] = h
        out_ref[0] = h.astype(out_ref.dtype)

        @pl.when(t == nt - 1)
        def _final():
            hn_ref[:] = h
            cn_ref[:] = c


def _lstm_kernel_split_train(xproj_ref, w_hh_ref, h0_ref, c0_ref, out_ref,
                             c_out_ref, hn_ref, cn_ref,
                             h_scratch, c_scratch, g_scratch, *, hidden):
    """Gate-split training forward: also streams the cell-state sequence
    (custom-VJP residual), mirroring _lstm_kernel_train."""
    t = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(0)

    @pl.when(jnp.logical_and(t == 0, j == 0))
    def _init():
        h_scratch[:] = h0_ref[:]
        c_scratch[:] = c0_ref[:]

    g_scratch[j] = xproj_ref[0, 0] + jnp.dot(
        h_scratch[:], w_hh_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(j == 3)
    def _update():
        i_g, f_g, g_g, o_g = g_scratch[0], g_scratch[1], g_scratch[2], g_scratch[3]
        c = jax.nn.sigmoid(f_g) * c_scratch[:] + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
        h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
        c_scratch[:] = c
        h_scratch[:] = h
        out_ref[0] = h.astype(out_ref.dtype)
        c_out_ref[0] = c

        @pl.when(t == nt - 1)
        def _final():
            hn_ref[:] = h
            cn_ref[:] = c


def _lstm_bwd_kernel_split(
    xg_ref, wg_ref, hprev_ref, cprev_ref, c_ref, dy_ref, dhn_ref, dcn_ref,
    dx_ref, dh0_ref, dc0_ref,
    g_s, dg_s, dh_acc, dc_s, *, hidden,
):
    """Gate-split reversed backward. Grid (Tc+1, 4); step (i, j) handles
    t = Tc-1-i, gate block j.

    The trick that keeps weight traffic at 1x forward: while gate block j of
    w_hh is VMEM-resident we do BOTH matmuls that need it —
      (a) recompute gate j's preactivation for the current step t, and
      (b) accumulate dL/dh_t's contribution  dgates_{t+1}[j] @ w_hh[j]^T
          from the PREVIOUS grid column's dgates (held in dg_s scratch).
    dW never lives on-chip: dgates streams to HBM and the (H, 4H) weight
    gradient is a single large MXU matmul outside the kernel (XLA tiles it
    better than any hand-rolled VMEM accumulator could at 16MB).

    The extra epilogue column (i == Tc) only performs (b), producing
    dL/dh0 = dgates_0 @ W^T; its block indices are clamped to t=0 and its
    recompute writes are masked off.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(0)  # Tc + 1

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        dg_s[:] = jnp.zeros_like(dg_s)
        dc_s[:] = dcn_ref[:]

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _seed_dh():
        dh_acc[:] = dhn_ref[:]

    @pl.when(jnp.logical_and(i > 0, j == 0))
    def _reset_dh():
        dh_acc[:] = jnp.zeros_like(dh_acc)

    # (b) dh_t += dgates_{t+1}[j] @ w_hh[j]^T  (dg_s is zero on column 0)
    dh_acc[:] += jax.lax.dot_general(
        dg_s[j], wg_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # (a) recompute gate j preactivation for step t (garbage on the epilogue
    # column — its consumers below are masked off there)
    g_s[j] = xg_ref[0, 0] + jnp.dot(
        hprev_ref[0], wg_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(jnp.logical_and(j == 3, i < nt - 1))
    def _grad():
        si = jax.nn.sigmoid(g_s[0])
        sf = jax.nn.sigmoid(g_s[1])
        tg = jnp.tanh(g_s[2])
        so = jax.nn.sigmoid(g_s[3])
        tc_ = jnp.tanh(c_ref[0])

        dh = dy_ref[0] + dh_acc[:]
        do = dh * tc_ * so * (1.0 - so)
        dc = dc_s[:] + dh * so * (1.0 - tc_ * tc_)
        di = dc * tg * si * (1.0 - si)
        dg = dc * si * (1.0 - tg * tg)
        df = dc * cprev_ref[0] * sf * (1.0 - sf)
        dg_s[0] = di
        dg_s[1] = df
        dg_s[2] = dg
        dg_s[3] = do
        dx_ref[0] = jnp.concatenate([di, df, dg, do], axis=-1).astype(dx_ref.dtype)
        dc_s[:] = dc * sf

    @pl.when(jnp.logical_and(j == 3, i == nt - 1))
    def _final():
        dh0_ref[:] = dh_acc[:]
        dc0_ref[:] = dc_s[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _lstm_chunk_split(xproj_t, w_hh, h0, c0, interpret: bool):
    """Differentiable gate-split chunk for large hidden sizes (w_hh too big
    for a single VMEM-resident block; (H, H) gate blocks stream instead)."""
    out, hn, cn = _lstm_chunk_split_impl(
        xproj_t, w_hh, h0, c0, interpret, with_residual=False
    )
    return out, hn, cn


def _split_fwd_rule(xproj_t, w_hh, h0, c0, interpret):
    out, c_seq, hn, cn = _lstm_chunk_split_impl(
        xproj_t, w_hh, h0, c0, interpret, with_residual=True
    )
    return (out, hn, cn), (xproj_t, w_hh, h0, c0, out, c_seq)


def _split_bwd_rule(interpret, residuals, cotangents):
    xproj_t, w_hh, h0, c0, h_seq, c_seq = residuals
    dy, dhn, dcn = cotangents
    tc, b, h4 = xproj_t.shape
    hidden = h4 // 4

    hprev = jnp.concatenate([h0[None], h_seq[:-1].astype(jnp.float32)], axis=0)
    cprev = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)
    xg = xproj_t.astype(jnp.float32).reshape(tc, b, 4, hidden).transpose(2, 0, 1, 3)
    wg = w_hh.astype(jnp.float32).reshape(hidden, 4, hidden).transpose(1, 0, 2)

    def rev_t(i, j):  # time-streamed blocks, clamped for the epilogue column
        return (jnp.maximum(tc - 1 - i, 0), 0, 0)

    def rev_gate_t(i, j):
        return (j, jnp.maximum(tc - 1 - i, 0), 0, 0)

    const = lambda i, j: (0, 0)
    dgates, dh0, dc0 = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel_split, hidden=hidden),
        grid=(tc + 1, 4),
        in_specs=[
            pl.BlockSpec((1, 1, b, hidden), rev_gate_t, memory_space=pltpu.VMEM),  # xg
            pl.BlockSpec((1, hidden, hidden), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), rev_t, memory_space=pltpu.VMEM),  # hprev
            pl.BlockSpec((1, b, hidden), rev_t, memory_space=pltpu.VMEM),  # cprev
            pl.BlockSpec((1, b, hidden), rev_t, memory_space=pltpu.VMEM),  # c
            pl.BlockSpec((1, b, hidden), rev_t, memory_space=pltpu.VMEM),  # dy
            pl.BlockSpec((b, hidden), const, memory_space=pltpu.VMEM),     # dhn
            pl.BlockSpec((b, hidden), const, memory_space=pltpu.VMEM),     # dcn
        ],
        out_specs=(
            pl.BlockSpec((1, b, h4), rev_t, memory_space=pltpu.VMEM),      # dgates
            pl.BlockSpec((b, hidden), const, memory_space=pltpu.VMEM),     # dh0
            pl.BlockSpec((b, hidden), const, memory_space=pltpu.VMEM),     # dc0
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tc, b, h4), jnp.float32),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, b, hidden), jnp.float32),  # g_s (recomputed gates)
            pltpu.VMEM((4, b, hidden), jnp.float32),  # dg_s (prev dgates)
            pltpu.VMEM((b, hidden), jnp.float32),     # dh accumulator
            pltpu.VMEM((b, hidden), jnp.float32),     # dc carry
        ],
        interpret=interpret,
    )(xg, wg, hprev, cprev, c_seq, dy.astype(jnp.float32), dhn, dcn)

    # weight gradient as one large MXU matmul outside the kernel:
    # dW[h, g] = sum_{t,b} hprev[t,b,h] * dgates[t,b,g]
    dw = jax.lax.dot_general(
        hprev.reshape(tc * b, hidden),
        dgates.reshape(tc * b, h4),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (
        dgates.astype(xproj_t.dtype),
        dw.astype(w_hh.dtype),
        dh0.astype(h0.dtype),
        dc0.astype(c0.dtype),
    )


def _lstm_chunk_split_impl(xproj_t, w_hh, h0, c0, interpret: bool,
                           with_residual: bool = False):
    """Gate-split chunk for large hidden sizes. Reshapes the gate axis into a
    leading block dim so BlockSpecs can tile it. with_residual=True also
    streams the cell-state sequence (the custom-VJP residual)."""
    tc, b, h4 = xproj_t.shape
    hidden = h4 // 4
    # gate axis leads so Mosaic's last-two-dims tiling constraint is met:
    # (Tc, B, 4H) -> (4, Tc, B, H);  (H, 4H) -> (4, H, H)
    xg = xproj_t.reshape(tc, b, 4, hidden).transpose(2, 0, 1, 3)
    wg = w_hh.reshape(hidden, 4, hidden).transpose(1, 0, 2)
    stream = pl.BlockSpec((1, b, hidden), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    const = pl.BlockSpec((b, hidden), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out_specs = [stream] + ([stream] if with_residual else []) + [const, const]
    out_shape = (
        [jax.ShapeDtypeStruct((tc, b, hidden), xproj_t.dtype)]
        + ([jax.ShapeDtypeStruct((tc, b, hidden), jnp.float32)] if with_residual else [])
        + [
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        ]
    )
    kernel = _lstm_kernel_split_train if with_residual else _lstm_kernel_split
    return pl.pallas_call(
        functools.partial(kernel, hidden=hidden),
        grid=(tc, 4),
        in_specs=[
            pl.BlockSpec((1, 1, b, hidden), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden, hidden), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((4, b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xg, wg, h0, c0)


def _chunk_fwd(xproj_t, w_hh, h0, c0, interpret: bool, with_residual: bool):
    """One chunk: (Tc, B, 4H) -> (h_seq, [c_seq,] hN, cN).

    with_residual=True additionally streams the cell-state sequence (needed
    by the backward pass); inference skips it to halve output traffic.
    """
    tc, b, h4 = xproj_t.shape
    hidden = h4 // 4
    stream = pl.BlockSpec((1, b, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    const = pl.BlockSpec((b, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_specs = [stream] + ([stream] if with_residual else []) + [const, const]
    out_shape = (
        [jax.ShapeDtypeStruct((tc, b, hidden), xproj_t.dtype)]
        + ([jax.ShapeDtypeStruct((tc, b, hidden), jnp.float32)] if with_residual else [])
        + [
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        ]
    )
    kernel = _lstm_kernel_train if with_residual else _lstm_kernel
    return pl.pallas_call(
        functools.partial(kernel, hidden=hidden),
        grid=(tc,),
        in_specs=[
            pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            const,
            const,
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xproj_t, w_hh, h0, c0)


def _lstm_bwd_kernel(
    xproj_ref, hprev_ref, cprev_ref, c_ref, dy_ref, w_hh_ref, dhn_ref, dcn_ref,
    dx_ref, dw_ref, dh0_ref, dc0_ref, dh_s, dc_s, dw_s, *, hidden,
):
    """Reversed-grid backward pass: step i processes t = T-1-i.

    Recomputes the gate activations from (xproj_t, h_{t-1}) — one extra
    matmul per step instead of storing (B, 4H) activations — and carries
    (dL/dh_t, dL/dc_t) in VMEM scratch; dW_hh accumulates on-chip and is
    emitted once at the end.
    """
    i = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dh_s[:] = dhn_ref[:]
        dc_s[:] = dcn_ref[:]
        dw_s[:] = jnp.zeros_like(dw_s)

    hprev = hprev_ref[0]
    gates = xproj_ref[0] + jnp.dot(hprev, w_hh_ref[:], preferred_element_type=jnp.float32)
    si = jax.nn.sigmoid(gates[:, :hidden])
    sf = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    tg = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    so = jax.nn.sigmoid(gates[:, 3 * hidden :])
    tc = jnp.tanh(c_ref[0])

    dh = dy_ref[0] + dh_s[:]
    do = dh * tc * so * (1.0 - so)
    dc = dc_s[:] + dh * so * (1.0 - tc * tc)
    di = dc * tg * si * (1.0 - si)
    dg = dc * si * (1.0 - tg * tg)
    df = dc * cprev_ref[0] * sf * (1.0 - sf)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)  # (B, 4H)

    dx_ref[0] = dgates.astype(dx_ref.dtype)
    dw_s[:] += jax.lax.dot_general(
        hprev, dgates, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (H, 4H)
    dh_s[:] = jax.lax.dot_general(
        dgates, w_hh_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (B, H): contribution to dL/dh_{t-1}
    dc_s[:] = dc * sf

    @pl.when(i == nt - 1)
    def _final():
        dw_ref[:] = dw_s[:]
        dh0_ref[:] = dh_s[:]
        dc0_ref[:] = dc_s[:]


def _chunk_bwd_call(xproj_t, w_hh, h0, c0, h_seq, c_seq, dy, dhn, dcn, interpret: bool):
    tc, b, h4 = xproj_t.shape
    hidden = h4 // 4
    hprev = jnp.concatenate([h0[None], h_seq[:-1]], axis=0)
    cprev = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)

    rev = lambda i: (tc - 1 - i, 0, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, hidden=hidden),
        grid=(tc,),
        in_specs=[
            pl.BlockSpec((1, b, h4), rev, memory_space=pltpu.VMEM),       # xproj
            pl.BlockSpec((1, b, hidden), rev, memory_space=pltpu.VMEM),   # hprev
            pl.BlockSpec((1, b, hidden), rev, memory_space=pltpu.VMEM),   # cprev
            pl.BlockSpec((1, b, hidden), rev, memory_space=pltpu.VMEM),   # c
            pl.BlockSpec((1, b, hidden), rev, memory_space=pltpu.VMEM),   # dy
            pl.BlockSpec((hidden, h4), const, memory_space=pltpu.VMEM),   # w_hh
            pl.BlockSpec((b, hidden), const, memory_space=pltpu.VMEM),    # dhn
            pl.BlockSpec((b, hidden), const, memory_space=pltpu.VMEM),    # dcn
        ],
        out_specs=(
            pl.BlockSpec((1, b, h4), rev, memory_space=pltpu.VMEM),       # dxproj
            pl.BlockSpec((hidden, h4), const, memory_space=pltpu.VMEM),   # dW
            pl.BlockSpec((b, hidden), const, memory_space=pltpu.VMEM),    # dh0
            pl.BlockSpec((b, hidden), const, memory_space=pltpu.VMEM),    # dc0
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tc, b, h4), xproj_t.dtype),
            jax.ShapeDtypeStruct((hidden, h4), jnp.float32),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((hidden, h4), jnp.float32),
        ],
        interpret=interpret,
    )(xproj_t, hprev, cprev, c_seq, dy, w_hh, dhn, dcn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _lstm_chunk(xproj_t, w_hh, h0, c0, interpret: bool):
    """Differentiable fused LSTM chunk: (Tc,B,4H) -> (h_seq, hN, cN).

    The primal (inference) path skips the cell-state residual output; only
    the VJP forward rule pays for it."""
    out, hn, cn = _chunk_fwd(xproj_t, w_hh, h0, c0, interpret, with_residual=False)
    return out, hn, cn


def _lstm_chunk_fwd_rule(xproj_t, w_hh, h0, c0, interpret):
    out, c_seq, hn, cn = _chunk_fwd(xproj_t, w_hh, h0, c0, interpret, with_residual=True)
    return (out, hn, cn), (xproj_t, w_hh, h0, c0, out, c_seq)


def _lstm_chunk_bwd_rule(interpret, residuals, cotangents):
    xproj_t, w_hh, h0, c0, h_seq, c_seq = residuals
    dy, dhn, dcn = cotangents
    dx, dw, dh0, dc0 = _chunk_bwd_call(
        xproj_t, w_hh, h0, c0, h_seq, c_seq, dy, dhn, dcn, interpret
    )
    return dx, dw.astype(w_hh.dtype), dh0.astype(h0.dtype), dc0.astype(c0.dtype)


_lstm_chunk.defvjp(_lstm_chunk_fwd_rule, _lstm_chunk_bwd_rule)
_lstm_chunk_split.defvjp(_split_fwd_rule, _split_bwd_rule)


def lstm_sequence(xproj, w_hh, reverse: bool = False, interpret: bool | None = None,
                  chunk: int = 128):
    """See _lstm_sequence; interpret=None auto-selects interpreter mode off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _lstm_sequence(xproj, w_hh, reverse=reverse, interpret=interpret, chunk=chunk)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret", "chunk"))
def _lstm_sequence(
    xproj: jax.Array,
    w_hh: jax.Array,
    reverse: bool = False,
    interpret: bool = False,
    chunk: int = 128,
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

    # full (H, 4H) weights above ~8MB can't stay VMEM-resident next to the
    # activation blocks; the gate-split kernel streams (H, H) gate blocks
    # instead (forward AND backward — see _split_bwd_rule's single-visit
    # weight schedule).
    split = w_hh.size * w_hh.dtype.itemsize > 8 * 1024 * 1024
    chunk_fn = _lstm_chunk_split if split else _lstm_chunk

    h = jnp.zeros((b, hidden), jnp.float32)
    c = jnp.zeros((b, hidden), jnp.float32)
    outs = []
    for start in range(0, t, chunk):
        end = min(start + chunk, t)
        out, h, c = chunk_fn(xt[start:end], w_hh, h, c, interpret)
        outs.append(out)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    if reverse:
        out = out[::-1]
    return jnp.swapaxes(out, 0, 1)  # (B, T, H)
