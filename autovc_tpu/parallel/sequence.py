"""Sequence (time-axis) parallelism for long-utterance conversion.

The reference bounds sequence length by single-device memory: training crops
to 128 frames and conversion runs whole utterances on one GPU
(SURVEY.md §5.7). There is no attention anywhere in the model family, so
ring-attention/Ulysses do not apply; the TPU-native long-sequence story for
conv+LSTM models is:

- halo_conv1d: time-sharded 'same' convolution — each device holds a time
  chunk and exchanges (k-1)/2-frame halos with its neighbors over ICI
  (ppermute) before convolving. Communication is O(halo), compute is fully
  parallel.
- sp_lstm / sp_blstm: chunked scan with sequential state handoff — device d
  runs its chunk after receiving (h, c) from device d-1 via ppermute. The
  recurrence stays serial (inherent to LSTM), but activations/memory are
  sharded, so utterances far beyond one chip's HBM become convertible;
  throughput recovers when batches pipeline.

All are shard_map-based SPMD functions over a 1-D 'seq' mesh axis.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _pvary(x, axes):
    """Mark a replicated value as device-varying over `axes` (shard_map's
    typed-collective requirement for values entering ppermute, and for
    lax.cond branch unification when other operands are varying over a
    second mesh axis). jax>=0.9 spells this lax.pcast(..., to='varying');
    older releases only have lax.pvary."""
    import jax.lax as lax

    axes = (axes,) if isinstance(axes, str) else tuple(axes)
    if hasattr(lax, "pcast"):
        return lax.pcast(x, axes, to="varying")
    return lax.pvary(x, axes)


def halo_conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None,
    mesh: Mesh,
    axis: str = "seq",
    batch_axis: str | None = None,
) -> jax.Array:
    """'Same' 1-D convolution over time-sharded input.

    x: (B, T, Cin) with T sharded over `axis`; kernel (k, Cin, Cout), k odd.
    Devices exchange `halo = k//2` frames with both neighbors (zero padding
    at the sequence ends), then convolve their chunk VALID.
    `batch_axis` optionally shards B over a second mesh axis (DP x SP);
    halos ride `axis` within each data-parallel slice.
    """
    k = kernel.shape[0]
    halo = k // 2
    assert k % 2 == 1

    def local(x_chunk, kernel, bias):
        if halo == 0:
            # k=1: pointwise conv, nothing to exchange (and x_chunk[:, -0:]
            # would select the WHOLE chunk, doubling the output length)
            padded = x_chunk
        else:
            n = jax.lax.axis_size(axis)
            idx = jax.lax.axis_index(axis)
            left_edge = x_chunk[:, :halo]  # first frames -> right neighbor's halo
            right_edge = x_chunk[:, -halo:]  # last frames -> left neighbor's halo

            # receive from left neighbor (their right edge), shifting right
            from_left = jax.lax.ppermute(
                right_edge, axis, [(i, (i + 1) % n) for i in range(n)]
            )
            from_right = jax.lax.ppermute(
                left_edge, axis, [(i, (i - 1) % n) for i in range(n)]
            )
            zeros = jnp.zeros_like(from_left)
            from_left = jnp.where(idx == 0, zeros, from_left)
            from_right = jnp.where(idx == n - 1, zeros, from_right)
            padded = jnp.concatenate([from_left, x_chunk, from_right], axis=1)
        out = jax.lax.conv_general_dilated(
            padded, kernel, (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")
        )
        if bias is not None:
            out = out + bias
        return out

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(), P()),
        out_specs=P(batch_axis, axis, None),
    )(x, kernel, bias if bias is not None else jnp.zeros((kernel.shape[-1],), x.dtype))


def _lstm_chunk_scan(xproj, w_hh, h0, c0, reverse: bool):
    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    xt = jnp.swapaxes(xproj, 0, 1)
    (h, c), hs = jax.lax.scan(step, (h0, c0), xt, reverse=reverse)
    return (h, c), jnp.swapaxes(hs, 0, 1)


def sp_lstm(
    x: jax.Array,
    w_ih: jax.Array,
    w_hh: jax.Array,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
    reverse: bool = False,
    batch_axis: str | None = None,
) -> jax.Array:
    """Sequence-parallel single-direction LSTM.

    x: (B, T, Cin), T sharded over `axis`; returns (B, T, H) sharded likewise.
    The input projection x @ w_ih runs fully parallel on every device's
    chunk; the recurrence runs as n_chunks sequential rounds, passing (h, c)
    along the ring (reverse=True passes the other way for the backward
    direction of a BLSTM).
    """
    hdim = w_hh.shape[0]

    def local(x_chunk, w_ih, w_hh, b):
        n = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        bsz = x_chunk.shape[0]
        xproj = x_chunk @ w_ih + b

        my_round = (n - 1 - idx) if reverse else idx
        perm = (
            [(i, (i - 1) % n) for i in range(n)]
            if reverse
            else [(i, (i + 1) % n) for i in range(n)]
        )

        vary = (axis,) if batch_axis is None else (axis, batch_axis)
        h = _pvary(jnp.zeros((bsz, hdim), x_chunk.dtype), vary)
        c = _pvary(jnp.zeros((bsz, hdim), x_chunk.dtype), vary)
        out = _pvary(jnp.zeros(x_chunk.shape[:2] + (hdim,), x_chunk.dtype), vary)

        def round_body(r, carry):
            h, c, out = carry
            is_mine = my_round == r

            def compute(_):
                (hf, cf), hs = _lstm_chunk_scan(xproj, w_hh, h, c, reverse)
                return hf, cf, hs

            def skip(_):
                return h, c, out

            h2, c2, out2 = jax.lax.cond(is_mine, compute, skip, None)
            # pass state along the ring every round; the device whose round
            # is r+1 accepts what the round-r producer just sent
            h3 = jax.lax.ppermute(h2, axis, perm)
            c3 = jax.lax.ppermute(c2, axis, perm)
            accept = my_round == r + 1
            h_next = jnp.where(accept, h3, h)
            c_next = jnp.where(accept, c3, c)
            # after my round, my output chunk is final
            return h_next, c_next, jnp.where(is_mine, out2, out)

        _, _, out = jax.lax.fori_loop(0, n, round_body, (h, c, out))
        return out

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(), P(), P()),
        out_specs=P(batch_axis, axis, None),
    )(x, w_ih, w_hh, b)


def sp_blstm(
    x: jax.Array,
    params: dict,
    mesh: Mesh,
    axis: str = "seq",
    num_layers: int = 2,
    batch_axis: str | None = None,
) -> jax.Array:
    """Sequence-parallel bidirectional LSTM stack using layers.LSTM's
    parameter naming (w_ih_l{k}_{fwd,bwd}, w_hh_..., b_...)."""
    h = x
    for layer in range(num_layers):
        fwd = sp_lstm(
            h,
            params[f"w_ih_l{layer}_fwd"],
            params[f"w_hh_l{layer}_fwd"],
            params[f"b_l{layer}_fwd"],
            mesh,
            axis,
            reverse=False,
            batch_axis=batch_axis,
        )
        bwd = sp_lstm(
            h,
            params[f"w_ih_l{layer}_bwd"],
            params[f"w_hh_l{layer}_bwd"],
            params[f"b_l{layer}_bwd"],
            mesh,
            axis,
            reverse=True,
            batch_axis=batch_axis,
        )
        h = jnp.concatenate([fwd, bwd], axis=-1)
    return h
