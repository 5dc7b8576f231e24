"""Persistent Pallas kernel for autoregressive WaveNet generation.

The reference's quality path is sample-by-sample autoregressive synthesis
(reference synthesis.py:53-69: 256 sequential net evals per mel frame). At
batch 1 the cost is pure HBM weight streaming: every generated sample must
read all ~96MB (f32) of layer weights. The XLA scan path (vocoder/wavenet.py
_generate_scan) already runs near the f32 streaming roofline, so the only
way to go faster is to move fewer bytes and keep the stream saturated:

- grid (T, L): sample-major, layer-minor. Layer l's weights are streamed as
  grid-indexed input blocks, so Mosaic's automatic pipelining DOUBLE-BUFFERS
  the fetch of layer l+1 against layer l's compute — a hand-written
  persistent kernel's overlap schedule, expressed declaratively.
- bfloat16 weight blocks halve the bytes per sample vs f32 (the MoL head and
  all accumulations stay float32).
- the dilation ring buffers, the (h, skip) accumulators, and the previous
  sample live in VMEM scratch for the whole call — nothing autoregressive
  ever round-trips through HBM.

Randomness is externalized: the caller pregenerates (T, B, K+1) uniforms and
both this kernel and the scan path consume the same stream (wavenet.
sample_from_mol_uniforms), making the two engines directly comparable.

VMEM budget (B=8, bf16): w3 block 1.5MB x2 (pipeline) + wout/wskip/wcond
~0.9MB x2 + ring buffers 4.1MB + accumulators < 16MB/core.

Large batches (B=32) exceed VMEM with all rings resident (504 slots x B x
512ch). hbm_threshold splits the rings by dilation: layers with d <
threshold keep VMEM rings (at threshold 16 that is 120 of 504 slots — the
cheap 24%), layers with d >= threshold move their rings to HBM with
double-buffered async DMA. The schedule is hazard-free by construction:
a slot read for sample t was written at sample t-d or t-2d, i.e. >= 15
samples (~360 grid steps) earlier, so reads for sample t+1 prefetch during
sample t's first grid step and writes drain with multi-sample slack. Extra
HBM traffic is 3 x B x R bytes per hbm-layer per sample (~0.8 MB/sample at
B=32) against ~50 MB/sample of weight streaming — noise. The ring lives in
an input/output-aliased HBM buffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT_HALF = float(np.sqrt(0.5))


def _sample_mol(logits, uniforms, log_scale_min):
    """MoL sampling on (B, 3K) logits with (B, K+1) uniforms — mirrors
    wavenet.sample_from_mol_uniforms with Mosaic-safe one-hot (2D iota)."""
    b, k3 = logits.shape
    k = k3 // 3
    logit_probs = logits[:, :k]
    means = logits[:, k : 2 * k]
    log_scales = jnp.maximum(logits[:, 2 * k :], log_scale_min)

    u_sel = jnp.clip(uniforms[:, :k], 1e-5, 1.0 - 1e-5)
    u_x = jnp.clip(uniforms[:, k], 1e-5, 1.0 - 1e-5)
    g = -jnp.log(-jnp.log(u_sel))
    am = jnp.argmax(logit_probs + g, axis=-1)  # (B,)
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    sel = (iota == am[:, None]).astype(logits.dtype)
    mu = jnp.sum(means * sel, axis=-1)
    log_s = jnp.sum(log_scales * sel, axis=-1)
    x = mu + jnp.exp(log_s) * (jnp.log(u_x) - jnp.log1p(-u_x))
    return jnp.clip(x, -1.0, 1.0)


def _begin_sample(xprev_s, h_s, skip_s, fk_ref, fb_ref):
    """First-conv projection of the previous sample; reset the skip sum."""
    h_s[:] = xprev_s[0][:, None] * fk_ref[0][None, :] + fb_ref[0][None, :]
    skip_s[:] = jnp.zeros_like(skip_s)


def _residual_layer(
    x_2d, x_d, h,
    w3_ref, wcond_ref, wout_ref, wskip_ref, bg_ref, bo_ref, bs_ref,
    cond_ref, h_s, skip_s, g2,
):
    """Shared per-(t, l) layer math for BOTH ring variants: fused gates
    matmul over [x(t-2d), x(t-d), x(t)], gated activation, skip and
    residual accumulator updates. `h` is the layer INPUT — the caller
    stores it into the just-consumed ring slot (VMEM or HBM)."""
    dtype = h.dtype
    x_all = jnp.concatenate([x_2d, x_d, h], axis=-1)  # (B, 3R)
    gates = (
        jnp.dot(x_all, w3_ref[0], preferred_element_type=jnp.float32)
        + jnp.dot(cond_ref[0].astype(dtype), wcond_ref[0], preferred_element_type=jnp.float32)
        + bg_ref[0, 0][None, :]
    )  # (B, G) f32
    z = (jnp.tanh(gates[:, :g2]) * jax.nn.sigmoid(gates[:, g2:])).astype(dtype)

    skip_s[:] = (
        skip_s[:]
        + jnp.dot(z, wskip_ref[0], preferred_element_type=jnp.float32)
        + bs_ref[0, 0][None, :]
    ) * SQRT_HALF
    h_s[:] = (
        h_s[:]
        + jnp.dot(z, wout_ref[0], preferred_element_type=jnp.float32)
        + bo_ref[0, 0][None, :]
    ) * SQRT_HALF


def _emit_sample(
    skip_s, l1k_ref, l1b_ref, l2k_ref, l2b_ref, unif_ref, y_ref, xprev_s,
    log_scale_min,
):
    """MoL head + sampling after the last layer of a sample."""
    out = jax.nn.relu(skip_s[:])
    out = jax.nn.relu(
        jnp.dot(out, l1k_ref[:], preferred_element_type=jnp.float32)
        + l1b_ref[0][None, :]
    )
    logits = (
        jnp.dot(out, l2k_ref[:], preferred_element_type=jnp.float32)
        + l2b_ref[0][None, :]
    )
    x_t = _sample_mol(logits, unif_ref[0], log_scale_min)
    y_ref[0, 0] = x_t
    xprev_s[0] = x_t


def _wavenet_kernel(
    dil_s, off_s,  # SMEM (L,) int32
    w3_ref, wcond_ref, wout_ref, wskip_ref, bg_ref, bo_ref, bs_ref,
    fk_ref, fb_ref, l1k_ref, l1b_ref, l2k_ref, l2b_ref,
    cond_ref, unif_ref,
    y_ref,
    rbuf, xprev_s, h_s, skip_s,
    *, n_layers, g2, log_scale_min,
):
    t = pl.program_id(0)
    l = pl.program_id(1)

    @pl.when(jnp.logical_and(t == 0, l == 0))
    def _init():
        rbuf[:] = jnp.zeros_like(rbuf)
        xprev_s[:] = jnp.zeros_like(xprev_s)

    @pl.when(l == 0)
    def _first_conv():
        _begin_sample(xprev_s, h_s, skip_s, fk_ref, fb_ref)

    d = dil_s[l]
    off = off_s[l]
    size = 2 * d
    slot = jax.lax.rem(t, size)
    slot_d = jax.lax.rem(t + d, size)  # (t - d) mod 2d

    dtype = rbuf.dtype
    x_2d = rbuf[pl.ds(off + slot, 1)][0]  # (B, R)
    x_d = rbuf[pl.ds(off + slot_d, 1)][0]
    h = h_s[:].astype(dtype)

    _residual_layer(
        x_2d, x_d, h, w3_ref, wcond_ref, wout_ref, wskip_ref,
        bg_ref, bo_ref, bs_ref, cond_ref, h_s, skip_s, g2,
    )
    # store this layer's INPUT into the slot just consumed (x[t-2d]'s slot)
    rbuf[pl.ds(off + slot, 1)] = h[None]

    @pl.when(l == n_layers - 1)
    def _emit():
        _emit_sample(
            skip_s, l1k_ref, l1b_ref, l2k_ref, l2b_ref, unif_ref, y_ref,
            xprev_s, log_scale_min,
        )


def _wavenet_kernel_hybrid(
    dil_s, off_s,  # SMEM (L,) int32 — VMEM-ring tables (1/0 for HBM layers)
    hbm_idx_s,     # SMEM (L,) int32 — index into the hbm tables, -1 if VMEM
    hbm_dil_s, hbm_off_s,  # SMEM (n_hbm,) int32
    w3_ref, wcond_ref, wout_ref, wskip_ref, bg_ref, bo_ref, bs_ref,
    fk_ref, fb_ref, l1k_ref, l1b_ref, l2k_ref, l2b_ref,
    cond_ref, unif_ref,
    ring_in,       # ANY/HBM (hbm_slots, BP, R) — aliased with ring_out
    y_ref, ring_out,
    rbuf, xprev_s, h_s, skip_s,
    rd_stage, wr_stage, rd_sem, wr_sem,
    *, n_layers, g2, log_scale_min, n_hbm,
):
    """Hybrid-ring variant: small-dilation rings in VMEM (as in
    _wavenet_kernel), large-dilation rings in HBM with double-buffered DMA.

    Staging layout (bank = sample parity):
      rd_stage[(bank*n_hbm + j)*2 + k]: k=0 -> x[t-2d], k=1 -> x[t-d]
      wr_stage[bank*n_hbm + j]:         layer j's input h, en route to HBM
    Reads for sample u prefetch at grid step (u-1, 0) (u=0 bootstraps at
    (0,0)); they target data written >= threshold-1 samples earlier, so no
    read-after-write hazard exists by construction. A write issued at
    sample t is semaphore-waited at sample t+2 before its staging slot is
    reused — its HBM slot is next read >= threshold samples later.
    """
    t = pl.program_id(0)
    l = pl.program_id(1)
    num_t = pl.num_programs(0)

    @pl.when(jnp.logical_and(t == 0, l == 0))
    def _init():
        rbuf[:] = jnp.zeros_like(rbuf)
        xprev_s[:] = jnp.zeros_like(xprev_s)

    def _read_copy(u, j, k, d, off):
        """Async copy of h[u - (2-k)*d] (k=0 -> 2d, k=1 -> d) for hbm layer j.

        Source is ring_out, not ring_in: they alias the same HBM buffer on
        TPU, but interpret mode does not connect the aliased pair — reading
        the output ref is correct in both."""
        slot = off + jax.lax.rem(u + k * d, 2 * d)
        bank = jax.lax.rem(u, 2)
        dst = (bank * n_hbm + j) * 2 + k
        return pltpu.make_async_copy(
            ring_out.at[pl.ds(slot, 1)], rd_stage.at[pl.ds(dst, 1)], rd_sem.at[dst]
        )

    def _write_copy(u, j, d, off):
        slot = off + jax.lax.rem(u, 2 * d)
        src = jax.lax.rem(u, 2) * n_hbm + j
        return pltpu.make_async_copy(
            wr_stage.at[pl.ds(src, 1)], ring_out.at[pl.ds(slot, 1)], wr_sem.at[src]
        )

    @pl.when(l == 0)
    def _first_conv():
        _begin_sample(xprev_s, h_s, skip_s, fk_ref, fb_ref)
        # prefetch next sample's HBM-ring reads (and sample 0's at t == 0)
        for j in range(n_hbm):
            d_j = hbm_dil_s[j]
            off_j = hbm_off_s[j]

            @pl.when(t == 0)
            def _bootstrap(j=j, d_j=d_j, off_j=off_j):
                for k in range(2):
                    _read_copy(0, j, k, d_j, off_j).start()

            @pl.when(t + 1 < num_t)
            def _ahead(j=j, d_j=d_j, off_j=off_j):
                for k in range(2):
                    _read_copy(t + 1, j, k, d_j, off_j).start()

    d = dil_s[l]
    off = off_s[l]
    slot = jax.lax.rem(t, 2 * d)
    slot_d = jax.lax.rem(t + d, 2 * d)  # (t - d) mod 2d

    jh = hbm_idx_s[l]
    is_hbm = jh >= 0
    jh_safe = jnp.maximum(jh, 0)
    d_h = hbm_dil_s[jh_safe]
    off_h = hbm_off_s[jh_safe]
    bank = jax.lax.rem(t, 2)
    rd_base = (bank * n_hbm + jh_safe) * 2
    wr_base = bank * n_hbm + jh_safe

    @pl.when(is_hbm)
    def _wait_reads():
        for k in range(2):
            _read_copy(t, jh_safe, k, d_h, off_h).wait()
        # staging slot reuse: the write DMA issued two samples ago on this
        # bank must have drained before we overwrite wr_stage below
        @pl.when(t >= 2)
        def _wait_prev_write():
            _write_copy(t - 2, jh_safe, d_h, off_h).wait()

    dtype = rbuf.dtype
    x_2d_v = rbuf[pl.ds(off + slot, 1)][0]  # (B, R)
    x_d_v = rbuf[pl.ds(off + slot_d, 1)][0]
    x_2d_h = rd_stage[pl.ds(rd_base, 1)][0]
    x_d_h = rd_stage[pl.ds(rd_base + 1, 1)][0]
    x_2d = jnp.where(is_hbm, x_2d_h, x_2d_v)
    x_d = jnp.where(is_hbm, x_d_h, x_d_v)
    h = h_s[:].astype(dtype)

    _residual_layer(
        x_2d, x_d, h, w3_ref, wcond_ref, wout_ref, wskip_ref,
        bg_ref, bo_ref, bs_ref, cond_ref, h_s, skip_s, g2,
    )

    # store this layer's INPUT into the slot just consumed (x[t-2d]'s slot)
    @pl.when(jnp.logical_not(is_hbm))
    def _store_vmem():
        rbuf[pl.ds(off + slot, 1)] = h[None]

    @pl.when(is_hbm)
    def _store_hbm():
        wr_stage[pl.ds(wr_base, 1)] = h[None]
        _write_copy(t, jh_safe, d_h, off_h).start()

    @pl.when(l == n_layers - 1)
    def _emit():
        _emit_sample(
            skip_s, l1k_ref, l1b_ref, l2k_ref, l2b_ref, unif_ref, y_ref,
            xprev_s, log_scale_min,
        )

        # drain the write DMAs still in flight at the end of the run
        @pl.when(t == num_t - 1)
        def _drain():
            for j in range(n_hbm):
                d_j = hbm_dil_s[j]
                off_j = hbm_off_s[j]

                @pl.when(num_t >= 2)
                def _w2(j=j, d_j=d_j, off_j=off_j):
                    _write_copy(num_t - 2, j, d_j, off_j).wait()

                _write_copy(num_t - 1, j, d_j, off_j).wait()


def pack_weights(params: dict, n_layers: int, dtype=jnp.bfloat16) -> dict:
    """Stack per-layer weights into grid-streamable (L, ...) arrays."""
    lp = [params["layers"][str(i)] for i in range(n_layers)]
    cast = lambda a: jnp.asarray(a, dtype)
    return {
        "w3": jnp.stack(
            [
                jnp.concatenate([cast(p["w_prev2"]), cast(p["w_prev1"]), cast(p["w_cur"])], axis=0)
                for p in lp
            ]
        ),  # (L, 3R, G)
        "wcond": jnp.stack([cast(p["w_cond"]) for p in lp]),  # (L, C, G)
        "wout": jnp.stack([cast(p["w_out"]) for p in lp]),    # (L, G/2, R)
        "wskip": jnp.stack([cast(p["w_skip"]) for p in lp]),  # (L, G/2, S)
        # biases as (L, 1, dim): a (1, 1, dim) block's last two dims equal the
        # array's, satisfying Mosaic's tiling rule (a 2D (1, dim) block off a
        # (L, dim) array has an illegal sublane extent of 1)
        "bg": jnp.stack([jnp.asarray(p["bias"], jnp.float32) for p in lp])[:, None, :],
        "bo": jnp.stack([jnp.asarray(p["b_out"], jnp.float32) for p in lp])[:, None, :],
        "bs": jnp.stack([jnp.asarray(p["b_skip"], jnp.float32) for p in lp])[:, None, :],
        "fk": jnp.asarray(params["first_conv"]["kernel"], jnp.float32),  # (1, R)
        "fb": jnp.asarray(params["first_conv"]["bias"], jnp.float32)[None],  # (1, R)
        "l1k": jnp.asarray(params["last1"]["kernel"], jnp.float32),
        "l1b": jnp.asarray(params["last1"]["bias"], jnp.float32)[None],
        "l2k": jnp.asarray(params["last2"]["kernel"], jnp.float32),
        "l2b": jnp.asarray(params["last2"]["bias"], jnp.float32)[None],
    }


@functools.partial(
    jax.jit,
    static_argnames=("dilations", "log_scale_min", "interpret", "hbm_threshold"),
)
def generate_pallas(
    packed: dict,
    dilations: tuple,
    cond: jax.Array,      # (B, T, C) float32
    uniforms: jax.Array,  # (B, T, K+1) float32
    log_scale_min: float = -32.23619130191664,
    interpret: bool = False,
    hbm_threshold: int | None = None,
) -> jax.Array:
    """Autoregressive generation; returns (B, T) float32 waveform.

    hbm_threshold: dilations >= this keep their ring buffers in HBM with
    double-buffered DMA (module docstring), lifting the VMEM batch ceiling
    (B=32 bf16 fits with threshold 16). None = all rings VMEM-resident.
    """
    b, t, c = cond.shape
    n_layers = len(dilations)
    r = packed["wout"].shape[-1]
    g = packed["w3"].shape[-1]
    s = packed["wskip"].shape[-1]
    ku = uniforms.shape[-1]
    dtype = packed["w3"].dtype

    pad_b = (-b) % 8  # sublane tile
    if pad_b:
        cond = jnp.pad(cond, ((0, pad_b), (0, 0), (0, 0)))
        uniforms = jnp.pad(
            uniforms, ((0, pad_b), (0, 0), (0, 0)), constant_values=0.5
        )
    bp = b + pad_b

    dils = np.asarray(dilations, np.int32)

    hybrid = hbm_threshold is not None and bool(np.any(dils >= hbm_threshold))
    if hybrid:
        if not interpret and r % 128:
            # The HBM<->VMEM ring DMAs copy (1, B, R) slot slices; Mosaic
            # requires the minor dim of a sliced memref to be lane-aligned
            # ("Slice shape along dimension 2 must be aligned to tiling
            # (128), but is 16" — measured on real v5e, 2026-08-19).
            # Interpret mode executes copies synchronously and never hits
            # the constraint, which is why only hardware runs catch this.
            raise ValueError(
                f"hybrid HBM-ring path requires residual_channels to be a "
                f"multiple of 128 (got {r}); use hbm_threshold=None "
                "(all-VMEM rings) or the scan engine"
            )
        # The sample-ahead prefetch reads h[u-d] written at grid (u-d, l) and
        # issues at (u-1, 0); the write's semaphore wait happens at (u-d+2, l),
        # so completion is only ordered before the read issue when d >= 4
        # (d < 2 is stale-by-construction, d in {2,3} races the in-flight DMA).
        assert hbm_threshold >= 4, (
            f"hbm_threshold must be >= 4 (got {hbm_threshold}): smaller "
            "dilations violate the hazard-free prefetch schedule"
        )
        is_hbm = dils >= hbm_threshold
        # VMEM-ring tables: hbm layers get (d=1, off=0) placeholders so their
        # (unused, pl.when-guarded) rbuf indices stay in range
        vdils = np.where(is_hbm, 1, dils).astype(np.int32)
        voffsets = np.zeros(n_layers, np.int32)
        vmem_slots = 0
        for i in range(n_layers):
            if not is_hbm[i]:
                voffsets[i] = vmem_slots
                vmem_slots += 2 * int(dils[i])
        vmem_slots = max(vmem_slots, 2)
        hbm_layers = np.nonzero(is_hbm)[0]
        n_hbm = len(hbm_layers)
        hbm_dils = dils[hbm_layers]
        hbm_offsets = np.concatenate([[0], np.cumsum(2 * hbm_dils)[:-1]]).astype(np.int32)
        hbm_slots = int(np.sum(2 * hbm_dils))
        hbm_idx = np.full(n_layers, -1, np.int32)
        hbm_idx[hbm_layers] = np.arange(n_hbm)
        dils_arg, offsets_arg = vdils, voffsets
        total_slots = vmem_slots
    else:
        offsets = np.concatenate([[0], np.cumsum(2 * dils)[:-1]]).astype(np.int32)
        total_slots = int(np.sum(2 * dils))
        dils_arg, offsets_arg = dils, offsets

    cond_t = jnp.swapaxes(cond, 0, 1)          # (T, B, C)
    unif_t = jnp.swapaxes(uniforms, 0, 1)      # (T, B, K+1)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    layer2 = lambda d0, d1: pl.BlockSpec((1, d0, d1), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM)
    layer1 = lambda d0: pl.BlockSpec((1, 1, d0), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM)
    const2 = lambda d0, d1: pl.BlockSpec((d0, d1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    time2 = lambda d0, d1: pl.BlockSpec((1, d0, d1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)

    weight_specs = [
        layer2(3 * r, g),                       # w3
        layer2(c, g),                           # wcond
        layer2(g // 2, r),                      # wout
        layer2(g // 2, s),                      # wskip
        layer1(g), layer1(r), layer1(s),        # bg, bo, bs
        const2(1, r), const2(1, r),             # fk, fb
        const2(s, s), const2(1, s),             # last1
        const2(s, packed["l2k"].shape[-1]), const2(1, packed["l2k"].shape[-1]),
        time2(bp, c),                           # cond
        time2(bp, ku),                          # uniforms
    ]
    weight_args = (
        packed["w3"], packed["wcond"], packed["wout"], packed["wskip"],
        packed["bg"], packed["bo"], packed["bs"],
        packed["fk"], packed["fb"], packed["l1k"], packed["l1b"],
        packed["l2k"], packed["l2b"],
        cond_t, unif_t,
    )
    # (T, 1, B) so the (1, 1, B) block's last two dims equal the array's
    y_spec = pl.BlockSpec((1, 1, bp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    y_shape = jax.ShapeDtypeStruct((t, 1, bp), jnp.float32)
    base_scratch = [
        pltpu.VMEM((total_slots, bp, r), dtype),  # dilation ring buffers
        pltpu.VMEM((1, bp), jnp.float32),         # previous sample
        pltpu.VMEM((bp, r), jnp.float32),         # residual accumulator
        pltpu.VMEM((bp, s), jnp.float32),         # skip accumulator
    ]

    if not hybrid:
        y = pl.pallas_call(
            functools.partial(
                _wavenet_kernel, n_layers=n_layers, g2=g // 2,
                log_scale_min=log_scale_min,
            ),
            grid=(t, n_layers),
            in_specs=[smem(), smem()] + weight_specs,
            out_specs=y_spec,
            out_shape=y_shape,
            scratch_shapes=base_scratch,
            interpret=interpret,
        )(jnp.asarray(dils_arg), jnp.asarray(offsets_arg), *weight_args)
        return jnp.swapaxes(y[:, 0, :], 0, 1)[:b]

    ring0 = jnp.zeros((hbm_slots, bp, r), dtype)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    y, _ring = pl.pallas_call(
        functools.partial(
            _wavenet_kernel_hybrid, n_layers=n_layers, g2=g // 2,
            log_scale_min=log_scale_min, n_hbm=n_hbm,
        ),
        grid=(t, n_layers),
        in_specs=[smem(), smem(), smem(), smem(), smem()]
        + weight_specs
        + [anyspec],
        out_specs=(y_spec, anyspec),
        out_shape=(y_shape, jax.ShapeDtypeStruct((hbm_slots, bp, r), dtype)),
        scratch_shapes=base_scratch + [
            pltpu.VMEM((4 * n_hbm, bp, r), dtype),   # read staging (2 banks x 2)
            pltpu.VMEM((2 * n_hbm, bp, r), dtype),   # write staging (2 banks)
            pltpu.SemaphoreType.DMA((4 * n_hbm,)),
            pltpu.SemaphoreType.DMA((2 * n_hbm,)),
        ],
        input_output_aliases={len(weight_args) + 5: 1},  # ring0 <-> _ring
        interpret=interpret,
    )(
        jnp.asarray(dils_arg), jnp.asarray(offsets_arg), jnp.asarray(hbm_idx),
        jnp.asarray(hbm_dils.astype(np.int32)), jnp.asarray(hbm_offsets),
        *weight_args, ring0,
    )
    return jnp.swapaxes(y[:, 0, :], 0, 1)[:b]
