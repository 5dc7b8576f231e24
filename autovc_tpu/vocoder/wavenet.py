"""WaveNet vocoder, TPU-native (reference synthesis.py + hparams.py:44-165).

Architecture matches the r9y9 wavenet_vocoder build the reference drives
(synthesis.py:19-40): scalar input, 24 dilated-conv layers in 4 stacks
(kernel 3, dilations 1..32), 512 residual / 512 gate (split into tanh and
sigmoid halves) / 256 skip channels, mixture-of-logistics output (10
mixtures), 80-mel local conditioning upsampled x256 by transposed convs
(scales 4,4,4,4, freq-axis kernel 3), legacy sqrt(0.5) residual/skip scaling.

Two execution paths:
- apply():   teacher-forced training forward — causal dilated convs as
             full-sequence MXU matmuls (XLA fuses the whole stack)
- generate(): autoregressive fast generation as ONE lax.scan over output
             samples with per-layer circular dilation buffers (the
             "Fast WaveNet" queue algorithm) — the reference's
             incremental_forward (256 sequential evals per mel frame,
             synthesis.py:53-69) rebuilt as a compiled TPU kernel. The scan
             body is the fused 24-layer step; batching utterances fills the
             MXU lanes.

Parameter tree (importable from r9y9 torch checkpoints — see
autovc_tpu/interop):
  first_conv: {kernel (1, 1, R), bias (R,)}
  layers/<i>: {w_prev2, w_prev1, w_cur (R, G)}, bias (G,), w_cond (C, G),
              w_out (G/2, R), b_out, w_skip (G/2, S), b_skip
  last1: {kernel (S, S), bias}, last2: {kernel (S, 30), bias}
  upsample/<j>: {kernel (3, 2s)} (channel-shared 2D transposed conv)
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from autovc_tpu.config import WaveNetConfig

SQRT_HALF = float(np.sqrt(0.5))


# --------------------------------------------------------------------- init


def init_params(cfg: WaveNetConfig, key: jax.Array) -> dict:
    r, g, s, c = (
        cfg.residual_channels,
        cfg.gate_channels,
        cfg.skip_channels,
        cfg.cin_channels,
    )
    keys = iter(jax.random.split(key, 8 + 8 * cfg.layers))

    def kaiming(k, shape, fan_in):
        std = math.sqrt(1.0 / fan_in)
        return jax.random.normal(k, shape, jnp.float32) * std

    params: dict[str, Any] = {
        "first_conv": {
            "kernel": kaiming(next(keys), (1, r), 1),
            "bias": jnp.zeros((r,)),
        },
        "layers": {},
        "last1": {"kernel": kaiming(next(keys), (s, s), s), "bias": jnp.zeros((s,))},
        "last2": {
            "kernel": kaiming(next(keys), (s, cfg.out_channels), s),
            "bias": jnp.zeros((cfg.out_channels,)),
        },
        "upsample": {},
    }
    for i in range(cfg.layers):
        fan = r * cfg.kernel_size
        params["layers"][str(i)] = {
            "w_prev2": kaiming(next(keys), (r, g), fan),
            "w_prev1": kaiming(next(keys), (r, g), fan),
            "w_cur": kaiming(next(keys), (r, g), fan),
            "bias": jnp.zeros((g,)),
            "w_cond": kaiming(next(keys), (c, g), c),
            "w_out": kaiming(next(keys), (g // 2, r), g // 2),
            "b_out": jnp.zeros((r,)),
            "w_skip": kaiming(next(keys), (g // 2, s), g // 2),
            "b_skip": jnp.zeros((s,)),
        }
    for j, scale in enumerate(cfg.upsample_scales):
        # channel-shared 2D transposed conv (freq kernel 3 x time kernel 2s),
        # initialized to nearest-neighbor-ish interpolation
        k = np.zeros((cfg.freq_axis_kernel_size, 2 * scale), np.float32)
        k[cfg.freq_axis_kernel_size // 2, :] = 1.0 / (2 * scale) * 2.0
        params["upsample"][str(j)] = {"kernel": jnp.asarray(k)}
    return params


# -------------------------------------------------------------- conditioning


def upsample_conditioning(params: dict, cfg: WaveNetConfig, c: jax.Array) -> jax.Array:
    """Mel (B, Tc, C) -> (B, Tc*prod(scales), C) via stacked channel-shared
    transposed convs (hparams.py:110-114)."""
    b, tc, ch = c.shape
    # treat as 2D image (B, 1, C, T) like r9y9's ConvTranspose2d
    h = jnp.transpose(c, (0, 2, 1))[:, None]  # (B, 1, C, T)
    for j, scale in enumerate(cfg.upsample_scales):
        k2d = params["upsample"][str(j)]["kernel"][:, :, None, None]  # (kf, kt, 1, 1)
        kf, kt = k2d.shape[:2]
        # torch ConvTranspose2d(kernel=(kf, 2s), stride=(1, s),
        # padding=(kf//2, s//2)) -> lax padding (k-1-p) per dim
        pad_f = kf - 1 - (kf - 1) // 2
        pad_t = kt - 1 - scale // 2
        h = jax.lax.conv_transpose(
            jnp.transpose(h, (0, 2, 3, 1)),  # NHWC: (B, C, T, 1)
            k2d,
            strides=(1, scale),
            padding=[(pad_f, pad_f), (pad_t, pad_t)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        h = jnp.transpose(h, (0, 3, 1, 2))  # back to (B, 1, C, T)
    out = jnp.transpose(h[:, 0], (0, 2, 1))  # (B, T, C)
    return out[:, : tc * int(np.prod(cfg.upsample_scales))]


# ------------------------------------------------------------ training path


def apply(params: dict, cfg: WaveNetConfig, x: jax.Array, c: jax.Array) -> jax.Array:
    """Teacher-forced forward.

    x: (B, T, 1) waveform in [-1, 1]; c: (B, Tc, 80) mel with Tc*256 >= T.
    Returns MoL logits (B, T, 30). The input is shifted right internally
    (sample t predicted from x[<t]).
    """
    cond = upsample_conditioning(params, cfg, c)[:, : x.shape[1]]
    # shift input right by one (predict x[t] from x[:t])
    x_in = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0)))
    h = x_in @ params["first_conv"]["kernel"] + params["first_conv"]["bias"]

    skip_sum = jnp.zeros(h.shape[:2] + (cfg.skip_channels,), h.dtype)
    for i, d in enumerate(cfg.dilations()):
        lp = params["layers"][str(i)]
        # causal dilated conv via shifted matmuls (k=3): taps t-2d, t-d, t
        def shift(a, n):
            return jnp.pad(a[:, : a.shape[1] - n], ((0, 0), (n, 0), (0, 0))) if n else a

        gates = (
            shift(h, 2 * d) @ lp["w_prev2"]
            + shift(h, d) @ lp["w_prev1"]
            + h @ lp["w_cur"]
            + lp["bias"]
            + cond @ lp["w_cond"]
        )
        a, b = jnp.split(gates, 2, axis=-1)
        z = jnp.tanh(a) * jax.nn.sigmoid(b)  # (B, T, G/2)
        skip_sum = (skip_sum + (z @ lp["w_skip"] + lp["b_skip"])) * SQRT_HALF
        h = (h + (z @ lp["w_out"] + lp["b_out"])) * SQRT_HALF

    out = jax.nn.relu(skip_sum)
    out = jax.nn.relu(out @ params["last1"]["kernel"] + params["last1"]["bias"])
    return out @ params["last2"]["kernel"] + params["last2"]["bias"]


# -------------------------------------------------- mixture of logistics


def sample_from_mol_uniforms(
    logits: jax.Array, uniforms: jax.Array, log_scale_min: float
) -> jax.Array:
    """Sample from MoL logits (..., 3*K) given uniforms (..., K+1) in (0, 1).

    Externalizing the randomness lets every generation engine (XLA scan,
    persistent Pallas kernel) consume the SAME pregenerated stream, so their
    outputs are directly comparable."""
    k = logits.shape[-1] // 3
    logit_probs = logits[..., :k]
    means = logits[..., k : 2 * k]
    log_scales = jnp.maximum(logits[..., 2 * k :], log_scale_min)

    u_sel = jnp.clip(uniforms[..., :k], 1e-5, 1.0 - 1e-5)
    u_x = jnp.clip(uniforms[..., k], 1e-5, 1.0 - 1e-5)
    # gumbel-max mixture selection
    g = -jnp.log(-jnp.log(u_sel))
    sel = jax.nn.one_hot(jnp.argmax(logit_probs + g, axis=-1), k, dtype=logits.dtype)
    mu = jnp.sum(means * sel, axis=-1)
    log_s = jnp.sum(log_scales * sel, axis=-1)
    x = mu + jnp.exp(log_s) * (jnp.log(u_x) - jnp.log1p(-u_x))
    return jnp.clip(x, -1.0, 1.0)


def sample_from_mol(logits: jax.Array, key: jax.Array, log_scale_min: float) -> jax.Array:
    """Sample from discretized mixture of logistics logits (..., 3*K)."""
    k = logits.shape[-1] // 3
    uniforms = jax.random.uniform(
        key, logits.shape[:-1] + (k + 1,), minval=1e-5, maxval=1.0 - 1e-5
    )
    return sample_from_mol_uniforms(logits, uniforms, log_scale_min)


def discretized_mol_loss(
    logits: jax.Array, target: jax.Array, num_classes: int = 65536,
    log_scale_min: float = -32.23619130191664, reduce: bool = True,
) -> jax.Array:
    """Discretized mixture-of-logistics NLL (the vocoder training loss the
    external package provided). logits (..., 3K), target (...,) in [-1, 1]."""
    k = logits.shape[-1] // 3
    logit_probs = logits[..., :k]
    means = logits[..., k : 2 * k]
    log_scales = jnp.maximum(logits[..., 2 * k :], log_scale_min)

    t = target[..., None] - means
    inv_s = jnp.exp(-log_scales)
    half = 1.0 / (num_classes - 1)
    plus = jax.nn.sigmoid(inv_s * (t + half))
    minus = jax.nn.sigmoid(inv_s * (t - half))
    cdf_delta = plus - minus

    mid = inv_s * t
    log_pdf_mid = mid - log_scales - 2.0 * jax.nn.softplus(mid)
    log_cdf_plus = inv_s * (t + half) - jax.nn.softplus(inv_s * (t + half))
    log_one_minus_cdf_min = -jax.nn.softplus(inv_s * (t - half))

    log_probs = jnp.where(
        target[..., None] < -0.999,
        log_cdf_plus,
        jnp.where(
            target[..., None] > 0.999,
            log_one_minus_cdf_min,
            jnp.where(
                cdf_delta > 1e-5,
                jnp.log(jnp.maximum(cdf_delta, 1e-12)),
                log_pdf_mid - np.log((num_classes - 1) / 2),
            ),
        ),
    )
    log_probs = log_probs + jax.nn.log_softmax(logit_probs)
    nll = -jax.scipy.special.logsumexp(log_probs, axis=-1)
    return jnp.mean(nll) if reduce else nll


# ----------------------------------------------------------- fast generation


@functools.partial(jax.jit, static_argnames=("cfg", "length", "dtype"))
def _generate_scan(
    params: dict,
    cfg: WaveNetConfig,
    cond: jax.Array,
    key: jax.Array,
    length: int,
    dtype=jnp.float32,
):
    """The cached fast-generation scan. cond: (B, length, C).

    dtype=bfloat16 halves the per-step weight streaming from HBM (the
    autoregressive bottleneck); logits/sampling stay float32.
    """
    b = cond.shape[0]
    r, g, s = cfg.residual_channels, cfg.gate_channels, cfg.skip_channels
    dils = cfg.dilations()

    # circular dilation buffers: layer i holds the last 2*d residual inputs
    bufs = tuple(jnp.zeros((b, 2 * d, r), dtype) for d in dils)
    x0 = jnp.zeros((b,), jnp.float32)

    cond_t = jnp.swapaxes(cond, 0, 1).astype(dtype)  # (T, B, C)
    k_mol = cfg.out_channels // 3
    uniforms = jax.random.uniform(
        key, (length, b, k_mol + 1), minval=1e-5, maxval=1.0 - 1e-5
    )
    ts = jnp.arange(length, dtype=jnp.int32)

    cast = lambda t: jax.tree_util.tree_map(lambda a: a.astype(dtype), t)
    first_k = cast(params["first_conv"]["kernel"])
    first_b = cast(params["first_conv"]["bias"])
    lps = [cast(params["layers"][str(i)]) for i in range(cfg.layers)]

    def step(carry, scanned):
        bufs, x_prev = carry
        c_t, u_t, t = scanned

        h = (x_prev[:, None].astype(dtype)) * first_k[0] + first_b  # (B, R)
        skip_sum = jnp.zeros((b, s), dtype)
        new_bufs = []
        for i, d in enumerate(dils):
            lp = lps[i]
            buf = bufs[i]
            size = 2 * d
            slot = jax.lax.rem(t, size)
            slot_d = jax.lax.rem(t + d, size)  # (t-d) mod 2d == (t+d) mod 2d
            x_2d = jax.lax.dynamic_slice(buf, (0, slot, 0), (b, 1, r))[:, 0]
            x_d = jax.lax.dynamic_slice(buf, (0, slot_d, 0), (b, 1, r))[:, 0]

            gates = (
                x_2d @ lp["w_prev2"]
                + x_d @ lp["w_prev1"]
                + h @ lp["w_cur"]
                + lp["bias"]
                + c_t @ lp["w_cond"]
            )
            a_half, b_half = jnp.split(gates, 2, axis=-1)
            z = jnp.tanh(a_half) * jax.nn.sigmoid(b_half)
            skip_sum = (skip_sum + (z @ lp["w_skip"] + lp["b_skip"])) * SQRT_HALF
            new_h = (h + (z @ lp["w_out"] + lp["b_out"])) * SQRT_HALF
            # write the layer INPUT into the slot we just consumed (x[t-2d])
            buf = jax.lax.dynamic_update_slice(buf, h[:, None, :], (0, slot, 0))
            new_bufs.append(buf)
            h = new_h

        out = jax.nn.relu(skip_sum).astype(jnp.float32)
        out = jax.nn.relu(out @ params["last1"]["kernel"] + params["last1"]["bias"])
        logits = out @ params["last2"]["kernel"] + params["last2"]["bias"]
        x_t = sample_from_mol_uniforms(logits, u_t, cfg.log_scale_min)
        return (tuple(new_bufs), x_t), (x_t, logits)

    (_, _), (ys, logits) = jax.lax.scan(step, (bufs, x0), (cond_t, uniforms, ts))
    return jnp.swapaxes(ys, 0, 1), jnp.swapaxes(logits, 0, 1)  # (B, T), (B, T, 30)


def auto_hbm_threshold(
    dilations: tuple,
    batch: int,
    itemsize: int,
    residual_channels: int,
    budget_mb: float = 8.0,
) -> int | None:
    """Pick the pallas ring placement for a batch size: the LARGEST
    hbm_threshold whose VMEM cost fits `budget_mb` — most rings stay in
    VMEM, only the big tails go to HBM. The cost of a candidate is the
    resident rings (dilations below it) PLUS the hybrid path's DMA staging
    (6 per-HBM-layer (bp, R) blocks: 2 banks x 2 reads + 2 banks x 1
    write, ops/pallas_wavenet.py scratch_shapes) — spilling a layer to HBM
    is not free in VMEM. None when everything fits resident; ValueError
    when even threshold 4 (the hazard-free floor) exceeds the budget."""
    bp = batch + (-batch) % 8  # kernel pads the sublane dim
    unit_mb = bp * residual_channels * itemsize / 2**20
    ring_mb = lambda th: sum(2 * d for d in dilations if d < th) * unit_mb
    stage_mb = lambda th: 6 * sum(1 for d in dilations if d >= th) * unit_mb
    if ring_mb(max(dilations) + 1) <= budget_mb:
        return None
    if residual_channels % 128:
        # the hybrid kernel's HBM ring DMAs need lane-aligned (1, B, R)
        # slices (generate_pallas raises on real TPU); no HBM fallback here
        raise ValueError(
            f"batch {batch} does not fit VMEM-resident rings and the HBM "
            f"ring path needs residual_channels % 128 == 0 (got "
            f"{residual_channels}); use the scan engine"
        )
    fitting = [
        th for th in sorted(set(dilations), reverse=True)
        if th >= 4 and ring_mb(th) + stage_mb(th) <= budget_mb
    ]
    if not fitting:
        raise ValueError(
            f"batch {batch} needs {ring_mb(4) + stage_mb(4):.1f} MB of VMEM "
            f"(rings {ring_mb(4):.1f} + DMA staging {stage_mb(4):.1f}) even "
            f"at hbm_threshold=4, over the {budget_mb:.1f} MB budget; use "
            "the scan engine"
        )
    return fitting[0]


class WaveNetVocoder:
    """User-facing vocoder wrapper (the reference's build_model + wavegen,
    synthesis.py:19-72)."""

    def __init__(self, cfg: WaveNetConfig, params: dict | None = None, seed: int = 0):
        self.cfg = cfg
        # engine='pallas' weight layout, cached per dtype: pack_weights
        # re-stacks ~50 MB of layer weights through dozens of eager
        # dispatches — repeating that per generate() call dominates the
        # latency engine's per-call overhead on tunneled devices. The
        # params setter clears it so a rebound tree can't synthesize with
        # stale packed weights.
        self._packed: dict = {}
        self.params = params if params is not None else init_params(cfg, jax.random.PRNGKey(seed))

    @property
    def params(self) -> dict:
        return self._params

    @params.setter
    def params(self, value: dict) -> None:
        self._params = value
        self._packed.clear()

    @classmethod
    def from_checkpoint(cls, cfg: WaveNetConfig, path: str | None):
        if path is None:
            print("[wavenet] no checkpoint given; using random initialization")
            return cls(cfg)
        if path.endswith(".npz"):
            flat = dict(np.load(path))
            # f16 is a storage format (halves the artifact); compute is f32
            flat = {
                k: v.astype(np.float32) if v.dtype == np.float16 else v
                for k, v in flat.items()
            }
            params = unflatten_params(flat)
            return cls(cfg, params)
        # torch checkpoint (r9y9 format)
        from autovc_tpu.interop.wavenet_import import wavenet_params_from_torch

        import torch

        ckpt = torch.load(path, map_location="cpu")
        sd = ckpt.get("state_dict", ckpt)
        return cls(cfg, wavenet_params_from_torch(sd, cfg))

    def generate(
        self,
        mel: np.ndarray,
        key: jax.Array | None = None,
        dtype=jnp.float32,
        engine: str = "scan",
        hbm_threshold: int | str | None = "auto",
    ) -> jax.Array:
        """mel (Tc, 80) or (B, Tc, 80) normalized -> waveform (B?, Tc*256),
        mirroring wavegen()'s length contract (synthesis.py:52-55).

        engine='scan':   lax.scan fast-generation (default; best at large B)
        engine='pallas': persistent kernel with pipelined weight streaming
                         (ops/pallas_wavenet.py; best per-utterance latency —
                         pair with dtype=bfloat16 to halve HBM traffic)
        Both consume the SAME uniform stream for a given key.

        hbm_threshold ('auto'|int|None, pallas engine only): dilations >=
        the threshold keep ring buffers in HBM, lifting the VMEM batch
        ceiling (measured above realtime per stream through B=64 on v5e,
        docs/PERF.md §2). 'auto' picks the largest threshold whose VMEM
        cost — resident rings PLUS the hybrid path's DMA staging blocks —
        fits an ~8 MB budget (None when everything fits resident; e.g.
        bf16 B=32 picks 16). Thresholds below 4 are invalid (hazard-free
        prefetch), so batches too large for even threshold 4 raise with
        the measured VMEM need. The HBM path additionally requires
        residual_channels % 128 == 0 (Mosaic lane-aligned DMA slices).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        mel = jnp.asarray(mel, jnp.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        length = mel.shape[1] * self.cfg.hop_size
        cond = upsample_conditioning(self.params, self.cfg, mel)[:, :length]
        if engine == "pallas":
            from autovc_tpu.ops.pallas_wavenet import generate_pallas, pack_weights

            k_mol = self.cfg.out_channels // 3
            uniforms = jax.random.uniform(
                key, (length, cond.shape[0], k_mol + 1),
                minval=1e-5, maxval=1.0 - 1e-5,
            )
            dkey = jnp.dtype(dtype).name
            if dkey not in self._packed:
                self._packed[dkey] = jax.block_until_ready(
                    pack_weights(self.params, self.cfg.layers, dtype=dtype)
                )
            packed = self._packed[dkey]
            dils = tuple(self.cfg.dilations())
            if hbm_threshold == "auto":
                hbm_threshold = auto_hbm_threshold(
                    dils,
                    cond.shape[0],
                    jnp.dtype(dtype).itemsize,
                    self.cfg.residual_channels,
                )
            wav = generate_pallas(
                packed, dils,
                cond, jnp.swapaxes(uniforms, 0, 1),
                log_scale_min=self.cfg.log_scale_min,
                interpret=jax.default_backend() not in ("tpu", "axon"),
                hbm_threshold=hbm_threshold,
            )
        else:
            wav, _ = _generate_scan(self.params, self.cfg, cond, key, length, dtype=dtype)
        return wav[0] if squeeze else wav

    def generate_bucketed(
        self,
        mel: np.ndarray,
        bucket: int = 64,
        key: jax.Array | None = None,
        dtype=jnp.float32,
        engine: str = "scan",
    ) -> np.ndarray:
        """generate() with the mel length padded (edge-replication) to a
        multiple of `bucket` frames and the waveform trimmed back to the true
        length, so a corpus of N distinct utterance lengths compiles
        ceil(maxlen/bucket) AR programs instead of N.

        Faithfulness: the AR sample stream is causal, so generated samples in
        the kept region are influenced by the pad only through the
        conditioning upsampler's receptive field (~2 mel frames at the tail);
        edge-replication keeps that boundary conditioning natural. bucket=0
        disables padding (identical to generate())."""
        mel = np.asarray(mel)
        assert mel.ndim == 2, "generate_bucketed takes a single (T, C) mel"
        t = mel.shape[0]
        pad = (-t) % bucket if bucket else 0
        if pad:
            mel = np.pad(mel, ((0, pad), (0, 0)), mode="edge")
        wav = np.asarray(
            self.generate(jnp.asarray(mel), key=key, dtype=dtype, engine=engine),
            np.float32,
        )
        return wav[: t * self.cfg.hop_size]

    def logits(self, x: jax.Array, mel: jax.Array) -> jax.Array:
        return apply(self.params, self.cfg, x, mel)


def flatten_params(params: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return out
