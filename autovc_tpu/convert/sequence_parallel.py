"""Sequence-parallel full-utterance conversion.

Runs the ENTIRE Generator forward with the time axis sharded over a 'seq'
mesh axis — the capability the reference fundamentally lacks (single-GPU
whole-utterance inference, bounded by one device's memory; SURVEY §5.7).
Composition per module:

  encoder: speaker-emb concat (local) -> 3x [halo conv + BN(eval) + relu]
           -> sequence-parallel BLSTM -> bottleneck downsampling (local:
           chunk lengths are multiples of freq)
  decoder: code upsample + target-emb concat (local) -> sp LSTM ->
           3x halo conv -> 2x sp LSTM -> projection (local)
  postnet: 5x [halo conv + BN(eval) (+ tanh)] + residual (local)

Convs communicate only k//2-frame halos over ICI; LSTMs hand their carry
along the device ring. Eval-mode BatchNorm is elementwise (running stats),
so it stays local.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from autovc_tpu.config import ModelConfig
from autovc_tpu.parallel.sequence import halo_conv1d, sp_blstm, sp_lstm


def _bn_eval(x, params, stats, eps=1e-5):
    p = params["BatchNorm_0"]
    s = stats["BatchNorm_0"]
    inv = jax.lax.rsqrt(s["var"] + eps)
    return (x - s["mean"]) * inv * p["scale"] + p["bias"]


class SPGenerator:
    """Sequence-parallel Generator inference over a 1-D 'seq' mesh.

    Takes the same (params, batch_stats) tree as models.autovc.Generator.
    Chunk constraint: T must divide evenly into n_devices chunks whose length
    is a multiple of freq (pad with pad_seq first).
    """

    def __init__(
        self,
        params,
        batch_stats,
        cfg: ModelConfig,
        mesh: Mesh,
        axis: str = "seq",
        batch_axis: str | None = None,
    ):
        # batch_axis optionally shards the batch over a second mesh axis
        # (combined DP x SP conversion); None = time-sharding only
        # replicate over the mesh (restored checkpoints arrive pinned to one device)
        rep = NamedSharding(mesh, P())
        self.p = jax.device_put(params, rep)
        self.s = jax.device_put(batch_stats, rep)
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self.batch_axis = batch_axis

    def _shard_t(self, x):
        return jax.device_put(
            x, NamedSharding(self.mesh, P(self.batch_axis, self.axis, None))
        )

    def _enc_conv(self, h, i):
        p, s = self.p["encoder"], self.s["encoder"]
        h = halo_conv1d(
            h, p[f"conv{i}"]["Conv_0"]["kernel"], p[f"conv{i}"]["Conv_0"].get("bias"),
            self.mesh, self.axis, batch_axis=self.batch_axis,
        )
        h = _bn_eval(h, p[f"bn{i}"], s[f"bn{i}"])
        return jax.nn.relu(h)

    def encode(self, x, c_org):
        b, t, _ = x.shape
        n = self.mesh.shape[self.axis]
        assert t % (n * self.cfg.freq) == 0, (
            f"T={t} must be divisible by n_devices*freq={n * self.cfg.freq}"
        )
        h = jnp.concatenate(
            [x, jnp.broadcast_to(c_org[:, None, :], (b, t, c_org.shape[-1]))], axis=-1
        )
        h = self._shard_t(h)
        for i in range(3):
            h = self._enc_conv(h, i)
        out = sp_blstm(
            h, self.p["encoder"]["blstm"], self.mesh, self.axis, num_layers=2,
            batch_axis=self.batch_axis,
        )
        # bottleneck downsampling: local per chunk (chunk % freq == 0)
        neck = self.cfg.dim_neck
        nb = t // self.cfg.freq
        fwd = out[..., :neck].reshape(b, nb, self.cfg.freq, neck)[:, :, -1]
        bwd = out[..., neck:].reshape(b, nb, self.cfg.freq, neck)[:, :, 0]
        return jnp.concatenate([fwd, bwd], axis=-1)  # (B, nb, 2*neck)

    def _dec_lstm(self, h, prefix, num_layers):
        p = self.p["decoder"][prefix]
        for layer in range(num_layers):
            h = sp_lstm(
                h,
                p[f"w_ih_l{layer}_fwd"],
                p[f"w_hh_l{layer}_fwd"],
                p[f"b_l{layer}_fwd"],
                self.mesh,
                self.axis,
                batch_axis=self.batch_axis,
            )
        return h

    def decode(self, codes, c_trg, t):
        b, nb, _ = codes.shape
        code_exp = jnp.repeat(codes, t // nb, axis=1)
        h = jnp.concatenate(
            [code_exp, jnp.broadcast_to(c_trg[:, None, :], (b, t, c_trg.shape[-1]))],
            axis=-1,
        )
        h = self._shard_t(h)
        h = self._dec_lstm(h, "lstm1", 1)
        p, s = self.p["decoder"], self.s["decoder"]
        for i in range(3):
            h = halo_conv1d(
                h, p[f"conv{i}"]["Conv_0"]["kernel"], p[f"conv{i}"]["Conv_0"].get("bias"),
                self.mesh, self.axis, batch_axis=self.batch_axis,
            )
            h = jax.nn.relu(_bn_eval(h, p[f"bn{i}"], s[f"bn{i}"]))
        h = self._dec_lstm(h, "lstm2", 2)
        proj = p["proj"]["Dense_0"]
        x_identic = h @ proj["kernel"] + proj["bias"]

        # postnet (5 halo convs, tanh on first 4)
        pp, ps = self.p["postnet"], self.s["postnet"]
        g = x_identic
        for i in range(5):
            g = halo_conv1d(
                g, pp[f"conv{i}"]["Conv_0"]["kernel"], pp[f"conv{i}"]["Conv_0"].get("bias"),
                self.mesh, self.axis, batch_axis=self.batch_axis,
            )
            g = _bn_eval(g, pp[f"bn{i}"], ps[f"bn{i}"])
            if i < 4:
                g = jnp.tanh(g)
        return x_identic, x_identic + g

    def __call__(self, x, c_org, c_trg):
        codes = self.encode(jnp.asarray(x), jnp.asarray(c_org))
        x_identic, x_psnt = self.decode(codes, jnp.asarray(c_trg), x.shape[1])
        return x_identic, x_psnt, codes.reshape(codes.shape[0], -1)
