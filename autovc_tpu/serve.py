"""AOT serving export: serialized, shape-polymorphic conversion programs.

The reference's deployment story is "run the python scripts again"
(conversion.py + vocoder.py are top-level scripts that rebuild torch modules
and load .ckpt files every invocation). The TPU-native serving story is
ahead-of-time: `jax.export` serializes the jitted conversion program —
Generator forward, optionally fused with the parallel HiFi-GAN vocoder —
into a single StableHLO artifact that a server loads and calls without the
model-building code, flax, or the checkpoint-import path on its dependency
surface.

Two properties make this production-shaped rather than a demo:

- **Shape polymorphism**: the program is exported over symbolic dimensions
  ``(b, 32*t, n_bins)`` — any batch and any frame count that is a multiple
  of the bottleneck ``freq=32`` (the same contract conversion.py:40-44 pads
  to) runs through ONE artifact, instead of one compile per utterance
  length. XLA still specializes at load time per concrete shape, but the
  traced program, weights plumbing and calling convention are frozen.
- **Multi-platform lowering**: exported for ``("cpu", "tpu")`` by default,
  so the same artifact serves on a TPU host and falls back to CPU canaries.

Weights travel beside the program (``weights.npz``, the cli.export_ckpt flat
format) and are passed as call arguments — keeping the artifact small and
letting one program serve checkpoint refreshes without re-export.

Layout of an exported bundle directory::

    converter.shlo    serialized jax.export.Exported (StableHLO + vjp-less)
    weights.npz       flat generator (+ ``hifigan/``-prefixed vocoder) params
    manifest.json     shapes, platforms, dtypes, calling convention
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import numpy as np

ARTIFACT_NAME = "converter.shlo"
WEIGHTS_NAME = "weights.npz"
MANIFEST_NAME = "manifest.json"


def _conversion_fn(model, vocoder_model=None):
    """The served program: normalized mel/stft features -> converted
    features (reference conversion.py:90-95), optionally -> waveform through
    the parallel vocoder (the >50x-RT path the headline bench times)."""

    def fn(weights, x, emb_org, emb_trg):
        variables = {
            "params": weights["generator"],
            "batch_stats": weights.get("batch_stats", {}),
        }
        _, x_psnt, _ = model.apply(variables, x, emb_org, emb_trg, train=False)
        if vocoder_model is not None:
            return vocoder_model.apply({"params": weights["hifigan"]}, x_psnt)
        return x_psnt

    return fn


def export_converter(
    variables: dict,
    cfg,
    out_dir: str,
    hifigan_params: dict | None = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> str:
    """Serialize the conversion program for serving; returns the bundle dir.

    variables: {'params': ..., 'batch_stats': ...} for the Generator built
    from cfg.model (cli.export_ckpt.load_artifact output). hifigan_params
    fuses waveform synthesis into the exported program.
    """
    import jax
    import jax.export

    from autovc_tpu.models import build_generator
    from autovc_tpu.vocoder.hifigan import HiFiGANGenerator

    model = build_generator(cfg.model)
    voc = HiFiGANGenerator(cfg.hifigan) if hifigan_params is not None else None

    weights = {
        "generator": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    if hifigan_params is not None:
        weights["hifigan"] = hifigan_params

    n_bins = cfg.model.n_bins
    freq = cfg.model.freq
    dim_emb = cfg.model.dim_emb

    # one symbolic scope: batch b, frames = freq * t (the pad_seq contract)
    b, t = jax.export.symbolic_shape(f"b, {freq}*t")
    x_spec = jax.ShapeDtypeStruct((b, t, n_bins), np.float32)
    e_spec = jax.ShapeDtypeStruct((b, dim_emb), np.float32)
    w_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), weights)

    exported = jax.export.export(
        jax.jit(_conversion_fn(model, voc)), platforms=list(platforms)
    )(w_spec, x_spec, e_spec, e_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_NAME), "wb") as f:
        f.write(exported.serialize())

    from autovc_tpu.vocoder.wavenet import flatten_params

    flat = {}
    for group, tree in weights.items():
        flat.update(flatten_params(tree, group))
    np.savez(os.path.join(out_dir, WEIGHTS_NAME), **flat)

    manifest = {
        "format": "autovc_tpu.serve/1",
        "platforms": list(platforms),
        "model_type": cfg.model.model_type,
        "n_bins": n_bins,
        "freq": freq,
        "dim_emb": dim_emb,
        "with_vocoder": hifigan_params is not None,
        "hop_size": cfg.audio.hop_length,
        "call": "exported.call(weights, x(b,%d*t,%d) f32, emb_org(b,%d), emb_trg(b,%d))"
        % (freq, n_bins, dim_emb, dim_emb),
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


class ServingConverter:
    """Loader/caller for an exported bundle — no flax, no model code.

    ``convert(features, emb_org, emb_trg)`` takes one utterance (T, n_bins),
    pads to the freq multiple exactly like the reference (conversion.py:40-44),
    calls the deserialized program and strips the pad (features out) or the
    corresponding hop_size*pad samples (waveform out, with_vocoder bundles).
    """

    def __init__(self, bundle_dir: str):
        import jax.export

        with open(os.path.join(bundle_dir, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        with open(os.path.join(bundle_dir, ARTIFACT_NAME), "rb") as f:
            self.exported = jax.export.deserialize(bytearray(f.read()))
        self.weights = self._load_weights(os.path.join(bundle_dir, WEIGHTS_NAME))

    def _load_weights(self, path: str) -> dict:
        from autovc_tpu.vocoder.wavenet import unflatten_params

        nested = unflatten_params(dict(np.load(path)))
        weights = {
            "generator": nested.get("generator", {}),
            "batch_stats": nested.get("batch_stats", {}),
        }
        if self.manifest["with_vocoder"]:
            weights["hifigan"] = nested["hifigan"]
        return weights

    def __call__(self, x: np.ndarray, emb_org: np.ndarray, emb_trg: np.ndarray) -> Any:
        """Batched raw call: x (b, 32*t, n_bins) already padded."""
        return self.exported.call(self.weights, x, emb_org, emb_trg)

    def convert(
        self, features: np.ndarray, emb_org: np.ndarray, emb_trg: np.ndarray
    ) -> np.ndarray:
        from autovc_tpu.convert import pad_seq

        x, len_pad = pad_seq(np.asarray(features, np.float32), base=self.manifest["freq"])
        out = np.asarray(
            self(
                x[None],
                np.asarray(emb_org, np.float32)[None],
                np.asarray(emb_trg, np.float32)[None],
            )[0]
        )
        if len_pad:
            if self.manifest["with_vocoder"]:
                out = out[: out.shape[0] - len_pad * self.manifest["hop_size"]]
            else:
                out = out[: out.shape[0] - len_pad]
        return out
