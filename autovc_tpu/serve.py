"""AOT serving export: serialized, shape-polymorphic conversion programs.

The reference's deployment story is "run the python scripts again"
(conversion.py + vocoder.py are top-level scripts that rebuild torch modules
and load .ckpt files every invocation). The TPU-native serving story is
ahead-of-time: `jax.export` serializes the jitted programs into StableHLO
artifacts that a server loads and calls without the model-building code,
flax, or the checkpoint-import path on its dependency surface.

Two properties make this production-shaped rather than a demo:

- **Shape polymorphism**: the conversion program is exported over symbolic
  dimensions ``(b, 32*t, n_bins)`` — any batch and any frame count that is
  a multiple of the bottleneck ``freq=32`` (the same contract
  conversion.py:40-44 pads to) runs through ONE artifact, instead of one
  compile per utterance length. XLA still specializes at load time per
  concrete shape, but the traced program, weights plumbing and calling
  convention are frozen.
- **Multi-platform lowering**: exported for ``("cpu", "tpu")`` by default,
  so the same artifact serves on a TPU host and falls back to CPU canaries.

A bundle holds TWO programs, mirroring the live pipeline's staging: the
converter (features -> converted features) and, optionally, the vocoder
(mel -> waveform, with the stft variant's mel-basis projection baked in,
conversion.py:102). Keeping the stages separate lets the server strip the
pad_seq padding between them — byte-identical behavior to
Converter.convert + HiFiGANVocoder.generate, rather than vocoding padded
mels (HiFi-GAN convs are non-causal, so trailing zero frames would
contaminate the last receptive field of kept samples).

Weights travel beside the programs (``weights.npz``, the cli.export_ckpt
flat format, stored at their compute dtype for bit parity with the live
pipeline) and are passed as call arguments — a checkpoint refresh does not
require re-export, and the program artifacts stay ~100 KB.

Layout of an exported bundle directory::

    converter.shlo    serialized jax.export.Exported (Generator forward)
    vocoder.shlo      optional: HiFi-GAN synthesis (+ stft mel projection)
    weights.npz       flat generator/batch_stats (+ ``hifigan/``) params
    manifest.json     shapes, platforms, dtypes, calling convention
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import numpy as np

CONVERTER_NAME = "converter.shlo"
VOCODER_NAME = "vocoder.shlo"
WEIGHTS_NAME = "weights.npz"
MANIFEST_NAME = "manifest.json"


def _converter_fn(model):
    """Served stage 1: normalized features -> converted features
    (reference conversion.py:90-95)."""

    def fn(weights, x, emb_org, emb_trg):
        variables = {
            "params": weights["generator"],
            "batch_stats": weights.get("batch_stats", {}),
        }
        _, x_psnt, _ = model.apply(variables, x, emb_org, emb_trg, train=False)
        # stable f32 interface regardless of compute_dtype (bench.py:108)
        import jax.numpy as jnp

        return x_psnt.astype(jnp.float32)

    return fn


def _vocoder_fn(vocoder_model, mel_basis, bf16: bool = False,
                audio=None, gl_iters: int | None = None):
    """Served stage 2: converted features -> waveform. For the stft variant
    the mel-basis projection (conversion.py:102) is baked into the program
    as a constant so the caller never handles 513-bin features. bf16 casts
    weights and activations in-program (weights stay f32 on disk — numpy
    cannot serialize bfloat16) exactly like the headline bench's
    configuration (bench.py:make_e2e); the waveform returns as f32.

    gl_iters (with `audio`) bakes the HYBRID refinement into the program:
    the neural waveform's phase seeds gl_iters Griffin-Lim iterations on the
    mel-derived magnitude (vocoder/hybrid.py) — the audio path that ties
    Griffin-Lim on converted mels (docs/VALIDATION_r3.md) — all in the one
    exported XLA program. The FFT stages run f32 regardless of bf16."""

    def fn(weights, feats):
        import jax
        import jax.numpy as jnp

        mel = feats if mel_basis is None else feats @ jnp.asarray(mel_basis)
        mel_f32 = mel.astype(jnp.float32)
        params = weights["hifigan"]
        if bf16:
            params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
            mel = mel.astype(jnp.bfloat16)
        wav = vocoder_model.apply({"params": params}, mel).astype(jnp.float32)
        if gl_iters is not None:
            from autovc_tpu.vocoder.hybrid import refine_with_mel_magnitude

            wav = refine_with_mel_magnitude(wav, mel_f32, audio, n_iter=gl_iters)
        return wav.astype(jnp.float32)

    return fn


def export_converter(
    variables: dict,
    cfg,
    out_dir: str,
    hifigan_params: dict | None = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    gl_iters: int | None = None,
) -> str:
    """Serialize the conversion program(s) for serving; returns the bundle
    dir.

    variables: {'params': ..., 'batch_stats': ...} for the Generator built
    from cfg.model (cli.export_ckpt.load_artifact output). hifigan_params
    adds the waveform-synthesis program to the bundle; gl_iters switches it
    to the hybrid path (HiFi-GAN phase + gl_iters Griffin-Lim projections on
    the mel magnitude, vocoder/hybrid.py) baked into the same program.
    """
    import jax
    import jax.export

    from autovc_tpu.models import build_generator
    from autovc_tpu.vocoder.hifigan import HiFiGANGenerator
    from autovc_tpu.vocoder.wavenet import flatten_params

    model = build_generator(cfg.model)
    n_bins = cfg.model.n_bins
    freq = cfg.model.freq
    dim_emb = cfg.model.dim_emb

    gen_weights = {
        "generator": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }

    def specs_of(tree):
        return jax.tree.map(lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), tree)

    # one symbolic scope: batch b, frames = freq * t (the pad_seq contract)
    b, t = jax.export.symbolic_shape(f"b, {freq}*t")
    x_spec = jax.ShapeDtypeStruct((b, t, n_bins), np.float32)
    e_spec = jax.ShapeDtypeStruct((b, dim_emb), np.float32)
    exported = jax.export.export(
        jax.jit(_converter_fn(model)), platforms=list(platforms)
    )(specs_of(gen_weights), x_spec, e_spec, e_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, CONVERTER_NAME), "wb") as f:
        f.write(exported.serialize())

    flat = {}
    for group, tree in gen_weights.items():
        flat.update(flatten_params(tree, group))

    if hifigan_params is not None:
        voc = HiFiGANGenerator(cfg.hifigan)
        mel_basis = None
        if cfg.model.model_type == "stft":
            from autovc_tpu.dsp.mel import mel_filterbank

            mel_basis = mel_filterbank(
                cfg.audio.sample_rate, cfg.audio.n_fft, cfg.audio.n_mels,
                cfg.audio.mel_fmin, cfg.audio.mel_fmax,
            ).astype(np.float32)
        voc_weights = {"hifigan": hifigan_params}
        # the vocoder runs on pad-stripped features: its own symbolic scope,
        # any length (no freq-multiple constraint). The hybrid path's STFT
        # reflect-pads n_fft//2 samples, so the waveform (hop*tm) must
        # provably cover it: constrain tm for symbolic lowering (4 frames =
        # 64 ms, far below any real utterance).
        constraints = () if gl_iters is None else ("tm >= 4",)
        b2, tm = jax.export.symbolic_shape("b2, tm", constraints=constraints)
        f_spec = jax.ShapeDtypeStruct((b2, tm, n_bins), np.float32)
        exported_voc = jax.export.export(
            jax.jit(
                _vocoder_fn(
                    voc, mel_basis,
                    bf16=cfg.model.compute_dtype == "bfloat16",
                    audio=cfg.audio, gl_iters=gl_iters,
                )
            ),
            platforms=list(platforms),
        )(specs_of(voc_weights), f_spec)
        with open(os.path.join(out_dir, VOCODER_NAME), "wb") as f:
            f.write(exported_voc.serialize())
        flat.update(flatten_params(hifigan_params, "hifigan"))

    np.savez_compressed(os.path.join(out_dir, WEIGHTS_NAME), **flat)

    manifest = {
        "format": "autovc_tpu.serve/1",
        "platforms": list(platforms),
        "model_type": cfg.model.model_type,
        "compute_dtype": cfg.model.compute_dtype,
        "n_bins": n_bins,
        "freq": freq,
        "dim_emb": dim_emb,
        "with_vocoder": hifigan_params is not None,
        "vocoder_mode": (
            None if hifigan_params is None
            else ("hybrid" if gl_iters is not None else "hifigan")
        ),
        "gl_iters": gl_iters,
        "hop_size": cfg.audio.hop_length,
        "call": "converter.call(weights, x(b,%d*t,%d) f32, emb_org(b,%d), "
        "emb_trg(b,%d)); vocoder.call(voc_weights, feats(b,tm,%d))"
        % (freq, n_bins, dim_emb, dim_emb, n_bins),
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


class ServingConverter:
    """Loader/caller for an exported bundle — no flax, no model code.

    ``convert(features, emb_org, emb_trg)`` takes one utterance (T, n_bins),
    pads to the freq multiple exactly like the reference
    (conversion.py:40-44), calls the converter program, strips the pad, and
    — for with_vocoder bundles — feeds the stripped features to the vocoder
    program: the same staging as Converter.convert + HiFiGANVocoder.generate,
    so outputs match the live pipeline bit-for-bit.
    """

    def __init__(self, bundle_dir: str):
        import jax.export

        with open(os.path.join(bundle_dir, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        with open(os.path.join(bundle_dir, CONVERTER_NAME), "rb") as f:
            self.exported = jax.export.deserialize(bytearray(f.read()))
        self.exported_voc = None
        if self.manifest["with_vocoder"]:
            with open(os.path.join(bundle_dir, VOCODER_NAME), "rb") as f:
                self.exported_voc = jax.export.deserialize(bytearray(f.read()))
        self._load_weights(os.path.join(bundle_dir, WEIGHTS_NAME))

    def _load_weights(self, path: str) -> None:
        from autovc_tpu.vocoder.wavenet import unflatten_params

        nested = unflatten_params(dict(np.load(path)))
        self.weights = {
            "generator": nested.get("generator", {}),
            "batch_stats": nested.get("batch_stats", {}),
        }
        self.voc_weights = (
            {"hifigan": nested["hifigan"]} if self.manifest["with_vocoder"] else None
        )

    def __call__(self, x: np.ndarray, emb_org: np.ndarray, emb_trg: np.ndarray) -> Any:
        """Batched raw converter call: x (b, 32*t, n_bins) already padded."""
        return self.exported.call(self.weights, x, emb_org, emb_trg)

    def vocode(self, feats: np.ndarray) -> Any:
        """Batched raw vocoder call: feats (b, tm, n_bins) -> wav
        (b, tm*hop_size)."""
        if self.exported_voc is None:
            raise ValueError("bundle was exported without a vocoder program")
        return self.exported_voc.call(self.voc_weights, feats)

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
            out = out[: out.shape[0] - len_pad]
        if self.exported_voc is not None:
            out = np.asarray(self.vocode(out[None])[0])
        return out
