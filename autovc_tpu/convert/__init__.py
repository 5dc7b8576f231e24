"""Conversion (inference) pipeline (reference conversion.py:33-123).

Batch voice conversion: pad source features to a multiple of freq, run the
generator with (src emb, trg emb), strip padding, optionally project STFT
outputs to mel for the vocoder, and write the results manifest
(results_<id>.pkl contract).

TPU notes: full utterances are padded to a static bucket length so repeated
conversions reuse one compiled program (XLA recompiles per shape otherwise);
the mel projection rides the same jit.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autovc_tpu.config import Config
from autovc_tpu.data.manifest import ConversionSpec, save_results
from autovc_tpu.dsp.mel import mel_filterbank


def pad_seq(x: np.ndarray, base: int = 32) -> tuple[np.ndarray, int]:
    """Right-pad (T, F) to a multiple of `base` (conversion.py:40-44)."""
    len_out = int(base * math.ceil(x.shape[0] / base))
    len_pad = len_out - x.shape[0]
    return np.pad(x, ((0, len_pad), (0, 0)), "constant"), len_pad


def bucket_length(t: int, base: int = 32, bucket: int = 256) -> int:
    """Static compilation bucket: multiple of `bucket` (itself a multiple of
    base) covering t — bounds the number of distinct compiled shapes."""
    assert bucket % base == 0
    return int(bucket * math.ceil(t / bucket))


class Converter:
    """Stateful wrapper holding the jitted conversion function per shape.

    use_buckets=False (default) pads exactly like the reference (to a
    multiple of freq, conversion.py:40-44) — bit-faithful outputs, one
    compiled program per distinct padded length. use_buckets=True pads to
    coarse buckets instead: bounded compile count for serving throughput, at
    the cost of slightly different BLSTM edge context in the padded tail.
    """

    def __init__(self, model, params, batch_stats, cfg: Config, use_buckets: bool = False):
        self.model = model
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.cfg = cfg
        self.use_buckets = use_buckets
        self._mel_basis = jnp.asarray(
            mel_filterbank(
                cfg.audio.sample_rate,
                cfg.audio.n_fft,
                cfg.audio.n_mels,
                cfg.audio.mel_fmin,
                cfg.audio.mel_fmax,
            )
        )

        def fwd(variables, x, emb_org, emb_trg):
            _, x_psnt, _ = self.model.apply(variables, x, emb_org, emb_trg, train=False)
            return x_psnt

        self._fwd = jax.jit(fwd)

    def convert(self, spec: ConversionSpec) -> np.ndarray:
        """One conversion -> output features (T, n_bins), padding stripped
        (conversion.py:58-100)."""
        x, len_pad = pad_seq(spec.src_features, base=self.cfg.model.freq)
        if self.use_buckets:
            tb = bucket_length(x.shape[0], self.cfg.model.freq)
            extra = tb - x.shape[0]
            x = np.pad(x, ((0, extra), (0, 0)), "constant")
            len_pad += extra
        out = self._fwd(
            self.variables,
            jnp.asarray(x[None]),
            jnp.asarray(spec.src_embedding[None]),
            jnp.asarray(spec.trg_embedding[None]),
        )
        out = np.asarray(out[0])
        return out[: out.shape[0] - len_pad] if len_pad else out

    def convert_to_mel(self, spec: ConversionSpec) -> np.ndarray:
        """Conversion + mel projection for the vocoder: spmel output passes
        through; stft output is projected via the mel basis
        (conversion.py:102: np.dot(uttr_trg, mel_basis))."""
        out = self.convert(spec)
        if self.cfg.model.model_type == "stft":
            out = np.asarray(jnp.asarray(out) @ self._mel_basis)
        return out

    def convert_batch(
        self, specs: Sequence[ConversionSpec], batch_size: int = 8, to_mel: bool = True
    ) -> list[np.ndarray]:
        """Batched conversion: specs grouped by padded length and run
        `batch_size` at a time through one compiled program per length —
        the throughput path for all-pairs matrices (one device fills its MXU
        with B utterances instead of B sequential singles). Groups use the
        reference-faithful pad-to-freq length (bucket coarsening only when
        the Converter was built with use_buckets=True)."""
        base = self.cfg.model.freq
        prepared = []
        for i, s in enumerate(specs):
            x, len_pad = pad_seq(s.src_features, base=base)
            tb = bucket_length(x.shape[0], base) if self.use_buckets else x.shape[0]
            prepared.append((i, s, x, len_pad, tb))

        results: list[np.ndarray | None] = [None] * len(specs)
        by_bucket: dict[int, list] = {}
        for item in prepared:
            by_bucket.setdefault(item[4], []).append(item)

        for tb, items in by_bucket.items():
            for off in range(0, len(items), batch_size):
                group = items[off : off + batch_size]
                xs = np.zeros((batch_size, tb, group[0][2].shape[-1]), np.float32)
                es = np.zeros((batch_size, group[0][1].src_embedding.shape[0]), np.float32)
                et = np.zeros_like(es)
                for k, (_, s, x, _, _) in enumerate(group):
                    xs[k, : x.shape[0]] = x
                    es[k] = s.src_embedding
                    et[k] = s.trg_embedding
                dev = self._fwd(self.variables, jnp.asarray(xs), jnp.asarray(es), jnp.asarray(et))
                if to_mel and self.cfg.model.model_type == "stft":
                    # project the whole batch on device: ONE D2H transfer
                    # instead of per-utterance round-trips through the tunnel
                    dev = dev @ self._mel_basis
                out = np.asarray(dev)
                for k, (idx, s, x, len_pad, _) in enumerate(group):
                    total_pad = tb - x.shape[0] + len_pad
                    results[idx] = out[k][: tb - total_pad]
        return results  # type: ignore[return-value]


def run_conversions(
    converter: Converter,
    specs: Sequence[ConversionSpec],
    results_path: str | None = None,
) -> list[tuple[str, np.ndarray]]:
    """The conversion.py main loop: all specs -> [(id, mel)], optional pickle."""
    results = [(str(s.conversion_id), converter.convert_to_mel(s)) for s in specs]
    if results_path:
        save_results(results_path, results)
    return results


class WavConverter:
    """Raw-waveform conversion (reference conversion_nina.py:42-189).

    Input features are robust-scaled waveforms (L, 1); the generator outputs
    a waveform directly. The vocoder mel is RE-EXTRACTED from the output
    waveform (conversion_nina.py:144-146) via the STFT+mel frontend.
    """

    def __init__(self, model, params, batch_stats, cfg: Config):
        from autovc_tpu.dsp.features import MelFrontend

        self.model = model
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.cfg = cfg
        self.frontend = MelFrontend(cfg.audio, dtype=jnp.float32)

        def fwd(variables, x, emb_org, emb_trg):
            _, x_identic, _, _ = self.model.apply(
                variables, x, emb_org, emb_trg, train=False
            )
            return x_identic

        self._fwd = jax.jit(fwd)

    def valid_length(self, n: int) -> int:
        """Largest L <= n with ((L - win)/hop + 1) divisible by freq
        (the reference hardcodes 33536 = 128 frames; conversion_nina.py:74)."""
        hop, win = self.cfg.audio.hop_length, self.cfg.audio.win_length
        frames = (n - win) // hop + 1
        frames -= frames % self.cfg.model.freq
        if frames <= 0:
            raise ValueError(f"utterance too short for conversion: {n} samples")
        return (frames - 1) * hop + win

    def convert(self, spec: ConversionSpec) -> np.ndarray:
        """-> converted waveform (L,), trimmed to the valid length."""
        x = spec.src_features
        if x.ndim == 1:
            x = x[:, None]
        L = self.valid_length(x.shape[0])
        out = self._fwd(
            self.variables,
            jnp.asarray(x[None, :L]),
            jnp.asarray(spec.src_embedding[None]),
            jnp.asarray(spec.trg_embedding[None]),
        )
        return np.asarray(out[0, :, 0])

    def convert_to_mel(self, spec: ConversionSpec) -> np.ndarray:
        """Waveform out -> mel re-extraction for the vocoder."""
        wav = self.convert(spec)
        return np.asarray(self.frontend.mel_features(jnp.asarray(wav)))


def all_pairs_specs(entries, feature_dir: str, utterance_index: int = 0):
    """The original AutoVC N x N conversion matrix (conversion_temp.py:82-101):
    every speaker's chosen utterance converted to every speaker.

    entries: train-manifest SpeakerEntry list; returns ConversionSpecs with
    ids 'src->trg'.
    """
    import os

    specs = []
    i = 0
    for src in entries:
        feats = np.load(os.path.join(feature_dir, src.utterances[utterance_index]))
        name = os.path.basename(src.utterances[utterance_index])[: -len(".npy")]
        for trg in entries:
            specs.append(
                ConversionSpec(
                    conversion_id=i,
                    src_name=name,
                    src_embedding=src.embedding,
                    src_features=feats,
                    trg_speaker=trg.speaker_id,
                    trg_embedding=trg.embedding,
                    src_speaker=src.speaker_id,
                )
            )
            i += 1
    return specs
