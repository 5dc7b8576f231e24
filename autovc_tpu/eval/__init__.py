"""Quantitative quality evaluation (speaker similarity, verification EER).

The reference's verification of conversion quality was LISTENING to
results/{mel,stft}/*.wav (reference results/readme.md:1-2; criterion prose
at reference README.md:63). This package replaces ears with measurements:

- SpeakerEmbedder: windowed GE2E d-vector embedding of an utterance
  (mirrors make_metadata.py:66-81's 128-frame crops, but deterministic
  sliding windows instead of random crops).
- speaker_centroids: per-speaker mean embedding over real utterances —
  the reference's train.pkl embedding recipe, with OUR trained encoder.
- similarity_report: converted output re-embedded and scored by cosine to
  the TARGET speaker centroid vs the SOURCE centroid. A conversion
  succeeded when the output is closer to the target. This is the
  product's entire point, made a number.
- verification_eer: speaker-verification equal-error-rate over all
  utterance pairs — the standard GE2E encoder quality gate (Wan et al.
  2018), validating the embeddings that both the conversion conditioning
  and the similarity metric stand on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from autovc_tpu.models.dvector import DVector


class SpeakerEmbedder:
    """Frozen d-vector encoder -> one unit embedding per utterance.

    Windows of `len_crop` frames at `stride`; window batches are padded to a
    multiple of 8 (masked out of the average) so XLA compiles a handful of
    programs, not one per utterance length.
    """

    def __init__(
        self,
        params: dict,
        dim_input: int | None = None,
        dim_cell: int | None = None,
        dim_emb: int | None = None,
        len_crop: int = 128,
        stride: int = 64,
    ):
        # accepts either a GE2ETrainer checkpoint tree ({'dvector', 'w', 'b'})
        # or bare DVector params
        self.params = params.get("dvector", params)
        # size the module to the checkpoint (shared with the training-side
        # SpeakerAux) so differently-sized encoders — e.g. an independent
        # judge — work without flags; explicit args override
        from autovc_tpu.models.dvector import dvector_for_params

        inferred = dvector_for_params(self.params)
        self.model = DVector(
            dim_input=dim_input or inferred.dim_input,
            dim_cell=dim_cell or inferred.dim_cell,
            dim_emb=dim_emb or inferred.dim_emb,
            num_layers=inferred.num_layers,
        )
        self.len_crop = len_crop
        self.stride = stride
        self._apply = jax.jit(lambda p, x: self.model.apply({"params": p}, x))

    def _windows(self, mel: np.ndarray) -> np.ndarray:
        t = mel.shape[0]
        if t <= self.len_crop:
            w = np.zeros((1, self.len_crop, mel.shape[1]), np.float32)
            w[0, :t] = mel
            return w
        starts = list(range(0, t - self.len_crop + 1, self.stride))
        if starts[-1] != t - self.len_crop:  # always cover the tail
            starts.append(t - self.len_crop)
        return np.stack([mel[s : s + self.len_crop] for s in starts]).astype(np.float32)

    def embed(self, mel: np.ndarray) -> np.ndarray:
        """(T, n_mels) -> (dim_emb,) unit vector."""
        w = self._windows(np.asarray(mel, np.float32))
        n = w.shape[0]
        pad = (-n) % 8
        if pad:
            w = np.concatenate([w, np.zeros((pad,) + w.shape[1:], np.float32)])
        e = np.asarray(self._apply(self.params, jnp.asarray(w)))[:n]
        m = e.mean(axis=0)
        return m / (np.linalg.norm(m) + 1e-12)


def load_speaker_mels(
    feature_dir: str, entries, max_per_speaker: int = 10
) -> dict[str, list[np.ndarray]]:
    """The centroid input recipe: the FIRST max_per_speaker manifest
    utterances per speaker, loaded from feature_dir. Shared by
    cli.evaluate_conversion and the Solver's lambda_spk 'windowed'
    protocol — the training-side centroids must match the eval-side
    recipe exactly, so there is exactly one copy of it."""
    import os

    return {
        e.speaker_id: [
            np.load(os.path.join(feature_dir, rel))
            for rel in e.utterances[:max_per_speaker]
        ]
        for e in entries
    }


def speaker_centroids(
    embedder: SpeakerEmbedder, mels_by_speaker: dict[str, list[np.ndarray]]
) -> dict[str, np.ndarray]:
    """Per-speaker mean-of-utterance-embeddings, L2-normalized
    (make_metadata.py:81's recipe with deterministic windows)."""
    out = {}
    for spk, mels in mels_by_speaker.items():
        es = np.stack([embedder.embed(m) for m in mels])
        c = es.mean(axis=0)
        out[spk] = c / (np.linalg.norm(c) + 1e-12)
    return out


def similarity_record(
    embedder: SpeakerEmbedder,
    centroids: dict[str, np.ndarray],
    converted_mel: np.ndarray,
    src: str,
    trg: str,
    orig_mel: np.ndarray | None = None,
) -> dict:
    """Score one conversion: cosine of the converted output's embedding to
    the target vs source centroid (+ the ORIGINAL utterance's cosines as the
    pre-conversion reference point)."""
    e = embedder.embed(converted_mel)
    rec = {
        "src": src,
        "trg": trg,
        "cos_trg": float(e @ centroids[trg]),
        "cos_src": float(e @ centroids[src]),
    }
    rec["success"] = rec["cos_trg"] > rec["cos_src"]
    rec["margin"] = rec["cos_trg"] - rec["cos_src"]
    if orig_mel is not None:
        eo = embedder.embed(orig_mel)
        rec["orig_cos_trg"] = float(eo @ centroids[trg])
        rec["orig_cos_src"] = float(eo @ centroids[src])
    return rec


def summarize_similarity(records: list[dict]) -> dict:
    """Aggregate cross-speaker records (src != trg) into the headline."""
    xs = [r for r in records if r["src"] != r["trg"]]
    if not xs:
        return {"pairs": 0}
    return {
        "pairs": len(xs),
        "success_rate": float(np.mean([r["success"] for r in xs])),
        "mean_cos_trg": float(np.mean([r["cos_trg"] for r in xs])),
        "mean_cos_src": float(np.mean([r["cos_src"] for r in xs])),
        "mean_margin": float(np.mean([r["margin"] for r in xs])),
        "median_margin": float(np.median([r["margin"] for r in xs])),
    }


def verification_eer(
    embeddings: np.ndarray, labels: np.ndarray
) -> tuple[float, float]:
    """Speaker-verification equal error rate.

    embeddings: (N, D) unit vectors; labels: (N,) int speaker ids.
    All N*(N-1)/2 pairs are trials; score = cosine. Returns (eer, threshold)
    at the point where false-accept rate == false-reject rate (linear
    interpolation between the two straddling thresholds).
    """
    n = embeddings.shape[0]
    sims = embeddings @ embeddings.T
    iu = np.triu_indices(n, k=1)
    scores = sims[iu]
    same = (labels[:, None] == labels[None, :])[iu]
    assert same.any() and (~same).any(), "need both same- and cross-speaker pairs"

    order = np.argsort(-scores)  # descending: accept everything above thresh
    scores_s, same_s = scores[order], same[order]
    n_same, n_diff = int(same.sum()), int((~same).sum())
    # sweeping the threshold down: after accepting k pairs,
    # FAR = diff accepted / n_diff, FRR = same rejected / n_same
    cum_same = np.cumsum(same_s)
    cum_diff = np.cumsum(~same_s)
    far = cum_diff / n_diff
    frr = (n_same - cum_same) / n_same
    # far rises and frr falls as the threshold sweeps down; interpolate
    # linearly between the two straddling accept-counts (matters on small
    # trial sets where FAR/FRR move in 1/n_pairs steps)
    d = far - frr
    k = int(np.argmax(d >= 0))  # first crossing
    if k == 0 or d[k] == d[k - 1]:
        eer, thr = (far[k] + frr[k]) / 2.0, scores_s[k]
    else:
        a = -d[k - 1] / (d[k] - d[k - 1])
        eer = far[k - 1] + a * (far[k] - far[k - 1])
        thr = scores_s[k - 1] + a * (scores_s[k] - scores_s[k - 1])
    return float(eer), float(thr)


def embedding_separation(
    embeddings: np.ndarray, labels: np.ndarray
) -> dict:
    """Mean intra-speaker vs inter-speaker cosine — the coarse margin the
    similarity metric rides on."""
    n = embeddings.shape[0]
    sims = embeddings @ embeddings.T
    iu = np.triu_indices(n, k=1)
    scores = sims[iu]
    same = (labels[:, None] == labels[None, :])[iu]
    return {
        "intra_speaker_cos_mean": float(scores[same].mean()),
        "inter_speaker_cos_mean": float(scores[~same].mean()),
        "separation": float(scores[same].mean() - scores[~same].mean()),
    }
