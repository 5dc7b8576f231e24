"""GE2E speaker-encoder training (Wan et al. 2018, "Generalized End-to-End
Loss for Speaker Verification").

The reference USES a GE2E d-vector encoder but ships no way to train one —
speaker embeddings depend on an external 3000000-BL.ckpt download
(make_metadata.py:43). This module removes that dependency: train DVector
from scratch on the corpus's mel features.

Batch layout: N speakers x M utterance crops. Softmax GE2E loss with the
learned (w, b) similarity scaling and the own-centroid exclusion for the
positive similarity.
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from autovc_tpu.models.dvector import DVector


def ge2e_softmax_loss(embeds: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """embeds: (N, M, D) unit vectors -> scalar loss.

    S(j,i,k) = w * cos(e_ji, c_k) + b, with c_j excluding e_ji for k == j.
    L = -sum log softmax(S(j,i,:))[j].
    """
    n, m, d = embeds.shape
    centroids = jnp.mean(embeds, axis=1)  # (N, D)
    # leave-one-out centroid for the own speaker
    sums = jnp.sum(embeds, axis=1, keepdims=True)  # (N, 1, D)
    loo = (sums - embeds) / (m - 1)  # (N, M, D)
    loo = loo / (jnp.linalg.norm(loo, axis=-1, keepdims=True) + 1e-6)
    cnorm = centroids / (jnp.linalg.norm(centroids, axis=-1, keepdims=True) + 1e-6)

    # similarity matrix (N, M, N)
    sim = jnp.einsum("nmd,kd->nmk", embeds, cnorm)
    own = jnp.sum(embeds * loo, axis=-1)  # (N, M)
    eye = jnp.eye(n)[:, None, :]  # (N, 1, N)
    sim = sim * (1 - eye) + own[..., None] * eye

    scores = w * sim + b
    logprob = jax.nn.log_softmax(scores, axis=-1)
    pos = jnp.sum(logprob * eye, axis=-1)  # (N, M)
    return -jnp.mean(pos)


def sample_ge2e_batch(
    features: list[list[np.ndarray]],
    n_speakers: int,
    m_utts: int,
    len_crop: int,
    rng: np.random.Generator,
    return_labels: bool = False,
):
    """(N, M, len_crop, 80) random crops, distinct speakers.

    With return_labels, also returns the (N,) global speaker indices — the
    targets for the optional cross-entropy auxiliary (GE2ETrainer n_classes).
    """
    spk = rng.choice(len(features), size=n_speakers, replace=False)
    out = np.zeros((n_speakers, m_utts, len_crop, features[0][0].shape[-1]), np.float32)
    for i, s in enumerate(spk):
        utts = features[s]
        for j in range(m_utts):
            u = utts[int(rng.integers(0, len(utts)))]
            if u.shape[0] <= len_crop:
                out[i, j, : u.shape[0]] = u
            else:
                off = int(rng.integers(0, u.shape[0] - len_crop))
                out[i, j] = u[off : off + len_crop]
    if return_labels:
        return out, spk.astype(np.int32)
    return out


class GE2ETrainer:
    """GE2E trainer with the paper's optimizer details and an optional
    cross-entropy auxiliary.

    - wb_grad_scale: Wan et al. §3 scale the (w, b) gradients by 0.01.
      NOTE: that recipe assumes SGD. Under Adam the update is invariant to
      constant gradient scaling EXCEPT through eps, so 0.01 effectively
      freezes (w, b) early and measurably worsens collapse (the synthetic
      separation test fails with it); default is therefore 1.0 (no-op).
    - n_classes/ce_weight: speaker-ID softmax head on the embedding (the
      ORIGINAL d-vector recipe). On tiny corpora the pure GE2E loss has a
      strong collapse attractor (all embeddings identical -> uniform
      softmax at loss ln N, observed within 300 iters on the 7-speaker
      bundled corpus); the classification gradient breaks that symmetry
      while GE2E shapes the cosine geometry the conversion pipeline uses.
      The head is dropped at save() time — checkpoints stay pure DVector.
    """

    def __init__(
        self,
        dim_input: int = 80,
        dim_cell: int = 768,
        dim_emb: int = 256,
        lr: float = 1e-4,
        grad_clip: float = 3.0,
        seed: int = 0,
        wb_grad_scale: float = 1.0,
        n_classes: int = 0,
        ce_weight: float = 1.0,
    ):
        self.model = DVector(dim_input=dim_input, dim_cell=dim_cell, dim_emb=dim_emb)
        x0 = jnp.zeros((1, 16, dim_input), jnp.float32)
        self.params = {
            "dvector": self.model.init(jax.random.PRNGKey(seed), x0)["params"],
            "w": jnp.asarray(10.0),
            "b": jnp.asarray(-5.0),
        }
        self.n_classes = n_classes
        self.ce_weight = ce_weight
        if n_classes:
            k = jax.random.normal(
                jax.random.PRNGKey(seed + 1), (dim_emb, n_classes)
            ) / np.sqrt(dim_emb)
            self.params["cls"] = {"kernel": k, "bias": jnp.zeros((n_classes,))}
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(grad_clip), optax.adam(lr)
        )
        self.opt_state = self.optimizer.init(self.params)
        self.history: list[float] = []

        def step(params, opt_state, batch, labels):
            n, m = batch.shape[:2]

            def loss_fn(p):
                flat = batch.reshape(n * m, *batch.shape[2:])
                e = self.model.apply({"params": p["dvector"]}, flat)
                loss = ge2e_softmax_loss(e.reshape(n, m, -1), p["w"], p["b"])
                if n_classes:
                    logits = e @ p["cls"]["kernel"] + p["cls"]["bias"]
                    tgt = jnp.repeat(labels, m)
                    ce = optax.softmax_cross_entropy_with_integer_labels(
                        logits, tgt
                    ).mean()
                    loss = loss + ce_weight * ce
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            # paper detail: (w, b) gradients scaled by 0.01 (Wan et al. §3)
            grads = dict(
                grads,
                w=grads["w"] * wb_grad_scale,
                b=grads["b"] * wb_grad_scale,
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # paper constraint w > 0: value clamp AFTER the update (clamping
            # inside the loss would zero w's gradient once it hits the floor)
            params = dict(params, w=jnp.maximum(params["w"], 1e-2))
            return params, opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

    def train(self, batches: Iterator, num_iters: int, log_step: int = 20):
        """batches yield (N, M, T, F) crops, or (crops, (N,) speaker-index
        labels) when the cross-entropy auxiliary is enabled."""
        t0 = time.time()
        for i in range(1, num_iters + 1):
            batch = next(batches)
            if isinstance(batch, tuple):
                batch, labels = batch
            elif self.n_classes:
                # an unlabeled iterator with the CE auxiliary enabled would
                # silently train every speaker toward class 0 — the exact
                # collapse the auxiliary exists to prevent
                raise ValueError(
                    "GE2ETrainer was built with n_classes>0 but the batch "
                    "iterator yields unlabeled arrays; use "
                    "sample_ge2e_batch(..., return_labels=True)"
                )
            else:
                labels = np.zeros((batch.shape[0],), np.int32)
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, jnp.asarray(batch), jnp.asarray(labels)
            )
            if i % log_step == 0 or i == num_iters:
                l = float(loss)
                self.history.append(l)
                print(
                    f"[ge2e] iter {i}/{num_iters} loss {l:.4f} "
                    f"({(time.time() - t0) / i:.2f}s/it)",
                    flush=True,
                )
        return self.history[-1] if self.history else None

    def save(self, path: str):
        from autovc_tpu.vocoder.wavenet import flatten_params

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        # the classifier head is a training-only scaffold; checkpoints stay
        # pure DVector(+w,b) so every consumer loads them identically
        params = {k: v for k, v in self.params.items() if k != "cls"}
        np.savez(path, **flatten_params(params))

    @staticmethod
    def load_params(path: str) -> dict:
        from autovc_tpu.vocoder.wavenet import unflatten_params

        return unflatten_params(dict(np.load(path)))
