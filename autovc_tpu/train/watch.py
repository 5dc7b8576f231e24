"""Parameter/gradient histogram watching — the wandb.watch equivalent.

The reference calls wandb.watch(self.G, log='all', log_freq=1000)
(solver_encoder.py:203): torch hooks stream parameter AND gradient
histograms to wandb. There are no hooks in a jitted JAX step, so the
TPU-native shape is a separate jitted observer: recompute the gradients at
watch boundaries (watch_step is rare — the double compute amortizes to
noise) and build fixed-bin histograms ON DEVICE, so only (bins,) counts per
module cross the wire — not the 28.5M-parameter tree.

Wired in Solver.train via cfg.train.watch_step; sinks are the JSONL metrics
stream and, when mirroring, wandb.Histogram(np_histogram=...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from autovc_tpu.config import Config


def _group_histogram(leaves: list[jax.Array], bins: int) -> dict:
    flat = jnp.concatenate([jnp.ravel(x).astype(jnp.float32) for x in leaves])
    lo, hi = jnp.min(flat), jnp.max(flat)
    # guard degenerate range (all-equal tensors, e.g. a freshly-zeroed bias)
    span = jnp.maximum(hi - lo, 1e-12)
    counts, _ = jnp.histogram(flat, bins=bins, range=(lo, lo + span))
    return {
        "counts": counts,
        "lo": lo,
        "hi": hi,
        "rms": jnp.sqrt(jnp.mean(flat * flat)),
    }


def tree_histograms(tree, bins: int = 64) -> dict:
    """Params/grads pytree -> {top_level_module: histogram dict} (jittable)."""
    out = {}
    for key, sub in tree.items():
        leaves = jax.tree_util.tree_leaves(sub)
        if leaves:
            out[str(key)] = _group_histogram(leaves, bins)
    return out


def make_watch_fn(model, cfg: Config, bins: int = 64, spk=None):
    """Build the jitted observer: (state, x, emb) -> {'param/...', 'grad/...'}.

    Gradients are recomputed from the same loss_fn the train step uses
    (train/step.py) — including the speaker-consistency auxiliary when
    lambda_spk is on (pass the Solver's SpeakerAux) — in eval-free train
    mode, so the histograms describe the exact training gradient field.
    """
    from autovc_tpu.train.step import loss_fn

    @jax.jit
    def watch_fn(state, x, emb):
        grads = jax.grad(
            lambda p: loss_fn(model, cfg, p, state.batch_stats, x, emb, spk=spk)[0]
        )(state.params)
        hists = {}
        for name, h in tree_histograms(state.params, bins).items():
            hists[f"param/{name}"] = h
        for name, h in tree_histograms(grads, bins).items():
            hists[f"grad/{name}"] = h
        return hists

    return watch_fn
