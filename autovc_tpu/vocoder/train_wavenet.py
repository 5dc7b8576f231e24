"""WaveNet vocoder training.

The reference ships only synthesis (synthesis.py) with a pretrained r9y9
checkpoint; the training hyperparameters it carries (hparams.py:134-154:
Adam 1e-3, noam decay, 8000-sample crops, EMA 0.9999) describe the external
pipeline. This module makes vocoder training a first-class framework
capability: teacher-forced MoL NLL over (waveform, mel) crops, jitted and
donated, with real EMA and .npz checkpoints loadable by
WaveNetVocoder.from_checkpoint.
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from autovc_tpu.config import WaveNetConfig
from autovc_tpu.vocoder.wavenet import (
    apply,
    discretized_mol_loss,
    flatten_params,
    init_params,
)


def noam_schedule(warmup: int = 4000, init_step: int = 0):
    """lr scale = min(step^-0.5, step * warmup^-1.5) * warmup^0.5
    (the reference's lr_schedule="noam_learning_rate_decay", hparams.py:142).
    init_step offsets the count so a warm-started run continues the decay
    instead of re-warming."""

    def fn(step):
        s = jnp.maximum(step + init_step, 1).astype(jnp.float32)
        return jnp.minimum(s**-0.5, s * warmup**-1.5) * warmup**0.5

    return fn


def crop_batch(
    wavs: list[np.ndarray],
    mels: list[np.ndarray],
    batch_size: int,
    max_time: int,
    hop: int,
    rng: np.random.Generator,
):
    """Random hop-aligned (waveform, mel) crops (hparams.py:150 semantics).

    max_time is rounded DOWN to a whole number of hops (8000 -> 7936 at
    hop 256) so the waveform length equals frames*hop — the teacher-forced
    forward adds the upsampled conditioning to the sample stream and r9y9's
    ensure_divisible does the same rounding."""
    xs, cs = [], []
    frames = max_time // hop
    max_time = frames * hop
    for _ in range(batch_size):
        i = int(rng.integers(0, len(wavs)))
        w, m = wavs[i], mels[i]
        max_f = min(m.shape[0], w.shape[0] // hop) - frames
        f0 = int(rng.integers(0, max(1, max_f)))
        xw = w[f0 * hop : f0 * hop + max_time]
        xm = m[f0 : f0 + frames]
        if xw.shape[0] < max_time:  # utterance shorter than the crop window
            xw = np.pad(xw, (0, max_time - xw.shape[0]))
        if xm.shape[0] < frames:
            xm = np.pad(xm, ((0, frames - xm.shape[0]), (0, 0)))
        xs.append(xw)
        cs.append(xm)
    return (
        np.stack(xs).astype(np.float32)[..., None],
        np.stack(cs).astype(np.float32),
    )


class WaveNetTrainer:
    def __init__(
        self,
        cfg: WaveNetConfig,
        lr: float = 1e-3,
        warmup: int = 4000,
        ema_decay: float = 0.9999,
        seed: int = 0,
        init_step: int = 0,
    ):
        self.cfg = cfg
        self.params = init_params(cfg, jax.random.PRNGKey(seed))
        self.ema = jax.tree_util.tree_map(jnp.copy, self.params)
        self.init_step = init_step
        schedule = noam_schedule(warmup, init_step)
        self.optimizer = optax.adam(
            learning_rate=lambda step: lr * schedule(step), b1=0.9, b2=0.999, eps=1e-8
        )
        self.opt_state = self.optimizer.init(self.params)
        self.ema_decay = ema_decay
        self.history: list[float] = []

        def step_fn(params, opt_state, ema, x, c):
            def loss_fn(p):
                logits = apply(p, cfg, x, c)
                return discretized_mol_loss(
                    logits, x[..., 0], log_scale_min=cfg.log_scale_min
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1 - ema_decay) * p, ema, params
            )
            return params, opt_state, ema, loss

        self._step = jax.jit(step_fn, donate_argnums=(0, 1, 2))

    def train(self, batches: Iterator, num_iters: int, log_step: int = 50):
        t0 = time.time()
        loss = float("nan")
        for i in range(1, num_iters + 1):
            x, c = next(batches)
            self.params, self.opt_state, self.ema, loss_j = self._step(
                self.params, self.opt_state, self.ema, jnp.asarray(x), jnp.asarray(c)
            )
            if i % log_step == 0 or i == num_iters:
                loss = float(loss_j)
                if not np.isfinite(loss):
                    # halt BEFORE the caller's save() can overwrite a good
                    # checkpoint with poisoned params (same rule as the
                    # Solver's non-finite sentinel, train/solver.py)
                    raise RuntimeError(
                        f"[wavenet] non-finite nll at iter {i}; refusing to "
                        f"continue — resume from the last saved checkpoint"
                    )
                self.history.append(loss)
                print(
                    f"[wavenet] iter {i}/{num_iters} nll {loss:.4f} "
                    f"({(time.time() - t0) / i:.2f}s/it)",
                    flush=True,
                )
        return loss

    def load(self, path: str):
        """Warm-start params AND ema from a saved .npz checkpoint (f16
        storage up-cast to f32); optimizer moments restart fresh."""
        from autovc_tpu.vocoder.wavenet import unflatten_params

        flat = {
            k: v.astype(np.float32) if v.dtype == np.float16 else v
            for k, v in dict(np.load(path)).items()
        }
        tree = jax.tree_util.tree_map(jnp.asarray, unflatten_params(flat))
        self.params = tree
        self.ema = jax.tree_util.tree_map(jnp.copy, tree)
        self.opt_state = self.optimizer.init(self.params)

    def save(self, path: str, use_ema: bool = True):
        """Write an .npz loadable by WaveNetVocoder.from_checkpoint."""
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez(path, **flatten_params(self.ema if use_ema else self.params))

    def save_train_state(self, path: str):
        """Full resume state: RAW params + Adam moments + schedule count
        (the .npz written by save() only carries EMA weights). Stored as
        positional leaves against the (params, opt_state) treedef, plus the
        trainer's init_step so a resume can reconstruct the same schedule
        closure (the effective noam position is count + init_step)."""
        leaves = jax.tree_util.tree_leaves((self.params, self.opt_state))
        np.savez(
            path,
            meta_init_step=np.int64(self.init_step),
            meta_count=np.int64(self.opt_count()),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )

    def opt_count(self) -> int:
        """Run-local optimizer step count (adam's count leaf — the only
        integer scalar in the opt state). Effective noam position is
        opt_count() + init_step; external tooling (the training watchdog's
        remaining-budget arithmetic) reads this back as meta_count."""
        for leaf in jax.tree_util.tree_leaves(self.opt_state):
            a = np.asarray(leaf)
            if a.ndim == 0 and np.issubdtype(a.dtype, np.integer):
                return int(a)
        return 0

    def restore_train_state(self, path: str):
        """Inverse of save_train_state; call after load() so EMA comes from
        the main checkpoint and params/optimizer resume exactly.

        The effective noam position is (optimizer count + the ORIGINATING
        trainer's init_step closure): the count leaf only carries steps taken
        since that trainer was constructed. The resuming trainer must
        therefore be built with the SAME init_step, which also makes the
        jitted step byte-identical and hits the persistent XLA cache. The
        saved meta_init_step enforces this (train states written before the
        metadata existed get a warning instead)."""
        data = np.load(path)
        if "meta_init_step" in data:
            saved = int(data["meta_init_step"])
            if saved != self.init_step:
                raise ValueError(
                    f"train state {path} was written by a trainer with "
                    f"init_step={saved}; this trainer was built with "
                    f"init_step={self.init_step}. Rebuild the trainer (or "
                    f"pass --init_step {saved}) so the noam schedule resumes "
                    f"at the right position."
                )
        else:
            import warnings

            warnings.warn(
                f"{path} predates init_step metadata; trusting this "
                f"trainer's init_step={self.init_step} to match the run "
                f"that wrote it",
                stacklevel=2,
            )
        template = (self.params, self.opt_state)
        treedef = jax.tree_util.tree_structure(template)
        leaves = [
            jnp.asarray(data[f"leaf_{i}"])
            for i in range(len(jax.tree_util.tree_leaves(template)))
        ]
        self.params, self.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
