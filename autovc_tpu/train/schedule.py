"""Learning-rate schedules (reference solver_encoder.py:139-145,302-311).

The reference supports None / CosineAnnealingLR(T_max=10000) /
ReduceLROnPlateau — with a bug: the scheduler-type check compares the
scheduler OBJECT to the string 'Cosine', so Cosine runs the Plateau branch
(solver_encoder.py:304). We implement both correctly (SURVEY §7 fix list).

Cosine is a pure step->scale function folded into the jitted step; Plateau is
inherently stateful on the loss stream, so it runs host-side and feeds a
scale factor into the step (the standard JAX pattern for data-dependent LR).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def cosine_annealing(step, t_max: int = 10_000, eta_min: float = 0.0, base: float = 1.0):
    """torch CosineAnnealingLR: eta_min + (base-eta_min)*(1+cos(pi*t/T))/2.
    Periodic in 2*T_max (torch's closed form), works as a jnp function of a
    traced step."""
    import jax.numpy as jnp

    return eta_min + (base - eta_min) * (1.0 + jnp.cos(jnp.pi * step / t_max)) / 2.0


def cosine_decay(step, total_steps: int, eta_min_ratio: float = 0.01):
    """One-shot cosine decay 1.0 -> eta_min_ratio over total_steps (clamped).

    Unlike the reference's periodic CosineAnnealingLR quirk (kept as
    'Cosine'), this is the monotone decay used for convergence runs: the
    train-MSE noise floor scales with the final LR, so annealing to ~1% of
    base is what closes the last decade toward the reference's ~1e-4
    criterion (README.md:63)."""
    import jax.numpy as jnp

    t = jnp.minimum(step, total_steps) / max(total_steps, 1)
    return eta_min_ratio + (1.0 - eta_min_ratio) * (1.0 + jnp.cos(jnp.pi * t)) / 2.0


@dataclass
class ReduceLROnPlateau:
    """Host-side plateau controller matching torch defaults
    (mode='min', factor=0.1, patience=10, threshold=1e-4 rel)."""

    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    min_lr: float = 0.0
    scale: float = 1.0
    best: float = field(default=float("inf"))
    num_bad: int = 0

    def step(self, metric: float) -> float:
        """Feed the latest loss; returns the current LR scale factor."""
        if not np.isfinite(metric):
            metric = float("inf")
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_lr)
                self.num_bad = 0
        return self.scale
