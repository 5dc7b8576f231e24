"""Functional training state (replaces the reference Solver's mutable
model/optimizer attributes, solver_encoder.py:118-162)."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array  # int32 scalar
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any  # REAL exponential moving average (ref model_EMA was a no-op)


def init_ema(params):
    # distinct buffers (donated state must not alias params)
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(ema, params, decay: float):
    """averaged = decay*averaged + (1-decay)*x (hparams.py:153 semantics,
    applied per step — fixing solver_encoder.py:168-177's no-op)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema, params
    )
