"""GE2E d-vector speaker encoder (reference model_bl.py:5-20).

3-layer unidirectional LSTM over mel frames, Linear on the LAST timestep's
hidden state, L2-normalized. Used frozen to build per-speaker embeddings
(make_metadata.py:41-81); embeddings are always mel-derived even for
stft/wav training — a deliberate reference behavior we preserve
(SURVEY.md §7 quirks).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from autovc_tpu.models.layers import LSTM


class DVector(nn.Module):
    dim_input: int = 80
    dim_cell: int = 768
    dim_emb: int = 256
    num_layers: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """x: (B, T, dim_input) mel crops -> (B, dim_emb) unit vectors."""
        h = LSTM(self.dim_cell, num_layers=self.num_layers, dtype=self.dtype, name="lstm")(x)
        e = nn.Dense(self.dim_emb, dtype=self.dtype, name="embedding")(h[:, -1, :])
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)
