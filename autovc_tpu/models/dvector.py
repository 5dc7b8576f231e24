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


def dvector_for_params(params: dict) -> DVector:
    """A DVector module sized to a checkpoint's parameter tree.

    The embedding Dense kernel is (dim_cell, dim_emb), the layer-0 LSTM
    input kernel is (dim_input, 4*dim_cell), and layers are counted from the
    w_ih_l{k}_fwd entries — so differently-sized encoders (e.g. the
    dim_cell=256 independent judge) work without flags. Falls back to the
    reference defaults (model_bl.py:42: 80/768/256 x3) if the tree doesn't
    match."""
    p = params.get("dvector", params)
    try:
        k = p["embedding"]["kernel"]
        lstm = p["lstm"]
        return DVector(
            dim_input=int(lstm["w_ih_l0_fwd"].shape[0]),
            dim_cell=int(k.shape[0]),
            dim_emb=int(k.shape[1]),
            num_layers=sum(1 for n in lstm if n.startswith("w_ih_l")),
        )
    except (KeyError, TypeError, AttributeError) as e:
        # malformed trees (missing keys, non-array leaves) degrade to the
        # reference defaults rather than raising — but loudly, so a corrupt
        # checkpoint is distinguishable from a genuinely default-shaped one
        # when the eventual failure surfaces as a downstream shape mismatch
        import warnings

        warnings.warn(
            f"dvector_for_params: checkpoint tree not understood ({e!r}); "
            "falling back to reference-default DVector dims (80/768/256 x3)",
            stacklevel=2,
        )
        return DVector()
