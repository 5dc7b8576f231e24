"""Device mesh + sharding layer — the framework's distributed backend.

The reference has NO distributed training (SURVEY.md §2.2: single V100, no
torch.distributed anywhere). This subsystem is the TPU-native capability the
rebuild adds: a ('data', 'model') mesh over ICI, with

- DP: batches sharded over 'data'; XLA inserts the gradient all-reduce
  (psum over ICI) automatically from GSPMD shardings.
- TP: the wide channel dims (512/1024 conv channels, 4H LSTM gate dims) are
  shardable over 'model'. At AutoVC scale TP is optional (SURVEY §2.2), but
  the machinery is first-class so conversion/training scale past one chip.

Sharding is expressed with NamedSharding + jit (GSPMD), not hand-written
collectives: XLA chooses ICI-riding all-reduces/all-gathers from the layout.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'model') mesh. data=-1 uses all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel layout rules for our parameter tree. Matched against the
# '/'-joined param path; first match wins. The principle: shard the OUTPUT
# channel axis of projections whose producers/consumers tolerate a gathered
# boundary, keep small dims replicated.
_TP_RULES: list[tuple[str, P]] = [
    # conv kernels (k, in, out): shard out-channels of the wide interior convs
    (r".*conv\d*/Conv_0/kernel$", P(None, None, "model")),
    (r".*conv\d*/Conv_0/bias$", P("model")),
    # LSTM input/hidden projections (in, 4H): shard the gate axis
    (r".*(w_ih|w_hh)_l\d+_(fwd|bwd)$", P(None, "model")),
    (r".*b_l\d+_(fwd|bwd)$", P("model")),
    # dense projections (in, out)
    (r".*(proj|embedding|Dense_0)/kernel$", P(None, "model")),
]


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = False):
    """A pytree of NamedShardings for `params`.

    tensor_parallel=False -> fully replicated (pure DP).
    tensor_parallel=True  -> wide axes sharded over 'model' by _TP_RULES
    (dims not divisible by the axis size stay replicated).
    """
    axis = mesh.shape["model"]

    def one(path: str, leaf) -> NamedSharding:
        if tensor_parallel and axis > 1:
            for pat, spec in _TP_RULES:
                if re.match(pat, path) and len(spec) <= leaf.ndim:
                    # a short spec right-aligns (P pads None on the LEFT), so
                    # the divisibility check must look at the same trailing
                    # dims the sharding will actually land on
                    pad = (None,) * (leaf.ndim - len(spec))
                    full = pad + tuple(spec)
                    if all(
                        name != "model" or dim % axis == 0
                        for dim, name in zip(leaf.shape, full)
                    ):
                        return NamedSharding(mesh, P(*full))
        return NamedSharding(mesh, P())

    def mapper(path, leaf):
        key = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        return one(key, leaf)

    return jax.tree_util.tree_map_with_path(mapper, params)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the leading axis split over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def put_global_batch(x, sharding):
    """Place a (possibly host-local) batch shard with a global sharding.

    Single-process: plain device_put. Multi-process (TPU pods): the array on
    this host is only its B/H-row shard of the global batch, so it must be
    assembled with make_array_from_process_local_data — a bare device_put
    would reinterpret the local shard as the whole global array.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)
