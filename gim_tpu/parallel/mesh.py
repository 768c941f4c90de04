"""Mesh construction and data-parallel sharding.

TPU-native replacement for the reference's distributed runtime
(pytorch-lightning DDPPlugin + tools/comm.py NCCL/Gloo collectives,
SURVEY §2.8): a `jax.sharding.Mesh` over all devices with a `data` axis for
pair-parallel eval/training, plus `model` axis room for intra-op sharding of
the dense heads. Metric gathering is fixed-shape array allgather over
ICI/DCN via jit-inserted collectives — no pickled-object Gloo round-trips
(ref tools/comm.py:95-176).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data_axis: int | None = None,
              model_axis: int = 1) -> Mesh:
    """Build an (data, model) mesh over `devices` (default: all)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data_axis is None:
        data_axis = n // model_axis
    grid = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) axis of every leaf over the `data` axis."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_apply(mesh: Mesh, fn, params, batch):
    """jit `fn(params, batch)` with params replicated and batch sharded on
    `data`. The functional analog of DDP eval (ref test.py:193-218)."""
    in_shardings = (NamedSharding(mesh, P()), NamedSharding(mesh, P("data")))
    out_shardings = NamedSharding(mesh, P("data"))
    jitted = jax.jit(fn, in_shardings=in_shardings,
                     out_shardings=out_shardings)
    return jitted(params, batch)


def process_local_pair_slice(n_pairs: int) -> slice:
    """Shard an eval pair list across hosts (replacement for PL's
    DistributedSampler; dedup at aggregation handles remainder padding,
    ref trainer/lightning.py:253-255)."""
    pid = jax.process_index()
    n_proc = jax.process_count()
    per = -(-n_pairs // n_proc)
    return slice(pid * per, min((pid + 1) * per, n_pairs))
