"""Data parallelism over a jax.sharding.Mesh.

The reference's multi-device story is single-process
torch.nn.DataParallel (train v2.py:593): replicate the module, scatter
the batch, gather outputs. The TPU-native equivalent is SPMD: one
``Mesh(('data',))``, params/state replicated, the batch sharded on
'data'; XLA inserts the gradient all-reduce over ICI automatically when
the jitted train step is given these shardings (SURVEY.md §2.2, §5.8).
The same mesh abstraction extends to multi-host slices unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis: str = "data"):
    """Place a host batch onto the mesh, sharded along the leading dim."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def shard_train_step(
    train_step: Callable, mesh: Mesh, axis: str = "data", donate: bool = True
) -> Callable:
    """jit a (state, batch) -> (state, metrics) step for data parallelism:
    state replicated, batch sharded on the leading (batch) dimension."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis))
    return jax.jit(
        train_step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_fold_mesh(n_folds: int, n_data: Optional[int] = None) -> Mesh:
    """2-axis mesh ('fold', 'data'): cross-validation folds are
    embarrassingly parallel, so they shard across chips with zero
    communication while each fold's batch still data-parallelizes over
    the remaining axis — the reference's round-robin CV loop
    (train v2.py:596-628) mapped onto the hardware topology."""
    devs = jax.devices()
    n_data = n_data or len(devs) // n_folds
    assert n_folds * n_data <= len(devs), (
        f"need {n_folds}x{n_data} devices, have {len(devs)}"
    )
    grid = np.asarray(devs[: n_folds * n_data]).reshape(n_folds, n_data)
    return Mesh(grid, ("fold", "data"))


def shard_fold_train_step(
    vmapped_step: Callable, mesh: Mesh, donate: bool = True
) -> Callable:
    """jit a vmapped fold step over a ('fold', 'data') mesh: stacked
    fold states shard on 'fold' (leading axis of every leaf), fold
    batches shard on ('fold', 'data')."""
    fold_state = NamedSharding(mesh, P("fold"))
    fold_batch = NamedSharding(mesh, P("fold", "data"))
    fold_metrics = NamedSharding(mesh, P("fold"))
    return jax.jit(
        vmapped_step,
        in_shardings=(fold_state, fold_batch),
        out_shardings=(fold_state, fold_metrics),
        donate_argnums=(0,) if donate else (),
    )
