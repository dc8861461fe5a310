"""k-fold cross-validation as a vmapped fold axis.

The reference trains k deep-copied models round-robin, one
optimizer.step() per fold per iteration (train v2.py:596-628, 194-253).
Here the k fold states are stacked along a leading axis of every state
leaf (params, BN stats, spectral u/v, optimizer momenta — each fold gets
independent statistics) and one vmapped train step advances all folds
simultaneously: embarrassingly parallel on the MXU instead of a serial
Python loop.
"""

from __future__ import annotations

from typing import Any, Callable, List

import jax
import jax.numpy as jnp

from gssd_tpu.train.state import TrainState


def stack_states(states: List[TrainState]) -> TrainState:
    """Stack k independent fold states into one leading-axis pytree.

    Static (non-pytree) fields — the optax ``tx`` closures — are taken
    from fold 0: per-fold ``create_train_state`` calls build distinct
    but behaviorally identical transformation objects, and tree_map
    over multiple trees requires identical treedefs."""
    states = [s.replace(tx=states[0].tx) for s in states]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_state(stacked: TrainState, fold: int) -> TrainState:
    return jax.tree_util.tree_map(lambda x: x[fold], stacked)


def vmap_train_step(train_step: Callable) -> Callable:
    """(stacked_state, stacked_batch) -> (stacked_state, stacked_metrics).

    The batch must carry a leading fold axis: [k, B, ...] — the per-fold
    batches the reference draws from per-fold iterators (v2.py:169-173).
    """
    return jax.vmap(train_step, in_axes=(0, 0))
