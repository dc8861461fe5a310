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

import os
from dataclasses import dataclass
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


@dataclass
class ParallelPlan:
    """The CLI trainers' production sharding layout, chosen from the
    runtime device count (the torch.nn.DataParallel one-liner of the
    reference, train v2.py:593, decided automatically here):

    - 'single':    1 usable device — plain jit, no mesh;
    - 'data':      ('data',) mesh; stacked fold states replicated, the
                   per-fold batch dim sharded on 'data';
    - 'fold_data': ('fold', 'data') mesh when the fold count divides the
                   device count — folds shard across chips (zero
                   communication), each fold's batch data-parallel.

    The step consumed by jit_plan_train_step is always the *vmapped*
    fold step (stacked_state, [k, B, ...] batch) so the trainer has one
    code path regardless of layout.
    """

    mesh: Optional[Mesh]
    layout: str  # 'single' | 'data' | 'fold_data'
    state_spec: Optional[P] = None
    batch_spec: Optional[P] = None

    @property
    def n_shards(self) -> int:
        return 1 if self.mesh is None else self.mesh.devices.size

    def state_sharding(self) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, self.state_spec)

    def batch_sharding(self) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, self.batch_spec)

    def put_state(self, stacked_state):
        """Commit the stacked fold state to the plan's state sharding
        (replicated or fold-sharded) before entering the train loop."""
        if self.mesh is None:
            return stacked_state
        return jax.device_put(stacked_state, self.state_sharding())

    def describe(self) -> str:
        if self.mesh is None:
            return "single-device"
        axes = ", ".join(
            f"{name}={size}" for name, size in self.mesh.shape.items()
        )
        return f"mesh({axes})"


def plan_parallelism(
    n_folds: int,
    batch_size: int,
    devices: Optional[Sequence] = None,
) -> ParallelPlan:
    """Choose the trainer's sharding layout. Honors the GSSD_DP_DEVICES
    env var as a cap on usable devices (operational override + the
    hook trainer-level tests use to force single-device runs). An
    explicit ``devices`` list is already an intentional override, so the
    env cap only applies to the discovered-device path (a leaked env var
    must not silently reshape a caller-specified mesh — ADVICE r4)."""
    if devices is not None:
        devs = list(devices)
    else:
        devs = list(jax.devices())
        cap = os.environ.get("GSSD_DP_DEVICES")
        if cap:
            devs = devs[: max(1, int(cap))]
    n = len(devs)
    if n > 1 and n_folds > 1 and n % n_folds == 0 \
            and batch_size % (n // n_folds) == 0:
        n_data = n // n_folds
        grid = np.asarray(devs[: n_folds * n_data]).reshape(n_folds, n_data)
        return ParallelPlan(
            Mesh(grid, ("fold", "data")), "fold_data",
            state_spec=P("fold"), batch_spec=P("fold", "data"),
        )
    # largest device count that divides the per-fold batch
    d = max((x for x in range(2, n + 1) if batch_size % x == 0), default=1)
    if d > 1:
        return ParallelPlan(
            Mesh(np.asarray(devs[:d]), ("data",)), "data",
            state_spec=P(), batch_spec=P(None, "data"),
        )
    return ParallelPlan(None, "single")


def jit_plan_train_step(vmapped_step: Callable, plan: ParallelPlan,
                        donate: bool = True) -> Callable:
    """jit the vmapped fold train step under the plan's shardings."""
    donate_argnums = (0,) if donate else ()
    if plan.mesh is None:
        return jax.jit(vmapped_step, donate_argnums=donate_argnums)
    s = plan.state_sharding()
    b = plan.batch_sharding()
    return jax.jit(
        vmapped_step,
        in_shardings=(s, b),
        out_shardings=(s, s),  # metrics carry the same leading fold axis
        donate_argnums=donate_argnums,
    )


def jit_plan_eval_step(vmapped_eval: Callable, plan: ParallelPlan) -> Callable:
    """jit the vmapped fold eval step (state, batch) -> metrics."""
    if plan.mesh is None:
        return jax.jit(vmapped_eval)
    s = plan.state_sharding()
    b = plan.batch_sharding()
    return jax.jit(vmapped_eval, in_shardings=(s, b), out_shardings=s)


def jit_plan_infer_step(infer_fn: Callable, plan: ParallelPlan,
                        infer_batch: int) -> Callable:
    """jit the single-fold inference step (state, images[B, ...]); the
    image batch shards over all the plan's devices when divisible."""
    if plan.mesh is None or infer_batch % plan.n_shards != 0:
        return jax.jit(infer_fn)
    flat = Mesh(plan.mesh.devices.reshape(-1), ("data",))
    rep = NamedSharding(flat, P())
    return jax.jit(
        infer_fn,
        in_shardings=(rep, NamedSharding(flat, P("data"))),
        out_shardings=rep,
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
