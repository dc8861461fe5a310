"""Train state and optimizer.

Reference recipe (train_lesion_multiphase_v2.py): SGD with momentum 0.9
and weight decay 5e-4 (:174-177), LR stepped x gamma at ``stepvalues``
(adjust_learning_rate :434-441), optional x0.1 LR group for DCN params
(--modify_dcn_lr, :603-622), optional global grad-norm clip (:250-252).

Here the optimizer is an optax chain (torch-SGD semantics: decoupled
weight decay added to the gradient *before* the momentum trace), the LR
schedule is a piecewise-constant function of the step, and the DCN LR
group is an optax.multi_transform over a param-path predicate. All
mutable model collections (batch_stats for BN, spectral for the
power-iteration u/v) live in the state pytree so vmapping over
cross-validation folds gives every fold its own statistics
(SURVEY.md §7.2.4-5).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from gssd_tpu.config import OptimConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    spectral: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.spectral:
            v["spectral"] = self.spectral
        return v

    def apply_gradients(self, grads, **updates):
        upd, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, upd)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            **updates,
        )


def step_lr_schedule(cfg: OptimConfig):
    """Piecewise-constant lr: cfg.lr * gamma^(#stepvalues passed).

    Boundaries past int32 range are dropped: the step counter is int32,
    so a never-reached sentinel like the reference pixellink trainer's
    9999999999999 (its "no decay" encoding) would overflow the
    schedule's `threshold - count` comparison."""
    boundaries = {s: cfg.gamma for s in cfg.stepvalues if s < 2**31 - 1}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def _is_dcn_path(path) -> bool:
    return any(
        isinstance(k, (str,)) and k.startswith("dcn_")
        or getattr(k, "key", None) is not None
        and str(getattr(k, "key")).startswith("dcn_")
        for k in path
    )


def make_optimizer(cfg: OptimConfig, params=None) -> optax.GradientTransformation:
    schedule = step_lr_schedule(cfg)

    def chain(lr_scale: float = 1.0):
        parts = [
            optax.add_decayed_weights(cfg.weight_decay),
            optax.trace(decay=cfg.momentum, nesterov=False),
            optax.scale_by_learning_rate(schedule),
        ]
        if lr_scale != 1.0:
            parts.append(optax.scale(lr_scale))
        return optax.chain(*parts)

    if not cfg.modify_dcn_lr:
        tx = chain()
    else:
        # x0.1 LR for everything under a dcn_* module (v2.py:603-622);
        # the scale applies to the final update, matching torch's
        # per-group lr
        def label_fn(tree):
            return jax.tree_util.tree_map_with_path(
                lambda p, _: "dcn" if _is_dcn_path(p) else "rest", tree
            )

        tx = optax.multi_transform(
            {"rest": chain(), "dcn": chain(0.1)}, label_fn
        )

    if cfg.clip is not None:
        # clip on the *global* norm over all params, before any per-group
        # transform — matches torch clip_grad_norm_(net.parameters())
        # (train v2.py:250-252), which torch computes across all groups
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip), tx)
    return tx


def create_train_state(
    model, rng, sample_input, optim_cfg: OptimConfig
) -> TrainState:
    # jit the init: eager op-by-op construction of the full detector is
    # minutes on a slow host, compiled it is seconds
    init_fn = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = init_fn(rng, sample_input)
    params = variables["params"]
    tx = make_optimizer(optim_cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        spectral=variables.get("spectral", {}),
        opt_state=tx.init(params),
        tx=tx,
    )
