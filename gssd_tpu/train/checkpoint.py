"""Checkpoint save / resume / partial restore (orbax).

Reference behavior being matched:
- save {'iters', 'state_dict', 'optimizer'} per CV fold every val_every
  iterations (train v2.py:377-384) -> here one orbax directory per
  (model_name, iteration, fold) holding the full TrainState pytree
  (params, BN stats, spectral u/v, optimizer momenta, step);
- --resume restores net+optimizer and continues (v2.py:630-637);
- shape-mismatch-tolerant partial load with a warning per skipped leaf
  (models/...group.py:402-429) so GSSD weights can warm-start GSSD++.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from gssd_tpu.train.state import TrainState


def _ckpt_dir(save_folder: str, model_name: str, iteration: int, fold: int) -> str:
    return os.path.join(
        os.path.abspath(save_folder), model_name,
        f"{model_name}_{iteration}_CV{fold}",
    )


def save_checkpoint(
    state: TrainState, save_folder: str, model_name: str, iteration: int,
    fold: int = 0,
) -> str:
    path = _ckpt_dir(save_folder, model_name, iteration, fold)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "step": state.step,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "spectral": state.spectral,
                "opt_state": state.opt_state,
            },
            force=True,
        )
    return path


def restore_checkpoint(
    state: TrainState, save_folder: str, model_name: str, iteration: int,
    fold: int = 0,
) -> TrainState:
    """Full restore (resume training): everything including optimizer."""
    path = _ckpt_dir(save_folder, model_name, iteration, fold)
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "spectral": state.spectral,
        "opt_state": state.opt_state,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, ocp.args.PyTreeRestore(template))
    return state.replace(**restored)


def load_weights_partial(
    state: TrainState, save_folder: str, model_name: str, iteration: int,
    fold: int = 0, verbose: bool = True,
) -> TrainState:
    """Shape-filtered partial weight load: copy every stored leaf whose
    path exists in the target with a matching shape; keep the target's
    value (and warn) otherwise. Optimizer state is NOT restored — this
    is the eval-time / warm-start path."""
    path = _ckpt_dir(save_folder, model_name, iteration, fold)
    with ocp.PyTreeCheckpointer() as ckptr:
        # restore as host numpy so checkpoints written on one backend
        # (TPU) load on another (CPU) without sharding metadata
        meta = ckptr.metadata(path).item_metadata
        if meta is None:
            import glob
            sibs = sorted(glob.glob(os.path.join(
                save_folder, model_name, f"{model_name}_*_CV{fold}")))
            raise FileNotFoundError(
                f"no checkpoint at {path}; available: "
                f"{[os.path.basename(s) for s in sibs] or 'none'}")
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta.tree
        )
        stored = ckptr.restore(
            path, ocp.args.PyTreeRestore(restore_args=restore_args)
        )

    def merge(section: str, target):
        src = stored.get(section)
        if src is None:
            return target
        flat_src = dict(
            jax.tree_util.tree_flatten_with_path(src)[0]
        )
        def pick(path_leaf, tgt_leaf):
            s = flat_src.get(path_leaf)
            if s is None:
                if verbose:
                    print(f"WARNING: {section}{path_leaf} missing in "
                          "checkpoint; keeping initialization")
                return tgt_leaf
            if np.shape(s) != np.shape(tgt_leaf):
                if verbose:
                    print(f"WARNING: shape of stored {section}{path_leaf} "
                          f"{np.shape(s)} != model {np.shape(tgt_leaf)}; "
                          "ignored")
                return tgt_leaf
            return np.asarray(s).astype(np.asarray(tgt_leaf).dtype)

        leaves = jax.tree_util.tree_flatten_with_path(target)
        new_leaves = [pick(p, l) for p, l in leaves[0]]
        return jax.tree_util.tree_unflatten(leaves[1], new_leaves)

    return state.replace(
        params=merge("params", state.params),
        batch_stats=merge("batch_stats", state.batch_stats),
        spectral=merge("spectral", state.spectral),
    )
