import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mini_model import build_mini, mini_batch

from gssd_tpu.config import LossConfig, OptimConfig
from gssd_tpu.train import create_train_state, make_train_step
from gssd_tpu.train.checkpoint import (
    load_weights_partial,
    restore_checkpoint,
    save_checkpoint,
)

OPTIM = OptimConfig(lr=1e-3, stepvalues=(100,))


def _trained_state(rng, steps=3):
    model, priors = build_mini()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 12)), OPTIM
    )
    step = jax.jit(make_train_step(model, priors, LossConfig(max_gt_boxes=4),
                                   OPTIM))
    batch = mini_batch(rng, 2)
    for _ in range(steps):
        state, _ = step(state, batch)
    return model, priors, state, step, batch


def test_save_restore_roundtrip(tmp_path, rng):
    model, priors, state, step, batch = _trained_state(rng)
    save_checkpoint(state, str(tmp_path), "mini", 3, fold=0)

    fresh = create_train_state(
        model, jax.random.PRNGKey(9), jnp.zeros((1, 64, 64, 12)), OPTIM
    )
    restored = restore_checkpoint(fresh, str(tmp_path), "mini", 3, fold=0)
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer momenta restored too -> next update identical
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_partial_restore_skips_mismatched(tmp_path, rng):
    model, priors, state, step, batch = _trained_state(rng)
    save_checkpoint(state, str(tmp_path), "mini", 3, fold=0)

    fresh = create_train_state(
        model, jax.random.PRNGKey(9), jnp.zeros((1, 64, 64, 12)), OPTIM
    )
    # grow one head shape: 4 classes instead of 2 (GSSD -> GSSD++ style
    # warm start must load everything else and skip the mismatch)
    from mini_model import MiniDetector

    model4 = MiniDetector(num_classes=4)
    fresh4 = create_train_state(
        model4, jax.random.PRNGKey(9), jnp.zeros((1, 64, 64, 12)), OPTIM
    )
    loaded = load_weights_partial(fresh4, str(tmp_path), "mini", 3, fold=0,
                                  verbose=False)
    # conv before the heads must match exactly
    np.testing.assert_array_equal(
        np.asarray(loaded.params["Conv_0"]["kernel"]),
        np.asarray(state.params["Conv_0"]["kernel"]),
    )
    # the 4-class conf head keeps its fresh init (mismatched shape)
    np.testing.assert_array_equal(
        np.asarray(loaded.params["Conv_4"]["kernel"]),
        np.asarray(fresh4.params["Conv_4"]["kernel"]),
    )
