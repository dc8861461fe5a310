import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_model import build_mini, mini_batch

from gssd_tpu.config import LossConfig, ModelConfig, OptimConfig
from gssd_tpu.models import build_model
from gssd_tpu.parallel import make_mesh, shard_batch, shard_train_step
from gssd_tpu.parallel.folds import stack_states, unstack_state, vmap_train_step
from gssd_tpu.train import create_train_state, make_train_step
from gssd_tpu.train.steps import make_eval_step

OPTIM = OptimConfig(lr=1e-3, stepvalues=(100,))
LOSS = LossConfig(max_gt_boxes=4)


@pytest.fixture(scope="module")
def mini():
    model, priors = build_mini()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 12)), OPTIM
    )
    step = make_train_step(model, priors, LOSS, OPTIM)
    return model, priors, state, step


def test_full_gssd_train_step_learns(rng):
    """One heavy end-to-end check: the real 300x300 GSSD train step
    compiles, runs, and reduces the loss on a repeated batch."""
    cfg = ModelConfig(compute_dtype="float32")
    model, priors = build_model(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 12)), OPTIM
    )
    step = jax.jit(make_train_step(model, priors, LOSS, OPTIM))
    batch = mini_batch(rng, 2, size=300)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 4
    assert losses[-1] < losses[0]
    assert float(metrics["grad_norm"]) > 0
    assert abs(float(metrics["lr"]) - 1e-3) < 1e-8


def test_mini_train_and_eval(mini, rng):
    model, priors, state, step = mini
    jstep = jax.jit(step)
    batch = mini_batch(rng, 4)
    for _ in range(10):
        state, metrics = jstep(state, batch)
    assert float(metrics["loss"]) < 20
    estep = jax.jit(make_eval_step(model, priors, LOSS))
    out = estep(state, batch)
    assert np.isfinite(float(out["loss"]))


def test_lr_schedule_steps(mini, rng):
    model, priors, state, step = mini
    jstep = jax.jit(step)
    batch = mini_batch(rng, 2)
    state = state.replace(step=jnp.asarray(150, jnp.int32))
    _, metrics = jstep(state, batch)
    # past the 100-step boundary: lr = 1e-3 * 0.1
    assert abs(float(metrics["lr"]) - 1e-4) < 1e-9


def test_data_parallel_matches_single_device(mini, rng):
    """The pjit'd step over the 8-device CPU mesh must produce the same
    update as the single-device step (the SPMD replacement for
    torch.nn.DataParallel)."""
    model, priors, state, step = mini
    batch = mini_batch(rng, 8)
    single_state, single_metrics = jax.jit(step)(state, batch)

    mesh = make_mesh(8)
    pstep = shard_train_step(step, mesh, donate=False)
    sharded = shard_batch(mesh, batch)
    multi_state, multi_metrics = pstep(state, sharded)
    np.testing.assert_allclose(
        float(single_metrics["loss"]), float(multi_metrics["loss"]), rtol=1e-5
    )
    for x, y in zip(
        jax.tree_util.tree_leaves(single_state.params),
        jax.tree_util.tree_leaves(multi_state.params),
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_vmapped_folds(mini, rng):
    """Stacked-fold vmap == running each fold separately (the TPU
    replacement for the reference's round-robin deepcopy loop,
    train v2.py:596-628)."""
    model, priors, state, step = mini
    k = 3
    stacked = stack_states([state] * k)
    batches = [mini_batch(rng, 2) for _ in range(k)]
    fold_batch = {
        key: np.stack([b[key] for b in batches]) for key in batches[0]
    }
    vstep = jax.jit(vmap_train_step(step))
    new_stacked, metrics = vstep(stacked, fold_batch)
    assert metrics["loss"].shape == (k,)

    for fold in (0, 2):
        sf, mf = jax.jit(step)(state, batches[fold])
        got = unstack_state(new_stacked, fold)
        np.testing.assert_allclose(
            float(metrics["loss"][fold]), float(mf["loss"]), rtol=1e-5
        )
        for x, y in zip(
            jax.tree_util.tree_leaves(sf.params),
            jax.tree_util.tree_leaves(got.params),
        ):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_fold_sharded_mesh(mini, rng):
    """2-axis ('fold', 'data') mesh: 2 folds x 4 data shards must equal
    the unsharded vmapped step."""
    from gssd_tpu.parallel.mesh import make_fold_mesh, shard_fold_train_step

    model, priors, state, step = mini
    k = 2
    stacked = stack_states([state] * k)
    batches = [mini_batch(rng, 4) for _ in range(k)]
    fold_batch = {
        key: np.stack([b[key] for b in batches]) for key in batches[0]
    }
    ref_stacked, ref_metrics = jax.jit(vmap_train_step(step))(
        stacked, fold_batch)

    mesh = make_fold_mesh(n_folds=2, n_data=4)
    pstep = shard_fold_train_step(vmap_train_step(step), mesh, donate=False)
    got_stacked, got_metrics = pstep(stacked, fold_batch)
    np.testing.assert_allclose(
        np.asarray(got_metrics["loss"]), np.asarray(ref_metrics["loss"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_stacked.params),
        jax.tree_util.tree_leaves(got_stacked.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
