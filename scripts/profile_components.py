"""Per-component step-time breakdown on the current backend.

Times the jitted train step for: plain GSSD, +attention, +DCN(xla),
full GSSD++ — to direct kernel-optimization effort.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gssd_tpu.config import LossConfig, ModelConfig, OptimConfig
from gssd_tpu.models import build_model
from gssd_tpu.train import create_train_state, make_train_step

BATCH = 32


def bench(cfg, iters=10):
    model, priors = build_model(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 12)),
        OptimConfig(),
    )
    step = jax.jit(make_train_step(model, priors, LossConfig(), OptimConfig()),
                   donate_argnums=(0,))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.uniform(0, 1, (BATCH, 300, 300, 12)).astype(np.float32)),
        "boxes": jnp.asarray(np.tile(
            np.asarray([0.3, 0.3, 0.6, 0.6], np.float32), (BATCH, 1, 1))),
        "labels": jnp.zeros((BATCH, 1), jnp.int32),
        "valid": jnp.ones((BATCH, 1), bool),
    }
    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters * 1000


BASE = ModelConfig()
CONFIGS = {
    "gssd": BASE,
    "gssd+attn": dataclasses.replace(
        BASE, use_self_attention=True, use_self_attention_base=True),
    "gssd+dcn": dataclasses.replace(
        BASE, num_dcn_layers=1, groups_dcn=4),
    "gssd++": dataclasses.replace(
        BASE, use_self_attention=True, use_self_attention_base=True,
        num_dcn_layers=1, groups_dcn=4, dcn_cat_sab=True),
}

if __name__ == "__main__":
    for name, cfg in CONFIGS.items():
        ms = bench(cfg)
        print(f"{name:12s}: {ms:7.1f} ms/step  "
              f"({BATCH / ms * 1000:6.1f} slices/s)")
