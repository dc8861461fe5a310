"""Fine-grained TPU step-time breakdown for the GSSD++ hot path.

Times each suspect piece with the tunnel-safe chained-scalar pattern
(each call consumes a scalar produced by the previous call, and the
final scalar is fetched with float() which forces a D2H sync).

Pieces:
  - train-step variants (gssd / +attn / gssd++ per DCN impl)
  - model fwd, model fwd+bwd with a dummy loss (isolates multibox loss)
  - multibox_loss fwd+bwd alone
  - OHNM double-argsort alone
  - DCN standalone per impl (fwd / fwd+bwd) at the flagship site shape
  - the offset-predictor conv alone
  - an equivalent dense 3x3 conv (speed-of-light reference for DCN)
  - SelfAttention at the conv4_3 site

Usage: python scripts/profile_dcn.py [piece ...]   (default: all)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gssd_tpu.config import LossConfig, ModelConfig, OptimConfig
from gssd_tpu.models import build_model
from gssd_tpu.train import create_train_state, make_train_step

B = 32
H = W = 38
C_IN = 1024
C_OUT = 512
G = 4


def chain_time(f, args, iters=20):
    """f(chain_scalar, *args) -> scalar. Returns ms/call."""
    f = jax.jit(f)
    c = jnp.zeros((), jnp.float32)
    c = f(c, *args)
    float(c)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c * 1e-30, *args)
    float(c)  # D2H forces completion
    return (time.perf_counter() - t0) / iters * 1000


def report(name, ms):
    print(f"{name:42s}: {ms:8.2f} ms", flush=True)


def rand(*shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(-1, 1, shape), dtype=dtype)


# ---------------------------------------------------------------- pieces


def piece_steps():
    base = ModelConfig()
    variants = {
        "step/gssd": base,
        "step/gssd+attn": dataclasses.replace(
            base, use_self_attention=True, use_self_attention_base=True),
        "step/gssd++hat": dataclasses.replace(
            base, use_self_attention=True, use_self_attention_base=True,
            num_dcn_layers=1, groups_dcn=4, dcn_cat_sab=True,
            dcn_impl="hat"),
        "step/gssd++hat-nocat": dataclasses.replace(
            base, use_self_attention=True, use_self_attention_base=True,
            num_dcn_layers=1, groups_dcn=4, dcn_cat_sab=False,
            dcn_impl="hat"),
        "step/gssd+dcnonly-hat": dataclasses.replace(
            base, num_dcn_layers=1, groups_dcn=4, dcn_impl="hat"),
        "step/gssd++fused": dataclasses.replace(
            base, use_self_attention=True, use_self_attention_base=True,
            num_dcn_layers=1, groups_dcn=4, dcn_cat_sab=True,
            dcn_impl="fused"),
        "step/gssd++xla": dataclasses.replace(
            base, use_self_attention=True, use_self_attention_base=True,
            num_dcn_layers=1, groups_dcn=4, dcn_cat_sab=True,
            dcn_impl="xla"),
        "step/gssd++pallas": dataclasses.replace(
            base, use_self_attention=True, use_self_attention_base=True,
            num_dcn_layers=1, groups_dcn=4, dcn_cat_sab=True,
            dcn_impl="pallas"),
    }
    batch = {
        "image": rand(B, 300, 300, 12, dtype=jnp.float32),
        "boxes": jnp.tile(jnp.asarray([0.3, 0.3, 0.6, 0.6], jnp.float32),
                          (B, 1, 1)),
        "labels": jnp.zeros((B, 1), jnp.int32),
        "valid": jnp.ones((B, 1), bool),
    }
    for name, cfg in variants.items():
        model, priors = build_model(cfg)
        state = create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 12)),
            OptimConfig())
        step = make_train_step(model, priors, LossConfig(), OptimConfig())

        def f(c, state, batch):
            b = dict(batch)
            b["image"] = b["image"] + c
            _, m = step(state, b)
            return m["loss"].astype(jnp.float32)

        report(name, chain_time(f, (state, batch)))


def piece_model():
    cfg = dataclasses.replace(
        ModelConfig(), use_self_attention=True, use_self_attention_base=True,
        num_dcn_layers=1, groups_dcn=4, dcn_cat_sab=True, dcn_impl="fused")
    model, priors = build_model(cfg)
    x = rand(B, 300, 300, 12, dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 12)),
        OptimConfig())
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 "spectral": state.spectral}

    def fwd(c, variables, x):
        out = model.apply(variables, x + c, train=False)
        return jnp.sum(out["loc"]) * 1e-6

    report("model/fwd only (eval mode)", chain_time(fwd, (variables, x)))

    def fwdbwd(c, params, x):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats,
                 "spectral": state.spectral},
                x + c, train=True, mutable=["batch_stats", "spectral"])
            return (jnp.mean(jnp.square(out["loc"]))
                    + jnp.mean(jnp.square(out["conf"])))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return loss + gs * 1e-30

    report("model/fwd+bwd dummy loss", chain_time(fwdbwd, (state.params, x)))


def piece_loss():
    P = 8732
    loc = rand(B, P, 4, dtype=jnp.float32)
    conf = rand(B, P, 2, dtype=jnp.float32)
    cfg = ModelConfig()
    from gssd_tpu.ops.anchors import make_anchors
    from gssd_tpu.ops.losses import multibox_loss

    priors = jnp.asarray(make_anchors(cfg.anchor_config))
    boxes = jnp.tile(jnp.asarray([0.3, 0.3, 0.6, 0.6], jnp.float32),
                     (B, 8, 1))
    labels = jnp.zeros((B, 8), jnp.int32)
    valid = jnp.ones((B, 8), bool)

    def f(c, loc, conf):
        def loss_fn(args):
            lc, cf = args
            ll, lcf, _ = multibox_loss(
                lc + c, cf, priors, boxes, labels, valid, LossConfig())
            return ll + lcf

        val, grads = jax.value_and_grad(loss_fn)((loc, conf))
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30

    report("loss/multibox fwd+bwd", chain_time(f, (loc, conf)))

    def g(c, conf):
        mining = conf[..., 0] + c
        order = jnp.argsort(-mining, axis=1)
        rank = jnp.argsort(order, axis=1)
        return jnp.sum(rank[:, :4]).astype(jnp.float32) * 1e-9

    report("loss/double argsort [B,8732]", chain_time(g, (conf,)))


def piece_dcn():
    from gssd_tpu.ops.deform_conv import DCN

    x = rand(B, H, W, C_IN)
    for impl in ("hat", "fused", "xla", "pallas"):
        mod = DCN(features=C_OUT, deformable_groups=G, dtype=jnp.bfloat16,
                  impl=impl)
        variables = mod.init(jax.random.PRNGKey(0), x)

        def fwd(c, variables, x):
            out, _ = mod.apply(variables, x + c.astype(x.dtype))
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        report(f"dcn/{impl} fwd", chain_time(fwd, (variables, x)))

        def fwdbwd(c, params, x):
            def loss_fn(args):
                p, xi = args
                out, _ = mod.apply({"params": p}, xi + c.astype(xi.dtype))
                return jnp.mean(jnp.square(out.astype(jnp.float32)))

            val, grads = jax.value_and_grad(loss_fn)((params, x))
            gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                     for g in jax.tree_util.tree_leaves(grads))
            return val + gs * 1e-30

        report(f"dcn/{impl} fwd+bwd",
               chain_time(fwdbwd, (variables["params"], x)))


def piece_dcn_parts():
    """Sub-pieces of the fused impl: gather-only, matmul-only."""
    from gssd_tpu.ops.deform_fused import _sample

    x = rand(B, H, W, C_IN)
    xg = x.reshape(B, H, W, G, C_IN // G)
    P = H * W
    py = rand(B, P, G, dtype=jnp.float32, seed=1) * 3 + 19
    px = rand(B, P, G, dtype=jnp.float32, seed=2) * 3 + 19
    m = jnp.abs(rand(B, P, G, dtype=jnp.float32, seed=3))

    def gather9(c, py, px, m, xg):
        acc = jnp.zeros((), jnp.float32)
        for k in range(9):
            s = _sample(py + c + k * 0.1, px, m, xg)  # noqa
            acc = acc + jnp.sum(s.astype(jnp.float32)) * 1e-9
        return acc

    report("dcnpart/9x gather (_sample) fwd", chain_time(gather9, (py, px, m, xg)))

    w = rand(9, C_IN, C_OUT, seed=4)
    sampled = rand(B, P, C_IN, seed=5)

    def matmul9(c, sampled, w):
        acc = None
        for k in range(9):
            t = jnp.dot(sampled + c, w[k],
                        preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        return jnp.sum(acc) * 1e-9

    report("dcnpart/9x tap matmul fwd", chain_time(matmul9, (sampled, w)))

    # offset conv alone (1024 -> 3*G*K at 3x3)
    om = nn.Conv(3 * G * 9, (3, 3), padding=[(1, 1)] * 2,
                 dtype=jnp.bfloat16, param_dtype=jnp.float32)
    ov = om.init(jax.random.PRNGKey(0), x)

    def offconv(c, ov, x):
        def loss_fn(p):
            return jnp.mean(jnp.square(
                om.apply(p, x + c.astype(x.dtype)).astype(jnp.float32)))

        val, grads = jax.value_and_grad(loss_fn)(ov)
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30

    report("dcnpart/offset conv fwd+bwd", chain_time(offconv, (ov, x)))

    # dense conv equivalent (speed-of-light for the DCN matmul volume)
    dense = nn.Conv(C_OUT, (3, 3), padding=[(1, 1)] * 2, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)
    dv = dense.init(jax.random.PRNGKey(0), x)

    def densef(c, dv, x):
        return jnp.sum(dense.apply(dv, x + c).astype(jnp.float32)) * 1e-9

    report("dcnpart/dense 3x3 1024->512 fwd", chain_time(densef, (dv, x)))

    def denseb(c, dv, x):
        def loss_fn(args):
            p, xi = args
            return jnp.mean(jnp.square(
                dense.apply(p, xi + c.astype(xi.dtype)).astype(jnp.float32)))

        val, grads = jax.value_and_grad(loss_fn)((dv, x))
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30

    report("dcnpart/dense 3x3 fwd+bwd", chain_time(denseb, (dv, x)))


def piece_attn():
    from gssd_tpu.ops.layers import SelfAttention

    x = rand(B, H, W, 512)
    mod = SelfAttention(max_pool_factor=8, dtype=jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(0), x, False)

    def f(c, variables, x):
        def loss_fn(v):
            out, _, _ = mod.apply(v, x + c, False,
                                  mutable=["spectral"])[0] if False else mod.apply(
                v, x + c, False)
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        val, grads = jax.value_and_grad(loss_fn)(variables)
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30

    report("attn/conv4_3 site fwd+bwd", chain_time(f, (variables, x)))


ALL = {
    "steps": piece_steps,
    "model": piece_model,
    "loss": piece_loss,
    "dcn": piece_dcn,
    "dcnparts": piece_dcn_parts,
    "attn": piece_attn,
}

def _warmup():
    """The tunneled device inflates the first timing loop in a process
    by ~20 ms/iter; burn that in on a trivial program first."""
    z = rand(128, 128, dtype=jnp.float32)
    chain_time(lambda c, a: jnp.sum(a * (1 + c)) * 1e-9, (z,), iters=30)


if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)
    _warmup()
    for n in names:
        ALL[n]()
