"""conv1_1 (12->64 @300^2 g4) alternatives: tiny-Cin convs waste MXU
lanes; compare XLA grouped/masked-dense conv vs im2col+matmul."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B, H, Cin, Cout, G = 32, 300, 12, 64, 4
K = 3


def chain_time(fn, args, iters=20):
    f = jax.jit(fn)
    c = jnp.zeros((), jnp.float32)
    c = f(c, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c * 1e-30, *args)
    float(c)
    return (time.perf_counter() - t0) / iters * 1000


def rand(*shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(-0.1, 0.1, shape), dtype=dtype)


x = rand(B, H, H, Cin)
wd = rand(K, K, Cin, Cout, seed=1)  # dense HWIO (block-diag-masked)
mask = np.zeros((K, K, Cin, Cout), np.float32)
for g in range(G):
    mask[:, :, g * (Cin // G):(g + 1) * (Cin // G),
         g * (Cout // G):(g + 1) * (Cout // G)] = 1
maskj = jnp.asarray(mask, jnp.bfloat16)
dn = jax.lax.conv_dimension_numbers(x.shape, wd.shape,
                                    ("NHWC", "HWIO", "NHWC"))


def run(f, w):
    def g_(c, w, x):
        def loss(args):
            wi, xi = args
            y = f(wi, xi + c.astype(xi.dtype))
            return jnp.mean(jnp.square(y.astype(jnp.float32)))
        val, grads = jax.value_and_grad(loss)((w, x))
        gs = sum(jnp.sum(gg.astype(jnp.float32) ** 2)
                 for gg in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30
    return chain_time(g_, (w, x))


def f_masked(w, xi):
    return jax.lax.conv_general_dilated(
        xi, w * maskj, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)


def f_im2col(w, xi):
    # patches: [B, H, W, K*K*Cin] (channel-major within each tap)
    p = jax.lax.conv_general_dilated_patches(
        xi, (K, K), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn)
    wm = (w * maskj)
    # patches order from conv_general_dilated_patches: [Cin, K, K] flat
    wm = jnp.transpose(wm, (2, 0, 1, 3)).reshape(K * K * Cin, Cout)
    return jax.lax.dot_general(
        p, wm, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(xi.dtype)


print(f"backend: {jax.default_backend()}")
z = rand(128, 128, dtype=jnp.float32)
chain_time(lambda c, a: jnp.sum(a * (1 + c)) * 1e-9, (z,), iters=30)

ya = np.asarray(jax.jit(f_masked)(wd, x), np.float32)
yb = np.asarray(jax.jit(f_im2col)(wd, x), np.float32)
err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-6)
print(f"im2col vs conv rel err: {err:.5f}")
print(f"masked-dense conv : {run(f_masked, wd):7.2f} ms")
print(f"im2col + matmul   : {run(f_im2col, wd):7.2f} ms")
# conclusion: materialized-patch traffic dominates; masked-dense conv stays
