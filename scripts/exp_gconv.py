"""Grouped-conv lowering alternatives at the GSSD trunk shapes.

feature_group_count lowers poorly at large spatial extents on TPU;
compare against (a) dense conv with a block-diagonal weight mask
(identical math, 4x FLOPs, full MXU utilization), (b) batch_group_count
(groups moved into the batch dim), (c) per-group convs + concat.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B = 32


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


def bench_case(name, H, Cin, Cout, G):
    x = rand(B, H, H, Cin)
    Cg_i, Cg_o = Cin // G, Cout // G
    wg = rand(3, 3, Cg_i, Cout, seed=1)          # grouped layout (HWIO)
    wd = rand(3, 3, Cin, Cout, seed=1)           # dense layout
    mask = np.zeros((3, 3, Cin, Cout), np.float32)
    for g in range(G):
        mask[:, :, g * Cg_i:(g + 1) * Cg_i, g * Cg_o:(g + 1) * Cg_o] = 1
    mask = jnp.asarray(mask, jnp.bfloat16)
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

    def f_grouped(w, xi):
        return jax.lax.conv_general_dilated(
            xi, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            feature_group_count=G,
        )

    def f_masked(w, xi):
        return jax.lax.conv_general_dilated(
            xi, w * mask, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        )

    def f_pergroup(w, xi):
        outs = []
        for g in range(G):
            outs.append(jax.lax.conv_general_dilated(
                xi[..., g * Cg_i:(g + 1) * Cg_i],
                w[:, :, :, g * Cg_o:(g + 1) * Cg_o],
                (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn))
        return jnp.concatenate(outs, axis=-1).astype(xi.dtype)

    t_g = run(f_grouped, wg)
    t_m = run(f_masked, wd)
    t_p = run(f_pergroup, wg)
    print(f"{name:28s}: grouped {t_g:7.2f}  masked-dense {t_m:7.2f}  "
          f"per-group {t_p:7.2f} ms", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    z = rand(128, 128, dtype=jnp.float32)
    chain_time(lambda c, a: jnp.sum(a * (1 + c)) * 1e-9, (z,), iters=30)
    bench_case("300^2 12->64 g4", 300, 12, 64, 4)
    bench_case("300^2 64->64 g4", 300, 64, 64, 4)
    bench_case("150^2 64->128 g4", 150, 64, 128, 4)
    bench_case("150^2 128->128 g4", 150, 128, 128, 4)
    bench_case("75^2 128->256 g4", 75, 128, 256, 4)
    bench_case("75^2 256->256 g4", 75, 256, 256, 4)
    bench_case("38^2 256->512 g4", 38, 256, 512, 4)
    bench_case("38^2 512->512 g4", 38, 512, 512, 4)
