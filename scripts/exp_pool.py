"""Max-pool BACKWARD shootout: SelectAndScatter vs mask formulations.

The xplane attribution (scripts/profile_step.py, round 3) shows the
2x2/s2 pool backward lowers to SelectAndScatter and costs 2.4 ms at
300^2x64 alone (~4 ms across the trunk). For NON-OVERLAPPING pools the
backward is expressible without windowed scatter:

    dx[i] = (x[i] == y[i // 2]) * dy[i // 2] / cnt[i // 2]

(cnt = tie count, keeps the exact sum-preserving subgradient). Two
lowerings are timed against the incumbent, fwd+bwd, at the four
flagship trunk sites:

  a) reshape:  x -> [B, H/2, 2, W/2, 2, C], reduce + compare there
  b) repeat:   y/cnt upsampled via jnp.repeat on H then W

Both risk the sublane-relayout tax that killed the strided-slice pool
(STATUS r3); this measures whether reshape/repeat lower cheaper than
strided slices. ceil_mode handled by -inf edge pad to even dims.

Usage: python scripts/exp_pool.py   (TPU; ~3 min)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gssd_tpu.ops.layers import max_pool

B = 32


def neg_inf(dtype):
    return jnp.asarray(-jnp.inf, dtype)


def _pad_even(x):
    Bv, H, W, C = x.shape
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-np.inf)
    return x


def pool2_reshape(x):
    x = _pad_even(x)
    Bv, H, W, C = x.shape
    xr = x.reshape(Bv, H // 2, 2, W // 2, 2, C)
    return jnp.max(xr, axis=(2, 4))


@jax.custom_vjp
def pool2_mask_reshape(x):
    return pool2_reshape(x)


def _pmr_fwd(x):
    y = pool2_reshape(x)
    return y, (x, y)


def _pmr_bwd(res, dy):
    x, y = res
    Bv, H, W, C = x.shape
    xp = _pad_even(x)
    Hp, Wp = xp.shape[1], xp.shape[2]
    xr = xp.reshape(Bv, Hp // 2, 2, Wp // 2, 2, C)
    yb = y[:, :, None, :, None, :]
    mask = (xr == yb).astype(dy.dtype)
    cnt = jnp.sum(mask, axis=(2, 4), keepdims=True)
    dxr = mask * (dy[:, :, None, :, None, :] / cnt)
    dx = dxr.reshape(Bv, Hp, Wp, C)[:, :H, :W]
    return (dx,)


pool2_mask_reshape.defvjp(_pmr_fwd, _pmr_bwd)


@jax.custom_vjp
def pool2_mask_repeat(x):
    return pool2_reshape(x)


def _up2(a, H, W):
    a = jnp.repeat(a, 2, axis=1)[:, :H]
    return jnp.repeat(a, 2, axis=2)[:, :, :W]


def _pmp_fwd(x):
    y = pool2_reshape(x)
    return y, (x, y)


def _pmp_bwd(res, dy):
    x, y = res
    Bv, H, W, C = x.shape
    y_up = _up2(y, H, W)
    mask = (x == y_up).astype(dy.dtype)
    # cnt via a second 2x2 reduce over the mask (sum), then upsample
    cnt = jax.lax.reduce_window(
        mask, jnp.asarray(0, mask.dtype), jax.lax.add,
        (1, 2, 2, 1), (1, 2, 2, 1),
        [(0, 0), (0, H % 2), (0, W % 2), (0, 0)])
    dx = mask * _up2(dy / cnt, H, W)
    return (dx,)


pool2_mask_repeat.defvjp(_pmp_fwd, _pmp_bwd)


def chain_time(f, args, iters=20):
    c = jnp.zeros((), jnp.float32)
    c = f(c, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c * 1e-30, *args)
    float(c)
    return (time.perf_counter() - t0) / iters * 1000


def bench(name, pool_fn, x, ceil):
    def g(c, xv):
        def loss(xi):
            y = pool_fn(xi + c.astype(xi.dtype))
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        v, dx = jax.value_and_grad(loss)(xv)
        return v + jnp.sum(dx.astype(jnp.float32) ** 2) * 1e-30

    ms = chain_time(jax.jit(g), (x,))
    print(f"{name:44s}: {ms:7.3f} ms", flush=True)
    return ms


SITES = [  # (H, C, ceil_mode) — flagship trunk pools
    (300, 64, False),
    (150, 128, False),
    (75, 256, True),
    (38, 512, False),
]


def main():
    rng = np.random.default_rng(0)
    for H, C, ceil in SITES:
        x = jnp.asarray(
            rng.uniform(-1, 1, (B, H, W_ := H, C)), jnp.bfloat16)
        x = jax.nn.relu(x)  # realistic tie density (many zeros)
        # correctness vs incumbent first (fwd exact; bwd allclose
        # except tie-splitting, checked via sum preservation)
        inc = max_pool(x, 2, 2, ceil_mode=ceil)
        got = pool2_mask_reshape(x)
        np.testing.assert_array_equal(np.asarray(inc), np.asarray(got))
        for impl_name, fn in [
            ("reduce_window+SelectAndScatter",
             lambda xi, c=ceil: max_pool(xi, 2, 2, ceil_mode=c)),
            ("mask/reshape", pool2_mask_reshape),
            ("mask/repeat", pool2_mask_repeat),
        ]:
            bench(f"{H}^2 x{C} {impl_name}", fn, x, ceil)
        print()


if __name__ == "__main__":
    main()
