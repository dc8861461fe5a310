"""W-pair channel-packing probe for the 300^2 x 64ch stem.

Hypothesis (round-3/4 stem lead): every 64-channel tensor at 300^2
wastes HALF of each (8, 128) tile (C=64 fills 64 of 128 lanes), so all
stem passes (conv, BN stats/apply, relu, pool) run at <= 50% of HBM
bandwidth. Packing W-pixel pairs into channels ([B, 300, 300, 64] ->
[B, 300, 150, 128], a free logical reshape) makes every pass full-lane
at the cost of 2x conv MACs (these convs are bandwidth-bound: 0.2 ->
0.4 TFLOP vs ~25 TFLOPS effective).

A 3x3 conv in packed space uses an embedded weight
  wp[ky, kt, q*Ci + ci, p*Co + co] = w[ky, 2*(kt-1)+q-p+1, ci, co]
(taps with |2*(kt-1)+q-p| > 1 are zero), exactly reproducing the
original conv including zero padding.

Sites (b32, fwd+bwd, chained-scalar timing):
  bnrelu   BN(train stats)+ReLU at 300^2x64      vs packed
  conv     3x3 64->64 dense conv (block-diag load) vs packed 128->128
  pool     2x2/s2 max pool                        vs packed lane-max
  chain    conv1_1(12->64)+BN+ReLU+conv1_2+BN+ReLU+pool end-to-end

Usage: python scripts/exp_packstem.py [sites...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B = 32
H = 300


def chain_time(f, args, iters=20):
    f = jax.jit(f)
    c = jnp.zeros((), jnp.float32)
    c = f(c, *args)
    float(c)
    for _ in range(3):
        c = f(c * 1e-30, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c * 1e-30, *args)
    float(c)
    return (time.perf_counter() - t0) / iters * 1000


def timed(name, loss_fn, params):
    def g(c, p):
        v, grads = jax.value_and_grad(loss_fn)(jax.tree_util.tree_map(
            lambda a: a + c.astype(a.dtype) * 0, p))
        gs = sum(jnp.sum(gi.astype(jnp.float32) ** 2)
                 for gi in jax.tree_util.tree_leaves(grads))
        return v + gs * 1e-30

    ms = chain_time(g, (params,))
    print(f"  {name:28s}: {ms:7.3f} ms", flush=True)
    return ms


def pack(x):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack(x):
    b, h, w, c = x.shape
    return x.reshape(b, h, w * 2, c // 2)


def pack_weight(w):
    """[3, 3, Ci, Co] -> [3, 3, 2Ci, 2Co] embedded W-pair weight."""
    ky, kw, ci, co = w.shape
    wp = jnp.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for p in (0, 1):
        for q in (0, 1):
            for kt in (0, 1, 2):
                dw = 2 * (kt - 1) + q - p
                if abs(dw) <= 1:
                    wp = wp.at[:, kt, q * ci:(q + 1) * ci,
                               p * co:(p + 1) * co].set(w[:, dw + 1])
    return wp


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bn_relu(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    y = (xf - mean) * (scale * jax.lax.rsqrt(var + 1e-5)) + bias
    return jax.nn.relu(y).astype(x.dtype)


def bn_relu_packed(xp, scale, bias):
    """Same BN semantics on the packed layout: fold the [2C] lane stats
    back to [C] (the two parities are disjoint samples of the same
    channel), tile scale/bias back up."""
    c = scale.shape[0]
    xf = xp.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=(0, 1, 2))
    s2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
    mean = 0.5 * (s1[:c] + s1[c:])
    var = 0.5 * (s2[:c] + s2[c:]) - jnp.square(mean)
    sc = jnp.tile(scale * jax.lax.rsqrt(var + 1e-5), 2)
    bi = jnp.tile(bias, 2) - jnp.tile(mean, 2) * sc
    return jax.nn.relu(xf * sc + bi).astype(xp.dtype)


def pool_packed(xp):
    """2x2/s2 pool: W-pairs are lane halves; H-pairs via reshape."""
    b, h, wp_, c2 = xp.shape
    c = c2 // 2
    wmax = jnp.maximum(xp[..., :c], xp[..., c:])
    return jnp.max(wmax.reshape(b, h // 2, 2, wp_, c), axis=2)


def pool_packed_rw(xp):
    """2x2/s2 pool: W-pairs via lane-max, H via reduce_window."""
    c = xp.shape[3] // 2
    wmax = jnp.maximum(xp[..., :c], xp[..., c:])
    return jax.lax.reduce_window(
        wmax, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1),
        [(0, 0)] * 4)


def pool_unpack_rw(xp):
    """Unpack (free logical reshape) then the plain reduce_window."""
    x = unpack(xp)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        [(0, 0)] * 4)


def main():
    rng = np.random.default_rng(0)
    sites = sys.argv[1:] or ["bnrelu", "conv", "pool", "chain"]
    x = jnp.asarray(rng.normal(0, 1, (B, H, H, 64)), jnp.bfloat16)
    xp = pack(x)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, 64), jnp.float32)
    w22 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 64)), jnp.float32)

    if "bnrelu" in sites:
        print("== bnrelu 300^2x64 fwd+bwd ==")
        timed("plain", lambda p: jnp.mean(
            jnp.square(bn_relu(p["x"], p["s"], p["b"]).astype(jnp.float32))),
            {"x": x, "s": scale, "b": bias})
        timed("packed", lambda p: jnp.mean(
            jnp.square(bn_relu_packed(p["x"], p["s"], p["b"])
                       .astype(jnp.float32))),
            {"x": xp, "s": scale, "b": bias})

    if "conv" in sites:
        print("== conv3x3 64->64 300^2 fwd+bwd ==")
        timed("plain dense", lambda p: jnp.mean(
            jnp.square(conv(p["x"], p["w"]).astype(jnp.float32))),
            {"x": x, "w": w22})
        timed("packed dense 128->128", lambda p: jnp.mean(
            jnp.square(conv(p["x"], pack_weight(p["w"]))
                       .astype(jnp.float32))),
            {"x": xp, "w": w22})

    if "pool" in sites:
        print("== pool 2x2/s2 300^2x64 fwd+bwd ==")
        from gssd_tpu.ops.layers import max_pool
        timed("plain reduce_window", lambda p: jnp.mean(
            jnp.square(max_pool(p["x"], 2, 2).astype(jnp.float32))),
            {"x": x})
        timed("packed lane-max", lambda p: jnp.mean(
            jnp.square(pool_packed(p["x"]).astype(jnp.float32))),
            {"x": xp})
        timed("packed lane+rw", lambda p: jnp.mean(
            jnp.square(pool_packed_rw(p["x"]).astype(jnp.float32))),
            {"x": xp})
        timed("packed unpack+rw", lambda p: jnp.mean(
            jnp.square(pool_unpack_rw(p["x"]).astype(jnp.float32))),
            {"x": xp})

    if "chain" in sites:
        print("== full stem chain (12ch in -> pool1 out) fwd+bwd ==")
        x0 = jnp.asarray(rng.normal(0, 1, (B, H, H, 12)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 12, 64)), jnp.float32)

        def chain_plain(p):
            h1 = bn_relu(conv(p["x"], p["w1"]), p["s"], p["b"])
            h2 = bn_relu(conv(h1, p["w2"]), p["s"], p["b"])
            from gssd_tpu.ops.layers import max_pool
            return jnp.mean(jnp.square(
                max_pool(h2, 2, 2).astype(jnp.float32)))

        def chain_packed(p):
            h1 = bn_relu_packed(conv(pack(p["x"]), pack_weight(p["w1"])),
                                p["s"], p["b"])
            h2 = bn_relu_packed(conv(h1, pack_weight(p["w2"])),
                                p["s"], p["b"])
            return jnp.mean(jnp.square(
                pool_packed(h2).astype(jnp.float32)))

        def chain_packed_rw(p):
            h1 = bn_relu_packed(conv(pack(p["x"]), pack_weight(p["w1"])),
                                p["s"], p["b"])
            h2 = bn_relu_packed(conv(h1, pack_weight(p["w2"])),
                                p["s"], p["b"])
            return jnp.mean(jnp.square(
                pool_packed_rw(h2).astype(jnp.float32)))

        def chain_packed_unpack(p):
            h1 = bn_relu_packed(conv(pack(p["x"]), pack_weight(p["w1"])),
                                p["s"], p["b"])
            h2 = bn_relu_packed(conv(h1, pack_weight(p["w2"])),
                                p["s"], p["b"])
            return jnp.mean(jnp.square(
                pool_unpack_rw(h2).astype(jnp.float32)))

        params = {"x": x0, "w1": w1, "w2": w22, "s": scale, "b": bias}
        timed("plain", chain_plain, params)
        timed("packed", chain_packed, params)
        timed("packed lane+rw pool", chain_packed_rw, params)
        timed("packed unpack+rw pool", chain_packed_unpack, params)

        # parity check (same math, packed)
        a = jax.jit(lambda p: chain_plain(p))(params)
        bv = jax.jit(lambda p: chain_packed(p))(params)
        print(f"  parity: plain={float(a):.6f} packed={float(bv):.6f}")


if __name__ == "__main__":
    main()
