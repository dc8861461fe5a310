"""Sweep harness for the hat-DCN dynamic-window experiment.

The deform_hat flags (GSSD_HAT_SKIP_*/WINDOW_*/WR/TP/CHUNKS) are read
at module import, so each configuration runs in a fresh subprocess.
`worker` mode times the hat DCN fwd and fwd+bwd at a given site with
the tunnel-safe chained-scalar pattern; the default driver mode runs
the sweep grid and prints a table.

Sites: flagship = conv4_3 of GSSD++ 300 (B32, 38x38, 1024->512, G4);
c512 = the 64x64 DCN site of the 512 model (B8, 64x64, 1024->512, G4).

Usage:
  python scripts/exp_hat_window.py                  # full sweep
  python scripts/exp_hat_window.py worker flagship  # one config (env set)
"""

import os
import subprocess
import sys
import time

SITES = {
    "flagship": dict(B=32, H=38, C_IN=1024, C_OUT=512, G=4),
    "c512": dict(B=8, H=64, C_IN=1024, C_OUT=512, G=4),
    "plk75": dict(B=8, H=75, C_IN=256, C_OUT=256, G=4),
    "plk150": dict(B=8, H=150, C_IN=128, C_OUT=128, G=4),
    # PixelLink 2s conv2_2 site with dcn_cat_sab (the real shape)
    "plk150cat": dict(B=8, H=150, C_IN=256, C_OUT=128, G=4),
}


def worker(site):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gssd_tpu.ops.deform_conv import DCN

    cfg = SITES[site]
    B, H, G = cfg["B"], cfg["H"], cfg["G"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, H, cfg["C_IN"])),
                    jnp.bfloat16)

    osig = float(os.environ.get("GSSD_EXP_OSIG", "0"))
    if osig > 0:
        return worker_op(site, cfg, rng, x, osig)

    impl = os.environ.get("GSSD_EXP_IMPL", "hat")
    mod = DCN(features=cfg["C_OUT"], deformable_groups=G,
              dtype=jnp.bfloat16, impl=impl)
    variables = mod.init(jax.random.PRNGKey(0), x)

    def chain_time(f, args, iters=20):
        f = jax.jit(f)
        c = jnp.zeros((), jnp.float32)
        c = f(c, *args)
        float(c)
        # burn-in: first timing loop in a process is tunnel-inflated
        for _ in range(3):
            c = f(c * 1e-30, *args)
        float(c)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = f(c * 1e-30, *args)
        float(c)
        return (time.perf_counter() - t0) / iters * 1000

    def fwd(c, variables, x):
        out, _ = mod.apply(variables, x + c.astype(x.dtype))
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    def fwdbwd(c, params, x):
        def loss_fn(args):
            p, xi = args
            out, _ = mod.apply({"params": p}, xi + c.astype(xi.dtype))
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        val, grads = jax.value_and_grad(loss_fn)((params, x))
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30

    f_ms = chain_time(fwd, (variables, x))
    fb_ms = chain_time(fwdbwd, (variables["params"], x))
    print(f"RESULT {site} fwd={f_ms:.2f} fwdbwd={fb_ms:.2f}", flush=True)


def worker_op(site, cfg, rng, x, osig):
    """Direct deform_conv2d_hat timing with injected offsets of a given
    magnitude (N(0, osig) pixels) — measures window/skip robustness to
    trained-size offsets, which module-init offsets (~0) can't."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gssd_tpu.ops.pallas.deform_hat import deform_conv2d_hat

    B, H, G, K = cfg["B"], cfg["H"], cfg["G"], 9
    C_IN, C_OUT = cfg["C_IN"], cfg["C_OUT"]
    oy = jnp.asarray(rng.normal(0, osig, (B, H, H, G, K)), jnp.float32)
    ox = jnp.asarray(rng.normal(0, osig, (B, H, H, G, K)), jnp.float32)
    m = jnp.asarray(rng.uniform(0, 1, (B, H, H, G, K)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.05, 0.05, (K, C_IN, C_OUT)),
                    jnp.float32)
    bias = jnp.zeros((C_OUT,), jnp.float32)

    import time

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

    def fwd(c, x, oy, ox, m, w):
        out = deform_conv2d_hat(x + c.astype(x.dtype), oy, ox, m, w, bias)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    def fwdbwd(c, x, oy, ox, m, w):
        def loss_fn(args):
            xi, oyi, oxi, mi, wi = args
            out = deform_conv2d_hat(
                xi + c.astype(xi.dtype), oyi, oxi, mi, wi, bias)
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        val, grads = jax.value_and_grad(loss_fn)((x, oy, ox, m, w))
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30

    f_ms = chain_time(fwd, (x, oy, ox, m, w))
    fb_ms = chain_time(fwdbwd, (x, oy, ox, m, w))
    print(f"RESULT {site} osig={osig} fwd={f_ms:.2f} fwdbwd={fb_ms:.2f}",
          flush=True)


_NOWIN = {"GSSD_HAT_WINDOW_BWD": "0"}
CONFIGS = [
    # (label, env overrides) — tiered all-window dispatch round:
    # default = tiers (2, 6); off = round-3 kernels (window-bwd + skip)
    ("allwin tiers 2,6", {}),
    ("allwin off (r3 path)", {"GSSD_HAT_ALLWIN": "0"}),
]


def main():
    sites = sys.argv[1:] or ["flagship"]
    for site in sites:
        print(f"== site {site} ==", flush=True)
        for label, env in CONFIGS:
            e = dict(os.environ, **env)
            p = subprocess.run(
                [sys.executable, __file__, "worker", site],
                env=e, capture_output=True, text=True, timeout=1800)
            line = [l for l in p.stdout.splitlines()
                    if l.startswith("RESULT")]
            print(f"{label:24s}: "
                  f"{line[0] if line else 'FAILED: ' + p.stderr[-300:]}",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2])
    else:
        main()
