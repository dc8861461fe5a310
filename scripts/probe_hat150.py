"""Probe the hat-DCN kernel at the PixelLink-2s conv2_2 geometry
(150x150, Cg=32, G=4) — the one in-tree site above GSSD_HAT_MAX_HW
where 'hat' currently falls back to the slow gather impl (VMEM OOM
recorded in round 3). Sweeps env-tunable tilings and prints
compile/run/VMEM outcomes plus fwd+bwd timings vs the gather fallback.

Usage (on the TPU):
  python scripts/probe_hat150.py [--hw 150] [--cg 32] [--batch 8]
Env knobs under test: GSSD_HAT_TP / GSSD_HAT_CHUNK / GSSD_HAT_CHUNKS /
GSSD_HAT_ALLWIN_MAX_HW (set per sweep point via subprocess).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

CASE = r"""
import os, time
import numpy as np
import jax, jax.numpy as jnp

H = W = {hw}
Cg, G, B, K = {cg}, 4, {batch}, 9
impl = "{impl}"

from gssd_tpu.ops.deform_conv import deform_conv2d
if impl == "hat":
    from gssd_tpu.ops.pallas.deform_hat import deform_conv2d_hat as op
else:
    op = deform_conv2d

rng = np.random.default_rng(0)
Cin = G * Cg
x = jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)).astype(np.float32)
                ).astype(jnp.bfloat16)
w = jnp.asarray(rng.normal(0, 0.05, (K, Cin, Cin)).astype(np.float32)
                ).astype(jnp.bfloat16)
bias = jnp.zeros((Cin,), jnp.float32)
off_y = jnp.asarray(rng.normal(0, {sigma}, (B, H, W, G, K)
                               ).astype(np.float32))
off_x = jnp.asarray(rng.normal(0, {sigma}, (B, H, W, G, K)
                               ).astype(np.float32))
mask = jnp.asarray(rng.uniform(0.3, 1, (B, H, W, G, K)).astype(np.float32))

def loss(x, w, off_y, off_x, mask):
    out = op(x, off_y, off_x, mask, w, bias)
    return jnp.sum(jnp.square(out.astype(jnp.float32)))

f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
v, grads = f(x, w, off_y, off_x, mask)
v0 = float(v)  # sync (burn-in: first call carries tunnel warm-up)
v, grads = f(x, w, off_y, off_x, mask)
float(v)
t0 = time.perf_counter()
for _ in range(8):
    # chain the next input to the previous dx grad so the loop can't
    # overlap (block_until_ready doesn't sync over the tunnel) and the
    # backward isn't dead code (bench.py _chain pattern)
    xc = x + (0.0 * grads[0].reshape(-1)[0]).astype(x.dtype)
    v, grads = f(xc, w, off_y, off_x, mask)
float(v)  # final D2H sync
print("RESULT", float(v), (time.perf_counter() - t0) / 8 * 1e3)
"""


def run_case(hw, cg, batch, impl, sigma, env_extra, timeout=900):
    env = dict(os.environ, **{k: str(v) for k, v in env_extra.items()})
    code = CASE.format(hw=hw, cg=cg, batch=batch, impl=impl, sigma=sigma)
    t0 = time.perf_counter()
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True,
                             timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"ok": False, "err": "timeout"}
    wall = time.perf_counter() - t0
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            _, val, ms = line.split()
            return {"ok": True, "ms": round(float(ms), 2),
                    "val": float(val), "wall_s": round(wall, 1)}
    err = (out.stderr or "")[-600:]
    key = next((l for l in (out.stderr or "").splitlines()
                if "vmem" in l.lower() or "VMEM" in l), err[-200:])
    return {"ok": False, "err": key.strip()[:300]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=150)
    ap.add_argument("--cg", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sigma", type=float, default=0.5)
    args = ap.parse_args()

    sweeps = [
        ("gather-fallback", "xla", {}),
        ("hat-default", "hat", {"GSSD_HAT_MAX_HW": 99999}),
        ("hat-allwin150", "hat", {"GSSD_HAT_MAX_HW": 99999,
                                  "GSSD_HAT_ALLWIN_MAX_HW": 30000}),
        ("hat-tp64", "hat", {"GSSD_HAT_MAX_HW": 99999, "GSSD_HAT_TP": 64}),
        ("hat-chunk600", "hat", {"GSSD_HAT_MAX_HW": 99999,
                                 "GSSD_HAT_CHUNK": 600}),
        ("hat-tp64-chunk600", "hat", {"GSSD_HAT_MAX_HW": 99999,
                                      "GSSD_HAT_TP": 64,
                                      "GSSD_HAT_CHUNK": 600}),
        ("hat-allwin-tp64", "hat", {"GSSD_HAT_MAX_HW": 99999,
                                    "GSSD_HAT_ALLWIN_MAX_HW": 30000,
                                    "GSSD_HAT_TP": 64}),
    ]
    results = {}
    for name, impl, env in sweeps:
        res = run_case(args.hw, args.cg, args.batch, impl, args.sigma, env)
        results[name] = res
        print(name, json.dumps(res))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
