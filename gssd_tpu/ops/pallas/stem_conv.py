"""Pallas 3x3 same-pad conv for wide-spatial / narrow-channel sites.

The stem convs (conv1_1 12->64, conv1_2 64->64 at 300^2, reference
ssd_multiphase_custom_group.py:434-444) are where XLA's conv lowering
is furthest off roofline on TPU (measured 20-26 TF/s raw; the MXU cap
for a 64-lane output is ~98 TF/s). This kernel computes the conv as
im2col-in-VMEM + one [R*W, 9*Cin] x [9*Cin, Cout] matmul per row tile:
patches never touch HBM, the whole image stays resident in VMEM across
row tiles, and the backward reuses the same kernel for dx (transposed
weights) plus a fused dw/dx pass.

Grouped convs are pre-lowered to dense block-diagonal weights by the
caller (ops/layers.py) — identical math, see _BlockDiagConv.

Layout: NHWC bf16 activations, f32 accumulation; weights arrive as
[9*Cin, Cout] (tap-major), bias [Cout].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_rows(h: int) -> int:
    """Row-tile size: a divisor of H near 20 (M = R*W ~ 6000 rows per
    matmul keeps the MXU pipelined without blowing VMEM on patches)."""
    for r in (20, 25, 30, 15, 19, 10, 12, 8, 6, 5, 4, 3, 2):
        if h % r == 0 and r + 2 <= h:  # _patches reads an R+2 row slab
            return r
    return 1


def _patches(x_ref, p_ref, r0, R, H, W, C):
    """Fill p_ref [R, W, 9*C] with patches for output rows r0..r0+R-1
    from the whole-image VMEM ref x_ref [1, H, W, C]; zero padding at
    the image border via masked halo rows / col pad. Taps are staged
    through the scratch ref because Mosaic cannot concatenate
    lane/sublane-offset-mismatched shifted slices directly (and its
    dynamic rotate is unimplemented for non-32-bit data); stores
    relayout each tap instead. Returns the [R*W, 9*C] view."""
    mid = x_ref[0, pl.ds(r0, R)]  # [R, W, C] always in range
    top = x_ref[0, pl.ds(jnp.maximum(r0 - 1, 0), 1)]
    top = jnp.where(r0 > 0, top, jnp.zeros_like(top))
    bot = x_ref[0, pl.ds(jnp.minimum(r0 + R, H - 1), 1)]
    bot = jnp.where(r0 + R < H, bot, jnp.zeros_like(bot))
    xr = jnp.concatenate([top, mid, bot], axis=0)  # [R+2, W, C]
    xrp = jnp.pad(xr, ((0, 0), (1, 1), (0, 0)))  # zero col halo
    for k, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                 for dx in range(3)):
        p_ref[:, :, k * C:(k + 1) * C] = xrp[dy:dy + R, dx:dx + W]
    return p_ref[:].reshape(R * W, 9 * C)


def _fwd_kernel(R, H, W, C, x_ref, w_ref, b_ref, out_ref, p_ref):
    t = pl.program_id(1)
    p = _patches(x_ref, p_ref, t * R, R, H, W, C).astype(jnp.bfloat16)
    acc = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    out_ref[0] = acc.reshape(R, W, out_ref.shape[-1]).astype(out_ref.dtype)


def _fwd_impl(x, wd, bias):
    B, H, W, C = x.shape
    Cout = wd.shape[1]
    R = _pick_rows(H)
    flops = 2 * B * H * W * 9 * C * Cout
    return pl.pallas_call(
        functools.partial(_fwd_kernel, R, H, W, C),
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((9 * C, Cout), lambda b, t: (0, 0)),
            pl.BlockSpec((Cout,), lambda b, t: (0,)),
        ],
        out_specs=pl.BlockSpec((1, R, W, Cout), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((R, W, 9 * C), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * (x.size + B * H * W * Cout),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, wd, bias)


def _bwd_kernel(R, H, W, C, Cout, x_ref, g_ref, wt_ref, dx_ref, dw_ref,
                gp_ref, xp_ref):
    b = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * R

    @pl.when((b == 0) & (t == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref[:])

    # dx rows r0..r0+R-1 = "conv" of g with spatially-flipped transposed
    # weights (wt [9*Cout, C], tap-major after flip)
    gp = _patches(g_ref, gp_ref, r0, R, H, W, Cout).astype(jnp.bfloat16)
    dx = jnp.dot(gp, wt_ref[:], preferred_element_type=jnp.float32)
    dx_ref[0] = dx.reshape(R, W, C).astype(dx_ref.dtype)

    # dw += x_patches^T @ g_rows  ([9C, R*W] x [R*W, Cout])
    xp = _patches(x_ref, xp_ref, r0, R, H, W, C).astype(jnp.bfloat16)
    g = g_ref[0, pl.ds(r0, R)].reshape(R * W, Cout).astype(jnp.bfloat16)
    dw_ref[:] += jax.lax.dot_general(
        xp, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bwd_impl(x, wd, g):
    B, H, W, C = x.shape
    Cout = wd.shape[1]
    R = _pick_rows(H)
    # flipped-transposed weights for dx: wt[(dy,dx), co, ci] =
    # wd[(2-dy, 2-dx), ci, co]
    w9 = wd.reshape(3, 3, C, Cout)
    wt = jnp.flip(w9, axis=(0, 1)).transpose(0, 1, 3, 2).reshape(
        9 * Cout, C).astype(jnp.bfloat16)
    g = g.astype(jnp.bfloat16)
    flops = 4 * B * H * W * 9 * C * Cout
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, R, H, W, C, Cout),
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, W, Cout), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((9 * Cout, C), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, R, W, C), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((9 * C, Cout), lambda b, t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((9 * C, Cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((R, W, 9 * Cout), g.dtype),
                        pltpu.VMEM((R, W, 9 * C), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * (2 * x.size + 2 * B * H * W * Cout),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, g, wt)
    return dx, dw


@jax.custom_vjp
def conv3x3_wide(x, wd, bias):
    """3x3 stride-1 same-pad conv, NHWC: x [B,H,W,C] bf16, wd
    [9*C, Cout] (tap-major dense weights), bias [Cout]."""
    return _fwd_impl(x, wd, bias)


def _vjp_fwd(x, wd, bias):
    return _fwd_impl(x, wd, bias), (x, wd)


def _vjp_bwd(res, g):
    x, wd = res
    dx, dw = _bwd_impl(x, wd, g)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw, db


conv3x3_wide.defvjp(_vjp_fwd, _vjp_bwd)


def pack_weights(w_grouped: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[3, 3, Cin/G, Cout] grouped param -> [9*Cin, Cout] tap-major
    dense block-diagonal weights (trace-time; VJP slices the gradient
    back down, mirroring _BlockDiagConv)."""
    kh, kw, cgi, cout = w_grouped.shape
    cgo = cout // groups
    parts = [
        jnp.pad(w_grouped[:, :, :, g * cgo:(g + 1) * cgo],
                ((0, 0), (0, 0),
                 (g * cgi, (groups - 1 - g) * cgi), (0, 0)))
        for g in range(groups)
    ]
    wd = jnp.concatenate(parts, axis=3)  # [3, 3, Cin, Cout]
    return wd.reshape(9 * cgi * groups, cout)
