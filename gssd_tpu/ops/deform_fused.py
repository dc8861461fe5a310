"""Fused-backward modulated deformable conv — the fast training path.

Combines the best-measured pieces (v5e, batch 32, conv4_3 shapes):
- forward: single 2x2-patch lax.gather per tap-group
  (deform_conv.deform_conv2d_patch's sampler) — ~1.6x the 4-corner
  gather formulation;
- backward, via one custom VJP per tap with only (py, px, m, x, w)
  residuals (no multi-hundred-MB sampled tensors):
  * d(offsets)/d(mask): analytic bilinear derivatives from one cheap
    patch-gather recompute — pure elementwise, no autodiff-of-gather;
  * d(x): the Pallas hat-matrix contraction kernel
    (ops/pallas/deform_sample._dx_kernel) — a transposed MXU matmul
    instead of XLA's slow scatter-add;
  * d(weight): recomputed-sample matmul.

Numerically identical to ops.deform_conv.deform_conv2d (the f32 XLA
reference) up to matmul association; parity-tested in
tests/test_deform_fused.py.

Known limitation (real-TPU Mosaic, not interpret mode): the dx hat
kernel's [TP, W, Cg] -> [TP, W*Cg] reshape requires a lane-aligned
W*Cg and fails to compile e.g. at PixelLink's 75x75/Cg=64 site. The
default 'hat' impl (ops/pallas/deform_hat.py) has no such restriction
and is faster at every site; this path is kept for cross-checks at the
conv4_3 geometry.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gssd_tpu.ops.deform_conv import _patch_gather_group


def _corners_group(x, py, px):
    """Like _patch_gather_group but returns the four corner values
    (unweighted) plus the lerp weights: x [H, W, C], py/px [P]."""
    H, W, C = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[:, None]
    wx = (px - x0)[:, None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    ys = jnp.clip(y0i, 0, H - 2)
    xs = jnp.clip(x0i, 0, W - 2)
    starts = jnp.stack([ys, xs], axis=1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    patch = jax.lax.gather(
        x, starts, dnums, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )

    def corner(dy, dx):
        ri = (jnp.clip(y0i + dy - ys, 0, 1) == 1)[:, None]
        ci = (jnp.clip(x0i + dx - xs, 0, 1) == 1)[:, None]
        row0 = jnp.where(ci, patch[:, 0, 1], patch[:, 0, 0])
        row1 = jnp.where(ci, patch[:, 1, 1], patch[:, 1, 0])
        vals = jnp.where(ri, row1, row0)
        inb = ((y0i + dy >= 0) & (y0i + dy < H)
               & (x0i + dx >= 0) & (x0i + dx < W))
        return jnp.where(inb[:, None], vals, 0)

    return corner(0, 0), corner(0, 1), corner(1, 0), corner(1, 1), wy, wx


@jax.custom_vjp
def deform_tap(py, px, m, xg, w):
    """One kernel tap: py/px/m [B, P, G]; xg [B, H, W, G, Cg];
    w [C, Cout] -> [B, P, Cout]."""
    return _tap_fwd_impl(py, px, m, xg, w)


def _sample(py, px, m, xg):
    """[B, P, G] coords -> masked samples [B, P, G*Cg]."""
    B, P, G = py.shape

    def one(pyi, pxi, mi, xi):
        parts = []
        for g in range(G):
            s = _patch_gather_group(xi[:, :, g], pyi[:, g], pxi[:, g])
            parts.append(s * mi[:, g][:, None].astype(s.dtype))
        return jnp.concatenate(parts, axis=-1)

    return jax.vmap(one)(py, px, m, xg)


def _tap_fwd_impl(py, px, m, xg, w):
    sampled = _sample(py, px, m, xg)
    return jnp.dot(sampled, w.astype(sampled.dtype),
                   preferred_element_type=jnp.float32).astype(xg.dtype)


def _tap_fwd(py, px, m, xg, w):
    return _tap_fwd_impl(py, px, m, xg, w), (py, px, m, xg, w)


def _tap_bwd(res, g):
    py, px, m, xg, w = res
    B, P, G = py.shape
    _, H, W, _, Cg = xg.shape
    C = G * Cg
    g32 = g.astype(jnp.float32)

    # dsampled = g @ w^T  [B, P, C]
    dsampled = jnp.dot(
        g, w.T.astype(g.dtype), preferred_element_type=jnp.float32
    )

    def one(pyi, pxi, mi, xi, dsi):
        dpy = jnp.zeros((P, G), jnp.float32)
        dpx = jnp.zeros((P, G), jnp.float32)
        dm = jnp.zeros((P, G), jnp.float32)
        sampled_parts = []
        for gi in range(G):
            v00, v01, v10, v11, wy, wx = _corners_group(
                xi[:, :, gi].astype(jnp.float32), pyi[:, gi], pxi[:, gi]
            )
            ds = dsi[:, gi * Cg:(gi + 1) * Cg].astype(jnp.float32)
            mg = mi[:, gi][:, None]
            top = v00 * (1 - wx) + v01 * wx
            bot = v10 * (1 - wx) + v11 * wx
            unmasked = top * (1 - wy) + bot * wy
            sampled_parts.append(unmasked * mg)
            dm = dm.at[:, gi].set(jnp.sum(ds * unmasked, axis=-1))
            dpy = dpy.at[:, gi].set(
                jnp.sum(ds * (bot - top), axis=-1) * mi[:, gi]
            )
            ddx = (v01 - v00) * (1 - wy) + (v11 - v10) * wy
            dpx = dpx.at[:, gi].set(
                jnp.sum(ds * ddx, axis=-1) * mi[:, gi]
            )
        sampled = jnp.concatenate(sampled_parts, axis=-1)  # [P, C]
        return dpy, dpx, dm, sampled

    dpy, dpx, dm, sampled = jax.vmap(one)(py, px, m, xg, dsampled)

    # dw = sampled^T @ g summed over batch
    dw = jnp.einsum(
        "bpc,bpo->co", sampled, g32, preferred_element_type=jnp.float32
    ).astype(w.dtype)

    # dx via the Pallas hat-matrix contraction (no scatter)
    from gssd_tpu.ops.pallas.deform_sample import _abx_bwd_dx, hat_weights

    A = (hat_weights(jnp.transpose(py, (0, 2, 1)), H)
         * jnp.transpose(m, (0, 2, 1))[..., None])  # [B, G, P, H]
    Bm = hat_weights(jnp.transpose(px, (0, 2, 1)), W)
    dsg = jnp.transpose(
        dsampled.reshape(B, P, G, Cg), (0, 2, 1, 3)
    )  # [B, G, P, Cg]
    dxg = _abx_bwd_dx(A, Bm, dsg)  # [B, G, H, W, Cg]
    dx = jnp.transpose(dxg, (0, 2, 3, 1, 4)).astype(xg.dtype)

    return (dpy.astype(py.dtype), dpx.astype(px.dtype),
            dm.astype(m.dtype), dx, dw)


deform_tap.defvjp(_tap_fwd, _tap_bwd)


def deform_conv2d_fused(
    x: jnp.ndarray,
    offset_y: jnp.ndarray,
    offset_x: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Drop-in for deform_conv2d with the fused fast backward."""
    B, H, W, C = x.shape
    K = weight.shape[0]
    kh = kw = int(round(K ** 0.5))
    G = mask.shape[3]
    Cg = C // G
    Ho, Wo = mask.shape[1], mask.shape[2]
    P = Ho * Wo

    base_y = (jnp.arange(Ho, dtype=jnp.float32) * stride
              - padding)[:, None, None]
    base_x = (jnp.arange(Wo, dtype=jnp.float32) * stride
              - padding)[None, :, None]
    xg = x.reshape(B, H, W, G, Cg)

    out = None
    for k in range(K):
        u, v = divmod(k, kw)
        py = (base_y + u * dilation
              + offset_y[..., k].astype(jnp.float32)).reshape(B, P, G)
        px = (base_x + v * dilation
              + offset_x[..., k].astype(jnp.float32)).reshape(B, P, G)
        mk = mask[..., k].astype(jnp.float32).reshape(B, P, G)
        tap = deform_tap(py, px, mk, xg, weight[k])
        out = tap if out is None else out + tap
    out = out + bias.astype(out.dtype)
    return out.reshape(B, Ho, Wo, -1).astype(x.dtype)
