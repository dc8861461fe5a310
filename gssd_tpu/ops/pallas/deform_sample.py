"""Pallas TPU kernels for modulated deformable sampling.

The reference's DCNv2 CUDA extension gathers K*C values per output
pixel with per-thread bilinear interpolation — a formulation TPUs hate
(data-dependent gathers; scatter-add backward). This kernel set uses a
TPU-native reformulation:

Bilinear sampling at (py, px) is a rank-1 separable *dense* contraction
with hat-function weights:

    sampled[p, c] = sum_qy sum_qx A[p, qy] * B[p, qx] * x[qy, qx, c]
    A[p, qy] = max(0, 1 - |py[p] - qy|)   (<= 2 nonzeros per row)
    B[p, qx] = max(0, 1 - |px[p] - qx|)

On the 38x38 (or 64x64) DCN feature maps the dense A/B matrices are
tiny, so the whole op becomes MXU matmuls + VPU reductions — no gather,
and every backward term (dx, dA, dB) is a transposed contraction, so
there is **no scatter anywhere**. The modulation mask folds into A
(row-scales the sample); out-of-border sampling zeroes itself because
the hat row vanishes outside the grid — exactly the CUDA kernel's
border behavior.

Kernels (P = Ho*Wo output pixels, tiled by TP):
  fwd  : grid (N, G, P/TP)
         T = A_tile @ x_flat (MXU [TP,H]x[H,W*Cg]), then a qx-weighted
         VPU reduction against B_tile -> [TP, Cg].
  dx   : grid (N, G, P/TP)
         S_tile[p, qy*W+qx] = A[p,qy]*B[p,qx] (VPU outer product),
         dx += S_tile^T @ dout_tile (MXU), accumulated across p-tiles
         in the revisited output block.
  dA/dB: grid (N, G, P/TP)
         M = dout_tile @ x_flat^T (MXU [TP,Cg]x[Cg,H*W]), then two VPU
         reductions against B_tile / A_tile.

The op is wrapped in jax.custom_vjp at the (A, B, x) boundary; the
chain rule from A/B back to the learned offsets and mask runs in plain
jnp (tiny tensors), so autodiff composes with the rest of the model.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_TP = 128


def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# kernels (blocks carry leading (1, 1) batch/group dims)
# ---------------------------------------------------------------------------


def _fwd_kernel(a_ref, b_ref, x_ref, out_ref):
    a = a_ref[0, 0]  # [TP, H]
    b = b_ref[0, 0]  # [TP, W]
    x = x_ref[0, 0]  # [H, W, Cg]
    TP = a.shape[0]
    H, W, Cg = x.shape
    t = jnp.dot(a, x.reshape(H, W * Cg),
                preferred_element_type=jnp.float32)  # [TP, W*Cg]
    t = t.reshape(TP, W, Cg)
    out = jnp.sum(t * b.astype(jnp.float32)[:, :, None], axis=1)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _dx_kernel(a_ref, b_ref, g_ref, dx_ref):
    # E[p, qx, c] = B[p, qx] * g[p, c] (f32: Mosaic supports minor-dim
    # insertion only on 32-bit types), then one MXU contraction over p:
    # dx[qy, (qx, c)] += A^T E. All reshapes keep the lane-aligned Cg
    # minor dim, which Mosaic requires.
    a = a_ref[0, 0]  # [TP, H]
    b = b_ref[0, 0].astype(jnp.float32)  # [TP, W]
    g = g_ref[0, 0].astype(jnp.float32)  # [TP, Cg]
    TP, H = a.shape
    W = b.shape[1]
    Cg = g.shape[1]
    e = (b[:, :, None] * g[:, None, :]).reshape(TP, W * Cg)
    partial = jax.lax.dot_general(
        a.astype(jnp.float32), e,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, W*Cg]

    @pl.when(pl.program_id(2) == 0)
    def _():
        dx_ref[0, 0] = jnp.zeros_like(dx_ref[0, 0])

    dx_ref[0, 0] += partial.reshape(H, W, Cg)


def _dab_kernel(x_ref, xt_ref, g_ref, a_ref, b_ref, da_ref, db_ref):
    # dA = E . x  over (qx, c); dB = F . x^T over (qy, c), with
    # E[p,qx,c] = B[p,qx] g[p,c] and F[p,qy,c] = A[p,qy] g[p,c].
    x = x_ref[0, 0]  # [H, W, Cg]
    xt = xt_ref[0, 0]  # [W, H, Cg]
    g = g_ref[0, 0].astype(jnp.float32)  # [TP, Cg]
    a = a_ref[0, 0].astype(jnp.float32)  # [TP, H]
    b = b_ref[0, 0].astype(jnp.float32)  # [TP, W]
    H, W, Cg = x.shape
    TP = g.shape[0]
    e = (b[:, :, None] * g[:, None, :]).reshape(TP, W * Cg)
    da_ref[0, 0] = jax.lax.dot_general(
        e.astype(jnp.bfloat16), x.reshape(H, W * Cg),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(da_ref.dtype)
    f = (a[:, :, None] * g[:, None, :]).reshape(TP, H * Cg)
    db_ref[0, 0] = jax.lax.dot_general(
        f.astype(jnp.bfloat16), xt.reshape(W, H * Cg),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(db_ref.dtype)


# ---------------------------------------------------------------------------
# abx_sample op with custom VJP
# ---------------------------------------------------------------------------


def _pad_p(arr, tp):
    p = arr.shape[2]
    pad = _cdiv(p, tp) * tp - p
    if pad:
        arr = jnp.pad(arr, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return arr


@jax.custom_vjp
def abx_sample(A: jnp.ndarray, B: jnp.ndarray, xg: jnp.ndarray) -> jnp.ndarray:
    """A: [N, G, P, H], B: [N, G, P, W], xg: [N, G, H, W, Cg] ->
    sampled [N, G, P, Cg]."""
    return _abx_fwd_impl(A, B, xg)


def _abx_fwd_impl(A, B, xg):
    N, G, P, H = A.shape
    W = B.shape[3]
    Cg = xg.shape[4]
    TP = min(DEFAULT_TP, P)
    Ap = _pad_p(A, TP).astype(jnp.bfloat16)
    Bp = _pad_p(B, TP).astype(jnp.bfloat16)
    Pp = Ap.shape[2]

    out = pl.pallas_call(
        _fwd_kernel,
        grid=(N, G, Pp // TP),
        in_specs=[
            pl.BlockSpec((1, 1, TP, H), lambda n, g, t: (n, g, t, 0)),
            pl.BlockSpec((1, 1, TP, W), lambda n, g, t: (n, g, t, 0)),
            pl.BlockSpec((1, 1, H, W, Cg), lambda n, g, t: (n, g, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, TP, Cg), lambda n, g, t: (n, g, t, 0)),
        out_shape=jax.ShapeDtypeStruct((N, G, Pp, Cg), xg.dtype),
        interpret=_interpret(),
    )(Ap, Bp, xg.astype(jnp.bfloat16))
    return out[:, :, :P]


def _abx_fwd(A, B, xg):
    return _abx_fwd_impl(A, B, xg), (A, B, xg)


def _abx_bwd_dx(A, B, g):
    """dx of the abx contraction: A [N,G,P,H], B [N,G,P,W],
    g (=dsampled) [N,G,P,Cg] -> [N,G,H,W,Cg] f32. Transposed MXU
    contraction accumulated across p-tiles — no scatter."""
    N, G, P, H = A.shape
    W = B.shape[3]
    Cg = g.shape[3]
    TP = min(DEFAULT_TP, P)
    Ap = _pad_p(A, TP).astype(jnp.bfloat16)
    Bp = _pad_p(B, TP).astype(jnp.bfloat16)
    gp = _pad_p(g, TP).astype(jnp.bfloat16)
    Pp = Ap.shape[2]
    return pl.pallas_call(
        _dx_kernel,
        grid=(N, G, Pp // TP),
        in_specs=[
            pl.BlockSpec((1, 1, TP, H), lambda n, gg, t: (n, gg, t, 0)),
            pl.BlockSpec((1, 1, TP, W), lambda n, gg, t: (n, gg, t, 0)),
            pl.BlockSpec((1, 1, TP, Cg), lambda n, gg, t: (n, gg, t, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H, W, Cg), lambda n, gg, t: (n, gg, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((N, G, H, W, Cg), jnp.float32),
        interpret=_interpret(),
    )(Ap, Bp, gp)


def _abx_bwd(res, g):
    A, B, xg = res
    N, G, P, H = A.shape
    W = B.shape[3]
    Cg = xg.shape[4]
    TP = min(DEFAULT_TP, P)
    Ap = _pad_p(A, TP).astype(jnp.bfloat16)
    Bp = _pad_p(B, TP).astype(jnp.bfloat16)
    gp = _pad_p(g, TP).astype(jnp.bfloat16)
    Pp = Ap.shape[2]
    grid = (N, G, Pp // TP)
    xb = xg.astype(jnp.bfloat16)

    dxg = _abx_bwd_dx(A, B, g)

    xtb = jnp.swapaxes(xb, 2, 3)  # [N, G, W, H, Cg]
    da, db = pl.pallas_call(
        _dab_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, H, W, Cg), lambda n, gg, t: (n, gg, 0, 0, 0)),
            pl.BlockSpec((1, 1, W, H, Cg), lambda n, gg, t: (n, gg, 0, 0, 0)),
            pl.BlockSpec((1, 1, TP, Cg), lambda n, gg, t: (n, gg, t, 0)),
            pl.BlockSpec((1, 1, TP, H), lambda n, gg, t: (n, gg, t, 0)),
            pl.BlockSpec((1, 1, TP, W), lambda n, gg, t: (n, gg, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TP, H), lambda n, gg, t: (n, gg, t, 0)),
            pl.BlockSpec((1, 1, TP, W), lambda n, gg, t: (n, gg, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, G, Pp, H), jnp.float32),
            jax.ShapeDtypeStruct((N, G, Pp, W), jnp.float32),
        ],
        interpret=_interpret(),
    )(xb, xtb, gp, Ap, Bp)
    return (
        da[:, :, :P].astype(A.dtype),
        db[:, :, :P].astype(B.dtype),
        dxg.astype(xg.dtype),
    )


abx_sample.defvjp(_abx_fwd, _abx_bwd)


# ---------------------------------------------------------------------------
# the full deformable conv built on abx_sample
# ---------------------------------------------------------------------------


def hat_weights(pos: jnp.ndarray, n: int) -> jnp.ndarray:
    """Dense bilinear hat weights: [..., P] positions -> [..., P, n]."""
    grid = jnp.arange(n, dtype=pos.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - grid))


def deform_conv2d_pallas(
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
    """Same contract as ops.deform_conv.deform_conv2d, computed with the
    Pallas MXU sampler. stride must be 1 (the only configuration the
    detectors use, dcn_v2_custom.py call sites)."""
    assert stride == 1, "pallas DCN currently supports stride=1"
    N, H, W, C = x.shape
    K = weight.shape[0]
    kh = kw = int(round(K ** 0.5))
    G = mask.shape[3]
    Cg = C // G
    Ho, Wo = mask.shape[1], mask.shape[2]
    P = Ho * Wo

    base_y = (jnp.arange(Ho, dtype=jnp.float32) - padding)[:, None]
    base_x = (jnp.arange(Wo, dtype=jnp.float32) - padding)[None, :]
    xg = jnp.transpose(
        x.reshape(N, H, W, G, Cg), (0, 3, 1, 2, 4)
    )  # [N, G, H, W, Cg]

    out = None
    for k in range(K):
        u, v = divmod(k, kw)
        py = base_y[None, :, :, None] + u * dilation + offset_y[..., k]
        px = base_x[None, :, :, None] + v * dilation + offset_x[..., k]
        # [N, Ho, Wo, G] -> [N, G, P]
        py = jnp.transpose(py.reshape(N, P, G), (0, 2, 1))
        px = jnp.transpose(px.reshape(N, P, G), (0, 2, 1))
        mk = jnp.transpose(mask[..., k].reshape(N, P, G), (0, 2, 1))
        A = hat_weights(py, H) * mk[..., None]  # mask folded into A
        Bm = hat_weights(px, W)
        sampled = abx_sample(A, Bm, xg)  # [N, G, P, Cg]
        sampled = jnp.transpose(sampled, (0, 2, 1, 3)).reshape(N, P, C)
        tap = jnp.dot(
            sampled, weight[k].astype(sampled.dtype),
            preferred_element_type=jnp.float32,
        )
        out = tap if out is None else out + tap
    out = out + bias.astype(out.dtype)
    return out.reshape(N, Ho, Wo, -1).astype(x.dtype)
