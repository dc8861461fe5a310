"""Modulated deformable convolution (DCNv2) — TPU-native.

The reference imports an external CUDA extension for this op
(layers/dcn_v2_custom.py:13 ``from dcn_v2 import _DCNv2``) and wraps it
with a zero-initialized offset/mask predictor conv
(dcn_v2_custom.py:58-89). This module provides the same semantics as a
pure-XLA program designed for the MXU:

Instead of an im2col over all K*C values (which would materialize a
[B,H,W,K,C] tensor), the conv is decomposed per kernel tap k:

    y = sum_k  (bilinear_warp(x, offset_k) * mask_k) @ W_k

Each tap is a per-deformable-group bilinear gather producing a
[B,H,W,C] intermediate followed by a [BHW, C] x [C, Cout] matmul —
K=9 gathers+matmuls that XLA pipelines, with peak memory O(B*H*W*C)
instead of O(B*H*W*K*C). Gradients come from jax autodiff (gather ->
scatter-add). ``deformable_groups`` gives each phase group its own
offset field, which is the GSSD++ phase-alignment mechanism
(groups_dcn=4).

Offset/mask layout (ours, clean): dy[B,H,W,dg,K], dx[B,H,W,dg,K],
mask[B,H,W,dg,K]. The predictor conv is zero-init so the op starts as a
plain conv with mask 0.5 — matching the reference's zero-init
conv_offset_mask + sigmoid (dcn_v2_custom.py:66-77).
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gssd_tpu.ops.layers import xavier_uniform


def _bilinear_gather_group(
    x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray
) -> jnp.ndarray:
    """Sample x [H, W, G, C] at real-valued (py, px) [Ho, Wo, G] per group.

    Out-of-bounds samples contribute 0 (matching the CUDA kernel's
    border handling). Returns [Ho, Wo, G, C].
    """
    H, W, G, C = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = (py - y0)[..., None]
    wx1 = (px - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    xf = x.reshape(H * W, G, C)
    gidx = jnp.arange(G)[None, None, :]

    def corner(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = xf[flat, gidx]  # [Ho, Wo, G, C]
        return jnp.where(inb[..., None], vals, 0)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    top = v00 * (1 - wx1) + v01 * wx1
    bot = v10 * (1 - wx1) + v11 * wx1
    return top * (1 - wy1) + bot * wy1


def _patch_gather_group(
    x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray
) -> jnp.ndarray:
    """2x2-window variant of the bilinear sampler: one lax.gather of
    [2, 2, C] patches per group instead of four corner gathers (and one
    scatter instead of four in the backward). x: [H, W, C] one group's
    channels; py/px: [P] sample coords. Returns [P, C]."""
    H, W, C = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[:, None]
    wx = (px - x0)[:, None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    ys = jnp.clip(y0i, 0, H - 2)
    xs = jnp.clip(x0i, 0, W - 2)
    starts = jnp.stack([ys, xs], axis=1)  # [P, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    patch = jax.lax.gather(
        x, starts, dnums, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [P, 2, 2, C]

    def corner(dy, dx):
        # select within the 2x2 patch by arithmetic (elementwise, no
        # secondary gather): row/col offsets are 0 or 1
        ri = (jnp.clip(y0i + dy - ys, 0, 1) == 1)[:, None]
        ci = (jnp.clip(x0i + dx - xs, 0, 1) == 1)[:, None]
        row0 = jnp.where(ci, patch[:, 0, 1], patch[:, 0, 0])
        row1 = jnp.where(ci, patch[:, 1, 1], patch[:, 1, 0])
        vals = jnp.where(ri, row1, row0)  # [P, C]
        inb = ((y0i + dy >= 0) & (y0i + dy < H)
               & (x0i + dx >= 0) & (x0i + dx < W))
        return jnp.where(inb[:, None], vals, 0)

    top = corner(0, 0) * (1 - wx) + corner(0, 1) * wx
    bot = corner(1, 0) * (1 - wx) + corner(1, 1) * wx
    return top * (1 - wy) + bot * wy


def deform_conv2d(
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
    """Modulated deformable conv.

    Args:
      x: [B, H, W, C] input.
      offset_y/offset_x: [B, Ho, Wo, G, K] learned offsets (pixels).
      mask: [B, Ho, Wo, G, K] modulation in [0, 1].
      weight: [K, C, Cout] kernel taps (K = kh*kw, row-major).
      bias: [Cout].

    Returns [B, Ho, Wo, Cout].
    """
    B, H, W, C = x.shape
    K = weight.shape[0]
    kh = kw = int(round(K ** 0.5))
    G = mask.shape[3]
    Cg = C // G
    Ho, Wo = mask.shape[1], mask.shape[2]

    out_y = jnp.arange(Ho, dtype=x.dtype) * stride - padding
    out_x = jnp.arange(Wo, dtype=x.dtype) * stride - padding
    base_y = out_y[:, None, None]  # [Ho, 1, 1] (broadcasts over Wo, G)
    base_x = out_x[None, :, None]  # [1, Wo, 1]

    xg = x.reshape(B, H, W, G, Cg)
    compute_dtype = x.dtype

    def one_image(xi, oy, ox, mi):
        acc = None
        for k in range(K):
            u, v = divmod(k, kw)
            py = base_y + u * dilation + oy[..., k]  # [Ho, Wo, G]
            px = base_x + v * dilation + ox[..., k]
            sampled = _bilinear_gather_group(xi, py, px)  # [Ho, Wo, G, Cg]
            sampled = sampled * mi[..., k][..., None]
            tap = sampled.reshape(Ho * Wo, C) @ weight[k].astype(compute_dtype)
            acc = tap if acc is None else acc + tap
        return acc.reshape(Ho, Wo, -1)

    out = jax.vmap(one_image)(
        xg,
        offset_y.astype(compute_dtype),
        offset_x.astype(compute_dtype),
        mask.astype(compute_dtype),
    )
    return out + bias.astype(compute_dtype)


def deform_conv2d_patch(
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
    """Same contract as deform_conv2d but sampling via single 2x2-patch
    gathers (one gather fwd / one scatter bwd per tap-group instead of
    four)."""
    B, H, W, C = x.shape
    K = weight.shape[0]
    kh = kw = int(round(K ** 0.5))
    G = mask.shape[3]
    Cg = C // G
    Ho, Wo = mask.shape[1], mask.shape[2]
    P = Ho * Wo

    base_y = (jnp.arange(Ho, dtype=jnp.float32) * stride - padding)[:, None]
    base_x = (jnp.arange(Wo, dtype=jnp.float32) * stride - padding)[None, :]
    xg = x.reshape(B, H, W, G, Cg)
    dt = x.dtype

    def one_image(xi, oy, ox, mi):
        # xi: [H, W, G, Cg]; oy/ox/mi: [Ho, Wo, G, K]
        acc = None
        for k in range(K):
            u, v = divmod(k, kw)
            parts = []
            for g in range(G):
                py = (base_y + u * dilation + oy[..., g, k]).reshape(P)
                px = (base_x + v * dilation + ox[..., g, k]).reshape(P)
                s = _patch_gather_group(
                    xi[:, :, g], py.astype(jnp.float32),
                    px.astype(jnp.float32),
                )
                parts.append(s * mi[..., g, k].reshape(P, 1).astype(s.dtype))
            sampled = jnp.concatenate(parts, axis=-1)  # [P, C]
            tap = sampled @ weight[k].astype(dt)
            acc = tap if acc is None else acc + tap
        return acc.reshape(Ho, Wo, -1)

    out = jax.vmap(one_image)(
        xg, offset_y.astype(jnp.float32), offset_x.astype(jnp.float32),
        mask.astype(jnp.float32),
    )
    return out + bias.astype(dt)


def resolve_deform_impl(impl: str, hw: int):
    """Map an impl name (+ feature-map size) to the op function. The
    hat contraction is O(P * H*W): on maps beyond GSSD_HAT_MAX_HW
    positions its bwd kernel spills VMEM on TPU (measured: 150x150
    Cg=64 needs 142M of 128M vmem; the largest verified-good map is
    75x75 = 5625), so 'hat' falls back to the gather-based impl there
    (the PixelLink 2s conv2_2 site is the only in-tree case)."""
    if impl == "pallas":
        from gssd_tpu.ops.pallas.deform_sample import deform_conv2d_pallas

        return deform_conv2d_pallas
    if impl == "hat":
        if hw > int(os.environ.get("GSSD_HAT_MAX_HW", "6000")):
            return deform_conv2d
        from gssd_tpu.ops.pallas.deform_hat import deform_conv2d_hat

        return deform_conv2d_hat
    if impl == "fused":
        from gssd_tpu.ops.deform_fused import deform_conv2d_fused

        return deform_conv2d_fused
    return deform_conv2d


class DCN(nn.Module):
    """Deformable conv block with its own offset/mask predictor.

    Reference: layers/dcn_v2_custom.py:58-89 (class DCN). The predictor
    is a plain conv, zero-initialized, producing 3*G*K channels split
    into (dy, dx, mask-logits); mask = sigmoid. Returns
    (output, offsets) where offsets is [B, Ho, Wo, G, K, 2] (dy, dx) for
    visualization parity (utils/show_offset.py consumes these).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    deformable_groups: int = 1
    dtype: Any = jnp.bfloat16
    impl: str = "xla"  # 'xla' | 'pallas'

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, H, W, C = x.shape
        K = self.kernel * self.kernel
        G = self.deformable_groups

        om = nn.Conv(
            3 * G * K,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv_offset_mask",
        )(x)
        Ho, Wo = om.shape[1], om.shape[2]
        om = om.astype(jnp.float32).reshape(B, Ho, Wo, 3, G, K)
        dy, dx, m = om[:, :, :, 0], om[:, :, :, 1], om[:, :, :, 2]
        m = jax.nn.sigmoid(m)

        # kernel weight in [K, C, Cout] tap layout; init uniform
        # (-stdv, stdv), stdv = 1/sqrt(C*K) as in dcn_v2_custom.py:37-43
        stdv = 1.0 / np.sqrt(C * K)

        def uniform_sym(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -stdv, stdv)

        weight = self.param(
            "weight", uniform_sym, (K, C, self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

        fn = resolve_deform_impl(self.impl, H * W)
        out = fn(
            x, dy, dx, m, weight, bias,
            stride=self.stride, padding=self.padding,
            dilation=self.dilation,
        )
        offsets = jnp.stack([dy, dx], axis=-1)
        return out, offsets
