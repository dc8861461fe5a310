"""Neural-net building blocks (flax linen, NHWC, TPU-first).

Covers the reference's layer zoo:
- ``ConvBNRelu`` — grouped conv (+BN+ReLU), the GSSD backbone unit
  (ssd_multiphase_custom_group.py:434-460, nn.Conv2d(groups=4)) via XLA
  ``feature_group_count``.
- ``L2Norm`` — learnable per-channel scale after channel L2
  normalization (layers/modules/l2norm.py:7-23).
- ``SNDense`` — spectral-normalized 1x1 conv as a Dense over the channel
  axis, with the power-iteration u/v state in a 'spectral' variable
  collection (reference vendors torch's SpectralNorm,
  layers/spectral_norm.py:10-80: one power iteration per training
  forward, frozen u/v at eval).
- ``SelfAttention`` — SAGAN spatial self-attention with avg-pooled
  key/value (layers/self_attn.py:29-89); the token count is H*W<=1444 so
  the whole attention fits VMEM and XLA maps the two contractions to the
  MXU.
- ``adaptive_avg_pool`` — static-shape equivalent of
  F.adaptive_avg_pool2d (self_attn.py:68,77) as two small matmuls.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()


def max_pool(
    x: jnp.ndarray, window: int = 2, stride: int = 2, ceil_mode: bool = False,
    padding: int = 0,
) -> jnp.ndarray:
    """NHWC max pool with torch-style ceil_mode / symmetric int padding.

    Lowered via reduce_window. (A strided-slice max formulation was
    measured 2.3x SLOWER fwd+bwd at 300^2x64 on v5e — stride-2 slicing
    of sublane dims relayouts; scripts/exp_stem3.py round-3 notes.)

    GSSD_POOL_MASK_BWD=1 swaps the 2x2/s2 case's backward for an
    equal-compare mask in the [B,H/2,2,W/2,2,C] reshape space
    (dx = (x==y) * dy / tie_count): the exact sum-preserving
    subgradient, avoiding XLA's SelectAndScatter lowering. Differs
    from torch only in tie-splitting (torch routes the whole grad to
    the first argmax; ties are ReLU zeros whose grad dies in the ReLU
    backward anyway). Measured on v5e: STANDALONE it wins at
    300^2x64 (30.8 -> 19.8 ms fwd+bwd) and 38^2x512 (5.2 -> 1.7) and
    loses at 150^2x128 / 75^2x256 (scripts/exp_pool.py), but
    IN-CONTEXT it LOSES at the 300-model (bench 269.9 -> 256.9
    slices/s; the standalone win is HBM traffic that fusion already
    hides, while the mask path's materialized intermediates break
    those fusions). Default OFF; the channel gate
    (C <= GSSD_POOL_MASK_CLO=64 or >= GSSD_POOL_MASK_CHI=512)
    selects the standalone-win sites if enabled for a future model.
    """
    if (POOL_MASK_BWD and window == 2 and stride == 2 and padding == 0
            and jnp.issubdtype(x.dtype, jnp.floating)
            and (x.shape[3] <= POOL_MASK_CLO
                 or x.shape[3] >= POOL_MASK_CHI)):
        return _max_pool2x2_mask(x, ceil_mode)
    h, w = x.shape[1], x.shape[2]
    if padding:
        pad = [(padding, padding), (padding, padding)]
    elif ceil_mode:
        def extra(n):
            return (math.ceil((n - window) / stride) * stride + window) - n
        pad = [(0, extra(h)), (0, extra(w))]
    else:
        pad = [(0, 0), (0, 0)]
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=[(0, 0)] + pad + [(0, 0)],
    )


POOL_MASK_BWD = os.environ.get("GSSD_POOL_MASK_BWD", "0") == "1"
POOL_MASK_CLO = int(os.environ.get("GSSD_POOL_MASK_CLO", "64"))
POOL_MASK_CHI = int(os.environ.get("GSSD_POOL_MASK_CHI", "512"))
USE_FLASH_ATTN = os.environ.get("GSSD_FLASH_ATTN", "1") == "1"

from gssd_tpu.ops.pallas.flash_attn import (  # noqa: E402
    flash_attention, flash_eligible)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool2x2_mask(x, ceil_mode):
    return _pool2x2_fwd_val(x, ceil_mode)


def _pool2x2_fwd_val(x, ceil_mode):
    h, w = x.shape[1], x.shape[2]
    ph, pw = (h % 2, w % 2) if ceil_mode else (0, 0)
    xr = x
    if ph or pw:
        xr = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                     constant_values=-np.inf)
    elif h % 2 or w % 2:  # floor mode drops the odd tail row/col
        xr = x[:, : h - h % 2, : w - w % 2]
    B, H, W, C = xr.shape
    return jnp.max(xr.reshape(B, H // 2, 2, W // 2, 2, C), axis=(2, 4))


def _pool2x2_mask_fwd(x, ceil_mode):
    y = _pool2x2_fwd_val(x, ceil_mode)
    return y, (x, y)


def _pool2x2_mask_bwd(ceil_mode, res, dy):
    x, y = res
    B, h, w, C = x.shape
    # region of x the pool actually reads: padded to even in ceil
    # mode, minus the odd tail row/col in floor mode (its grad is 0)
    ph, pw = (h % 2, w % 2) if ceil_mode else (0, 0)
    he, we = (h, w) if ceil_mode else (h - h % 2, w - w % 2)
    xp = x
    if ph or pw:
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                     constant_values=-np.inf)
    elif (he, we) != (h, w):
        xp = x[:, :he, :we]
    Hp, Wp = xp.shape[1], xp.shape[2]
    # compare in the [B,H/2,2,W/2,2,C] reshape space (measured faster
    # than repeat-upsampling on v5e, scripts/exp_pool.py); mask picks
    # the argmax cells, 1/cnt splits exact ties (sum-preserving)
    xr = xp.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
    yb = y[:, :, None, :, None, :]
    mask = (xr == yb).astype(jnp.float32)
    cnt = jnp.sum(mask, axis=(2, 4), keepdims=True)
    dyb = dy.astype(jnp.float32)[:, :, None, :, None, :]
    dx = (mask * (dyb / cnt)).reshape(B, Hp, Wp, C).astype(x.dtype)
    dx = dx[:, :min(h, Hp), :min(w, Wp)]
    if dx.shape[1] != h or dx.shape[2] != w:
        dx = jnp.pad(dx, ((0, 0), (0, h - dx.shape[1]),
                          (0, w - dx.shape[2]), (0, 0)))
    return (dx,)


_max_pool2x2_mask.defvjp(_pool2x2_mask_fwd, _pool2x2_mask_bwd)


def adaptive_avg_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """torch.adaptive_avg_pool2d semantics on NHWC, as two matmuls.

    Segment i of an n->t pool averages rows floor(i*n/t)..ceil((i+1)*n/t).
    Pooling matrices are trace-time constants, so this stays static-shape
    and XLA fuses it onto the MXU.
    """
    def pool_matrix(n: int, t: int) -> np.ndarray:
        m = np.zeros((t, n), np.float32)
        for i in range(t):
            s, e = (i * n) // t, -(-((i + 1) * n) // t)
            m[i, s:e] = 1.0 / (e - s)
        return m

    h, w = x.shape[1], x.shape[2]
    if h == out_size and w == out_size:
        return x
    mh = jnp.asarray(pool_matrix(h, out_size), x.dtype)
    mw = jnp.asarray(pool_matrix(w, out_size), x.dtype)
    x = jnp.einsum("th,bhwc->btwc", mh, x)
    return jnp.einsum("tw,bhwc->bhtc", mw, x)


class _BlockDiagConv(nn.Module):
    """Grouped conv computed as a DENSE conv with a block-diagonal
    kernel. Numerically identical to feature_group_count (the extra
    contraction terms are exact zeros), but 1.5-3x faster on TPU at
    large spatial extents where XLA's grouped-conv lowering starves the
    MXU (measured: scripts/exp_gconv.py — 300^2 64ch: 27 -> 15 ms,
    150^2 128ch: 14 -> 4.7 ms fwd+bwd @ b32). The parameter keeps the
    grouped [kh, kw, Cin/G, Cout] layout so checkpoints and weight
    transplants are unaffected; the zero padding to dense happens at
    trace time and its VJP slices the gradient back down."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Any
    kernel_dilation: Tuple[int, int]
    groups: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        cgi = cin // self.groups
        cgo = self.features // self.groups
        kh, kw = self.kernel
        w = self.param("kernel", xavier_uniform,
                       (kh, kw, cgi, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        # Pair mode: block-diagonal only WITHIN pairs of groups, lowered
        # as feature_group_count=2 — executes 2x the true MACs instead
        # of the full dense form's Gx, and at Cg=64 each conv group is
        # 128 channels (full lane width), dodging the half-empty-lane
        # layouts that sink XLA's G=4 grouped lowering (see
        # DENSE_GROUPS_MAX_CIN_PER_GROUP notes). Numerics identical:
        # the off-diagonal pair entries are exact zeros.
        hw_out = ((x.shape[1] // self.strides[0])
                  * (x.shape[2] // self.strides[1]))
        pair = (DENSE_PAIR and self.groups % 2 == 0 and self.groups > 2
                and cgi >= DENSE_PAIR_MIN_CGI
                and hw_out <= DENSE_PAIR_MAX_HW)
        if pair:
            parts = [
                jnp.pad(w[:, :, :, g * cgo:(g + 1) * cgo],
                        ((0, 0), (0, 0),
                         ((g % 2) * cgi, (1 - g % 2) * cgi), (0, 0)))
                for g in range(self.groups)
            ]
            fgc = self.groups // 2
        else:
            parts = [
                jnp.pad(w[:, :, :, g * cgo:(g + 1) * cgo],
                        ((0, 0), (0, 0),
                         (g * cgi, (self.groups - 1 - g) * cgi), (0, 0)))
                for g in range(self.groups)
            ]
            fgc = 1
        wd = jnp.concatenate(parts, axis=3).astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, wd.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wd, self.strides, self.padding,
            rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
            feature_group_count=fgc)
        return y + b.astype(self.dtype)


class _PallasWideConv(nn.Module):
    """3x3/s1/same conv via the Pallas im2col-in-VMEM kernel
    (ops/pallas/stem_conv.py). Parameter layout identical to the
    grouped nn.Conv / _BlockDiagConv ([3, 3, Cin/G, Cout] + bias), so
    checkpoints and weight transplants are lowering-independent."""

    features: int
    groups: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        from gssd_tpu.ops.pallas.stem_conv import (
            conv3x3_wide,
            pack_weights,
        )

        cgi = x.shape[-1] // self.groups
        w = self.param("kernel", xavier_uniform,
                       (3, 3, cgi, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return conv3x3_wide(
            x.astype(self.dtype),
            pack_weights(w, self.groups).astype(self.dtype),
            b)


# The Pallas wide-conv path is DISABLED pending a formulation that
# beats XLA: measured on v5e (scripts/exp_stemk.py), every Mosaic
# patch-assembly structure tried (scratch-staged im2col 35 ms,
# per-tap dots 21 ms, dy-concat+3-dots 14 ms fwd @300^2x64 b32) loses
# to XLA's own conv (8.3 ms fwd) — sublane-shifted operand relayouts
# dominate. Kept behind this flag with full tests for future Mosaic
# versions.
USE_PALLAS_WIDE_CONV = False

# grouped convs switch to the block-diagonal dense form at or above
# this many spatial positions (crossover measured on v5e)
DENSE_GROUPS_MIN_HW = 5000
# ... but only when the per-group contraction depth is too shallow for
# the MXU. Measured on v5e (scripts/exp_trunk3.py, fwd+bwd b32):
# 150^2 128ch (cin/g=32): grouped 10.1 ms vs dense 3.7 ms — dense wins;
# 75^2 256ch (cin/g=64): grouped 3.6 ms vs dense 4.0 ms standalone,
# BUT the grouped lowering forces [B, H, W, G, Cg] 5-D layouts onto
# every neighboring BN/ReLU fusion, and at Cg = 64 those tensors tile
# (8, 128) with HALF their lanes empty (xplane: six 0.6-1.1 ms
# [32,75,75,4,64] fusions) — in-context the dense form wins and
# Cg = 64 is INCLUDED in the dense range (same-regime bench A/Bs:
# 300.3 -> 306.5 slices/s @300^2 b32; 92.8 -> 97.9 @512 b8, where the
# same Cg = 64 stage sits at 128^2);
# 38^2 512ch (cin/g=128): grouped 2.3 ms vs dense 4.4 ms (and Cg = 128
# fills the lanes, so no layout externality) — grouped stays.
DENSE_GROUPS_MAX_CIN_PER_GROUP = int(
    os.environ.get("GSSD_DENSE_MAX_CGI", "65"))
# pair mode (see _BlockDiagConv): block-diag within group PAIRS lowered
# as feature_group_count=2 — 2x true MACs instead of Gx. Gated to sites
# whose paired groups fill the 128-lane tile (cgi >= 64 by default) AND
# whose spatial extent is small enough that the grouped fgc=2 lowering
# doesn't re-starve the MXU. Measured on v5e (scripts/ab_bench.py,
# interleaved same-regime reps, 20 iters): flagship 300^2 b32 — the
# Cg=64 site sits at 75^2 — 319.3 -> 328.3 slices/s (+2.8%, mfu_hw
# 0.387 -> 0.365: fewer hardware MACs, less wall time); 512 b8 — the
# same stage sits at 128^2 — 102.5 -> 100.2 (-2.2%). Hence the
# spatial gate defaults between 75^2=5625 and 128^2=16384.
DENSE_PAIR = os.environ.get("GSSD_DENSE_PAIR", "1") == "1"
DENSE_PAIR_MIN_CGI = int(os.environ.get("GSSD_DENSE_PAIR_MIN_CGI", "64"))
DENSE_PAIR_MAX_HW = int(os.environ.get("GSSD_DENSE_PAIR_MAX_HW", "8192"))


# --- W-pair channel packing for the 64-channel stem ------------------
#
# At C = 64 every (8, 128)-tiled tensor pass wastes HALF its lanes, so
# the stem's conv/BN/ReLU/pool chain runs at <= 50% of HBM bandwidth.
# Packing W-pixel pairs into channels ([B, H, W, C] -> [B, H, W/2, 2C],
# a free logical reshape) makes every pass full-lane; a 3x3 conv in
# packed space uses an embedded [3, 3, 2Ci, 2Co] weight
#   wp[ky, kt, q*Ci + ci, p*Co + co] = w[ky, 2*(kt-1)+q-p+1, ci, co]
# (taps with |2*(kt-1)+q-p| > 1 are zero), exactly reproducing the
# original conv including its zero padding at 2x the MACs — these
# convs are bandwidth-bound, so the extra MACs are free. Measured on
# v5e (scripts/exp_packstem.py, fwd+bwd standalone b32 @300^2x64):
# conv 15.0 -> 8.1 ms, BN+ReLU 3.5 -> 2.8, full stem chain 28.1 ->
# 26.0 with the lane-max+reduce_window pool.
STEM_PACK = os.environ.get("GSSD_PACKED_STEM", "1") == "1"
# ... extended one conv deeper: conv2_1's input is the last C = 64
# tensor, so models/ssd.py can re-pack the pool1 output and run
# conv2_1 packed too. Measured and kept OFF: the pair-embedded dense
# conv2_1 weight carries 4x the MACs (block-diag x pair), which loses
# to the half-lane input it fixes at BOTH sites — 512 model 96.4 ->
# 78.6 slices/s (256^2), flagship 300.3 -> 279.9 (150^2), same-regime
# bench A/Bs. Unlike conv1_x (Ci = 3/16 per pair half), conv2_1's
# per-group contraction is deep enough that the stem's
# bandwidth-bound argument no longer holds.
STEM_PACK2 = os.environ.get("GSSD_PACKED_STEM2", "0") == "1"
STEM_PACK2_MAX_HW = int(os.environ.get("GSSD_PACKED_STEM2_MAX_HW",
                                       "40000"))


def pack_wpairs(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def pack_pair_weight(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Ci, Co] -> [3, 3, 2Ci, 2Co] W-pair embedded weight."""
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


def packed_pool2(xp: jnp.ndarray) -> jnp.ndarray:
    """2x2/s2 max pool on a W-pair packed map: the W-pair max is a
    lane-half maximum, the H-pair max a reduce_window; the result is
    the UNPACKED [B, H/2, W/2, C] pool output (pair index == pooled w
    coordinate). Tie gradients split jnp.maximum-style instead of
    SelectAndScatter's first-match (ties are ReLU zeros whose grad
    dies in the ReLU backward)."""
    c = xp.shape[3] // 2
    wmax = jnp.maximum(xp[..., :c], xp[..., c:])
    return jax.lax.reduce_window(
        wmax, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1),
        [(0, 0)] * 4)


class PackedBatchNorm(nn.Module):
    """BatchNorm over the ORIGINAL C channels of a W-pair packed
    [B, H, W/2, 2C] tensor. Parameter/stat tree identical to
    nn.BatchNorm (params scale/bias [C]; batch_stats mean/var [C]) so
    checkpoints are packing-independent; lane stats fold exactly
    (the two parities are equal-count disjoint samples)."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, xp):
        c = xp.shape[-1] // 2
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        xf = xp.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            s1 = jnp.mean(xf, axis=(0, 1, 2))
            s2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            mean = 0.5 * (s1[:c] + s1[c:])
            var = 0.5 * (s2[:c] + s2[c:]) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        sc = jnp.tile(scale * jax.lax.rsqrt(var + self.epsilon), 2)
        bi = jnp.tile(bias - mean * scale
                      * jax.lax.rsqrt(var + self.epsilon), 2)
        return xf * sc + bi


class _PackedPairConv(nn.Module):
    """3x3/s1/same (optionally grouped) conv on a W-pair packed input.
    Parameter layout identical to the grouped nn.Conv / _BlockDiagConv
    ([3, 3, Cin/G, Cout] + bias), so checkpoints and transplants are
    lowering-independent; block-diag expansion and pair embedding both
    happen at trace time and their VJPs slice the gradient back."""

    features: int
    groups: int
    dtype: Dtype

    @nn.compact
    def __call__(self, xp):
        cin = xp.shape[-1] // 2
        cgi = cin // self.groups
        cgo = self.features // self.groups
        w = self.param("kernel", xavier_uniform,
                       (3, 3, cgi, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        if self.groups > 1:
            parts = [
                jnp.pad(w[:, :, :, g * cgo:(g + 1) * cgo],
                        ((0, 0), (0, 0),
                         (g * cgi, (self.groups - 1 - g) * cgi), (0, 0)))
                for g in range(self.groups)
            ]
            wd = jnp.concatenate(parts, axis=3)
        else:
            wd = w
        wp = pack_pair_weight(wd).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), wp, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.tile(b, 2).astype(self.dtype)


class ConvBNRelu(nn.Module):
    """Grouped conv + optional BatchNorm + optional ReLU.

    With ``packed=True`` the input/output are W-pair packed
    [B, H, W/2, 2C] (see STEM_PACK above); only the 3x3/s1/same
    configuration the stem uses is supported there."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: Any = 0
    dilation: int = 1
    groups: int = 1
    use_bn: bool = False
    relu: bool = True
    dtype: Dtype = jnp.bfloat16
    packed: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.packed:
            assert (self.kernel, self.stride, self.dilation) == (3, 1, 1)
            x = _PackedPairConv(self.features, self.groups, self.dtype,
                                name="Conv_0")(x)
            if self.use_bn:
                x = PackedBatchNorm(use_running_average=not train,
                                    name="BatchNorm_0")(x)
                x = x.astype(self.dtype)
            if self.relu:
                x = nn.relu(x)
            return x
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        ek = (self.kernel - 1) * self.dilation + 1  # effective kernel
        out_hw = ((x.shape[1] + pad[0][0] + pad[0][1] - ek) // self.stride
                  + 1) * (
            (x.shape[2] + pad[1][0] + pad[1][1] - ek) // self.stride + 1)
        if (USE_PALLAS_WIDE_CONV and jax.default_backend() == "tpu"
                and self.kernel == 3 and self.stride == 1
                and self.dilation == 1 and pad == [(1, 1), (1, 1)]
                and out_hw >= DENSE_GROUPS_MIN_HW
                and x.shape[-1] <= 64 and self.features <= 64
                and x.shape[1] > 4):
            # stem-class site (wide spatial, narrow channels): XLA's
            # conv lowering runs 20-26 TF/s here; the Pallas
            # im2col-in-VMEM kernel sustains closer to the 64-lane MXU
            # cap (ops/pallas/stem_conv.py). Same grouped param layout.
            x = _PallasWideConv(
                self.features, self.groups, self.dtype, name="Conv_0",
            )(x)
        elif (self.groups > 1 and out_hw >= DENSE_GROUPS_MIN_HW
                and x.shape[-1] // self.groups
                < DENSE_GROUPS_MAX_CIN_PER_GROUP):
            x = _BlockDiagConv(
                self.features,
                (self.kernel, self.kernel),
                (self.stride, self.stride),
                pad,
                (self.dilation, self.dilation),
                self.groups,
                self.dtype,
                name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=pad,
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=xavier_uniform,
                name="Conv_0",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
            )(x)
            x = x.astype(self.dtype)
        if self.relu:
            x = nn.relu(x)
        return x


class L2Norm(nn.Module):
    """Channel-wise L2 normalize then scale by a learned per-channel
    weight (init ``scale``). Reference: layers/modules/l2norm.py."""

    scale: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", nn.initializers.constant(self.scale), (x.shape[-1],)
        )
        x32 = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True)) + self.eps
        return ((x32 / norm) * w).astype(x.dtype)


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class SNDense(nn.Module):
    """Spectral-normalized 1x1 conv over the channel axis.

    Matches torch spectral_norm semantics (layers/spectral_norm.py):
    weight matrix [out, in], one power iteration per *training* forward
    updating persistent u [out] / v [in]; at eval sigma is computed from
    the frozen vectors. The u/v state lives in the 'spectral' variable
    collection so it threads through the train-state pytree (and gets a
    fold axis under vmapped cross-validation).
    """

    features: int
    dtype: Dtype = jnp.bfloat16
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", xavier_uniform, (in_features, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        def init_vec(key, n):
            return _l2_normalize(jax.random.normal(key, (n,), jnp.float32))

        u = self.variable(
            "spectral", "u", init_vec, self.make_rng("params") if self.is_initializing() else None, self.features
        )
        v = self.variable(
            "spectral", "v", init_vec, self.make_rng("params") if self.is_initializing() else None, in_features
        )

        # torch's weight_mat is [out, in]; kernel is [in, out]
        w = kernel.T
        if train and not self.is_initializing():
            v_new = _l2_normalize(w.T @ u.value, self.eps)
            u_new = _l2_normalize(w @ v_new, self.eps)
            # grads must not flow through the power iteration
            u_new = jax.lax.stop_gradient(u_new)
            v_new = jax.lax.stop_gradient(v_new)
            u.value, v.value = u_new, v_new
            sigma = jnp.dot(u_new, w @ v_new)
        else:
            sigma = jnp.dot(u.value, w @ v.value)
        w_sn = (kernel / sigma).astype(self.dtype)
        y = x.astype(self.dtype) @ w_sn + bias.astype(self.dtype)
        return y


class SelfAttention(nn.Module):
    """SAGAN self-attention over the spatial grid (self_attn.py:29-89).

    theta: C->C/8 queries at full resolution; phi/g: C/8 and C/2
    keys/values adaptively avg-pooled to (H // max_pool_factor)^2
    tokens; out: C/2->C; residual ``x + sigma * attn_g`` with learned
    scalar sigma (init 0). Returns (out, sigma*attn_g, attn_map).
    """

    max_pool_factor: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        pool_size = max(h // self.max_pool_factor, 1)

        theta = SNDense(c // 8, dtype=self.dtype, name="theta")(x, train)
        phi = SNDense(c // 8, dtype=self.dtype, name="phi")(x, train)
        g = SNDense(c // 2, dtype=self.dtype, name="g")(x, train)

        phi = adaptive_avg_pool(phi, pool_size)
        g = adaptive_avg_pool(g, pool_size)

        q = theta.reshape(b, h * w, c // 8)
        k = phi.reshape(b, pool_size * pool_size, c // 8)
        vv = g.reshape(b, pool_size * pool_size, c // 2)

        logits = jnp.einsum(
            "bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if (USE_FLASH_ATTN and q.dtype == jnp.bfloat16
                and flash_eligible(k.shape[1])):
            # fused Pallas path: the [N, M] map never touches HBM.
            # `attn` above is only consumed by the --visualize aux
            # dumps — XLA prunes it (and its logits) whenever the
            # caller ignores it, i.e. in every train/eval/infer step.
            # bf16-only: the kernel's internal casts match the bf16
            # compute path bit-for-bit but would degrade a float32
            # model (e.g. cross-backend eval / transplant parity).
            attn_g = flash_attention(q, k, vv)
        else:
            attn_g = jnp.einsum("bnm,bmd->bnd", attn, vv)
        attn_g = attn_g.reshape(b, h, w, c // 2)
        attn_g = SNDense(c, dtype=self.dtype, name="out")(attn_g, train)

        sigma = self.param("sigma", nn.initializers.zeros, (1,), jnp.float32)
        scaled = sigma.astype(self.dtype) * attn_g
        return x + scaled, scaled, attn
