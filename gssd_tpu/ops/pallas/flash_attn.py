"""Fused SAGAN attention (softmax(Q K^T) V) for TPU.

The reference's self-attention (ssd_liverdet/layers/self_attn.py:29-89)
materializes the [B, N, M] attention map in HBM three times per train
step (fwd softmax + remat recompute + backward), which the round-3
xplane profile attributes ~13.6 ms/step at the flagship site
(N = M = 38^2 = 1444, b32) and far more at the 512/PixelLink sites
(M = 64^2/75^2). This kernel fuses logits, softmax, and the value
contraction in VMEM — the map never touches HBM; the backward
recomputes P from the saved row logsumexp (the FlashAttention
recipe). Because every site's K/V block fits VMEM (M <= ~5.6k), each
query tile processes the FULL key range in one shot — no online
softmax state is needed, which keeps the kernels cond-free.

Semantics exactly match the plain path in ops/layers.SelfAttention:
f32 logits (no 1/sqrt(dk) scale — SAGAN doesn't scale), f32 softmax,
P cast to bf16 for the value dot, f32 accumulation.

Backward (custom VJP, residuals q, k, v, o, logsumexp):
    D  = rowsum(dO * O)                       (XLA, one cheap pass)
    P  = exp(S - L)          dV += P^T dO
    dP = dO V^T              dS  = P * (dP - D)
    dQ = dS K                dK += dS^T Q
dK/dV accumulate across query-tile grid steps (output block indexed by
batch only), the same revisit pattern as deform_hat's backward.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLASH_TN = int(_os.environ.get("GSSD_FLASH_TN", "256"))
# largest M (key/value token count) the single-pass kernel may hold in
# VMEM: the f32 logits tile is TN x Mp (4 MB at 256 x 4096) plus K/V
# blocks; beyond this the plain XLA path runs.
FLASH_MAX_M = int(_os.environ.get("GSSD_FLASH_MAX_M", "8192"))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _masked_logits(q, k, Mr):
    """[TN, Mp] f32 logits with padded key columns at -inf."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if Mr < s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < Mr, s, -jnp.inf)
    return s


def _fwd_kernel(Mr, q_ref, k_ref, v_ref, o_ref, l_ref):
    s = _masked_logits(q_ref[0], k_ref[0], Mr)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.sum(e, axis=1, keepdims=True)
    p = (e / den).astype(jnp.bfloat16)
    o_ref[0] = jnp.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    l_ref[0] = m + jnp.log(den)


def _bwd_kernel(Mr, q_ref, k_ref, v_ref, do_ref, l_ref, d_ref,
                dq_ref, dk_ref, dv_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    do = do_ref[0]  # [TN, dv] bf16
    s = _masked_logits(q, k, Mr)
    p = jnp.exp(s - l_ref[0])  # masked cols -> exp(-inf) = 0
    pb = p.astype(jnp.bfloat16)
    dv_ref[0] += jax.lax.dot_general(
        pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dS stays f32 for the dQ/dK dots (the plain path's dlogits are
    # f32; casting dS to bf16 measured ~1.6% relative grad error).
    # These dots are small (dk-deep), so the f32 MXU rate is fine.
    ds = p * (dp - d_ref[0])
    dq_ref[0] = jnp.dot(ds, k.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    dk_ref[0] += jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pad_axis(a, axis, size):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, size - a.shape[axis])
    return jnp.pad(a, pad) if size != a.shape[axis] else a


def _fwd_impl(q, k, v):
    B, N, dk = q.shape
    M, dv = k.shape[1], v.shape[2]
    TN = min(FLASH_TN, _cdiv(N, 8) * 8)
    Np = _cdiv(N, TN) * TN
    Mp = _cdiv(M, 128) * 128
    qp = _pad_axis(q, 1, Np)
    kp = _pad_axis(k, 1, Mp)
    vp = _pad_axis(v, 1, Mp)
    o, l = pl.pallas_call(
        functools.partial(_fwd_kernel, M),
        grid=(B, Np // TN),
        in_specs=[
            pl.BlockSpec((1, TN, dk), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Mp, dk), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, Mp, dv), lambda b, t: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TN, dv), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, TN, 1), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, dv), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Mp * (dk + dv),
            bytes_accessed=2 * B * (Np * dk + Mp * (dk + dv) + Np * dv),
            transcendentals=B * Np * Mp),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, kp, vp)
    return o[:, :N], l


def _bwd_impl(q, k, v, o, l, do):
    B, N, dk = q.shape
    M, dv = k.shape[1], v.shape[2]
    TN = min(FLASH_TN, _cdiv(N, 8) * 8)
    Np = _cdiv(N, TN) * TN
    Mp = _cdiv(M, 128) * 128
    do = do.astype(jnp.bfloat16)
    d = jnp.sum(do.astype(jnp.float32) * o[:, :N], axis=2, keepdims=True)
    qp = _pad_axis(q, 1, Np)
    kp = _pad_axis(k, 1, Mp)
    vp = _pad_axis(v, 1, Mp)
    dop = _pad_axis(do, 1, Np)  # zero rows: padded queries contribute 0
    lp = _pad_axis(l, 1, Np)
    dp_ = _pad_axis(d, 1, Np)
    dq, dk_, dv_ = pl.pallas_call(
        functools.partial(_bwd_kernel, M),
        grid=(B, Np // TN),
        in_specs=[
            pl.BlockSpec((1, TN, dk), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Mp, dk), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, Mp, dv), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, TN, dv), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, TN, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, TN, 1), lambda b, t: (b, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TN, dk), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Mp, dk), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, Mp, dv), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, dk), jnp.float32),
            jax.ShapeDtypeStruct((B, Mp, dk), jnp.float32),
            jax.ShapeDtypeStruct((B, Mp, dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * Np * Mp * (dk + dv),
            bytes_accessed=4 * B * (Np * dk + Mp * (dk + dv) + Np * dv),
            transcendentals=B * Np * Mp),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, kp, vp, dop, lp, dp_)
    return dq[:, :N], dk_[:, :M], dv_[:, :M]


@jax.custom_vjp
def _flash_core(q, k, v):
    return _fwd_impl(q, k, v)[0]


def _flash_fwd(q, k, v):
    o, l = _fwd_impl(q, k, v)
    return o, (q, k, v, o, l)


def _flash_bwd(res, g):
    q, k, v, o, l = res
    dq, dk_, dv_ = _bwd_impl(q, k, v, o, l, g)
    return (dq.astype(q.dtype), dk_.astype(k.dtype), dv_.astype(v.dtype))


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray,
                    v: jnp.ndarray) -> jnp.ndarray:
    """softmax(q @ k^T) @ v without materializing the attention map.

    q [B, N, dk], k [B, M, dk], v [B, M, dv] (bf16 or f32) -> [B, N, dv]
    in q's dtype. Unscaled logits, f32 softmax, bf16 value dot — the
    exact SAGAN convention of ops/layers.SelfAttention's plain path.
    """
    out = _flash_core(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                      v.astype(jnp.bfloat16))
    return out.astype(q.dtype)


def flash_eligible(M: int) -> bool:
    """Key counts beyond FLASH_MAX_M would blow the single-pass VMEM
    budget; callers fall back to the plain XLA path."""
    return M <= FLASH_MAX_M
