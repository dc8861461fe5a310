"""The SSD detector family: SSD (multiphase), GSSD, GSSD++.

One flax module covers the reference's model zoo via ModelConfig flags:
- ``ssd_type='ssd'``: 12-channel multiphase SSD300 without grouping
  (reference models/ssd_multiphase.py).
- ``ssd_type='gssd'``: phase-wise grouped convs + 1x1 fuse convs
  (reference models/ssd_multiphase_custom_group.py — the GSSD of
  MICCAI'18 with batch_norm/groups flags).
- GSSD++ flags: ``use_self_attention[_base]``, ``num_dcn_layers``,
  ``groups_dcn``, ``dcn_cat_sab``, ``detach_sab``, ``max_pool_factor``
  (reference group model ctor :40-183 and forward :217-400).

TPU-first design notes:
- NHWC, bfloat16 activations, f32 params; grouped convs via XLA
  ``feature_group_count`` (one fused conv per layer, not 4 separate).
- The module is phase-free and returns raw (loc, conf) and aux maps;
  softmax + Detect/NMS live in ``gssd_tpu.ops.nms`` so train/eval are
  pure functions of params rather than differently-built networks (the
  reference rebuilds a 'test'-phase net per eval,
  train_lesion_multiphase_v2.py:405-408).
- The VGG trunk taps follow the reference's source points exactly:
  conv4_3(+L2Norm) and fc7 from the trunk, then extras block outputs
  (group model :254-372), with attention/DCN/fuse applied per source.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gssd_tpu.config import ModelConfig
from gssd_tpu.ops.anchors import make_anchors
from gssd_tpu.ops.deform_conv import DCN
from gssd_tpu.ops.layers import (
    STEM_PACK,
    STEM_PACK2,
    STEM_PACK2_MAX_HW,
    ConvBNRelu,
    L2Norm,
    SelfAttention,
    max_pool,
    pack_wpairs,
    packed_pool2,
    xavier_uniform,
)

# VGG-16 (reduced fc) channel plan for 300 input; 'M' = 2x2/2 maxpool,
# 'C' = ceil-mode maxpool (75 -> 38). Matches the reference base cfg
# (ssd_multiphase_custom_group.py:523-527).
VGG_STAGE1 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "C", 512, 512, 512]
VGG_STAGE2 = [512, 512, 512]  # conv5_x after an 'M'; then pool5/conv6/conv7

# extras plan: (out_1x1, out_3x3, stride, padding, kernel) per block;
# sources are each block's 3x3 output. Mirrors add_extras semantics
# (group model :463-490): for 300, two strided blocks then two valid 3x3
# blocks; for 512, four strided blocks plus a final 4x4 block taking
# 2x2 -> 1x1 (ssd_multiphase_custom_512_group.py:356-364 — whose
# original head wiring is vestigial/incomplete; this implements the
# 7-source layout the v2_512 anchor config defines).
EXTRAS = {
    300: [
        (256, 512, 2, 1, 3),
        (128, 256, 2, 1, 3),
        (128, 256, 1, 0, 3),
        (128, 256, 1, 0, 3),
    ],
    512: [
        (256, 512, 2, 1, 3),
        (128, 256, 2, 1, 3),
        (128, 256, 2, 1, 3),
        (128, 256, 2, 1, 3),
        (128, 256, 1, 1, 4),
    ],
}

SOURCE_CHANNELS = [512, 1024, 512, 256, 256, 256]


def slice_and_cat(a: jnp.ndarray, b: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Interleave two feature maps phase-group-wise (group model
    slice_and_cat :185-192): output groups are [a_g, b_g] per phase so
    the next grouped conv keeps per-phase context."""
    B, H, W, Ca = a.shape
    Cb = b.shape[-1]
    ag = a.reshape(B, H, W, groups, Ca // groups)
    bg = b.reshape(B, H, W, groups, Cb // groups)
    return jnp.concatenate([ag, bg], axis=-1).reshape(B, H, W, Ca + Cb)


class SSD(nn.Module):
    """See module docstring. Call returns a dict:
    loc [B, P, 4] (f32), conf [B, P, C] logits (f32), plus 'offsets'
    / 'attn' / 'attn_base' aux lists when the corresponding flags are
    on (consumed by the --visualize eval path, test_ap_iobb.py:156-179).
    """

    cfg: ModelConfig

    def _attn(self, name: str, idx: int):
        # --remat_attention: jax.checkpoint the attention block so its
        # activations are recomputed in backward (torch.utils.checkpoint
        # analog; the static_argnums entry is the `train` bool)
        mod = (nn.remat(SelfAttention, static_argnums=(2,))
               if self.cfg.remat_attention else SelfAttention)
        return mod(
            max_pool_factor=self.cfg.max_pool_factor,
            dtype=self.dtype,
            name=f"{name}_{idx}",
        )

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        fs = cfg.feature_scale
        dt = self.dtype
        x = x.astype(dt)

        def conv(feats, name, k=3, s=1, p=1, d=1, groups=1, use_bn=None,
                 packed=False):
            return ConvBNRelu(
                feats * fs, kernel=k, stride=s, padding=p, dilation=d,
                groups=groups,
                use_bn=cfg.batch_norm if use_bn is None else use_bn,
                dtype=dt, name=name, packed=packed,
            )

        aux: Dict[str, List[jnp.ndarray]] = {"offsets": [], "attn": [], "attn_base": []}
        sources: List[jnp.ndarray] = []
        attn_i = 0
        attn_base_i = 0

        # ---- VGG stage 1: through conv4_3 relu
        ci = 0
        stage1 = list(VGG_STAGE1)
        if (STEM_PACK and dt == jnp.bfloat16 and stage1[:3] == [64, 64, "M"]
                and 64 * fs <= 64
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            # 64-channel stem at half lane occupancy: run conv1_1 ->
            # BN/ReLU -> conv1_2 -> BN/ReLU -> pool1 in the W-pair
            # packed layout (ops/layers.py STEM_PACK notes). Params
            # and BN stats are packing-independent; bf16-only (the
            # f32 transplant/eval path keeps the plain lowering).
            xp = pack_wpairs(x)
            xp = conv(64, "vgg_1", groups=cfg.groups_vgg,
                      packed=True)(xp, train)
            xp = conv(64, "vgg_2", groups=cfg.groups_vgg,
                      packed=True)(xp, train)
            x = packed_pool2(xp)
            stage1 = stage1[3:]
            ci = 2
            if (STEM_PACK2 and stage1 and stage1[0] == 128
                    and x.shape[2] % 2 == 0
                    and x.shape[1] * x.shape[2] <= STEM_PACK2_MAX_HW):
                # conv2_1's INPUT is the last half-lane (C = 64)
                # tensor: re-pack the pool output (another
                # offset-preserving reshape) and run conv2_1 packed
                # too; its C = 128 output fills the lanes, so unpack
                # there and let the plain path take over. Gated by map
                # size: the pair-embedded dense weight quadruples the
                # MACs (309 vs 77 GF at the 512 model's 256^2 site,
                # XLA cost model), which stops being bandwidth-hidden
                # on large maps — measured 512 bench 96.4 -> 78.6
                # slices/s, so 256^2 is OUT; 150^2 (the 300 model)
                # gate pending its own A/B.
                xp = conv(128, "vgg_3", groups=cfg.groups_vgg,
                          packed=True)(pack_wpairs(x), train)
                b_, h_, w2_, c2_ = xp.shape
                x = xp.reshape(b_, h_, 2 * w2_, c2_ // 2)
                stage1 = stage1[1:]
                ci = 3
        for v in stage1:
            if v == "M":
                x = max_pool(x, 2, 2)
            elif v == "C":
                x = max_pool(x, 2, 2, ceil_mode=True)
            else:
                ci += 1
                x = conv(v, f"vgg_{ci}", groups=cfg.groups_vgg)(x, train)

        attn_g = None
        if cfg.use_self_attention_base:
            x, attn_g, a = self._attn("attn_base", attn_base_i)(x, train)
            aux["attn_base"].append(a)
            attn_base_i += 1

        if cfg.dcn_cat_sab:
            sab = jax.lax.stop_gradient(attn_g) if cfg.detach_sab else attn_g
            x = slice_and_cat(x, sab, cfg.groups_vgg)

        if cfg.num_dcn_layers > 0:
            for i in range(cfg.num_dcn_layers):
                x, offs = DCN(
                    features=512 * fs,
                    deformable_groups=cfg.groups_dcn,
                    dtype=dt,
                    impl=cfg.dcn_impl,
                    name=f"dcn_{i}",
                )(x)
                aux["offsets"].append(offs)

        s = L2Norm(scale=20.0, name="l2norm")(x)
        if cfg.use_self_attention:
            s, _, a = self._attn("attn", attn_i)(s, train)
            aux["attn"].append(a)
            attn_i += 1
        if cfg.use_fuseconv:
            s = conv(512, "fuse_1", k=1, p=0)(s, train)
        sources.append(s)

        # ---- VGG stage 2: conv5_x + pool5 + dilated conv6 + conv7 (fc7)
        x = max_pool(x, 2, 2)
        for v in VGG_STAGE2:
            ci += 1
            x = conv(v, f"vgg_{ci}", groups=cfg.groups_vgg)(x, train)
        x = max_pool(x, 3, 1, padding=1)  # pool5
        x = conv(1024, "vgg_conv6", k=3, p=6, d=6, groups=cfg.groups_vgg)(x, train)
        x = conv(1024, "vgg_conv7", k=1, p=0, groups=cfg.groups_vgg)(x, train)

        if cfg.use_self_attention_base:
            x, _, a = self._attn("attn_base", attn_base_i)(x, train)
            aux["attn_base"].append(a)
            attn_base_i += 1
        s2 = x
        if cfg.use_self_attention:
            s2, _, a = self._attn("attn", attn_i)(s2, train)
            aux["attn"].append(a)
            attn_i += 1
        if cfg.use_fuseconv:
            s2 = conv(1024, "fuse_2", k=1, p=0)(s2, train)
        sources.append(s2)

        # ---- extras
        for bi, (c1, c3, stride, pad, kk) in enumerate(EXTRAS[cfg.size]):
            x = conv(c1, f"extra_{bi}_1", k=1, p=0, groups=cfg.groups_extra)(x, train)
            x = conv(c3, f"extra_{bi}_3", k=kk, s=stride, p=pad,
                     groups=cfg.groups_extra)(x, train)
            se = x
            if cfg.use_self_attention_base:
                x, _, a = self._attn("attn_base", attn_base_i)(x, train)
                aux["attn_base"].append(a)
                attn_base_i += 1
                se = x
            if cfg.use_self_attention:
                se, _, a = self._attn("attn", attn_i)(se, train)
                aux["attn"].append(a)
                attn_i += 1
            if cfg.use_fuseconv:
                se = conv(c3, f"fuse_{bi + 3}", k=1, p=0)(se, train)
            sources.append(se)

        # ---- multibox heads (plain, ungrouped 3x3 convs)
        mbox = cfg.anchor_config.num_priors_per_cell  # (4,6,6,6,4,4) for v2
        locs, confs = [], []
        for i, (src, nb) in enumerate(zip(sources, mbox)):
            B = src.shape[0]
            l = nn.Conv(
                nb * 4, (3, 3), padding=[(1, 1), (1, 1)], dtype=dt,
                param_dtype=jnp.float32, kernel_init=xavier_uniform,
                name=f"loc_{i}",
            )(src)
            c = nn.Conv(
                nb * cfg.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                dtype=dt, param_dtype=jnp.float32, kernel_init=xavier_uniform,
                name=f"conf_{i}",
            )(src)
            locs.append(l.reshape(B, -1, 4))
            confs.append(c.reshape(B, -1, cfg.num_classes))

        out = {
            "loc": jnp.concatenate(locs, axis=1).astype(jnp.float32),
            "conf": jnp.concatenate(confs, axis=1).astype(jnp.float32),
        }
        for k, v in aux.items():
            if v:
                out[k] = v
        return out


def build_model(cfg: ModelConfig):
    """Build the model plus its constant anchor table — the TPU analog
    of the reference's build_ssd(phase, ...) factory
    (ssd_multiphase_custom_group.py:542-557). ``ssd_type`` selects the
    variant: ssd (ungrouped), gssd (grouped + fuse, the main model),
    fssd / groupfssd (feature-fusion pyramid), fusedssd (deconv
    conv5_3->conv4_3 fusion)."""
    import dataclasses

    if cfg.size == 512 and cfg.anchors == "v2":
        cfg = dataclasses.replace(cfg, anchors="v2_512")
    if cfg.ssd_type == "ssd":
        cfg = dataclasses.replace(
            cfg, groups_vgg=1, groups_extra=1, use_fuseconv=False
        )
    priors = make_anchors(cfg.anchor_config)
    if cfg.ssd_type in ("ssd", "gssd"):
        return SSD(cfg), priors
    if cfg.ssd_type in ("fssd", "groupfssd"):
        from gssd_tpu.models.fssd import FSSD

        if cfg.ssd_type == "fssd":
            cfg = dataclasses.replace(cfg, groups_vgg=1, groups_extra=1)
        return FSSD(cfg), priors
    if cfg.ssd_type == "fusedssd":
        from gssd_tpu.models.fssd import FusedSSD

        return FusedSSD(cfg), priors
    raise NotImplementedError(f"ssd_type={cfg.ssd_type!r}")
