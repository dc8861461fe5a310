"""FSSD and Fused-SSD variants (flax, NHWC).

- ``FSSD`` (reference models/ssd_multiphase_custom_fssd.py and the
  grouped models/ssd_multiphase_custom_groupfssd.py:55-167): taps
  conv4_3 / fc7 / an extra conv8_2 (1x1 1024->256 + 3x3 s2 256->512),
  projects each to 256ch with 1x1 convs, bilinear-upsamples (align
  corners) to 38x38, concats to 768ch + BN ("bn_fused"), then builds a
  fresh 6-level pyramid conv9_1..conv14_1 from the fused map, with the
  optional per-source 1x1 group-fuse convs of GSSD before the heads.
- ``FusedSSD`` (reference models/ssd_multiphase_custom_fused.py:61-160):
  replaces the conv4_3 source with relu(L2Norm(conv3x3(conv4_3)) +
  L2Norm(conv3x3(deconv2x2(conv5_3)))) and keeps the standard SSD
  pyramid for the rest.

Both reuse the anchor grid / heads / Detect contract of the main SSD.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp
from flax import linen as nn

from gssd_tpu.config import ModelConfig
from gssd_tpu.models.pixellink import upsample_bilinear_ac
from gssd_tpu.models.ssd import EXTRAS, VGG_STAGE1, VGG_STAGE2
from gssd_tpu.ops.layers import ConvBNRelu, L2Norm, max_pool, xavier_uniform


class _Heads(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, sources: List[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        mbox = cfg.anchor_config.num_priors_per_cell
        dt = jnp.dtype(cfg.compute_dtype)
        locs, confs = [], []
        for i, (src, nb) in enumerate(zip(sources, mbox)):
            B = src.shape[0]
            l = nn.Conv(nb * 4, (3, 3), padding=[(1, 1)] * 2, dtype=dt,
                        param_dtype=jnp.float32, kernel_init=xavier_uniform,
                        name=f"loc_{i}")(src)
            c = nn.Conv(nb * cfg.num_classes, (3, 3), padding=[(1, 1)] * 2,
                        dtype=dt, param_dtype=jnp.float32,
                        kernel_init=xavier_uniform, name=f"conf_{i}")(src)
            locs.append(l.reshape(B, -1, 4))
            confs.append(c.reshape(B, -1, cfg.num_classes))
        return {
            "loc": jnp.concatenate(locs, 1).astype(jnp.float32),
            "conf": jnp.concatenate(confs, 1).astype(jnp.float32),
        }


class _VGGTrunk(nn.Module):
    """Shared grouped VGG-300 trunk; returns conv4_3, conv5_3, fc7."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)

        def conv(feats, name, k=3, p=1, d=1):
            return ConvBNRelu(
                feats * cfg.feature_scale, kernel=k, padding=p, dilation=d,
                groups=cfg.groups_vgg, use_bn=cfg.batch_norm, dtype=dt,
                name=name,
            )

        ci = 0
        for v in VGG_STAGE1:
            if v == "M":
                x = max_pool(x, 2, 2)
            elif v == "C":
                x = max_pool(x, 2, 2, ceil_mode=True)
            else:
                ci += 1
                x = conv(v, f"vgg_{ci}")(x, train)
        conv4_3 = x
        x = max_pool(x, 2, 2)
        for v in VGG_STAGE2:
            ci += 1
            x = conv(v, f"vgg_{ci}")(x, train)
        conv5_3 = x
        x = max_pool(x, 3, 1, padding=1)
        x = conv(1024, "vgg_conv6", p=6, d=6)(x, train)
        fc7 = conv(1024, "vgg_conv7", k=1, p=0)(x, train)
        return conv4_3, conv5_3, fc7


class FSSD(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dt)
        ge = cfg.groups_extra

        def conv(feats, name, k=3, s=1, p=1, groups=1):
            return ConvBNRelu(feats * cfg.feature_scale, kernel=k, stride=s,
                              padding=p, groups=groups,
                              use_bn=cfg.batch_norm, dtype=dt, name=name)

        conv4_3, _, fc7 = _VGGTrunk(cfg, name="trunk")(x, train)

        c81 = conv(256, "conv8_1", k=1, p=0, groups=ge)(fc7, train)
        c82 = conv(512, "conv8_2", k=3, s=2, p=1, groups=ge)(c81, train)

        g = cfg.groups_vgg
        f43 = conv(256, "fuse_conv43", k=1, p=0, groups=g)(conv4_3, train)
        ffc7 = conv(256, "fuse_fc7", k=1, p=0, groups=g)(fc7, train)
        f82 = conv(256, "fuse_conv82", k=1, p=0, groups=ge)(c82, train)
        size0 = conv4_3.shape[1]
        ffc7 = upsample_bilinear_ac(ffc7, size0, size0)
        f82 = upsample_bilinear_ac(f82, size0, size0)
        fused = jnp.concatenate([f43, ffc7, f82], axis=-1)
        if cfg.batch_norm:
            fused = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="bn_fused",
            )(fused).astype(dt)

        s1 = conv(512, "conv9_1", groups=ge)(fused, train)  # 38
        s2 = conv(512, "conv10_1", s=2, groups=ge)(s1, train)  # 19
        s3 = conv(256, "conv11_1", s=2, groups=ge)(s2, train)  # 10
        s4 = conv(256, "conv12_1", s=2, groups=ge)(s3, train)  # 5
        s5 = conv(256, "conv13_1", p=0, groups=ge)(s4, train)  # 3
        s6 = conv(256, "conv14_1", p=0, groups=ge)(s5, train)  # 1
        sources = [s1, s2, s3, s4, s5, s6]

        if cfg.use_fuseconv:
            fused_sources = []
            for i, s in enumerate(sources):
                fused_sources.append(
                    conv(s.shape[-1] // cfg.feature_scale, f"fuse_{i + 1}",
                         k=1, p=0)(s, train)
                )
            sources = fused_sources

        return _Heads(cfg, name="heads")(sources)


class FusedSSD(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dt)

        def conv(feats, name, k=3, s=1, p=1, groups=1, relu=True):
            return ConvBNRelu(feats * cfg.feature_scale, kernel=k, stride=s,
                              padding=p, groups=groups, relu=relu,
                              use_bn=cfg.batch_norm, dtype=dt, name=name)

        conv4_3, conv5_3, fc7 = _VGGTrunk(cfg, name="trunk")(x, train)

        # conv4_3 path: 3x3 conv then L2Norm (scale 20)
        f43 = conv(512, "fuse_conv_43", relu=False)(conv4_3, train)
        f43 = L2Norm(scale=20.0, name="l2norm_43")(f43)
        # conv5_3 path: 2x2 stride-2 transposed conv + 3x3 conv, L2Norm
        # (scale 10) — models/ssd_multiphase_custom_fused.py:61-84
        up = nn.ConvTranspose(
            512 * cfg.feature_scale, (2, 2), strides=(2, 2), dtype=dt,
            param_dtype=jnp.float32, kernel_init=xavier_uniform,
            name="fuse_deconv_53",
        )(conv5_3)
        if cfg.batch_norm:
            up = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=jnp.float32,
                              name="bn_fuse_deconv_53")(up).astype(dt)
        f53 = conv(512, "fuse_conv_53", relu=False)(up, train)
        f53 = L2Norm(scale=10.0, name="l2norm_53")(f53)
        s1 = nn.relu(f43 + f53)

        sources = [s1, fc7]
        xx = fc7
        for bi, (c1, c3, stride, pad, kk) in enumerate(EXTRAS[300]):
            xx = conv(c1, f"extra_{bi}_1", k=1, p=0,
                      groups=cfg.groups_extra)(xx, train)
            xx = conv(c3, f"extra_{bi}_3", k=kk, s=stride, p=pad,
                      groups=cfg.groups_extra)(xx, train)
            sources.append(xx)

        return _Heads(cfg, name="heads")(sources)
