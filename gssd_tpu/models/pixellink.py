"""PixelLink++ segmentation-style detector (flax, NHWC).

Reference: pixel_link/model.py — explicit grouped VGG16 trunk
(conv1_1..conv7, ceil-mode pools), per-scale pixel (2ch) and link
(16ch) 1x1 heads, top-down bilinear (align_corners) accumulation to the
2s/4s resolution, optional cascade_fuse (concat of every upsampled
partial sum through a final 1x1, :306-356), plus the same GSSD++
submodules: fuse convs (+BN, no relu here), self-attention (source and
base, gradient-checkpointed in the reference via torch.utils.checkpoint
:203 -> jax.checkpoint/nn.remat here), and DCN phase alignment at
conv2_2 ('2s') or conv3_3 ('4s') with optional slice_and_cat of the
base-attention map.

Outputs NHWC: pixel logits [B, S, S, 2], link logits [B, S, S, 16]
where S = size // (2 if '2s' else 4).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gssd_tpu.config import PixelLinkConfig
from gssd_tpu.ops.deform_conv import DCN
from gssd_tpu.ops.layers import (
    ConvBNRelu,
    SelfAttention,
    max_pool,
    xavier_uniform,
)
from gssd_tpu.models.ssd import slice_and_cat


def upsample_bilinear_ac(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """NHWC bilinear resize with torch align_corners=True semantics,
    expressed as two small interpolation matmuls (static shapes)."""
    def mat(n: int, o: int) -> np.ndarray:
        m = np.zeros((o, n), np.float32)
        if o == 1 or n == 1:
            m[:, 0] = 1.0
            return m
        pos = np.arange(o) * (n - 1) / (o - 1)
        i0 = np.floor(pos).astype(int)
        i1 = np.minimum(i0 + 1, n - 1)
        frac = (pos - i0).astype(np.float32)
        m[np.arange(o), i0] += 1 - frac
        m[np.arange(o), i1] += frac
        return m

    h, w = x.shape[1], x.shape[2]
    if h == oh and w == ow:
        return x
    mh = jnp.asarray(mat(h, oh), x.dtype)
    mw = jnp.asarray(mat(w, ow), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, x)


class PixelLink(nn.Module):
    cfg: PixelLinkConfig
    cascade_fuse: bool = False
    batch_norm: bool = True
    dtype: Any = jnp.bfloat16
    dcn_impl: str = "hat"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        fs = cfg.feature_scale
        dt = self.dtype
        two_s = cfg.version == "2s"
        x = x.astype(dt)

        def conv(feats, name, k=3, p=1, d=1, groups=cfg.vgg_groups,
                 bn=False, relu=True):
            return ConvBNRelu(
                int(feats * fs), kernel=k, padding=p, dilation=d,
                groups=groups, use_bn=bn, relu=relu, dtype=dt, name=name,
            )

        def head(name, ch):
            return nn.Conv(ch, (1, 1), dtype=dt, param_dtype=jnp.float32,
                           kernel_init=xavier_uniform, name=name)

        def attn(kind, idx):
            # the reference wraps these in torch.utils.checkpoint
            # (pixel_link/model.py:203,...,296); nn.remat is the XLA
            # analog — activations recomputed in backward
            # (static_argnums entry = the `train` bool)
            mod = (nn.remat(SelfAttention, static_argnums=(2,))
                   if cfg.remat_attention else SelfAttention)
            return mod(
                max_pool_factor=cfg.max_pool_factor, dtype=dt,
                name=f"{kind}_{idx}",
            )

        aux: Dict[str, List] = {"offsets": [], "attn": [], "attn_base": []}
        sa_i = 0
        sab_i = 0
        sources: List[jnp.ndarray] = []

        def apply_dcn(x, attn_g, channels):
            if cfg.dcn_cat_sab:
                sab = (
                    jax.lax.stop_gradient(attn_g) if cfg.detach_sab else attn_g
                )
                x = slice_and_cat(x, sab, cfg.vgg_groups)
            for i in range(cfg.num_dcn_layers):
                x, offs = DCN(
                    features=int(channels * fs),
                    deformable_groups=cfg.groups_dcn,
                    dtype=dt, impl=self.dcn_impl, name=f"dcn_{i}",
                )(x)
                aux["offsets"].append(offs)
            return x

        def source_block(x, channels, idx):
            """attention (source) + fuse conv (+BN, no relu) + heads."""
            nonlocal sa_i
            s = x
            if cfg.use_self_attention:
                s, _, a = attn("attn", sa_i)(s, train)
                aux["attn"].append(a)
                sa_i += 1
            if cfg.use_fuseconv:
                s = nn.Conv(int(channels * fs), (1, 1), dtype=dt,
                            param_dtype=jnp.float32,
                            kernel_init=xavier_uniform,
                            name=f"fuse_{idx}")(s)
                if self.batch_norm:
                    s = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32,
                        name=f"bn_fuse_{idx}",
                    )(s).astype(dt)
            pix = head(f"out{idx}_1", 2)(s)
            lnk = head(f"out{idx}_2", 16)(s)
            return pix, lnk

        def base_attn(x):
            nonlocal sab_i
            attn_g = None
            if cfg.use_self_attention_base:
                x, attn_g, a = attn("attn_base", sab_i)(x, train)
                aux["attn_base"].append(a)
                sab_i += 1
            return x, attn_g

        heads: List[Tuple[jnp.ndarray, jnp.ndarray]] = []

        # conv1_x
        x = conv(64, "conv1_1")(x, train)
        x = conv(64, "conv1_2")(x, train)
        x = max_pool(x, 2, 2, ceil_mode=True)
        # conv2_x
        x = conv(128, "conv2_1")(x, train)
        x = conv(128, "conv2_2")(x, train)
        if two_s:
            x, attn_g = base_attn(x)
            if cfg.num_dcn_layers > 0:
                x = apply_dcn(x, attn_g, 128)
            heads.append(source_block(x, 128, 1))
        x = max_pool(x, 2, 2, ceil_mode=True)
        # conv3_x
        x = conv(256, "conv3_1")(x, train)
        x = conv(256, "conv3_2")(x, train)
        x = conv(256, "conv3_3")(x, train)
        x, attn_g = base_attn(x)
        if not two_s and cfg.num_dcn_layers > 0:
            x = apply_dcn(x, attn_g, 256)
        heads.append(source_block(x, 256, 2))
        x = max_pool(x, 2, 2, ceil_mode=True)
        # conv4_x
        x = conv(512, "conv4_1")(x, train)
        x = conv(512, "conv4_2")(x, train)
        x = conv(512, "conv4_3")(x, train)
        x, _ = base_attn(x)
        heads.append(source_block(x, 512, 3))
        x = max_pool(x, 2, 2, ceil_mode=True)
        # conv5_x + fc6/fc7
        x = conv(512, "conv5_1")(x, train)
        x = conv(512, "conv5_2")(x, train)
        x = conv(512, "conv5_3")(x, train)
        x, _ = base_attn(x)
        heads.append(source_block(x, 512, 4))
        x = max_pool(x, 3, 1, padding=1)
        x = conv(1024, "conv6", p=6 if cfg.dilation else 1,
                 d=6 if cfg.dilation else 1)(x, train)
        x = conv(1024, "conv7", k=1, p=0)(x, train)
        x, _ = base_attn(x)
        heads.append(source_block(x, 1024, 5))

        # ---- top-down accumulation. Head resolutions (fine -> coarse):
        # 4s: [conv3_3 (s/4), conv4_3 (s/8), conv5_3 (s/16), fc7 (s/16)];
        # 2s prepends conv2_2 (s/2).
        pix_maps = [h[0] for h in heads]
        lnk_maps = [h[1] for h in heads]

        def topdown(maps):
            c = maps[::-1]  # coarse -> fine: fc7, conv5_3, conv4_3, ...
            partials = []
            acc = c[0] + c[1]  # fc7 + conv5_3 share resolution
            partials.append(c[0])
            partials.append(acc)
            for m in c[2:]:
                acc = upsample_bilinear_ac(acc, m.shape[1], m.shape[2]) + m
                partials.append(acc)
            return acc, partials

        out_pix, part_pix = topdown(pix_maps)
        out_lnk, part_lnk = topdown(lnk_maps)

        if self.cascade_fuse:
            def fuse_final(acc, partials, ch, name):
                feats = [
                    upsample_bilinear_ac(p, acc.shape[1], acc.shape[2])
                    for p in partials
                ]
                cat = jnp.concatenate(feats, axis=-1)
                return nn.Conv(ch, (1, 1), dtype=dt,
                               param_dtype=jnp.float32,
                               kernel_init=xavier_uniform, name=name)(cat)

            out_pix = fuse_final(out_pix, part_pix, 2, "final_1")
            out_lnk = fuse_final(out_lnk, part_lnk, 16, "final_2")
        else:
            out_pix = nn.Conv(2, (1, 1), dtype=dt, param_dtype=jnp.float32,
                              kernel_init=xavier_uniform,
                              name="final_1")(out_pix)
            out_lnk = nn.Conv(16, (1, 1), dtype=dt, param_dtype=jnp.float32,
                              kernel_init=xavier_uniform,
                              name="final_2")(out_lnk)

        out = {
            "pixel": out_pix.astype(jnp.float32),
            "link": out_lnk.astype(jnp.float32),
        }
        for key, v in aux.items():
            if v:
                out[key] = v
        return out


def build_pixellink(cfg: PixelLinkConfig, cascade_fuse: bool = False,
                    batch_norm: bool = True, compute_dtype: str = "bfloat16",
                    dcn_impl: str = "hat") -> PixelLink:
    return PixelLink(cfg, cascade_fuse=cascade_fuse, batch_norm=batch_norm,
                     dtype=jnp.dtype(compute_dtype), dcn_impl=dcn_impl)
