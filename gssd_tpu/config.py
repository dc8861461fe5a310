"""Configuration tree for the gssd_tpu framework.

Replaces the reference's three config mechanisms (argparse flags in
train_lesion_multiphase_v2.py:31-113, anchor dicts in data/config.py:19-157,
module constants in pixel_link/pixel_link_config.py) with one dataclass
tree, while preserving the reference flag names as the public surface.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple


# ---------------------------------------------------------------------------
# Anchor (prior box) configurations.
# Values mirror ssd_liverdet/data/config.py:19-157 — these are the public
# anchor-grid contracts of the reference ('v2' is the one actually used by
# the models: ssd_multiphase_custom_group.py:48).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AnchorConfig:
    name: str
    feature_maps: Tuple[int, ...]
    min_dim: int
    steps: Tuple[int, ...]
    min_sizes: Tuple[int, ...]
    max_sizes: Tuple[int, ...]
    aspect_ratios: Tuple[Tuple[float, ...], ...]
    variance: Tuple[float, float] = (0.1, 0.2)
    clip: bool = True

    @property
    def num_priors_per_cell(self) -> Tuple[int, ...]:
        """Boxes per feature-map cell per scale (the reference 'mbox')."""
        if self.name == "v1":
            # legacy v1 branch (prior_box.py:141-167): min square,
            # sqrt(min*max) square only when max > 0, one box per ar != 1
            return tuple(
                1 + (1 if mx > 0 else 0)
                + sum(1 for ar in ars if abs(ar - 1) >= 1e-6)
                for ars, mx in zip(self.aspect_ratios, self.max_sizes)
            )
        return tuple(2 + 2 * len(ars) for ars in self.aspect_ratios)

    @property
    def num_priors(self) -> int:
        return sum(
            f * f * n
            for f, n in zip(self.feature_maps, self.num_priors_per_cell)
        )


V2 = AnchorConfig(
    name="v2",
    feature_maps=(38, 19, 10, 5, 3, 1),
    min_dim=300,
    steps=(8, 16, 32, 64, 100, 300),
    min_sizes=(30, 60, 111, 162, 213, 264),
    max_sizes=(60, 111, 162, 213, 264, 315),
    aspect_ratios=((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
)

V2_CUSTOM = AnchorConfig(
    name="v2_custom",
    feature_maps=(38, 19, 10, 5, 3, 1),
    min_dim=300,
    steps=(8, 16, 32, 64, 100, 300),
    min_sizes=(30, 60, 111, 162, 213, 264),
    max_sizes=(60, 111, 162, 213, 264, 315),
    aspect_ratios=((2, 3), (2, 3), (2, 3), (2, 3), (2,), (2,)),
)

V2_CUSTOM_SQUAREONLY = dataclasses.replace(
    V2_CUSTOM, name="v2_custom_squareonly", aspect_ratios=V2.aspect_ratios
)

V2_512 = AnchorConfig(
    name="v2_512",
    feature_maps=(64, 32, 16, 8, 4, 2, 1),
    min_dim=512,
    steps=(8, 16, 32, 64, 128, 256, 512),
    min_sizes=(20, 51, 133, 215, 296, 378, 460),
    max_sizes=(51, 133, 215, 296, 378, 460, 542),
    aspect_ratios=((2,), (2, 3), (2, 3), (2, 3), (2, 3), (2,), (2,)),
)

V2_CUSTOM_512 = dataclasses.replace(
    V2_512,
    name="v2_custom_512",
    aspect_ratios=((2, 3), (2, 3), (2, 3), (2, 3), (2, 3), (2,), (2,)),
)

V1 = AnchorConfig(
    name="v1",
    feature_maps=(38, 19, 10, 5, 3, 1),
    min_dim=300,
    steps=(8, 16, 32, 64, 100, 300),
    min_sizes=(30, 60, 114, 168, 222, 276),
    max_sizes=(-1, 114, 168, 222, 276, 330),
    aspect_ratios=(
        (1, 1, 2, 1 / 2),
        (1, 1, 2, 1 / 2, 3, 1 / 3),
        (1, 1, 2, 1 / 2, 3, 1 / 3),
        (1, 1, 2, 1 / 2, 3, 1 / 3),
        (1, 1, 2, 1 / 2, 3, 1 / 3),
        (1, 1, 2, 1 / 2, 3, 1 / 3),
    ),
)

ANCHOR_CONFIGS = {
    c.name: c
    for c in (V2, V2_CUSTOM, V2_CUSTOM_SQUAREONLY, V2_512, V2_CUSTOM_512, V1)
}


# ---------------------------------------------------------------------------
# Model configuration (reference: build_ssd kwargs,
# ssd_multiphase_custom_group.py:542-557 + trainer flags v2.py:31-113).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    # 'ssd' = no grouping (ssd_multiphase.py), 'gssd' = grouped+fuse
    # (ssd_multiphase_custom_group.py); fssd/fusedssd variants keep the
    # reference --ssd_type names.
    ssd_type: str = "gssd"
    size: int = 300
    num_classes: int = 2  # background + lesion
    num_phases: int = 4
    slices_per_phase: int = 3  # 3 adjacent axial slices per phase
    batch_norm: bool = True
    groups_vgg: int = 4
    groups_extra: int = 4
    feature_scale: int = 1
    use_fuseconv: bool = True
    use_self_attention: bool = False
    use_self_attention_base: bool = False
    num_dcn_layers: int = 0
    groups_dcn: int = 1
    dcn_cat_sab: bool = False
    detach_sab: bool = False
    max_pool_factor: int = 1
    # rematerialize (jax.checkpoint) the self-attention blocks in the
    # backward pass. The reference only checkpoints PixelLink attention
    # (pixel_link/model.py:203), so this is off by default for SSD and
    # exposed as a memory/compute trade-off flag.
    remat_attention: bool = False
    anchors: str = "v2"
    # compute dtype for conv/matmul activations; params stay f32
    compute_dtype: str = "bfloat16"
    # deformable-conv core: 'hat' (default; single-dispatch hat-matrix
    # Pallas kernel — all 9 taps in one forward, one merged backward,
    # H*W-deep MXU contractions, no gather/scatter), 'fused'
    # (patch-gather fwd + analytic offset grads + Pallas matmul dx),
    # 'xla' (4-corner gather, exact f32 grads — the parity reference),
    # or 'pallas' (per-tap bilinear-sample kernel, historical)
    dcn_impl: str = "hat"

    def __post_init__(self):
        if self.detach_sab and not self.dcn_cat_sab:
            raise ValueError("detach_sab requires dcn_cat_sab=True")
        if self.dcn_cat_sab and not self.use_self_attention_base:
            raise ValueError("dcn_cat_sab requires use_self_attention_base=True")
        if self.dcn_cat_sab and self.num_dcn_layers <= 0:
            # the slice_and_cat concat exists only to feed the DCN
            # (group model :267-271); without a DCN it would silently
            # build a 768-ch map the reference never has
            raise ValueError("dcn_cat_sab requires num_dcn_layers > 0")

    @property
    def in_channels(self) -> int:
        return self.num_phases * self.slices_per_phase  # 12

    @property
    def anchor_config(self) -> AnchorConfig:
        return ANCHOR_CONFIGS[self.anchors]


@dataclass(frozen=True)
class LossConfig:
    """Reference: MultiBoxLoss ctor args (train v2.py:639)."""

    num_classes: int = 2
    overlap_thresh: float = 0.5
    neg_pos_ratio: int = 3  # --ohnm_neg_ratio
    variance: Tuple[float, float] = (0.1, 0.2)
    max_gt_boxes: int = 16  # static padding of variable-length targets


@dataclass(frozen=True)
class DetectConfig:
    """Reference: Detect.apply(num_classes, 0, 200, 0.01, 0.45, ...)
    (ssd_multiphase_custom_group.py:384-390)."""

    num_classes: int = 2
    background_label: int = 0
    top_k: int = 200
    conf_thresh: float = 0.01
    nms_thresh: float = 0.45
    variance: Tuple[float, float] = (0.1, 0.2)


@dataclass(frozen=True)
class OptimConfig:
    """Reference: SGD + manual step LR (train v2.py:174-177, 434-441)."""

    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    gamma: float = 0.1
    stepvalues: Tuple[int, ...] = (30000, 50000)
    clip: Optional[float] = None  # grad-norm clip (reference --clip)
    modify_dcn_lr: bool = False  # x0.1 LR for DCN params (v2.py:603-622)


@dataclass(frozen=True)
class DataConfig:
    datapath: str = ""
    means: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    use_normalize: bool = True
    p_only: bool = False  # portal-phase-only (repeat portal x4)
    gt_pixel_jitter: float = 0.01
    expand_ratio: float = 1.5
    num_test_subjects: int = 10
    cross_validation: int = 5
    batch_size: int = 32
    load_data_to_ram: bool = False
    num_workers: int = 4


@dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    detect: DetectConfig = field(default_factory=DetectConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)
    max_iter: int = 60000
    val_every: int = 2500
    speedrun: int = 0
    seed: int = 1111
    save_folder: str = "output/checkpoints"
    model_name: str = "gssd"
    # eval sweep (reference --ap_list/--iobb_list/--confidence_threshold)
    ap_list: Tuple[float, ...] = (0.3, 0.5, 0.7)
    iobb_list: Tuple[float, ...] = (0.3, 0.5, 0.7)
    confidence_threshold: float = 0.2
    use_07_metric: bool = False


@dataclass(frozen=True)
class PixelLinkConfig:
    """Reference: pixel_link/pixel_link_config.py module constants."""

    version: str = "4s"  # '2s' or '4s' (reference default: pixel_link_config.py:2)
    pixel_weight: float = 2.0
    link_weight: float = 1.0
    neg_pos_ratio: int = 3
    min_area: int = 3
    min_height: int = 1
    pixel_conf_threshold: float = 0.2
    link_conf_threshold: float = 0.8
    vgg_groups: int = 4
    feature_scale: int = 1
    dilation: bool = True
    use_fuseconv: bool = True
    use_self_attention: bool = False
    use_self_attention_base: bool = False
    num_dcn_layers: int = 0
    groups_dcn: int = 1
    dcn_cat_sab: bool = False
    detach_sab: bool = False
    max_pool_factor: int = 1
    # reference wraps every PixelLink Self_Attn call in
    # torch.utils.checkpoint (pixel_link/model.py:203,216,...,296):
    # rematerialized by default here too
    remat_attention: bool = True

    def __post_init__(self):
        # same hazards ModelConfig guards against (ADVICE r1)
        if self.detach_sab and not self.dcn_cat_sab:
            raise ValueError("detach_sab requires dcn_cat_sab=True")
        if self.dcn_cat_sab and not self.use_self_attention_base:
            raise ValueError(
                "dcn_cat_sab requires use_self_attention_base=True")
        if self.dcn_cat_sab and self.num_dcn_layers <= 0:
            raise ValueError("dcn_cat_sab requires num_dcn_layers > 0")

    @property
    def scale_factor(self) -> int:
        return 2 if self.version == "2s" else 4
