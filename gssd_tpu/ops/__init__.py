from gssd_tpu.ops.boxes import (  # noqa: F401
    point_form,
    center_size,
    intersect,
    iou,
    iobb,
    encode,
    decode,
)
from gssd_tpu.ops.anchors import make_anchors  # noqa: F401
from gssd_tpu.ops.matcher import match  # noqa: F401
from gssd_tpu.ops.nms import nms, detect  # noqa: F401
from gssd_tpu.ops.losses import multibox_loss  # noqa: F401
