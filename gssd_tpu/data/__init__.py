from gssd_tpu.data.splitter import DataSplitter  # noqa: F401
from gssd_tpu.data.dataset import LesionDataset, pad_targets  # noqa: F401
from gssd_tpu.data.transforms import BaseTransform  # noqa: F401
from gssd_tpu.data.voc import VOCDataset, VOC_CLASSES  # noqa: F401
