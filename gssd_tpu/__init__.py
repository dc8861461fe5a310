"""gssd_tpu — TPU-native (JAX/XLA/Pallas/pjit) focal liver lesion detection.

A ground-up rebuild of the capabilities of L0SG/grouped-ssd-pytorch:
GSSD (MICCAI'18), GSSD++ (IEEE TETCI'21) and PixelLink++ detectors over
4-phase abdominal CT, designed TPU-first:

- NHWC tensors, bfloat16 matmuls on the MXU, grouped convs via
  ``feature_group_count``.
- The whole training step (jaccard matching, OHNM multibox loss, SGD
  update) is a single jitted, static-shape program — no host round trips.
- Inference decode + NMS are static-shape ``lax`` loops on device.
- Data parallelism over a ``jax.sharding.Mesh`` ('data' axis), k-fold
  cross-validation as a vmapped fold axis.
- The deformable-conv phase alignment (reference: external DCNv2 CUDA
  extension, ssd_liverdet/layers/dcn_v2_custom.py) is implemented as an
  XLA gather/matmul formulation plus a Pallas TPU kernel.
"""

__version__ = "0.1.0"

from gssd_tpu import config  # noqa: F401
