"""Native (C++) host-side components.

The reference's only native code is the external DCNv2 CUDA extension
(SURVEY.md §2.1) — on TPU that lives in Pallas/XLA. The host-side
runtime pieces that are sequential/algorithmic (PixelLink union-find
component grouping, greedy eval matching) are implemented here in C++
with ctypes bindings, built on demand with g++ and cached; every entry
point has a numpy fallback so the framework degrades gracefully without
a toolchain.
"""

from gssd_tpu.native.build import load_native  # noqa: F401
