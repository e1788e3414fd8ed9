"""Device-side ops: resize, sliding-window inference, attention kernels, EDT.

These replace the native capabilities the reference imports (SURVEY.md §2.9):
scipy ``zoom`` → MXU matmul resize; MONAI ``sliding_window_inference`` → one
XLA program; torch attention → Pallas/XLA blockwise attention; scipy EDT →
native C++ Felzenszwalb kernel.
"""

from multimodal_organ_segmentation_tpu.ops.resize import (  # noqa: F401
    resize_linear,
    resize_nearest,
    resize_volume,
)
from multimodal_organ_segmentation_tpu.ops.sliding_window import (  # noqa: F401
    sliding_window_inference,
)
