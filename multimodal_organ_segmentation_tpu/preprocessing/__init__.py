"""Offline preprocessing: DICOM→NIfTI, SUV, registration, normalization.

Reference parity: src/preprocessing/ (SURVEY.md §2.5). The DICOM codec and
registration are self-contained (no pydicom / SimpleITK): DICOM parsing is
this package's own binary reader; registration is JAX gradient descent on
image-similarity metrics with map_coordinates resampling.
"""

from multimodal_organ_segmentation_tpu.preprocessing.dicom_converter import (  # noqa: F401
    DicomConverter,
)
from multimodal_organ_segmentation_tpu.preprocessing.suv_calculator import (  # noqa: F401
    SUVCalculator,
)
from multimodal_organ_segmentation_tpu.preprocessing.registration import (  # noqa: F401
    ImageRegistration,
)
from multimodal_organ_segmentation_tpu.preprocessing.normalizer import (  # noqa: F401
    IntensityNormalizer,
)
