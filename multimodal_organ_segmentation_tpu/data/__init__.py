"""Data layer: CSV-driven multimodal dataset, jit transform graph, loader.

Reference parity: src/data/ (SURVEY.md §2.2), rebuilt with device-side
jit-compiled transforms and host-side threaded prefetch.
"""

from multimodal_organ_segmentation_tpu.data.dataset import (  # noqa: F401
    MultiModalDataset,
    InferenceDataset,
    get_dataset,
)
from multimodal_organ_segmentation_tpu.data.transforms import (  # noqa: F401
    get_transforms,
    TransformPipeline,
)
from multimodal_organ_segmentation_tpu.data.dataloader import (  # noqa: F401
    DataLoader,
    get_dataloader,
)
from multimodal_organ_segmentation_tpu.data.synthetic import (  # noqa: F401
    generate_synthetic_dataset,
    synthetic_volume,
)
