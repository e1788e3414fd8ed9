"""Utility layer: config, logging, PRNG, IO, visualization.

Mirrors the reference's ``src/utils`` surface (SURVEY.md §2.8) with a
JAX-first PRNG design (explicit key threading instead of global seeds).
"""

from multimodal_organ_segmentation_tpu.utils.config import (  # noqa: F401
    ConfigNode,
    load_config,
    save_config,
    default_config,
    merge_config_with_args,
)
from multimodal_organ_segmentation_tpu.utils.logger import setup_logger, get_logger  # noqa: F401
from multimodal_organ_segmentation_tpu.utils.prng import set_seed, KeyStream  # noqa: F401
from multimodal_organ_segmentation_tpu.utils.io import (  # noqa: F401
    load_nifti,
    save_nifti,
    load_json,
    save_json,
    ensure_dir,
    get_file_list,
)
