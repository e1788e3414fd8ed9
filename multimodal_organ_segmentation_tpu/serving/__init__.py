"""Resident HTTP serving for the segmentation engine."""

from multimodal_organ_segmentation_tpu.serving.server import (
    InferenceService,
    RequestError,
    ServiceBusyError,
    make_server,
    run_serve,
)

__all__ = [
    "InferenceService",
    "RequestError",
    "ServiceBusyError",
    "make_server",
    "run_serve",
]
