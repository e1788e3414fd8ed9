"""Clinical analysis tail: SUV, TMTV/TLG, histograms, reports.

Reference parity: src/analysis/ (SURVEY.md §2.6) — thresholding semantics
preserved exactly, including the ``(seg==0)|(seg>7)`` tumor region and the
label-5 liver rule.
"""

from multimodal_organ_segmentation_tpu.analysis.suv import SUVAnalyzer  # noqa: F401
from multimodal_organ_segmentation_tpu.analysis.tmtv import TMTVAnalyzer  # noqa: F401
from multimodal_organ_segmentation_tpu.analysis.histogram import (  # noqa: F401
    HistogramAnalyzer,
)
from multimodal_organ_segmentation_tpu.analysis.report import (  # noqa: F401
    ReportGenerator,
)

ORGAN_LABELS = {
    1: "bladder",
    2: "kidney_right",
    3: "kidney_left",
    4: "heart",
    5: "liver",
    6: "spleen",
    7: "brain",
}
