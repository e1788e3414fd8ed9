"""Per-organ SUV analysis (reference: src/analysis/suv.py:14-185).

Semantics preserved: hardcoded 7-organ label map (suv.py:20-28), per-organ
max/mean/std/median/min + volume (ml via header zooms), iso-contour volumes
at 40/50/60% of organ max (suv.py:100-103), glob-based file discovery,
CSV + XLSX export, and ``analyze_tumor`` (SUV ≥ τ outside any organ mask).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import numpy as np

from multimodal_organ_segmentation_tpu.utils.io import ensure_dir
from multimodal_organ_segmentation_tpu.utils.nifti import load as nifti_load
from multimodal_organ_segmentation_tpu.utils.xlsx import save_table


def find_file(directory: Path, patterns: List[str]) -> Optional[Path]:
    """First match over glob patterns, then recursive (suv.py:169-185)."""
    directory = Path(directory)
    for pattern in patterns:
        matches = sorted(directory.glob(pattern))
        if matches:
            return matches[0]
        matches = sorted(directory.rglob(pattern))
        if matches:
            return matches[0]
    return None


class SUVAnalyzer:
    """Organ-level SUV statistics over a predicted segmentation."""

    ORGAN_LABELS = {
        1: "bladder",
        2: "kidney_right",
        3: "kidney_left",
        4: "heart",
        5: "liver",
        6: "spleen",
        7: "brain",
    }

    def __init__(self, config=None):
        self.config = config

    def analyze(self, input_path, output_path) -> Dict[str, Any]:
        import pandas as pd

        input_path = Path(input_path)
        output_path = ensure_dir(output_path)

        suv_file = find_file(input_path, ["*suv*.nii*", "*SUV*.nii*"])
        seg_file = find_file(input_path, ["*seg*.nii*", "*label*.nii*", "*pred*.nii*"])
        if suv_file is None or seg_file is None:
            raise FileNotFoundError("SUV or segmentation file not found")

        suv_img = nifti_load(suv_file)
        suv = suv_img.get_fdata()
        seg = nifti_load(seg_file).get_fdata().astype(np.int32)
        voxel_volume = float(np.prod(suv_img.header.get_zooms())) / 1000.0  # ml

        results = []
        for label_id, organ in self.ORGAN_LABELS.items():
            mask = seg == label_id
            if mask.sum() == 0:
                continue
            vals = suv[mask]
            stats = {
                "organ": organ,
                "label_id": label_id,
                "suv_max": float(np.max(vals)),
                "suv_mean": float(np.mean(vals)),
                "suv_std": float(np.std(vals)),
                "suv_median": float(np.median(vals)),
                "suv_min": float(np.min(vals)),
                "volume_ml": float(mask.sum() * voxel_volume),
                "volume_voxels": int(mask.sum()),
            }
            mx = stats["suv_max"]
            for pct in (40, 50, 60):
                stats[f"suv_{pct}_volume"] = float(
                    (vals >= mx * pct / 100).sum() * voxel_volume
                )
            results.append(stats)

        df = pd.DataFrame(results)
        save_table(
            df, output_path / "suv_analysis.csv", output_path / "suv_analysis.xlsx"
        )

        return {
            "organs": results,
            "summary": {
                "num_organs_analyzed": len(results),
                "total_volume_ml": sum(r["volume_ml"] for r in results),
            },
        }

    def analyze_tumor(
        self, suv_path, seg_path, threshold: float = 2.5
    ) -> Dict[str, Any]:
        """Tumor candidates: SUV ≥ τ outside all organ labels (suv.py:122-167)."""
        suv_img = nifti_load(suv_path)
        suv = suv_img.get_fdata()
        seg = nifti_load(seg_path).get_fdata().astype(np.int32)
        voxel_volume = float(np.prod(suv_img.header.get_zooms())) / 1000.0

        organ_mask = seg > 0
        candidates = (suv >= threshold) & ~organ_mask
        if candidates.sum() == 0:
            return {"num_lesions": 0, "total_volume_ml": 0, "max_suv": 0}

        vals = suv[candidates]
        return {
            "num_voxels": int(candidates.sum()),
            "volume_ml": float(candidates.sum() * voxel_volume),
            "suv_max": float(np.max(vals)),
            "suv_mean": float(np.mean(vals)),
            "suv_median": float(np.median(vals)),
            "threshold_used": threshold,
        }
