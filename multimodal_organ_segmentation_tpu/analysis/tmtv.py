"""TMTV / TLG analysis (reference: src/analysis/tmtv.py:14-329).

Threshold semantics preserved exactly:

- tumor region = ``(seg == 0) | (seg > 7)`` (background or unknown);
- absolute: SUV ≥ 2.5 (config analysis.tmtv.absolute_threshold);
- percentage: SUV ≥ 40% of max-in-tumor-region;
- liver-based: SUV ≥ mean + 2σ of label-5 liver voxels;
- TLG = volume_ml × mean SUV over the absolute-threshold mask;
- SUV peak ≈ mean over the 7³ neighborhood of the max voxel;
- binary masks saved per method + CSV/XLSX summary.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Union

import numpy as np

from multimodal_organ_segmentation_tpu.analysis.suv import find_file
from multimodal_organ_segmentation_tpu.utils.io import ensure_dir, save_nifti
from multimodal_organ_segmentation_tpu.utils.nifti import load as nifti_load
from multimodal_organ_segmentation_tpu.utils.xlsx import save_table


def tumor_region_mask(seg: Optional[np.ndarray], like: np.ndarray) -> np.ndarray:
    if seg is None:
        return np.ones_like(like, dtype=bool)
    return (seg == 0) | (seg > 7)


class TMTVAnalyzer:
    """Total Metabolic Tumor Volume via three thresholding methods."""

    def __init__(self, config=None):
        self.config = config
        tm = (config.get("analysis.tmtv", {}) or {}) if config is not None else {}
        self.absolute_threshold = float(tm.get("absolute_threshold", 2.5))
        self.percentage_threshold = float(tm.get("percentage_threshold", 0.4))

    # -- public API -----------------------------------------------------------

    def analyze(self, input_path, output_path) -> Dict[str, Any]:
        import pandas as pd

        input_path = Path(input_path)
        output_path = ensure_dir(output_path)

        suv_file = find_file(input_path, ["*suv*.nii*", "*SUV*.nii*", "*pet*.nii*"])
        seg_file = find_file(input_path, ["*seg*.nii*", "*label*.nii*", "*pred*.nii*"])
        if suv_file is None:
            raise FileNotFoundError("SUV file not found")

        suv_img = nifti_load(suv_file)
        suv = suv_img.get_fdata()
        voxel_volume = float(np.prod(suv_img.header.get_zooms())) / 1000.0

        seg = None
        if seg_file is not None:
            seg = nifti_load(seg_file).get_fdata().astype(np.int32)

        results: Dict[str, Any] = {}
        results["absolute"] = self.tmtv_absolute(suv, seg, voxel_volume)
        save_nifti(
            self.tmtv_mask(suv, seg, "absolute"),
            output_path / "tmtv_absolute.nii.gz",
            affine=suv_img.affine,
            dtype=np.uint8,
        )

        results["percentage"] = self.tmtv_percentage(suv, seg, voxel_volume)
        save_nifti(
            self.tmtv_mask(suv, seg, "percentage"),
            output_path / "tmtv_percentage.nii.gz",
            affine=suv_img.affine,
            dtype=np.uint8,
        )

        if seg is not None:
            results["liver_based"] = self.tmtv_liver_based(suv, seg, voxel_volume)
            save_nifti(
                self.tmtv_mask(suv, seg, "liver"),
                output_path / "tmtv_liver_based.nii.gz",
                affine=suv_img.affine,
                dtype=np.uint8,
            )

        results["tlg"] = self.tlg(suv, seg, voxel_volume)

        df = pd.DataFrame([{"metric": k, **v} for k, v in results.items()])
        save_table(
            df, output_path / "tmtv_analysis.csv", output_path / "tmtv_analysis.xlsx"
        )
        return results

    # -- methods ---------------------------------------------------------------

    def tmtv_absolute(self, suv, seg, voxel_volume) -> Dict[str, float]:
        region = tumor_region_mask(seg, suv)
        mask = (suv >= self.absolute_threshold) & region
        vals = suv[mask]
        if mask.sum() == 0:
            return {
                "volume_ml": 0, "suv_max": 0, "suv_mean": 0,
                "threshold": self.absolute_threshold,
            }
        return {
            "volume_ml": float(mask.sum() * voxel_volume),
            "suv_max": float(np.max(vals)),
            "suv_mean": float(np.mean(vals)),
            "suv_peak": float(self.suv_peak(suv, mask)),
            "num_voxels": int(mask.sum()),
            "threshold": self.absolute_threshold,
        }

    def tmtv_percentage(self, suv, seg, voxel_volume) -> Dict[str, float]:
        region = tumor_region_mask(seg, suv)
        max_suv = float(np.max(suv[region])) if region.any() else float(np.max(suv))
        threshold = max_suv * self.percentage_threshold
        mask = (suv >= threshold) & region
        vals = suv[mask]
        if mask.sum() == 0:
            return {
                "volume_ml": 0, "suv_max": 0, "suv_mean": 0,
                "threshold": threshold, "percentage": self.percentage_threshold,
            }
        return {
            "volume_ml": float(mask.sum() * voxel_volume),
            "suv_max": float(np.max(vals)),
            "suv_mean": float(np.mean(vals)),
            "num_voxels": int(mask.sum()),
            "threshold": float(threshold),
            "percentage": self.percentage_threshold,
        }

    def tmtv_liver_based(self, suv, seg, voxel_volume) -> Dict[str, float]:
        liver = seg == 5
        if liver.sum() == 0:
            return {"volume_ml": 0, "error": "Liver not found in segmentation"}
        liver_vals = suv[liver]
        mean_l, std_l = float(np.mean(liver_vals)), float(np.std(liver_vals))
        threshold = mean_l + 2 * std_l
        region = tumor_region_mask(seg, suv)
        mask = (suv >= threshold) & region
        vals = suv[mask]
        if mask.sum() == 0:
            return {
                "volume_ml": 0, "suv_max": 0, "suv_mean": 0,
                "threshold": threshold, "liver_mean": mean_l, "liver_std": std_l,
            }
        return {
            "volume_ml": float(mask.sum() * voxel_volume),
            "suv_max": float(np.max(vals)),
            "suv_mean": float(np.mean(vals)),
            "num_voxels": int(mask.sum()),
            "threshold": float(threshold),
            "liver_mean": mean_l,
            "liver_std": std_l,
        }

    def tlg(self, suv, seg, voxel_volume) -> Dict[str, float]:
        region = tumor_region_mask(seg, suv)
        mask = (suv >= self.absolute_threshold) & region
        vals = suv[mask]
        if mask.sum() == 0:
            return {"tlg": 0, "volume_ml": 0, "mean_suv": 0}
        volume_ml = float(mask.sum() * voxel_volume)
        mean_suv = float(np.mean(vals))
        return {"tlg": volume_ml * mean_suv, "volume_ml": volume_ml, "mean_suv": mean_suv}

    def suv_peak(self, suv, mask, neighborhood: int = 3) -> float:
        """Mean over the (2n+1)³ neighborhood of the masked max voxel."""
        masked = np.where(mask, suv, -np.inf)
        idx = np.unravel_index(np.argmax(masked), suv.shape)
        slices = tuple(
            slice(max(0, i - neighborhood), min(s, i + neighborhood + 1))
            for i, s in zip(idx, suv.shape)
        )
        return float(np.mean(suv[slices]))

    def tmtv_mask(self, suv, seg, method: str = "absolute") -> np.ndarray:
        region = tumor_region_mask(seg, suv)
        if method == "absolute":
            threshold = self.absolute_threshold
        elif method == "percentage":
            mx = float(np.max(suv[region])) if region.any() else float(np.max(suv))
            threshold = mx * self.percentage_threshold
        elif method == "liver" and seg is not None:
            liver = seg == 5
            if liver.sum() > 0:
                vals = suv[liver]
                threshold = float(np.mean(vals) + 2 * np.std(vals))
            else:
                threshold = self.absolute_threshold
        else:
            threshold = self.absolute_threshold
        return ((suv >= threshold) & region).astype(np.uint8)
