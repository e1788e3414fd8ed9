"""Histogram analysis figures (reference: src/analysis/histogram.py:14-339).

Figure families preserved: per-organ SUV histograms in a 2×4 grid with
mean/median lines; combined density histogram; threshold-vs-volume curves
(relative %-of-max over 50 steps and absolute SUV 0–20); per-organ CDFs;
fixed per-organ color palette (histogram.py:29-37).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from multimodal_organ_segmentation_tpu.analysis.suv import find_file
from multimodal_organ_segmentation_tpu.utils.io import ensure_dir
from multimodal_organ_segmentation_tpu.utils.nifti import load as nifti_load

ORGAN_LABELS = {
    1: "bladder",
    2: "kidney_right",
    3: "kidney_left",
    4: "heart",
    5: "liver",
    6: "spleen",
    7: "brain",
}

ORGAN_COLORS = {
    "bladder": "#1f77b4",
    "kidney_right": "#ff7f0e",
    "kidney_left": "#2ca02c",
    "heart": "#d62728",
    "liver": "#9467bd",
    "spleen": "#8c564b",
    "brain": "#e377c2",
}


class HistogramAnalyzer:
    """SUV distribution figures per organ."""

    def __init__(self, config=None):
        self.config = config
        hist_cfg = (config.get("analysis.histogram", {}) or {}) if config is not None else {}
        self.bins = int(hist_cfg.get("bins", 100))

    def analyze(self, input_path, output_path) -> Dict[str, Any]:
        input_path = Path(input_path)
        output_path = ensure_dir(output_path)

        suv_file = find_file(input_path, ["*suv*.nii*", "*SUV*.nii*", "*pet*.nii*"])
        seg_file = find_file(input_path, ["*seg*.nii*", "*label*.nii*", "*pred*.nii*"])
        if suv_file is None or seg_file is None:
            raise FileNotFoundError("SUV or segmentation file not found")

        suv = nifti_load(suv_file).get_fdata()
        seg = nifti_load(seg_file).get_fdata().astype(np.int32)

        organ_values = {
            name: suv[seg == lid]
            for lid, name in ORGAN_LABELS.items()
            if (seg == lid).sum() > 0
        }

        written: List[str] = []
        written.append(self.plot_organ_histograms(organ_values, output_path))
        written.append(self.plot_combined_histogram(organ_values, output_path))
        written.append(self.plot_threshold_curves(organ_values, output_path))
        written.append(self.plot_cdf(organ_values, output_path))

        return {"figures": [w for w in written if w], "organs": list(organ_values)}

    # -- figures -----------------------------------------------------------

    def plot_organ_histograms(self, organ_values, output_path) -> str:
        fig, axes = plt.subplots(2, 4, figsize=(18, 8))
        axes = axes.ravel()
        for ax, (organ, vals) in zip(axes, organ_values.items()):
            color = ORGAN_COLORS.get(organ, "gray")
            ax.hist(vals, bins=self.bins, color=color, alpha=0.7)
            ax.axvline(np.mean(vals), color="red", linestyle="--", label="mean")
            ax.axvline(np.median(vals), color="black", linestyle=":", label="median")
            ax.set_title(organ)
            ax.set_xlabel("SUV")
            ax.legend(fontsize=7)
        for ax in axes[len(organ_values):]:
            ax.axis("off")
        fig.tight_layout()
        out = str(Path(output_path) / "organ_histograms.png")
        fig.savefig(out, dpi=100)
        plt.close(fig)
        return out

    def plot_combined_histogram(self, organ_values, output_path) -> str:
        fig, ax = plt.subplots(figsize=(10, 6))
        for organ, vals in organ_values.items():
            ax.hist(
                vals, bins=self.bins, density=True, histtype="step",
                label=organ, color=ORGAN_COLORS.get(organ, "gray"),
            )
        ax.set_xlabel("SUV")
        ax.set_ylabel("density")
        ax.legend()
        fig.tight_layout()
        out = str(Path(output_path) / "combined_histogram.png")
        fig.savefig(out, dpi=100)
        plt.close(fig)
        return out

    def plot_threshold_curves(self, organ_values, output_path) -> str:
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 6))
        rel = np.linspace(0, 1, 50)
        for organ, vals in organ_values.items():
            color = ORGAN_COLORS.get(organ, "gray")
            mx = np.max(vals) if len(vals) else 1.0
            vol_rel = [(vals >= mx * t).sum() for t in rel]
            ax1.plot(rel * 100, vol_rel, label=organ, color=color)
            abs_t = np.linspace(0, 20, 50)
            vol_abs = [(vals >= t).sum() for t in abs_t]
            ax2.plot(abs_t, vol_abs, label=organ, color=color)
        ax1.set_xlabel("threshold (% of max)")
        ax1.set_ylabel("volume (voxels)")
        ax1.set_title("relative threshold vs volume")
        ax2.set_xlabel("SUV threshold")
        ax2.set_title("absolute threshold vs volume")
        ax1.legend(fontsize=7)
        fig.tight_layout()
        out = str(Path(output_path) / "threshold_curves.png")
        fig.savefig(out, dpi=100)
        plt.close(fig)
        return out

    def plot_cdf(self, organ_values, output_path) -> str:
        fig, ax = plt.subplots(figsize=(10, 6))
        for organ, vals in organ_values.items():
            v = np.sort(vals)
            cdf = np.arange(1, len(v) + 1) / len(v)
            ax.plot(v, cdf, label=organ, color=ORGAN_COLORS.get(organ, "gray"))
        ax.set_xlabel("SUV")
        ax.set_ylabel("CDF")
        ax.legend(fontsize=8)
        fig.tight_layout()
        out = str(Path(output_path) / "organ_cdf.png")
        fig.savefig(out, dpi=100)
        plt.close(fig)
        return out
