"""Analysis layer tests: SUV stats, TMTV/TLG thresholds, histograms, reports."""

import zipfile
from pathlib import Path

import numpy as np
import pytest

from multimodal_organ_segmentation_tpu.analysis import (
    HistogramAnalyzer,
    ReportGenerator,
    SUVAnalyzer,
    TMTVAnalyzer,
)
from multimodal_organ_segmentation_tpu.utils.config import ConfigNode
from multimodal_organ_segmentation_tpu.utils.io import load_nifti, save_nifti
from multimodal_organ_segmentation_tpu.utils.xlsx import write_xlsx


@pytest.fixture
def analysis_case(tmp_path):
    """SUV volume + segmentation with liver (5), heart (4), and hot tumor."""
    rng = np.random.default_rng(0)
    shape = (24, 24, 24)
    suv = rng.uniform(0.2, 0.8, shape).astype(np.float32)  # background
    seg = np.zeros(shape, dtype=np.uint8)

    seg[2:8, 2:8, 2:8] = 5          # liver
    suv[2:8, 2:8, 2:8] = rng.normal(2.0, 0.1, (6, 6, 6))
    seg[10:14, 10:14, 10:14] = 4    # heart
    suv[10:14, 10:14, 10:14] = rng.normal(1.5, 0.1, (4, 4, 4))
    # hot tumor outside organs (seg==0)
    suv[18:22, 18:22, 18:22] = rng.normal(8.0, 0.3, (4, 4, 4))

    affine = np.diag([2.0, 2.0, 2.0, 1.0])  # voxel volume = 8 mm³ = 0.008 ml
    save_nifti(suv, tmp_path / "pet_suv_bw.nii.gz", affine=affine)
    save_nifti(seg, tmp_path / "pred_seg.nii.gz", affine=affine)
    return tmp_path, suv, seg


class TestSUVAnalyzer:
    def test_analyze(self, analysis_case, tmp_path):
        in_dir, suv, seg = analysis_case
        out = tmp_path / "out"
        results = SUVAnalyzer(ConfigNode({})).analyze(in_dir, out)
        organs = {r["organ"]: r for r in results["organs"]}
        assert set(organs) == {"heart", "liver"}
        liver_vals = suv[seg == 5]
        assert organs["liver"]["suv_mean"] == pytest.approx(float(liver_vals.mean()), rel=1e-5)
        assert organs["liver"]["volume_voxels"] == int((seg == 5).sum())
        assert organs["liver"]["volume_ml"] == pytest.approx((seg == 5).sum() * 0.008)
        assert (out / "suv_analysis.csv").exists()
        assert (out / "suv_analysis.xlsx").exists()

    def test_analyze_tumor(self, analysis_case):
        in_dir, suv, seg = analysis_case
        res = SUVAnalyzer(ConfigNode({})).analyze_tumor(
            in_dir / "pet_suv_bw.nii.gz", in_dir / "pred_seg.nii.gz", threshold=2.5
        )
        expected = ((suv >= 2.5) & (seg == 0)).sum()
        assert res["num_voxels"] == int(expected)


class TestTMTV:
    def test_absolute(self, analysis_case, tmp_path):
        in_dir, suv, seg = analysis_case
        analyzer = TMTVAnalyzer(ConfigNode({"analysis": {"tmtv": {"absolute_threshold": 2.5}}}))
        results = analyzer.analyze(in_dir, tmp_path / "out")

        region = (seg == 0) | (seg > 7)
        mask = (suv >= 2.5) & region
        assert results["absolute"]["num_voxels"] == int(mask.sum())
        assert results["absolute"]["volume_ml"] == pytest.approx(mask.sum() * 0.008)
        assert results["absolute"]["suv_mean"] == pytest.approx(float(suv[mask].mean()), rel=1e-5)

        # masks written
        m = load_nifti(tmp_path / "out" / "tmtv_absolute.nii.gz", dtype=np.uint8)
        np.testing.assert_array_equal(m, mask.astype(np.uint8))
        assert (tmp_path / "out" / "tmtv_percentage.nii.gz").exists()
        assert (tmp_path / "out" / "tmtv_liver_based.nii.gz").exists()
        assert (tmp_path / "out" / "tmtv_analysis.csv").exists()

    def test_percentage(self, analysis_case, tmp_path):
        in_dir, suv, seg = analysis_case
        analyzer = TMTVAnalyzer(ConfigNode({}))
        results = analyzer.analyze(in_dir, tmp_path / "out")
        region = (seg == 0) | (seg > 7)
        thr = suv[region].max() * 0.4
        assert results["percentage"]["threshold"] == pytest.approx(float(thr), rel=1e-5)

    def test_liver_based(self, analysis_case, tmp_path):
        in_dir, suv, seg = analysis_case
        analyzer = TMTVAnalyzer(ConfigNode({}))
        results = analyzer.analyze(in_dir, tmp_path / "out")
        liver_vals = suv[seg == 5]
        thr = liver_vals.mean() + 2 * liver_vals.std()
        assert results["liver_based"]["threshold"] == pytest.approx(float(thr), rel=1e-4)

    def test_tlg(self, analysis_case, tmp_path):
        in_dir, suv, seg = analysis_case
        analyzer = TMTVAnalyzer(ConfigNode({}))
        results = analyzer.analyze(in_dir, tmp_path / "out")
        region = (seg == 0) | (seg > 7)
        mask = (suv >= 2.5) & region
        vol = mask.sum() * 0.008
        assert results["tlg"]["tlg"] == pytest.approx(float(vol * suv[mask].mean()), rel=1e-5)

    def test_no_liver(self, tmp_path):
        suv = np.full((8, 8, 8), 3.0, np.float32)
        seg = np.zeros((8, 8, 8), np.uint8)
        analyzer = TMTVAnalyzer(ConfigNode({}))
        res = analyzer.tmtv_liver_based(suv, seg, 0.008)
        assert "error" in res


class TestHistogram:
    def test_figures_written(self, analysis_case, tmp_path):
        in_dir, _, _ = analysis_case
        out = tmp_path / "figs"
        results = HistogramAnalyzer(ConfigNode({})).analyze(in_dir, out)
        assert len(results["figures"]) == 4
        for f in results["figures"]:
            assert Path(f).exists() and Path(f).stat().st_size > 1000


class TestReports:
    def _results(self):
        return {
            "suv": {"organs": [
                {"organ": "liver", "suv_mean": 2.0, "volume_ml": 12.5},
                {"organ": "heart", "suv_mean": 1.5, "volume_ml": 8.0},
            ]},
            "tmtv": {"absolute": {"volume_ml": 3.2, "suv_max": 8.5},
                     "tlg": {"tlg": 25.3}},
        }

    def test_markdown_and_html(self, tmp_path):
        gen = ReportGenerator(ConfigNode({}))
        written = gen.generate(self._results(), tmp_path, formats=["markdown", "html"])
        md = Path(written["markdown"]).read_text()
        assert "liver" in md and "SUV" in md.upper()
        html = Path(written["html"]).read_text()
        assert "<table>" in html and "liver" in html

    def test_docx_valid_zip(self, tmp_path):
        gen = ReportGenerator(ConfigNode({}))
        written = gen.generate(self._results(), tmp_path, formats=["docx"])
        with zipfile.ZipFile(written["docx"]) as z:
            names = z.namelist()
            assert "word/document.xml" in names
            doc = z.read("word/document.xml").decode()
            assert "liver" in doc


class TestXlsx:
    def test_readable_by_pandas(self, tmp_path):
        pd = pytest.importorskip("pandas")
        try:
            import openpyxl  # noqa: F401

            has_reader = True
        except ImportError:
            has_reader = False
        write_xlsx([["a", "b"], [1, 2.5], ["x", 3]], tmp_path / "t.xlsx")
        assert (tmp_path / "t.xlsx").exists()
        with zipfile.ZipFile(tmp_path / "t.xlsx") as z:
            sheet = z.read("xl/worksheets/sheet1.xml").decode()
            assert "2.5" in sheet and "<t>x</t>" in sheet
        if has_reader:
            df = pd.read_excel(tmp_path / "t.xlsx")
            assert list(df.columns) == ["a", "b"]
