"""bench.py round-over-round regression gate (VERDICT r4 #10).

The gate compares the current bench JSON against the most recent
non-outage ``BENCH_r*.json`` driver record: metrics >7% worse print an
explicit REGRESSION stderr line and land in ``result["regressions"]
["worse"]``; ms-keys are lower-is-better, rate keys higher-is-better.
Pure logic — no TPU needed.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def _write_round(tmp_path, n, value, extra, error=None):
    parsed = {"value": value, "extra": dict(extra)}
    if error:
        parsed["extra"]["error"] = error
    (tmp_path / f"BENCH_r{n:02d}.json").write_text(
        json.dumps({"n": n, "parsed": parsed})
    )


class TestLoadPrior:
    def test_latest_round_wins(self, tmp_path):
        _write_round(tmp_path, 3, 40.0, {})
        _write_round(tmp_path, 4, 43.7, {})
        n, parsed = bench._load_prior_bench(tmp_path)
        assert n == 4 and parsed["value"] == 43.7

    def test_outage_rounds_skipped(self, tmp_path):
        """A relay-outage record (value 0 / error in extra) must not become
        the comparison base — everything would read as an improvement."""
        _write_round(tmp_path, 3, 40.0, {})
        _write_round(tmp_path, 4, 0.0, {}, error="tpu_backend_unreachable")
        n, parsed = bench._load_prior_bench(tmp_path)
        assert n == 3 and parsed["value"] == 40.0

    def test_no_files(self, tmp_path):
        assert bench._load_prior_bench(tmp_path) == (None, None)


class TestCheckRegressions:
    def test_flags_worse_metrics_both_directions(self, tmp_path, capsys):
        _write_round(
            tmp_path, 4, 43.7,
            {"train_step_ms": 178.4, "inference_mfu": 0.0346},
        )
        result = {
            "value": 38.0,  # -13% vol/min (higher-better) → regression
            "extra": {
                "train_step_ms": 200.0,  # +12% ms (lower-better) → regression
                "inference_mfu": 0.0350,  # fine
            },
        }
        bench._check_regressions(result, bench_dir=tmp_path)
        rep = result["regressions"]
        assert rep["vs_round"] == 4
        worse_keys = {w["key"] for w in rep["worse"]}
        assert worse_keys == {"value", "train_step_ms"}
        err = capsys.readouterr().err
        assert err.count("REGRESSION vs r4") == 2
        # delta table carries every compared key, better or worse
        assert set(rep["deltas"]) == {"value", "train_step_ms", "inference_mfu"}
        assert rep["deltas"]["value"] < -7.0
        assert rep["deltas"]["inference_mfu"] > 0

    def test_within_threshold_is_clean(self, tmp_path, capsys):
        _write_round(tmp_path, 4, 43.7, {"train_step_ms": 178.4})
        result = {"value": 42.0, "extra": {"train_step_ms": 182.0}}
        bench._check_regressions(result, bench_dir=tmp_path)
        assert result["regressions"]["worse"] == []
        assert "REGRESSION" not in capsys.readouterr().err

    def test_missing_or_null_priors_skipped(self, tmp_path):
        _write_round(tmp_path, 4, 43.7, {"new_metric": None})
        result = {"value": 44.0, "extra": {"new_metric": 1.0, "novel": 2.0}}
        bench._check_regressions(result, bench_dir=tmp_path)
        assert result["regressions"]["worse"] == []
        assert set(result["regressions"]["deltas"]) == {"value"}

    def test_no_prior_leaves_result_untouched(self, tmp_path):
        result = {"value": 44.0, "extra": {}}
        bench._check_regressions(result, bench_dir=tmp_path)
        assert "regressions" not in result

    def test_real_repo_records_parse(self):
        """The shipped BENCH_r*.json records must be loadable (the gate
        runs against them for real at the end of every round)."""
        n, parsed = bench._load_prior_bench()
        assert n is not None and parsed["value"] > 0


class TestPartialEmitOnSigterm:
    def test_sigterm_emits_partial_json(self):
        """A driver-budget SIGTERM mid-bench must still emit one valid JSON
        line with the already-measured headline (+ truncated marker +
        regression deltas) instead of dying silently — a cold-cache run
        through a slow relay can exceed a fixed budget (r5: 1154s on the
        flagship compile alone)."""
        import signal
        import subprocess

        code = (
            "import sys, time\n"
            f"sys.path.insert(0, {str(Path(__file__).resolve().parents[1])!r})\n"
            "import bench\n"
            "result = {'value': 43.2, 'unit': 'volumes/min/chip',"
            " 'extra': {'inference_mfu': 0.034}}\n"
            "state = {'printed': False}\n"
            "bench._install_partial_emitter(result, state)\n"
            "print('READY', flush=True)\n"
            "time.sleep(60)\n"
        )
        p = subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
        )
        try:
            assert p.stdout.readline().strip() == "READY"
            p.send_signal(signal.SIGTERM)
            out = p.stdout.read()
            assert p.wait(timeout=30) == 0
        finally:
            p.kill()
        doc = json.loads(
            [ln for ln in out.splitlines() if ln.startswith("{")][0]
        )
        assert doc["value"] == 43.2
        assert "truncated" in doc["extra"]
        assert "regressions" in doc  # the gate ran on the partial result
