"""Serving front-end: resident InferenceService + HTTP server.

The reference has no serving surface beyond the one-shot batch CLI
(src/trainer/trainer.py:303-368); this subsystem keeps the model resident
behind HTTP with shape-bucketed compiles (--mode serve).
"""

import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest
import yaml

from multimodal_organ_segmentation_tpu import cli
from multimodal_organ_segmentation_tpu.data.synthetic import generate_synthetic_dataset
from multimodal_organ_segmentation_tpu.serving import (
    InferenceService,
    RequestError,
    ServiceBusyError,
    make_server,
)
from multimodal_organ_segmentation_tpu.utils.config import load_config
from multimodal_organ_segmentation_tpu.utils.io import load_nifti

CONFIG = str(Path(__file__).resolve().parents[1] / "configs" / "tiny_cpu.yaml")


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """Train a tiny checkpoint, return (config, ckpt_path, case_inputs)."""
    workdir = tmp_path_factory.mktemp("serving")
    generate_synthetic_dataset(
        workdir / "data", n_train=4, n_val=2, n_test=1,
        shape=(32, 32, 32), num_classes=4, seed=0,
    )
    cfg = load_config(CONFIG).to_dict()
    cfg["data"]["data_root"] = str(workdir / "data")
    cfg["experiment"]["output_dir"] = str(workdir / "outputs")
    cfg["experiment"]["log_dir"] = str(workdir / "logs")
    cfg_path = workdir / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    cli.main(["--mode", "train", "--config", str(cfg_path),
              "--device", "cpu", "--epochs", "1"])
    ckpt = workdir / "outputs" / "tiny_cpu" / "best"
    assert (ckpt / "meta.json").exists()

    case_dir = workdir / "data" / "test" / "test_000"
    inputs = {"CT": str(case_dir / "ct.nii.gz"),
              "PET": str(case_dir / "pet.nii.gz")}
    config = load_config(cfg_path)
    config["_args"] = {}
    return config, str(ckpt), inputs, workdir


class TestInferenceService:
    def test_segment_writes_mask(self, served):
        config, ckpt, inputs, workdir = served
        svc = InferenceService(config, ckpt)
        out_dir = workdir / "preds"
        res = svc.segment(inputs, output_dir=str(out_dir), case_id="caseA")
        assert res["shape"] == [32, 32, 32]
        assert res["compiled_buckets"] == 1
        assert sum(res["class_voxels"].values()) == 32 * 32 * 32
        pred = load_nifti(res["output"])
        assert pred.shape == (32, 32, 32)
        assert np.asarray(pred).max() <= 3

        # same-bucket second case: no new compile
        res2 = svc.segment(inputs, output_dir=str(out_dir), case_id="caseB")
        assert res2["compiled_buckets"] == 1
        assert (out_dir / "caseB_pred.nii.gz").exists()

    def test_segment_with_probabilities(self, served):
        """"probabilities": true also writes the 4D softmax volume, and
        its argmax matches the saved mask (same artifact as the batch
        CLI's inference.save_probabilities)."""
        config, ckpt, inputs, workdir = served
        svc = InferenceService(config, ckpt)
        out_dir = workdir / "preds_probs"
        res = svc.segment(
            inputs, output_dir=str(out_dir), case_id="caseP",
            probabilities=True,
        )
        probs = load_nifti(res["probabilities"])
        pred = load_nifti(res["output"])
        assert probs.shape == (32, 32, 32, 4)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(probs).argmax(-1), np.asarray(pred)
        )

    def test_probabilities_requires_output_dir(self, served):
        config, ckpt, inputs, _ = served
        svc = InferenceService(config, ckpt)
        with pytest.raises(RequestError, match="output_dir"):
            svc.segment(inputs, probabilities=True)
        with pytest.raises(RequestError, match="output_dir"):
            svc.segment(inputs, uncertainty=True)

    def test_segment_with_uncertainty(self, served):
        """"uncertainty": true writes the 3D normalized predictive entropy
        derived from the same posterior as the probability volume (same
        artifact as the batch CLI's inference.save_uncertainty)."""
        config, ckpt, inputs, workdir = served
        svc = InferenceService(config, ckpt)
        out_dir = workdir / "preds_unc"
        res = svc.segment(
            inputs, output_dir=str(out_dir), case_id="caseU",
            probabilities=True, uncertainty=True,
        )
        unc = np.asarray(load_nifti(res["uncertainty"]))
        probs = np.asarray(load_nifti(res["probabilities"]))
        assert unc.shape == (32, 32, 32)
        assert unc.min() >= 0.0 and unc.max() <= 1.0 + 1e-5
        expected = -(probs * np.log(np.clip(probs, 1e-12, None))).sum(-1)
        expected /= np.log(probs.shape[-1])
        np.testing.assert_allclose(unc, expected, atol=1e-4)

    def test_ensemble_duplicate_matches_single(self, served, tmp_path):
        """The HTTP service honors inference.ensemble with the same
        softmax-average rule as the batch CLI: a duplicate-member ensemble
        reproduces the single-model mask exactly."""
        config, ckpt, inputs, workdir = served
        svc1 = InferenceService(config, ckpt)
        a = svc1.segment(inputs, output_dir=str(tmp_path / "s"), case_id="c")
        cfg2 = config.copy()
        cfg2.set("inference.ensemble", [ckpt])
        svc2 = InferenceService(cfg2, ckpt)
        assert len(svc2._members) == 2
        b = svc2.segment(inputs, output_dir=str(tmp_path / "e"), case_id="c")
        np.testing.assert_array_equal(
            np.asarray(load_nifti(a["output"])), np.asarray(load_nifti(b["output"]))
        )

    def test_missing_modality_raises(self, served):
        config, ckpt, inputs, _ = served
        svc = InferenceService(config, ckpt)
        # RequestError (a ValueError) marks client faults for the 400 path
        with pytest.raises(RequestError, match="missing modalities"):
            svc.segment({"CT": inputs["CT"]})

    def test_garbage_volume_is_request_error(self, served, tmp_path):
        config, ckpt, inputs, _ = served
        bad = tmp_path / "garbage.nii.gz"
        bad.write_bytes(b"not a nifti at all")
        svc = InferenceService(config, ckpt)
        with pytest.raises(RequestError):
            svc.segment({m: str(bad) for m in svc.modalities})

    def test_admission_control_sheds_load(self, served):
        config, ckpt, inputs, _ = served
        config.set("serving.max_in_flight", 1)
        svc = InferenceService(config, ckpt)
        assert svc.max_in_flight == 1
        assert svc._admission.acquire(blocking=False)  # occupy the only slot
        try:
            with pytest.raises(ServiceBusyError, match="in flight"):
                svc.segment(inputs)
            # warmup holds the device lock through a compile — it must go
            # through the same admission gate
            with pytest.raises(ServiceBusyError, match="in flight"):
                svc.warmup([32, 32, 32])
        finally:
            svc._admission.release()
        svc.segment(inputs)  # slot free again → serves normally

    def test_oversized_shape_rejected(self, served):
        config, ckpt, inputs, _ = served
        svc = InferenceService(config, ckpt)
        # a 4096^3 warmup would pin ~550 GB on device; client fault, not 500
        with pytest.raises(RequestError, match="max_volume_voxels"):
            svc.warmup([4096, 4096, 4096])
        with pytest.raises(RequestError, match="empty axes"):
            svc.warmup([0, 32, 32])

    def test_stats_counters_and_latency_window(self, served):
        config, ckpt, inputs, workdir = served
        svc = InferenceService(config, ckpt)
        s0 = svc.stats()
        assert s0["requests"] == 0 and s0["window"] == 0
        assert "total_s" not in s0  # no latencies yet

        svc.warmup([32, 32, 32])
        svc.segment(inputs, output_dir=str(workdir / "stats_preds"), case_id="s1")
        svc.segment(inputs, output_dir=str(workdir / "stats_preds"), case_id="s2")
        with pytest.raises(RequestError):
            svc.segment({m: "/nope.nii.gz" for m in svc.modalities})

        s = svc.stats()
        assert s["requests"] == 2 and s["window"] == 2
        assert s["warmups"] == 1 and s["client_errors"] == 1
        assert s["server_errors"] == 0 and s["rejected"] == 0
        for key in ("total_s", "device_s", "load_s"):
            assert s[key]["p50"] <= s[key]["p95"] <= s[key]["max"]
        # rejections count too
        config.set("serving.max_in_flight", 1)
        svc2 = InferenceService(config, ckpt)
        assert svc2._admission.acquire(blocking=False)
        try:
            with pytest.raises(ServiceBusyError):
                svc2.segment(inputs)
        finally:
            svc2._admission.release()
        assert svc2.stats()["rejected"] == 1


class TestHTTPServer:
    @pytest.fixture(scope="class")
    def server(self, served):
        config, ckpt, inputs, workdir = served
        svc = InferenceService(config, ckpt)
        httpd = make_server(svc, host="127.0.0.1", port=0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        yield base, inputs, workdir
        httpd.shutdown()
        httpd.server_close()

    def _post(self, url, payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def test_healthz(self, server):
        base, _, _ = server
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["model"] == "unet3d"
        assert health["roi_size"] == [32, 32, 32]

    def test_warmup_then_segment(self, server):
        base, inputs, workdir = server
        warm = self._post(base + "/v1/warmup", {"shape": [32, 32, 32]})
        assert warm["compiled_buckets"] >= 1

        res = self._post(base + "/v1/segment", {
            "inputs": inputs,
            "output_dir": str(workdir / "http_preds"),
            "case_id": "http1",
        })
        assert res["output"].endswith("http1_pred.nii.gz")
        assert Path(res["output"]).exists()
        # warmed bucket reused — no extra compile for the real request
        assert res["compiled_buckets"] == warm["compiled_buckets"]

    def test_segment_probabilities_over_http(self, server):
        base, inputs, workdir = server
        res = self._post(base + "/v1/segment", {
            "inputs": inputs,
            "output_dir": str(workdir / "http_probs"),
            "case_id": "httpP",
            "probabilities": True,
        })
        assert res["probabilities"].endswith("httpP_prob.nii.gz")
        probs = load_nifti(res["probabilities"])
        assert probs.shape == (32, 32, 32, 4)
        # probabilities without output_dir: explicit 400, not silent waste
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(base + "/v1/segment",
                       {"inputs": inputs, "probabilities": True})
        assert ei.value.code == 400

    def test_segment_uncertainty_over_http(self, server):
        base, inputs, workdir = server
        res = self._post(base + "/v1/segment", {
            "inputs": inputs,
            "output_dir": str(workdir / "http_unc"),
            "case_id": "httpU",
            "uncertainty": True,
        })
        assert res["uncertainty"].endswith("httpU_unc.nii.gz")
        unc = np.asarray(load_nifti(res["uncertainty"]))
        assert unc.shape == (32, 32, 32)
        assert unc.min() >= 0.0 and unc.max() <= 1.0 + 1e-5

    def test_bad_request_is_400_and_server_survives(self, server):
        base, inputs, workdir = server
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(base + "/v1/segment", {"inputs": {"CT": "/nope.nii.gz"}})
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(base + "/v1/nothere", {})
        assert ei.value.code == 404
        # valid JSON that is not an object is a client error, not a 500
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(base + "/v1/segment", [1, 2, 3])
        assert ei.value.code == 400
        # malformed warmup shape is a client error too
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(base + "/v1/warmup", {"shape": [96, 96]})
        assert ei.value.code == 400
        # server still serves after errors
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

    def test_serve_cli_lifecycle_sigterm_drains(self, served):
        """The real `main.py --mode serve` process: binds an OS-assigned
        port, answers /healthz, and exits 0 on SIGTERM (preemption drain)."""
        import os
        import re
        import signal
        import subprocess
        import sys
        import threading as th

        config, ckpt, inputs, workdir = served
        repo = str(Path(__file__).resolve().parents[1])
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.Popen(
            [sys.executable, "main.py", "--mode", "serve",
             "--config", str(workdir / "cfg.yaml"), "--checkpoint", ckpt,
             "--device", "cpu", "--port", "0"],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        url = {}

        def _watch():
            for line in proc.stdout:
                url.setdefault("log", []).append(line)
                m = re.search(r"http://[\d.]+:(\d+)", line)
                if m:
                    url["port"] = int(m.group(1))
                    return

        w = th.Thread(target=_watch, daemon=True)
        w.start()
        w.join(timeout=180)
        try:
            if "port" not in url:
                log_tail = "".join(url.get("log", []))[-300:]
                # a DEAD process is a regression and must FAIL; skip is
                # reserved for a genuinely slow start (process still alive)
                if proc.poll() is not None:
                    pytest.fail(
                        f"serve process died at startup (rc={proc.returncode}): "
                        + log_tail
                    )
                pytest.skip("serve process did not come up in time: " + log_tail)
            with urllib.request.urlopen(
                f"http://127.0.0.1:{url['port']}/healthz", timeout=30
            ) as r:
                assert json.loads(r.read())["status"] == "ok"
            proc.send_signal(signal.SIGTERM)
            rc = proc.wait(timeout=60)
            assert rc == 0  # clean drain, supervisor-restartable
        finally:
            if proc.poll() is None:
                proc.kill()

    def test_stats_endpoint(self, server):
        base, _, _ = server
        with urllib.request.urlopen(base + "/v1/stats", timeout=30) as r:
            stats = json.loads(r.read())
        # the class-scoped server has served earlier tests' traffic
        assert stats["requests"] >= 1
        assert stats["client_errors"] >= 1
        assert stats["total_s"]["p50"] > 0


class TestArtifactServing:
    """--checkpoint can be a StableHLO export zip: the deployment host
    serves from the artifact alone (no model code / Orbax checkpoint) and
    must produce the identical mask to checkpoint-mode serving."""

    def test_artifact_mask_matches_checkpoint_mask(self, served):
        config, ckpt, inputs, workdir = served
        artifact = workdir / "model.stablehlo.zip"
        cli.main([
            "--mode", "export", "--config", str(workdir / "cfg.yaml"),
            "--device", "cpu", "--checkpoint", ckpt,
            "--output", str(artifact), "--format", "stablehlo",
        ])

        svc_ckpt = InferenceService(config, ckpt)
        res_ckpt = svc_ckpt.segment(
            inputs, output_dir=str(workdir / "p_ckpt"), case_id="c"
        )
        svc_art = InferenceService(config, str(artifact))
        assert "stablehlo" in svc_art.model_name
        res_art = svc_art.segment(
            inputs, output_dir=str(workdir / "p_art"), case_id="c"
        )
        np.testing.assert_array_equal(
            np.asarray(load_nifti(res_art["output"])),
            np.asarray(load_nifti(res_ckpt["output"])),
        )

    def test_artifact_without_num_classes_rejected(self, served, tmp_path):
        import zipfile

        config, ckpt, inputs, workdir = served
        artifact = workdir / "model.stablehlo.zip"
        assert artifact.exists()  # written by the previous test
        with zipfile.ZipFile(artifact) as zf:
            blob = zf.read("model.stablehlo")
            meta = json.loads(zf.read("metadata.json"))
        meta.pop("num_classes", None)
        bad = tmp_path / "no_classes.zip"
        with zipfile.ZipFile(bad, "w") as zf:
            zf.writestr("model.stablehlo", blob)
            zf.writestr("metadata.json", json.dumps(meta))
        with pytest.raises(ValueError, match="num_classes"):
            InferenceService(config, str(bad))
