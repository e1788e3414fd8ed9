"""Production serving front-end: HTTP segmentation service.

The reference's only serving surface is the batch CLI (`trainer.predict`,
/root/reference/src/trainer/trainer.py:303-368): start a process, scan a
directory, exit — every invocation re-pays model load and (on GPU) warmup.
This module keeps the model resident and serves requests over HTTP, the
way a clinical PACS integration or a batch farm actually consumes a
segmentation engine.

TPU-shaped design decisions:

- One ``SlidingWindowRunner`` owns all compiled programs: volumes are
  padded to shape buckets, so a cohort of varying clinical shapes compiles
  O(buckets) XLA programs, not O(shapes) — and ``/v1/warmup`` lets an
  operator pre-pay those compiles before traffic arrives.
- Device access is serialized with a lock: one chip runs one sliding-window
  program at a time; concurrency above that belongs to the mesh (the
  runner's tile chunks are data-parallel under ``parallel.mesh``), not to
  racing HTTP threads. IO (NIfTI decode/encode) runs outside the lock, so
  host IO of one request overlaps device compute of another.
- Transport is filesystem paths in JSON, not tensor payloads: medical
  volumes are hundreds of MB and clinical pipelines share storage; the
  response carries metadata + the written mask path.

Endpoints (JSON in/out):

- ``GET  /healthz``      → {status, model, compiled_buckets, requests}
- ``GET  /v1/stats``     → request/rejection/error counters + latency
                          percentiles (p50/p95/max over a sliding window)
- ``POST /v1/warmup``    {"shape": [H, W, D]} → precompile that bucket
- ``POST /v1/segment``   {"inputs": {MOD: path, ...}, "output_dir": ...,
                          "case_id": ..., "probabilities": bool,
                          "uncertainty": bool} → run +
                          save {case}_pred.nii.gz (+ {case}_prob.nii.gz)
"""

from __future__ import annotations

import collections
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def _is_stablehlo_artifact(path) -> bool:
    """A StableHLO export is a zip FILE; an Orbax checkpoint is a dir."""
    import zipfile

    p = Path(path)
    return p.is_file() and zipfile.is_zipfile(p)


class RequestError(ValueError):
    """Client-side fault (bad paths, missing modalities, malformed volume).

    The HTTP layer maps this (and ``FileNotFoundError``) to 400; every other
    exception is a genuine server fault and surfaces as a logged 500.
    """


class ServiceBusyError(RuntimeError):
    """Admission control rejected the request; maps to HTTP 503."""


class InferenceService:
    """Resident model + shape-bucketed sliding-window engine.

    ``segment`` is thread-safe: NIfTI IO runs concurrently, device work is
    serialized. Statistics mirror what the batch CLI logs per case.
    """

    def __init__(self, config, checkpoint_path, logger=None):
        import jax.numpy as jnp

        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            SlidingWindowRunner,
        )

        self.config = config
        self.logger = logger
        sw_cfg = config.get("inference.sliding_window", {}) or {}

        if _is_stablehlo_artifact(checkpoint_path):
            # deployment-host mode: the artifact IS the model — no flax
            # module, no Orbax checkpoint, no model code or config parity
            # needed on this machine (models/stablehlo_export.py)
            from multimodal_organ_segmentation_tpu.models.stablehlo_export import (
                load_stablehlo,
            )

            call, meta = load_stablehlo(checkpoint_path)
            shape = meta["input"]["shape"]  # ["b", H, W, D, C]
            roi = tuple(int(s) for s in shape[1:4])
            num_classes = int(meta.get("num_classes", 0) or 0)
            if num_classes <= 0:
                raise ValueError(
                    f"{checkpoint_path}: artifact metadata lacks num_classes"
                )
            self.modalities = list(
                meta.get("modalities")
                or config.get("data.modalities", ["CT", "PET"])
            )
            if len(self.modalities) != int(shape[4]):
                raise ValueError(
                    f"{checkpoint_path}: artifact takes {shape[4]} input "
                    f"channels but modalities are {self.modalities}"
                )
            predict_fn = lambda prm, patches: call(patches)  # noqa: E731
            self._members = [{}]
            self._variables = self._members[0]
            dp_mesh = None  # artifact serving is single-chip (the exported
            # module is an opaque call; shard_map partitioning of it is
            # not validated — use checkpoint serving for mesh parallelism)
            model_name = f"{meta.get('model', 'unknown')} (stablehlo)"
        else:
            from multimodal_organ_segmentation_tpu.train.trainer import Trainer

            # the checkpoint is self-sufficient; a stale model.pretrained
            # path from the training config may not exist on the serving
            # machine (same rule as run_eval / run_export)
            config.set("model.pretrained", None)
            trainer = Trainer(config, logger=logger)
            roi = tuple(
                config.get("inference.sliding_window.roi_size", [96, 96, 96])
            )
            self.modalities = list(config.get("data.modalities", ["CT", "PET"]))
            trainer.init_state(
                np.zeros((*roi, len(self.modalities)), np.float32)
            )
            trainer.load_params(checkpoint_path)
            # _inference_members: EMA-weight selection + inference.ensemble —
            # the SAME member list as batch predict, so the two serving
            # surfaces cannot diverge on the same config
            self._members = trainer._inference_members()
            # the resident service never trains: release the restored
            # optimizer moments (2× params HBM) before any tile chunk runs
            trainer.freeze_for_inference()
            self._variables = self._members[0]
            num_classes = trainer.num_classes
            predict_fn = trainer._predict_fn
            dp_mesh = trainer._inference_mesh()
            model_name = str(config.get("model.name", "unknown"))

        self.runner = SlidingWindowRunner(
            predict_fn,
            roi_size=roi,
            num_classes=num_classes,
            overlap=float(sw_cfg.get("overlap", 0.5)),
            sw_batch_size=config.get("inference.batch_size", 4),
            mode=str(sw_cfg.get("mode", "gaussian")),
            mesh=dp_mesh,
        )
        self.model_name = model_name
        self.normalize = bool(config.get("inference.normalize", False))
        self.tta = bool(config.get("inference.tta", False))
        self._jnp = jnp
        self._device_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self.requests_served = 0
        # operational counters + a sliding latency window (512 requests ≈
        # hours of clinical traffic; bounded so a long-lived process never
        # grows). Guarded by _stats_lock.
        self._counters = collections.Counter()
        self._latencies = {
            k: collections.deque(maxlen=512) for k in ("total_s", "device_s", "load_s")
        }
        # admission control: each in-flight request holds a decoded clinical
        # volume (hundreds of MB) in host RAM while queued on the device
        # lock; bound that, and shed the rest with 503 instead of OOMing the
        # long-lived process (and losing every warmed bucket compile)
        self.max_in_flight = max(1, int(config.get("serving.max_in_flight", 4)))
        self._admission = threading.BoundedSemaphore(self.max_in_flight)
        # cap per-request device memory: a whole-body PET/CT is ~112M voxels
        # (400×400×700); anything past this is a malformed or abusive
        # request, not a clinical volume
        self.max_volume_voxels = int(
            config.get("serving.max_volume_voxels", 128_000_000)
        )

    def _count(self, key: str, n: int = 1) -> None:
        with self._stats_lock:
            self._counters[key] += n

    def _check_volume_shape(self, h: int, w: int, d: int) -> None:
        if min(h, w, d) < 1:
            raise RequestError(f"volume shape ({h}, {w}, {d}) has empty axes")
        if h * w * d > self.max_volume_voxels:
            raise RequestError(
                f"volume shape ({h}, {w}, {d}) exceeds "
                f"serving.max_volume_voxels={self.max_volume_voxels}"
            )

    # -- operations -------------------------------------------------------

    def warmup(self, shape) -> Dict[str, Any]:
        """Precompile the bucket program covering ``shape`` (zeros input)."""
        from multimodal_organ_segmentation_tpu.ops.sliding_window import bucket_shape

        jnp = self._jnp
        try:
            h, w, d = (int(s) for s in shape)
        except (TypeError, ValueError) as e:
            raise RequestError(f"shape must be 3 ints, got {shape!r}") from e
        self._check_volume_shape(h, w, d)
        # warmup compiles can take minutes and hold the device lock — they
        # go through the same admission gate as segment requests
        if not self._admission.acquire(blocking=False):
            self._count("rejected")
            raise ServiceBusyError(
                f"{self.max_in_flight} requests already in flight; retry later"
            )
        try:
            bucket = bucket_shape(
                (h, w, d), self.runner.roi_size, self.runner.overlap
            )
            t0 = time.perf_counter()
            vol = jnp.zeros((h, w, d, len(self.modalities)), jnp.float32)
            with self._device_lock:
                out = self.runner(vol, self._variables)
                out.block_until_ready()
            self._count("warmups")
            return {
                "bucket": list(bucket),
                "compiled_buckets": self.runner.num_compiled,
                "warmup_s": round(time.perf_counter() - t0, 3),
            }
        finally:
            self._admission.release()

    def segment(
        self,
        inputs: Dict[str, str],
        output_dir: Optional[str] = None,
        case_id: Optional[str] = None,
        probabilities: bool = False,
        uncertainty: bool = False,
    ) -> Dict[str, Any]:
        """Segment one case given ``{modality: nifti_path}``.

        ``probabilities`` also writes ``{case}_prob.nii.gz`` (4D float32
        per-class softmax) next to the mask — same artifact as the batch
        CLI's ``inference.save_probabilities``. ``uncertainty`` writes
        ``{case}_unc.nii.gz`` (3D float32 normalized predictive entropy),
        matching ``inference.save_uncertainty``."""
        from multimodal_organ_segmentation_tpu.ops.sliding_window import bucket_shape
        from multimodal_organ_segmentation_tpu.utils.io import (
            load_case_channels,
            save_nifti,
        )

        if not self._admission.acquire(blocking=False):
            self._count("rejected")
            raise ServiceBusyError(
                f"{self.max_in_flight} requests already in flight; retry later"
            )
        try:
            result = self._segment(inputs, output_dir, case_id,
                                   bucket_shape, load_case_channels, save_nifti,
                                   probabilities=probabilities,
                                   uncertainty=uncertainty)
        except (RequestError, FileNotFoundError):
            self._count("client_errors")
            raise
        except Exception:
            self._count("server_errors")
            raise
        finally:
            self._admission.release()
        with self._stats_lock:
            for k, dq in self._latencies.items():
                dq.append(result[k])
        return result

    def _segment(self, inputs, output_dir, case_id,
                 bucket_shape, load_case_channels, save_nifti,
                 probabilities: bool = False,
                 uncertainty: bool = False) -> Dict[str, Any]:
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            predict_labels,
            predictive_entropy,
        )

        jnp = self._jnp
        missing = [m for m in self.modalities if m not in inputs]
        if missing:
            raise RequestError(f"missing modalities {missing}; need {self.modalities}")
        if (probabilities or uncertainty) and output_dir is None:
            # these volumes only exist as saved files; computing and
            # fetching hundreds of MB just to drop them would be silent
            # waste — refuse up front
            which = "probabilities" if probabilities else "uncertainty"
            raise RequestError(f"{which}: true requires output_dir")

        t0 = time.perf_counter()
        try:
            image_np, affine = load_case_channels(inputs, self.modalities)
        except (ValueError, OSError) as e:
            # garbage/mismatched/corrupt client volumes, not our bug
            # (gzip.BadGzipFile is an OSError)
            raise RequestError(f"cannot assemble input volume: {e}") from e
        self._check_volume_shape(*image_np.shape[:3])
        image = jnp.asarray(image_np)
        if self.normalize:
            from multimodal_organ_segmentation_tpu.data.transforms import (
                normalize_from_config,
            )

            image = normalize_from_config(image, self.config)
        t_io = time.perf_counter()

        # only device DISPATCH holds the lock; the host fetch of the mask
        # (tens of MB) runs outside it so the next request's dispatch can
        # overlap this one's transfer
        import jax

        is_ensemble = len(self._members) > 1
        if is_ensemble:
            # inference.ensemble: average member softmaxes — identical rule
            # to Trainer.predict so batch and HTTP masks match
            def run_sw(vol):
                acc = None
                for v in self._members:
                    p = jax.nn.softmax(self.runner(vol, v), axis=-1)
                    acc = p if acc is None else acc + p
                return acc / len(self._members)

        else:
            run_sw = lambda vol: self.runner(vol, self._variables)

        probs = None
        unc = None
        with self._device_lock:
            if probabilities or uncertainty:
                pred_dev, probs_dev = predict_labels(
                    run_sw, image, tta=self.tta, return_probs=True,
                    already_probs=is_ensemble,
                )
                if uncertainty:
                    unc_dev = predictive_entropy(probs_dev)
            else:
                pred_dev = predict_labels(run_sw, image, tta=self.tta)
        pred = np.asarray(pred_dev).astype(np.uint8)
        if probabilities:
            probs = np.asarray(probs_dev, dtype=np.float32)
        if uncertainty:
            unc = np.asarray(unc_dev, dtype=np.float32)
        t_dev = time.perf_counter()
        # host-side CPU cleanup stays OUTSIDE device_s so the /v1/stats
        # device-latency percentiles measure the accelerator, not scipy
        from multimodal_organ_segmentation_tpu.ops.postprocess import (
            postprocess_from_config,
        )

        pred = postprocess_from_config(pred, self.config)

        result: Dict[str, Any] = {
            "case_id": case_id,
            "shape": list(image.shape[:3]),
            "bucket": list(
                bucket_shape(
                    tuple(image.shape[:3]), self.runner.roi_size, self.runner.overlap
                )
            ),
            "compiled_buckets": self.runner.num_compiled,
            "class_voxels": {
                int(c): int(n)
                for c, n in zip(*(a.tolist() for a in np.unique(pred, return_counts=True)))
            },
            "load_s": round(t_io - t0, 3),
            "device_s": round(t_dev - t_io, 3),
        }
        if output_dir is not None:
            out_dir = Path(output_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            name = case_id or Path(next(iter(inputs.values()))).stem.split(".")[0]
            out_file = out_dir / f"{name}_pred.nii.gz"
            save_nifti(pred, out_file, affine=affine)
            result["output"] = str(out_file)
            if probs is not None:
                prob_file = out_dir / f"{name}_prob.nii.gz"
                save_nifti(probs, prob_file, affine=affine)
                result["probabilities"] = str(prob_file)
            if unc is not None:
                unc_file = out_dir / f"{name}_unc.nii.gz"
                save_nifti(unc, unc_file, affine=affine)
                result["uncertainty"] = str(unc_file)
        result["total_s"] = round(time.perf_counter() - t0, 3)
        with self._stats_lock:
            self.requests_served += 1
        if self.logger:
            self.logger.info(f"served case={case_id} {result['shape']} "
                             f"in {result['total_s']}s")
        return result

    def health(self) -> Dict[str, Any]:
        return {
            "status": "ok",
            "model": self.model_name,
            "modalities": self.modalities,
            "roi_size": list(self.runner.roi_size),
            "overlap": self.runner.overlap,
            "compiled_buckets": self.runner.num_compiled,
            "requests": self.requests_served,
        }

    def stats(self) -> Dict[str, Any]:
        """Operational counters + latency percentiles (sliding 512-request
        window). What an SRE dashboard scrapes; the reference has no serving
        surface at all, let alone one with observability."""

        def pct(sorted_xs, q: float) -> float:
            i = min(len(sorted_xs) - 1, int(round(q * (len(sorted_xs) - 1))))
            return sorted_xs[i]

        with self._stats_lock:
            counters = dict(self._counters)
            lats = {k: sorted(dq) for k, dq in self._latencies.items()}
            served = self.requests_served
        out: Dict[str, Any] = {
            "requests": served,
            "rejected": counters.get("rejected", 0),
            "client_errors": counters.get("client_errors", 0),
            "server_errors": counters.get("server_errors", 0),
            "warmups": counters.get("warmups", 0),
            "compiled_buckets": self.runner.num_compiled,
            "max_in_flight": self.max_in_flight,
            "window": len(lats["total_s"]),
        }
        for name, xs in lats.items():
            if xs:
                out[name] = {
                    "p50": round(pct(xs, 0.50), 3),
                    "p95": round(pct(xs, 0.95), 3),
                    "max": round(xs[-1], 3),
                }
        return out


def make_server(service: InferenceService, host: str = "127.0.0.1", port: int = 8080):
    """Build (not start) a ``ThreadingHTTPServer`` around ``service``."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            if service.logger:
                service.logger.debug("http: " + fmt % args)

        def _reply(self, code: int, payload: Dict[str, Any]):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, service.health())
            elif self.path == "/v1/stats":
                self._reply(200, service.stats())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                self._reply(400, {"error": f"bad request body: {e}"})
                return
            if not isinstance(req, dict):
                self._reply(400, {"error": "request body must be a JSON object"})
                return
            try:
                if self.path == "/v1/segment":
                    self._reply(
                        200,
                        service.segment(
                            req.get("inputs", {}),
                            output_dir=req.get("output_dir"),
                            case_id=req.get("case_id"),
                            probabilities=bool(req.get("probabilities", False)),
                            uncertainty=bool(req.get("uncertainty", False)),
                        ),
                    )
                elif self.path == "/v1/warmup":
                    self._reply(200, service.warmup(req.get("shape", [96, 96, 96])))
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})
            except (RequestError, FileNotFoundError) as e:
                self._reply(400, {"error": str(e)})
            except ServiceBusyError as e:
                self._reply(503, {"error": str(e)})
            except Exception as e:  # keep the server alive on internal errors
                if service.logger:
                    service.logger.error(f"serve error: {e}", exc_info=True)
                self._reply(500, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)


def run_serve(config, logger) -> None:
    """CLI glue for ``--mode serve``."""
    ckpt = config["_args"].get("checkpoint")
    if ckpt is None:
        raise ValueError(
            "--checkpoint is required for serve mode (an Orbax checkpoint "
            "dir, or a StableHLO export zip from --mode export "
            "--format stablehlo)"
        )
    host = str(config.get("serving.host", "127.0.0.1"))
    p = config["_args"].get("port")  # 0 is valid: OS-assigned free port
    port = int(p) if p is not None else int(config.get("serving.port", 8080))
    service = InferenceService(config, ckpt, logger=logger)
    for shape in config.get("serving.warmup_shapes", []) or []:
        info = service.warmup(shape)
        logger.info(f"warmup {list(shape)} → bucket {info['bucket']} "
                    f"({info['warmup_s']}s)")
    server = make_server(service, host, port)
    bound_port = server.server_address[1]  # real port when --port 0
    logger.info(f"serving {service.model_name} on http://{host}:{bound_port} "
                f"(endpoints: /healthz, /v1/stats, /v1/warmup, /v1/segment)")

    # preemptible TPU hosts get SIGTERM before the chip is reclaimed: stop
    # accepting, let in-flight requests drain, exit 0 so the supervisor
    # restarts cleanly elsewhere
    import signal

    def _term(signum, frame):
        logger.info("SIGTERM: draining and shutting down")
        threading.Thread(target=server.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _term)
    except ValueError:  # not the main thread (embedded use)
        pass
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        logger.info(f"final stats: {json.dumps(service.stats())}")
