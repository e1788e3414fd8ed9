"""Multi-host (DCN) bootstrap: ``jax.distributed.initialize`` wiring.

The reference ships only a dead config stub (``distributed: {enabled:
false, backend: nccl, world_size: 1}``, configs/default.yaml:164-167 —
no torch.distributed anywhere). Here multi-host is real: on a TPU pod
slice each host process calls :func:`maybe_initialize_distributed` before
first JAX use; afterwards ``jax.devices()`` spans every host over DCN and
the existing ``(data, model)`` mesh / pjit / shard_map code paths work
unchanged — XLA routes collectives over ICI within a slice and DCN
across slices. No communication code changes: that is the point of the
GSPMD design (SURVEY.md §2.10).

Config surface (``parallel.multihost``):

- ``auto``  (default) — initialize only when the environment clearly
  indicates a multi-process run (TPU pod metadata or explicit coordinator
  variables). Single-process runs are untouched.
- ``true``  — force initialization; raise if the coordinator cannot be
  resolved.
- ``false`` — never initialize.

Coordinator resolution order (standard JAX conventions):
1. explicit config keys ``parallel.coordinator_address`` /
   ``parallel.num_processes`` / ``parallel.process_id``;
2. env vars ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
   ``JAX_PROCESS_ID`` (also honored by ``jax.distributed`` itself);
3. TPU pod metadata — ``jax.distributed.initialize()`` with no args
   auto-discovers on Cloud TPU (``TPU_WORKER_HOSTNAMES`` et al.).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

_TPU_POD_ENV_VARS = (
    "TPU_WORKER_HOSTNAMES",  # Cloud TPU pod slices
    "MEGASCALE_COORDINATOR_ADDRESS",  # multislice
)
_COORD_ENV_VARS = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")

_initialized = False


def resolve_distributed_args(config=None, env: Optional[Dict[str, str]] = None) -> Dict[str, Any]:
    """Resolve ``jax.distributed.initialize`` kwargs from config + env.

    Returns {} when auto-discovery should be used (TPU pod metadata), and
    a kwargs dict when an explicit coordinator is configured. Raises
    ``ValueError`` if an explicit coordinator is only partially specified.
    """
    env = os.environ if env is None else env
    kwargs: Dict[str, Any] = {}

    def cfg(key):
        return config.get(key, None) if config is not None else None

    addr = cfg("parallel.coordinator_address")
    if addr is None:
        for var in _COORD_ENV_VARS:
            if env.get(var):
                addr = env[var]
                break
    nproc = cfg("parallel.num_processes")
    if nproc is None and env.get("JAX_NUM_PROCESSES"):
        nproc = env["JAX_NUM_PROCESSES"]
    pid = cfg("parallel.process_id")
    if pid is None and env.get("JAX_PROCESS_ID"):
        pid = env["JAX_PROCESS_ID"]

    if addr is None and (nproc is not None or pid is not None):
        raise ValueError(
            "parallel.num_processes/process_id set without a coordinator "
            "address (parallel.coordinator_address or "
            "JAX_COORDINATOR_ADDRESS)"
        )
    if addr is not None:
        kwargs["coordinator_address"] = str(addr)
        if nproc is not None:
            kwargs["num_processes"] = int(nproc)
        if pid is not None:
            kwargs["process_id"] = int(pid)
        if (nproc is None) != (pid is None):
            raise ValueError(
                "explicit multihost config needs BOTH parallel.num_processes "
                "and parallel.process_id (env: JAX_NUM_PROCESSES / "
                "JAX_PROCESS_ID)"
            )
    return kwargs


def multihost_env_detected(env: Optional[Dict[str, str]] = None) -> bool:
    """True when the environment indicates a multi-process run."""
    env = os.environ if env is None else env
    if any(env.get(v) for v in _TPU_POD_ENV_VARS):
        return True
    return any(env.get(v) for v in _COORD_ENV_VARS)


def maybe_initialize_distributed(config=None, env: Optional[Dict[str, str]] = None) -> bool:
    """Initialize ``jax.distributed`` per ``parallel.multihost`` policy.

    Returns True iff initialization ran (or had already run). Must be
    called before any other JAX API touches the backend; the trainer CLI
    calls it first thing in ``main``.
    """
    global _initialized
    mode = "auto"
    if config is not None:
        mode = str(config.get("parallel.multihost", "auto") or "auto").lower()
    if mode in ("false", "off", "none", "0"):
        return False
    if _initialized:
        return True

    explicit = mode in ("true", "on", "1", "force")
    kwargs = resolve_distributed_args(config, env)
    # a coordinator configured in YAML counts as detection too — "auto"
    # must not silently ignore parallel.coordinator_address and let N
    # processes train as N independent jobs
    detected = multihost_env_detected(env) or bool(kwargs)
    if not explicit and not detected:
        return False

    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        if explicit:
            raise
        return False
    _initialized = True
    return True


def process_info() -> Dict[str, int]:
    """Current process's place in the job (1-process values otherwise)."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def allgather_payloads(obj: Any) -> list:
    """All-gather one JSON-serializable host object per process.

    Returns ``[payload_from_process_0, ..., payload_from_process_{n-1}]``
    on EVERY process (single-process: ``[obj]``). Used to merge host-side
    evaluation state (per-case metric rows, streaming accumulators) after
    cohort-sharded native eval — the payloads are variable-size, so sizes
    are gathered first and buffers padded to the global max before the
    fixed-shape ``process_allgather``.
    """
    import jax

    if jax.process_count() == 1:
        return [obj]

    import json

    import numpy as np
    from jax.experimental import multihost_utils as mhu

    data = np.frombuffer(json.dumps(obj).encode("utf-8"), dtype=np.uint8)
    sizes = np.asarray(
        mhu.process_allgather(np.asarray([data.size], np.int64))
    ).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: data.size] = data
    stacked = np.asarray(mhu.process_allgather(buf))
    return [
        json.loads(bytes(stacked[i, : int(sizes[i])]).decode("utf-8"))
        for i in range(len(sizes))
    ]
