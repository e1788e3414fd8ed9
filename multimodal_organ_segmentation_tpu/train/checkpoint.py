"""Checkpointing: Orbax pytree checkpoints with the reference's policy.

Reference policy (src/trainer/trainer.py:397-433, src/models/build.py:122-180):
``last`` every epoch, ``best`` on val-dice improvement, ``epoch_{N}`` every
``save_every`` epochs; checkpoint carries {epoch, params, opt_state,
best_metric, history}; loading is format-tolerant.

Orbax stores the array pytree; the scalar metadata rides in a side JSON so
restore works without knowing the tree structure in advance.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from multimodal_organ_segmentation_tpu.utils.io import ensure_dir, load_json, save_json


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    state_tree: Any,
    path,
    epoch: int = 0,
    best_metric: float = 0.0,
    history: Optional[Dict] = None,
    **extra,
) -> None:
    """Save an array pytree + metadata under ``path`` (a directory).

    Crash-safe: writes to a sibling temp dir first, then swaps — a kill
    mid-save never destroys the previous checkpoint.
    """
    import shutil

    # multi-host: the train state is replicated, so only process 0 writes
    # (every process writing to shared storage would race on the swap)
    if jax.process_count() > 1 and jax.process_index() != 0:
        return

    path = Path(path).resolve()
    tmp = path.with_name(path.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    ensure_dir(tmp.parent)
    _checkpointer().save(tmp / "tree", state_tree)
    save_json(
        {"epoch": epoch, "best_metric": best_metric, "history": history or {}, **extra},
        tmp / "meta.json",
    )
    if path.exists():
        old = path.with_name(path.name + ".old")
        if old.exists():
            shutil.rmtree(old)
        path.rename(old)
        tmp.rename(path)
        shutil.rmtree(old)
    else:
        tmp.rename(path)


def load_checkpoint(path, target: Optional[Any] = None) -> Dict[str, Any]:
    """Load a checkpoint directory → {tree, epoch, best_metric, history}.

    ``target`` (optional) is an example pytree giving the structure.
    Arrays are restored as host numpy — topology-independent (a checkpoint
    written on TPU restores on a CPU mesh and vice versa); JAX re-places
    them on first use (or the caller re-shards explicitly).
    """
    path = Path(path).resolve()
    if not path.exists():
        raise FileNotFoundError(f"checkpoint not found: {path}")
    ckptr = _checkpointer()
    tree_path = path / "tree"

    def _as_numpy_restore(item):
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item
        )
        return ckptr.restore(
            tree_path, args=ocp.args.PyTreeRestore(item=item, restore_args=restore_args)
        )

    def _restore_with_target(item):
        """Orbax rejects any item/on-disk structure mismatch. The one
        mismatch that must stay loadable is the optional ``ema_params``
        field of a train state (``training.ema_decay`` toggled between
        writing and reading): retry with the opposite EMA structure —
        checkpoints carrying EMA restore it even when the caller's target
        didn't ask; EMA-less checkpoints restore with ``ema_params=None``.
        Callers inspect the result and apply their own policy."""
        try:
            return _as_numpy_restore(item)
        except ValueError as e:
            if not (
                hasattr(item, "ema_params")
                and hasattr(item, "replace")
                and "ema_params" in str(e)
            ):
                raise  # a genuine mismatch — don't misdirect it at EMA
            if item.ema_params is None:
                # the EMA tree mirrors the params tree by construction
                return _as_numpy_restore(item.replace(ema_params=item.params))
            return _as_numpy_restore(item.replace(ema_params=None))

    if target is not None:
        tree = _restore_with_target(target)
    else:
        try:
            meta_tree = ckptr.metadata(tree_path)
            tree = _as_numpy_restore(meta_tree.tree) if hasattr(meta_tree, "tree") else ckptr.restore(tree_path)
        except Exception:
            tree = ckptr.restore(tree_path)
    meta = load_json(path / "meta.json") if (path / "meta.json").exists() else {}
    return {
        "tree": tree,
        "epoch": int(meta.get("epoch", 0)),
        "best_metric": float(meta.get("best_metric", 0.0)),
        "history": meta.get("history", {}),
        "meta": meta,  # full metadata incl. step-resume fields
    }


class AsyncCheckpointWriter:
    """One background worker serializing checkpoint writes off the train
    loop.

    The loop pays only the device→host snapshot (unavoidable: the next
    train step donates the state, so its buffers must be fetched before
    they are overwritten); the atomic tmp-swap disk write happens on the
    worker. Pending writes to the SAME path coalesce latest-wins — a slow
    filesystem can never queue an unbounded backlog of ``last`` saves —
    while distinct paths write in submission order. Worker errors surface
    on the next ``submit()`` or on ``flush()``. The reference saves
    synchronously inside its epoch loop (trainer.py:397-433)."""

    def __init__(self):
        import atexit
        import threading

        self._cond = threading.Condition()
        self._pending: Dict[str, tuple] = {}
        self._order: list = []
        self._busy = False
        self._error: Optional[BaseException] = None
        self._closed = False
        self._thread = threading.Thread(
            target=self._worker, daemon=True, name="ckpt-writer"
        )
        self._thread.start()
        # the worker is a daemon (it must never wedge interpreter exit on a
        # hung filesystem); drain queued writes at exit instead of dropping
        self._atexit = atexit
        atexit.register(self._drain_at_exit)

    def _worker(self) -> None:
        while True:
            with self._cond:
                while not self._order and not self._closed:
                    self._cond.wait()
                if self._closed and not self._order:
                    return
                key = self._order.pop(0)
                args, kwargs = self._pending.pop(key)
                self._busy = True
            try:
                save_checkpoint(*args, **kwargs)
            except BaseException as e:  # surfaced on next submit/flush
                with self._cond:
                    self._error = e
            finally:
                with self._cond:
                    self._busy = False
                    self._cond.notify_all()

    def _drain_at_exit(self) -> None:
        try:
            self.flush()
        except Exception:
            pass  # exit path: nothing useful left to do with the error

    def _raise_pending(self) -> None:
        if self._error is not None:
            e, self._error = self._error, None
            raise RuntimeError(f"async checkpoint write failed: {e}") from e

    def submit(self, state_tree: Any, path, **meta) -> None:
        """Snapshot ``state_tree`` to host numpy and queue the write."""
        if jax.process_count() > 1 and jax.process_index() != 0:
            return  # save_checkpoint would drop it anyway; skip the fetch
        host = jax.tree_util.tree_map(np.asarray, state_tree)
        key = str(Path(path).resolve())
        with self._cond:
            self._raise_pending()
            if self._closed:
                raise RuntimeError("AsyncCheckpointWriter is closed")
            if key not in self._pending:
                self._order.append(key)
            self._pending[key] = ((host, path), meta)
            self._cond.notify_all()

    def flush(self) -> None:
        """Block until every queued write has hit disk; re-raise errors."""
        with self._cond:
            while self._order or self._busy:
                self._cond.wait()
            self._raise_pending()

    def close(self) -> None:
        self.flush()
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._thread.join(timeout=60)
        try:
            self._atexit.unregister(self._drain_at_exit)
        except Exception:
            pass


class CheckpointPolicy:
    """best/last/every-N saving policy; writes go through ``writer``
    (async, off-loop) when one is provided."""

    def __init__(self, output_dir, config, writer: Optional[AsyncCheckpointWriter] = None):
        ckpt_cfg = config.get("training.checkpoint", {}) or {}
        self.output_dir = ensure_dir(output_dir)
        self.save_best = bool(ckpt_cfg.get("save_best", True))
        self.save_last = bool(ckpt_cfg.get("save_last", True))
        self.save_every = int(ckpt_cfg.get("save_every", 10) or 0)
        self.writer = writer

    def _write(self, state_tree, path, **meta) -> None:
        if self.writer is not None:
            self.writer.submit(state_tree, path, **meta)
        else:
            save_checkpoint(state_tree, path, **meta)

    def save(
        self,
        state_tree: Any,
        epoch: int,
        metric: float,
        best_metric: float,
        history: Optional[Dict] = None,
        is_best: Optional[bool] = None,
    ) -> float:
        """Apply the policy; returns the (possibly updated) best metric.

        ``best_metric`` must already reflect this epoch (callers decide
        improvement); ``is_best`` marks whether this epoch set it.
        """
        if is_best is None:
            is_best = metric >= best_metric
            best_metric = max(best_metric, metric)
        if self.save_last:
            self._write(
                state_tree, self.output_dir / "last", epoch=epoch,
                best_metric=best_metric, history=history,
            )
        if self.save_best and is_best:
            self._write(
                state_tree, self.output_dir / "best", epoch=epoch,
                best_metric=best_metric, history=history,
            )
        if self.save_every and (epoch + 1) % self.save_every == 0:
            self._write(
                state_tree, self.output_dir / f"epoch_{epoch + 1}", epoch=epoch,
                best_metric=best_metric, history=history,
            )
        return best_metric
