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


class CheckpointPolicy:
    """best/last/every-N saving policy."""

    def __init__(self, output_dir, config):
        ckpt_cfg = config.get("training.checkpoint", {}) or {}
        self.output_dir = ensure_dir(output_dir)
        self.save_best = bool(ckpt_cfg.get("save_best", True))
        self.save_last = bool(ckpt_cfg.get("save_last", True))
        self.save_every = int(ckpt_cfg.get("save_every", 10) or 0)

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
            save_checkpoint(
                state_tree, self.output_dir / "last", epoch=epoch,
                best_metric=best_metric, history=history,
            )
        if self.save_best and is_best:
            save_checkpoint(
                state_tree, self.output_dir / "best", epoch=epoch,
                best_metric=best_metric, history=history,
            )
        if self.save_every and (epoch + 1) % self.save_every == 0:
            save_checkpoint(
                state_tree, self.output_dir / f"epoch_{epoch + 1}", epoch=epoch,
                best_metric=best_metric, history=history,
            )
        return best_metric
