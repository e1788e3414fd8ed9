"""Trainer: functional train/eval steps under jit + host epoch loop.

Reference parity (src/trainer/trainer.py:21-433) with a TPU-native core:

- pure ``train_step(state, images, labels, key) → (state, metrics)``
  compiled once; gradient accumulation is a ``lax.scan`` over microbatches
  *inside* the step (reference: host-side accumulate every
  ``accumulation_steps``, trainer.py:241-258);
- bf16 compute / fp32 params (reference: fp16 AMP + GradScaler — loss
  scaling is unnecessary with bf16);
- data parallelism: batches sharded over the mesh ``data`` axis, params
  replicated; XLA inserts the gradient psum (no DDP/NCCL code);
- per-epoch LR schedule injected host-side (cosine/step/plateau parity);
- streaming device-side Dice during validation;
- Orbax best/last/every-N checkpoints, early stopping, resume;
- ``predict``: case discovery over ``{input}/{modality}/*.nii[.gz]``
  (reference trainer.py:327-334), sliding-window inference as one XLA
  program, argmax → ``{case}_pred.nii.gz`` uint8 with source affine.
  Like the reference, predict applies no normalization transforms
  (SURVEY.md §3.3 quirk) unless ``inference.normalize: true``.
"""

from __future__ import annotations

import math
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from multimodal_organ_segmentation_tpu.models.build import build_model
from multimodal_organ_segmentation_tpu.ops.sliding_window import (
    sliding_window_inference,
)
from multimodal_organ_segmentation_tpu.parallel.mesh import (
    make_mesh,
    replicate_tree,
    shard_opt_state,
    zero1_constrainer,
)
from multimodal_organ_segmentation_tpu.train.checkpoint import (
    AsyncCheckpointWriter,
    CheckpointPolicy,
    load_checkpoint,
)
from multimodal_organ_segmentation_tpu.train.losses import (
    get_loss,
    with_deep_supervision,
)
from multimodal_organ_segmentation_tpu.train.metrics import get_metrics
from multimodal_organ_segmentation_tpu.train.optim import (
    LRScheduler,
    make_optimizer,
    set_learning_rate,
)
from multimodal_organ_segmentation_tpu.utils.io import ensure_dir, save_nifti
from multimodal_organ_segmentation_tpu.utils.prng import KeyStream


class CaseShard(Tuple[int, int]):
    """``(pid, nproc)`` cohort shard plus how it was derived.

    Subclasses tuple so existing ``pid, nproc = shard`` unpacking and
    ``shard[0]`` indexing keep working; ``auto`` distinguishes shards
    derived from the jax.distributed topology (full-cohort results are
    merged across processes) from explicit ``[pid, nproc]`` config values
    (independent workers, per-worker PARTIAL results, never merged).
    """

    auto: bool

    def __new__(cls, pid: int, nproc: int, auto: bool):
        self = super().__new__(cls, (int(pid), int(nproc)))
        self.auto = bool(auto)
        return self


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    extra: Any  # mutable collections (e.g. batch_stats); {} if none
    # EMA of params (None when training.ema_decay is 0/unset). Kept in the
    # state so checkpoints carry it and the update runs in-jit.
    ema_params: Any = None


def select_infer_params(tree: "TrainState", config):
    """The weights inference-like consumers run on: the EMA tree when the
    checkpoint carries one and ``training.ema_eval`` (default true), else
    the raw params. ONE rule shared by eval/predict/serve/export/explain —
    divergence here would mean exporting different weights than you
    evaluated."""
    ema = getattr(tree, "ema_params", None)
    if ema is not None and bool(config.get("training.ema_eval", True)):
        return ema
    return tree.params


def make_train_step(
    model, tx, loss_fn: Callable, accum_steps: int, opt_constraint=None,
    skip_nonfinite: bool = False, ema_decay: Optional[float] = None,
) -> Callable:
    """Build the jitted train step.

    images ``[accum, micro, H, W, D, C]``, labels ``[accum, micro, H, W, D]``.
    ``opt_constraint`` (optional; see ``parallel.mesh.zero1_constrainer``)
    re-asserts the ZeRO-1 sharding on the updated optimizer state so it
    stays sharded across steps instead of being re-replicated by GSPMD.
    ``skip_nonfinite`` drops the update (params and optimizer state keep
    their previous values) when the loss or any gradient is non-finite —
    one bad batch on a 300-epoch preemptible run must not poison the Adam
    moments. The step still advances and ``metrics["skipped"]`` reports 1.0
    so the host loop can log it. (The reference's fp16 GradScaler skips
    steps on inf/nan scaling; bf16 needs no scaler, but spike protection
    is still wanted — torch.cuda.amp semantics, trainer.py:237-258.)
    ``ema_decay`` maintains ``state.ema_params`` as an exponential moving
    average of the params (``e ← d·e + (1−d)·p``, initialized to the
    initial params so no debias term is needed) — one fused elementwise op
    per step; eval/predict can then run on the smoothed weights. The
    reference has no weight averaging.
    """

    def loss_for(params, extra, img, lbl, key):
        variables = {"params": params, **extra}
        mutable = [k for k in extra.keys()]
        if mutable:
            logits, new_vars = model.apply(
                variables, img, train=True, rngs={"dropout": key}, mutable=mutable
            )
            new_extra = dict(new_vars)
        else:
            logits = model.apply(variables, img, train=True, rngs={"dropout": key})
            new_extra = extra
        return loss_fn(logits, lbl), new_extra

    grad_fn = jax.value_and_grad(loss_for, has_aux=True)

    def train_step(state: TrainState, images, labels, key):
        keys = jax.random.split(key, accum_steps)

        def micro(carry, inp):
            grads_acc, loss_acc, extra = carry
            img, lbl, k = inp
            (loss, new_extra), grads = grad_fn(state.params, extra, img, lbl, k)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, new_extra), None

        # accumulate in ≥f32 (promote keeps f64 under jax x64 — the
        # float64 step-parity test pins the update math through here)
        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(
                p, dtype=jnp.promote_types(p.dtype, jnp.float32)
            ),
            state.params,
        )
        leaves = jax.tree_util.tree_leaves(state.params)
        loss_dt = jnp.promote_types(
            jnp.promote_types(
                jnp.result_type(leaves[0]) if leaves else jnp.float32,
                jnp.result_type(images),
            ),
            jnp.float32,
        )
        (grads, loss_sum, extra), _ = jax.lax.scan(
            micro, (zero_grads, jnp.zeros((), loss_dt), state.extra),
            (images, labels, keys),
        )
        scale = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if opt_constraint is not None:
            opt_state = opt_constraint(opt_state)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        gnorm = jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads))
        )
        metrics = {"loss": loss_sum * scale, "grad_norm": gnorm}
        if skip_nonfinite:
            # grad_norm is finite iff every gradient element is; one scalar
            # test instead of a per-leaf reduction tree
            ok = jnp.isfinite(metrics["loss"]) & jnp.isfinite(gnorm)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old
            )
            params = keep(params, state.params)
            opt_state = keep(opt_state, state.opt_state)
            extra = keep(extra, state.extra)
            metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
        ema_params = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            d = jnp.float32(ema_decay)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: (e * d + p.astype(jnp.float32) * (1.0 - d)).astype(
                    e.dtype
                ),
                state.ema_params,
                params,
            )
            if skip_nonfinite:
                # a skipped step must leave the EMA untouched too
                ema_params = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(ok, n, o), ema_params, state.ema_params
                )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, extra=extra,
            ema_params=ema_params,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, loss_fn: Callable, num_classes: int) -> Callable:
    """Jitted eval: loss + argmax preds + per-class ∩/∪ on device.

    ``n_valid`` (optional, static) supports sharded validation: the batch
    is zero-padded to a multiple of the mesh data axis and the loss/Dice
    reductions run on the ``[:n_valid]`` slice — a *static* slice, so the
    numbers are exactly the unpadded batch's for every loss (including
    class-weighted CE, whose weighted-mean normalization is not
    per-sample-separable). With the batch dim sharded over ``data`` and
    params replicated, GSPMD inserts the psum into the cross-batch
    reductions — the returned scalars are fully reduced (SURVEY.md §7
    step 8; the reference validates on one GPU only,
    src/trainer/trainer.py:265-296).
    """

    def eval_step(params, extra, images, labels, n_valid=None):
        variables = {"params": params, **extra}
        logits = model.apply(variables, images, train=False)
        if n_valid is not None and int(n_valid) != images.shape[0]:
            logits_v = logits[: int(n_valid)]
            labels_v = labels[: int(n_valid)]
        else:
            logits_v, labels_v = logits, labels
        loss = loss_fn(logits_v, labels_v)
        preds = jnp.argmax(logits, axis=-1)
        pred_oh = jax.nn.one_hot(
            jnp.argmax(logits_v, axis=-1), num_classes, dtype=jnp.float32
        )
        tgt_oh = jax.nn.one_hot(labels_v, num_classes, dtype=jnp.float32)
        axes = tuple(range(pred_oh.ndim - 1))
        inter = jnp.sum(pred_oh * tgt_oh, axis=axes)
        union = jnp.sum(pred_oh, axis=axes) + jnp.sum(tgt_oh, axis=axes)
        return loss, preds, inter, union

    return jax.jit(eval_step, static_argnums=(4,))


class Trainer:
    """Owns model/optimizer/state and runs the train/eval/predict loops."""

    def __init__(
        self,
        config,
        model=None,
        train_loader=None,
        val_loader=None,
        logger=None,
        resume_from: Optional[str] = None,
        mesh=None,
    ):
        self.config = config
        self.logger = logger
        self.train_loader = train_loader
        self.val_loader = val_loader

        self.model = model if model is not None else build_model(config)
        # the wrapper is pass-through for single-output models and applies
        # 2^-k scale weights when the model trains with deep supervision
        self.loss_fn = with_deep_supervision(get_loss(config))
        self.num_classes = int(config.get("model.out_channels", 8))
        self.epochs = int(config.get("training.epochs", 300))
        self.accum_steps = max(1, int(config.get("training.accumulation_steps", 1)))

        self.tx = make_optimizer(config)
        self.scheduler = LRScheduler(config)

        out_dir = Path(config.get("experiment.output_dir", "outputs")) / str(
            config.get("experiment.name", "exp")
        )
        self.output_dir = ensure_dir(out_dir)
        # training.checkpoint.async: true → writes happen on a background
        # worker; the loop pays only the host snapshot (checkpoint.py).
        # Created lazily per train() and closed at its end so repeated
        # Trainer construction (sweeps, tests) never leaks worker threads.
        self._ckpt_async = bool(config.get("training.checkpoint.async", False))
        self._ckpt_writer = None
        self.ckpt = CheckpointPolicy(self.output_dir, config)

        # mesh=None → auto (build one when >1 devices); mesh=False → force
        # single-device (no mesh)
        if mesh is False:
            self.mesh = None
        else:
            self.mesh = mesh if mesh is not None else (
                make_mesh(config) if len(jax.devices()) > 1 else None
            )

        seed = int(config.get("experiment.seed", 42))
        self.keys = KeyStream(seed)

        self.state: Optional[TrainState] = None
        self.current_epoch = 0
        self.best_metric = 0.0  # reference init (trainer.py:86)
        self.history: Dict[str, List[float]] = {
            "train_loss": [],
            "val_loss": [],
            "val_dice": [],
        }

        self._train_step = None
        self._eval_step = make_eval_step(self.model, self.loss_fn, self.num_classes)
        # one stable callable: a fresh lambda per predict() call would be a
        # new static-arg hash → recompile of the sliding-window program
        self._predict_fn = lambda v, patches: self.model.apply(
            v, patches, train=False
        )
        self._resume_from = resume_from
        self._warned_replicate = False
        self._resume_step_in_epoch = 0
        self.last_step_losses: List[float] = []
        # in-training native-grid validation (training.native_val_every):
        # loader + bucketed runner built lazily once, reused every cycle
        self._native_val_loader = None
        self._native_val_runner = None

    # -- state ------------------------------------------------------------

    def _ema_decay(self) -> Optional[float]:
        """``training.ema_decay`` > 0 turns on in-jit EMA weight averaging."""
        d = float(self.config.get("training.ema_decay", 0.0) or 0.0)
        if not (0.0 < d < 1.0):
            return None
        return d

    def _infer_params(self):
        """Params used for eval/inference — see ``select_infer_params``."""
        return select_infer_params(self.state, self.config)

    def _inference_members(self) -> List[Dict]:
        """Variable sets for inference: the live state plus any
        ``inference.ensemble`` checkpoints (callers average the member
        softmaxes). Every member reuses the same compiled program."""
        members = [{"params": self._infer_params(), **self.state.extra}]
        for ens_path in list(self.config.get("inference.ensemble", []) or []):
            ckpt = load_checkpoint(ens_path, target=self._restore_target())
            tree = ckpt["tree"]
            members.append(
                jax.tree_util.tree_map(
                    jnp.asarray,
                    {
                        "params": select_infer_params(tree, self.config),
                        **tree.extra,
                    },
                )
            )
        if len(members) > 1 and self.logger:
            self.logger.info(
                f"Ensembling {len(members)} checkpoints (softmax average)"
            )
        return members

    def freeze_for_inference(self) -> None:
        """Release the optimizer state before inference-only work.

        ``load_params`` restores the checkpoint's WHOLE tree, so Adam
        moments (2× params) sit in HBM during serving — on the flagship
        that headroom is the difference between sw_batch 15 fitting and
        RESOURCE_EXHAUSTED (tile-chunk activations already fill most of
        the chip). Inference never steps the optimizer; drop the moments
        and let JAX free the buffers.

        A buffer-free ``ShapeDtypeStruct`` skeleton of the dropped tree is
        kept so later checkpoint restores (e.g. a second ``predict`` with
        ``inference.ensemble``) still present a structure-complete Orbax
        target; restored moments are host numpy and die with the restore
        scope.
        """
        if self.state is not None and self.state.opt_state is not None:
            self._opt_skeleton = jax.tree_util.tree_map(
                lambda x: (
                    jax.ShapeDtypeStruct(jnp.shape(x), x.dtype)
                    if hasattr(x, "dtype")
                    else x
                ),
                self.state.opt_state,
            )
            self.state = self.state.replace(opt_state=None)

    def _inference_mesh(self):
        """The mesh handed to the sliding-window runner: the trainer mesh
        when ``inference.data_parallel`` (default on) and the data axis is
        non-trivial, else None. ONE rule shared by evaluate_native /
        predict / serving / tune — divergence would mean the tuner times a
        different program than serving runs."""
        if (
            bool(self.config.get("inference.data_parallel", True))
            and self.mesh is not None
            and self.mesh.shape["data"] > 1
        ):
            return self.mesh
        return None

    def _case_shard(self, key: str = "inference.case_shard"):
        """``(pid, nproc)`` for cohort-level case parallelism in
        :meth:`predict` (``inference.case_shard``) and
        :meth:`evaluate_native` (``evaluation.case_shard``), or None.

        Value semantics:

        - ``auto`` (default) — under a multi-process JAX job
          (``jax.distributed``), each process predicts the cases
          ``sorted(cases)[pid::nproc]``; tile-level parallelism stays
          within the host (:meth:`_inference_mesh` switches to a
          local-device mesh so no cross-host collective is issued from
          per-host-divergent programs). Single-process runs: no-op.
        - ``[pid, nproc]`` — explicit, for fleets of INDEPENDENT workers
          (e.g. a job-array of single-chip hosts with no jax.distributed
          coordinator). The reference has no cohort parallelism at all
          (/root/reference/src/trainer/trainer.py:303-395 is a serial
          per-case loop on one GPU).
        - ``false`` — every process predicts every case.

        Returns a :class:`CaseShard` ``(pid, nproc, auto)`` or None. The
        ``auto`` flag records HOW the shard was derived: explicit
        ``[pid, nproc]`` shards describe independent workers whose
        results stay per-worker PARTIAL (no cross-process merge —
        merging would double-count when every process of a
        jax.distributed job reads the same explicit slot).
        """
        val = self.config.get(key, "auto")
        if isinstance(val, (list, tuple)):
            pid, nproc = int(val[0]), int(val[1])
            if not 0 <= pid < nproc:
                raise ValueError(f"bad {key} {list(val)!r}")
            return CaseShard(pid, nproc, auto=False) if nproc > 1 else None
        if isinstance(val, bool):
            if not val:
                return None
        else:
            s = str(val).lower()
            if s in ("false", "off", "none", "no", "0", ""):
                return None
            if s not in ("auto", "true", "on", "1"):
                # a typo must not silently drop cases from what the user
                # believed was an unsharded (or differently-sharded) run
                raise ValueError(
                    f"{key}={val!r}: expected 'auto', a [pid, nproc] "
                    "pair, or a falsy value"
                )
        nproc = jax.process_count()
        if nproc > 1:
            return CaseShard(jax.process_index(), nproc, auto=True)
        return None

    def _local_data_mesh(self):
        """A data-axis mesh over THIS process's devices only — used when
        case sharding makes per-process programs diverge (a global mesh
        would deadlock on collectives)."""
        local = jax.local_devices()
        if len(local) <= 1:
            return None
        from jax.sharding import Mesh

        return Mesh(np.asarray(local), ("data",))

    def _restore_target(self):
        """The Orbax restore target: the live state, with the optimizer
        skeleton standing in for moments dropped by
        ``freeze_for_inference`` (Orbax rejects structure mismatches)."""
        skel = getattr(self, "_opt_skeleton", None)
        if self.state.opt_state is None and skel is not None:
            return self.state.replace(opt_state=skel)
        return self.state

    def _zero1_active(self) -> bool:
        """ZeRO-1 optimizer-state sharding: on when ``parallel.zero1`` is
        set and the mesh has a non-trivial data axis."""
        return (
            bool(self.config.get("parallel.zero1", False))
            and self.mesh is not None
            and int(self.mesh.shape["data"]) > 1
        )

    def init_state(self, sample_image: np.ndarray) -> TrainState:
        """Initialize params/opt state from one example image [H, W, D, C]."""
        x = jnp.asarray(sample_image)[None]
        variables = self.model.init(self.keys.next(), x, train=False)
        variables = dict(variables)
        params = variables.pop("params")
        # state carries only persistent collections (e.g. batch_stats);
        # ephemeral captures must never enter the train state
        extra = {
            k: v
            for k, v in variables.items()
            if k not in ("intermediates", "perturbations")
        }
        # a pending --resume restore supersedes the torch import (the
        # checkpoint carries the full trained state; the .pth may not even
        # exist on the resuming machine)
        pretrained = self.config.get("model.pretrained", None)
        if pretrained and not self._resume_from:
            params = self._import_pretrained(str(pretrained), params)
        opt_state = self.tx.init(params)
        ema = None
        if self._ema_decay() is not None:
            # EMA starts AT the initial params (no debias term needed)
            ema = jax.tree_util.tree_map(jnp.copy, params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=opt_state, extra=extra, ema_params=ema,
        )
        if self.mesh is not None:
            state = replicate_tree(state, self.mesh)
            if self._zero1_active():
                # ZeRO-1: Adam moments sharded over the data axis instead of
                # replicated — each chip stores 1/data of the optimizer state
                state = state.replace(
                    opt_state=shard_opt_state(state.opt_state, self.mesh)
                )
        self.state = state

        if self._resume_from:
            self.resume(self._resume_from)
            self._resume_from = None
        return self.state

    def _import_pretrained(self, path, fresh_params):
        """``model.pretrained`` → reference torch .pth mapped onto our tree
        (reference load_pretrained, build.py:66-69), validated leaf-by-leaf
        against the freshly initialized shapes."""
        from multimodal_organ_segmentation_tpu.models.torch_import import (
            import_torch_checkpoint,
        )

        imported = jax.tree_util.tree_map(
            jnp.asarray, import_torch_checkpoint(path, self.config)
        )
        ref = jax.tree_util.tree_map(lambda a: jnp.shape(a), fresh_params)
        got = jax.tree_util.tree_map(lambda a: jnp.shape(a), imported)
        if ref != got:
            raise ValueError(
                f"pretrained checkpoint {path} does not match the configured "
                f"model: expected shapes {ref}, imported {got}"
            )
        if self.logger:
            self.logger.info(f"Imported reference torch weights: {path}")
        return imported

    def resume(self, path) -> None:
        ckpt = load_checkpoint(path, target=self.state)
        tree = ckpt["tree"]
        # reconcile the checkpoint's EMA with this run's config (the
        # tolerant loader restores whatever structure exists on disk)
        want_ema = self.state.ema_params is not None
        have_ema = getattr(tree, "ema_params", None) is not None
        if want_ema and not have_ema:
            # pre-EMA checkpoint: restart the EMA at the restored weights
            # (same rule as a fresh init)
            tree = tree.replace(
                ema_params=jax.tree_util.tree_map(np.copy, tree.params)
            )
            if self.logger:
                self.logger.warning(
                    "checkpoint has no EMA params; EMA restarted at the "
                    "restored weights"
                )
        elif have_ema and not want_ema:
            # EMA was turned off for this run: a stale EMA would never be
            # updated again but would silently drive eval — drop it
            tree = tree.replace(ema_params=None)
            if self.logger:
                self.logger.info(
                    "checkpoint carries EMA params but training.ema_decay "
                    "is 0 — ignoring them for this run"
                )
        self.state = tree
        if self.mesh is not None:
            # checkpoints restore as host numpy (topology-independent);
            # re-place explicitly: params replicated, optimizer moments
            # re-sharded when ZeRO-1 is on (relying on the in-step
            # constraint alone would replicate them for the first step).
            # The moments go host→device DIRECTLY with their sharded spec —
            # replicating first and re-sharding after would transiently
            # materialize the full unsharded Adam state on every chip,
            # exactly the memory ZeRO-1 exists to avoid.
            opt_state = self.state.opt_state
            rest = replicate_tree(
                self.state.replace(opt_state=None), self.mesh
            )
            if self._zero1_active():
                opt_state = shard_opt_state(opt_state, self.mesh)
            else:
                opt_state = replicate_tree(opt_state, self.mesh)
            self.state = rest.replace(opt_state=opt_state)
        meta = ckpt.get("meta", {}) or {}
        step_in_epoch = int(meta.get("step_in_epoch", 0))
        if step_in_epoch > 0:
            # step-granular checkpoint: re-enter the SAME epoch, skip the
            # steps already taken, restore the PRNG stream position — the
            # resumed run reproduces the uninterrupted loss trajectory
            # exactly (preemption recovery; the reference can only resume
            # at epoch granularity)
            self.current_epoch = ckpt["epoch"]
            self._resume_step_in_epoch = step_in_epoch
        else:
            self.current_epoch = ckpt["epoch"] + 1
            self._resume_step_in_epoch = 0
        if "key_counter" in meta:
            self.keys.counter = int(meta["key_counter"])
        self.best_metric = ckpt["best_metric"]
        self.history = {
            "train_loss": list(ckpt["history"].get("train_loss", [])),
            "val_loss": list(ckpt["history"].get("val_loss", [])),
            "val_dice": list(ckpt["history"].get("val_dice", [])),
        }
        if self.logger:
            self.logger.info(
                f"Resumed from epoch {self.current_epoch}"
                + (f" step {step_in_epoch}" if step_in_epoch else "")
            )

    def load_params(self, path) -> None:
        """Load params-only (eval/inference from a checkpoint).

        EMA follows the checkpoint, not the config: a checkpoint trained
        with EMA evaluates on its smoothed weights (``training.ema_eval``
        still opts out), one without evaluates on the raw weights."""
        if self.state is None:
            raise RuntimeError("call init_state first")
        was_frozen = self.state.opt_state is None
        ckpt = load_checkpoint(path, target=self._restore_target())
        tree = ckpt["tree"]
        if was_frozen:
            # stay frozen: the restored moments are host numpy; don't let
            # a late load_params resurrect them onto the device
            tree = tree.replace(opt_state=None)
        self.state = tree

    # -- batching ---------------------------------------------------------

    def _stack_accum(self, batches: List[Dict]) -> Tuple[jax.Array, jax.Array]:
        images = np.stack([np.asarray(b["image"]) for b in batches], axis=0)
        labels = np.stack(
            [np.asarray(b["label"]).astype(np.int32) for b in batches], axis=0
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            nproc = jax.process_count()
            if nproc > 1:
                # multi-host DP: each process loaded only ITS rows of the
                # global batch (DataLoader process_shard); assemble the
                # global array from the per-host blocks. Process order along
                # the data axis matches the loader's contiguous-block split.
                from jax.experimental import multihost_utils as mhu

                data_size = self.mesh.shape["data"]
                if (images.shape[1] * nproc) % data_size != 0:
                    raise ValueError(
                        f"global microbatch {images.shape[1] * nproc} does "
                        f"not divide the mesh data axis ({data_size})"
                    )

                def put_global(x):
                    spec = P(*([None, "data"] + [None] * (x.ndim - 2)))
                    return mhu.host_local_array_to_global_array(
                        x, self.mesh, spec
                    )

                return put_global(images), put_global(labels)

            data_size = self.mesh.shape["data"]
            divisible = images.shape[1] % data_size == 0
            if not divisible and not self._warned_replicate:
                self._warned_replicate = True
                msg = (
                    f"microbatch {images.shape[1]} does not divide the mesh "
                    f"data axis ({data_size}): replicating the batch — data "
                    f"parallelism is OFF for this run. Pick a batch size "
                    f"divisible by {data_size}."
                )
                if self.logger:
                    self.logger.warning(msg)
                else:
                    import warnings

                    warnings.warn(msg)

            # [accum, micro, ...]: shard the microbatch dim over `data`
            # (replicate when the microbatch doesn't divide the axis)
            def put(x):
                axis = "data" if divisible else None
                spec = P(*([None, axis] + [None] * (x.ndim - 2)))
                return jax.device_put(x, NamedSharding(self.mesh, spec))

            return put(images), put(labels)
        return jnp.asarray(images), jnp.asarray(labels)

    # -- loops ------------------------------------------------------------

    def _prune_metrics_stream(self) -> None:
        """Drop metrics.jsonl lines for epochs this run is about to re-write.

        A fresh run in an existing experiment dir, or a resume from a
        non-last checkpoint (e.g. ``best``), would otherwise append a second
        record for the same epoch — dashboards would double-count or plot a
        sawtooth. Lines with ``epoch <= current_epoch`` (already completed,
        not re-run) are kept so the file stays the full trajectory.
        """
        import json as _json

        path = self.output_dir / "metrics.jsonl"
        if not path.exists():
            return
        kept = []
        for line in path.read_text().splitlines():
            try:
                rec = _json.loads(line.replace("NaN", "null"))
            except Exception:
                continue
            if int(rec.get("epoch", 0)) <= self.current_epoch:
                kept.append(line)
        path.write_text("".join(l + "\n" for l in kept))

    def train(self) -> Dict[str, List[float]]:
        assert self.train_loader is not None, "train requires a train_loader"
        es_cfg = self.config.get("training.early_stopping", {}) or {}
        patience = int(es_cfg.get("patience", 30))
        es_enabled = bool(es_cfg.get("enabled", False))
        no_improve = 0
        prev_metric: Optional[float] = None
        native_every = int(self.config.get("training.native_val_every", 0) or 0)
        monitor = str(
            self.config.get("training.checkpoint.monitor", "dice") or "dice"
        ).lower()
        if monitor == "dice_native" and native_every <= 0:
            raise ValueError(
                "training.checkpoint.monitor=dice_native requires "
                "training.native_val_every > 0"
            )

        if self._train_step is None:
            self._train_step = make_train_step(
                self.model, self.tx, self.loss_fn, self.accum_steps,
                opt_constraint=(
                    zero1_constrainer(self.mesh) if self._zero1_active() else None
                ),
                skip_nonfinite=bool(
                    self.config.get("training.skip_nonfinite_updates", False)
                ),
                ema_decay=self._ema_decay(),
            )

        if self._ckpt_async and self._ckpt_writer is None:
            self._ckpt_writer = AsyncCheckpointWriter()
            self.ckpt.writer = self._ckpt_writer

        tb_writer = None
        if jax.process_count() == 1 or jax.process_index() == 0:
            self._prune_metrics_stream()
            if bool(self.config.get("experiment.tensorboard", False)):
                # the reference DECLARES tensorboard (requirements.txt:32)
                # but never imports it; this is the real event stream,
                # dependency-free (utils/tensorboard.py)
                from multimodal_organ_segmentation_tpu.utils.tensorboard import (
                    SummaryWriter,
                    read_scalar_events,
                )

                tb_dir = self.output_dir / "tb"
                old_events = (
                    sorted(tb_dir.glob("events.out.tfevents.*"))
                    if tb_dir.exists()
                    else []
                )
                tb_writer = SummaryWriter(tb_dir)
                # consolidate prior runs into the new file with the same
                # semantics as _prune_metrics_stream: completed epochs
                # (step <= current_epoch) are kept, stale epochs about to be
                # re-run are dropped. Original wall_time is not preserved
                # (scalar dashboards plot against step).
                kept: Dict = {}
                for old in old_events:
                    try:
                        for tag, pts in read_scalar_events(old).items():
                            for step, v in pts:
                                if step <= self.current_epoch:
                                    kept[(tag, step)] = v
                    except ValueError:
                        pass  # corrupt/truncated prior file: drop it
                    old.unlink()
                for (tag, step), v in sorted(kept.items(), key=lambda kv: kv[0][1]):
                    tb_writer.add_scalar(tag, v, step)

        try:
            profile_dir = self.config.get("hardware.profile_dir")
            for epoch in range(self.current_epoch, self.epochs):
                self.current_epoch = epoch
                lr = self.scheduler.lr_for_epoch(epoch, metric=prev_metric)

                # jax.profiler trace of one epoch when requested (SURVEY.md §5:
                # the reference has no tracing at all)
                if profile_dir and epoch == int(self.config.get("hardware.profile_epoch", 1)):
                    jax.profiler.start_trace(str(profile_dir))

                t0 = time.perf_counter()
                train_loss = self._train_epoch(lr)
                self.history["train_loss"].append(train_loss)

                if profile_dir and epoch == int(self.config.get("hardware.profile_epoch", 1)):
                    jax.profiler.stop_trace()

                val_loss, val_metrics = self._validate()
                self.history["val_loss"].append(val_loss)
                val_dice = val_metrics.get("dice", 0.0)
                self.history["val_dice"].append(val_dice)
                prev_metric = val_dice

                # periodic native-grid validation: the deployed pipeline's
                # Dice (sliding window on original grids + postprocess)
                dice_native = None
                if native_every > 0 and (
                    (epoch + 1) % native_every == 0 or epoch + 1 == self.epochs
                ):
                    dice_native = self._native_val_dice()
                if native_every > 0:
                    # aligned-with-epochs history (None on off-cycle epochs)
                    self.history.setdefault("val_dice_native", []).append(
                        dice_native
                    )

                dt = time.perf_counter() - t0
                if self.logger:
                    native_str = (
                        f" Native Dice: {dice_native:.4f}"
                        if dice_native is not None else ""
                    )
                    self.logger.info(
                        f"Epoch [{epoch + 1}/{self.epochs}] "
                        f"Train Loss: {train_loss:.4f} Val Loss: {val_loss:.4f} "
                        f"Val Dice: {val_dice:.4f}{native_str} "
                        f"LR: {lr:.2e} ({dt:.1f}s)"
                    )
                # machine-readable epoch stream (one JSON object per line) for
                # dashboards/experiment tracking; append-only so a resumed run
                # keeps the full trajectory in one file (stale lines for epochs
                # about to be re-run are pruned at train() start). The reference
                # keeps history only inside checkpoint pickles (trainer.py:182-187).
                if jax.process_count() == 1 or jax.process_index() == 0:
                    import json as _json

                    def _num(x):
                        # strict-JSON consumers (jq, JSON.parse, pandas) reject
                        # bare NaN/Infinity tokens — emit null instead
                        x = float(x)
                        return round(x, 6) if np.isfinite(x) else None

                    rec = {
                        "epoch": epoch + 1,
                        "train_loss": _num(train_loss),
                        "val_loss": _num(val_loss),
                        "val_dice": _num(val_dice),
                        "lr": lr,
                        "seconds": round(dt, 2),
                    }
                    if dice_native is not None:
                        rec["val_dice_native"] = _num(dice_native)
                    with open(self.output_dir / "metrics.jsonl", "a") as f:
                        f.write(_json.dumps(rec) + "\n")
                    if tb_writer is not None:
                        scalars = {
                            "loss/train": train_loss,
                            "loss/val": val_loss,
                            "metrics/val_dice": val_dice,
                            "lr": lr,
                            "time/epoch_seconds": dt,
                        }
                        if dice_native is not None:
                            scalars["metrics/val_dice_native"] = dice_native
                        tb_writer.add_scalars(scalars, step=epoch + 1)
                        tb_writer.flush()

                # best-metric tracking is independent of checkpoint policy
                # (with save_best off, early stopping must still see the best).
                # monitor=dice_native tracks best only on native-val epochs —
                # off-cycle epochs can't claim (or reset) the best.
                if monitor == "dice_native":
                    monitored = dice_native
                else:
                    monitored = val_dice
                if monitored is None:
                    is_best = False
                    improved = False
                else:
                    is_best = monitored >= self.best_metric
                    improved = monitored > self.best_metric
                    self.best_metric = max(self.best_metric, monitored)
                self.ckpt.save(
                    self.state, epoch, monitored if monitored is not None else val_dice,
                    self.best_metric,
                    history=self.history, is_best=is_best,
                )

                # early stopping on val dice (reference: trainer.py:209-218)
                if improved:
                    no_improve = 0
                else:
                    no_improve += 1
                if es_enabled and no_improve >= patience:
                    if self.logger:
                        self.logger.info(f"Early stopping at epoch {epoch + 1}")
                    break
        finally:
            # close writers on every exit path (relay outage, OOM,
            # KeyboardInterrupt) — not just normal completion
            if tb_writer is not None:
                tb_writer.close()
            if self._ckpt_writer is not None:
                # don't return before every queued write is on disk
                # (writer errors surface here); close() also stops the
                # worker thread — no leak when many Trainers run in one
                # process
                self._ckpt_writer.close()
                self._ckpt_writer = None
                self.ckpt.writer = None
        return self.history

    def _train_epoch(self, lr: float) -> float:
        from multimodal_organ_segmentation_tpu.train.checkpoint import (
            save_checkpoint,
        )

        if self.state is None:
            first = next(iter(self.train_loader))
            self.init_state(np.asarray(first["image"][0]))

        self.state = self.state.replace(
            opt_state=set_learning_rate(self.state.opt_state, lr)
        )

        # step-granular preemption recovery: every N optimizer steps an
        # atomic "last_step" checkpoint records (state, step-in-epoch, PRNG
        # counter); resume re-enters this epoch at the exact position
        save_every_steps = int(
            self.config.get("training.checkpoint.save_every_steps", 0) or 0
        )
        skip_steps = self._resume_step_in_epoch
        self._resume_step_in_epoch = 0
        if hasattr(self.train_loader, "epoch_iter"):
            it = self.train_loader.epoch_iter(
                self.current_epoch + 1,
                skip_batches=skip_steps * self.accum_steps,
            )
        else:  # plain iterables (test fixtures): manual skip
            it = iter(self.train_loader)
            for _ in range(skip_steps * self.accum_steps):
                next(it, None)

        total, count = 0.0, 0
        step_in_epoch = skip_steps
        self.last_step_losses = []
        group: List[Dict] = []
        for batch in it:
            group.append(batch)
            if len(group) < self.accum_steps:
                continue
            images, labels = self._stack_accum(group)
            group = []
            self.state, metrics = self._train_step(
                self.state, images, labels, self.keys.next()
            )
            loss = float(metrics["loss"])
            if float(metrics.get("skipped", 0.0)) > 0:
                if self.logger:
                    self.logger.warning(
                        f"step {step_in_epoch + 1}: non-finite loss/grads "
                        f"(loss={loss}) — update skipped"
                    )
            else:
                total += loss
                count += 1
            step_in_epoch += 1
            self.last_step_losses.append(loss)
            if save_every_steps and step_in_epoch % save_every_steps == 0:
                _save = (
                    self._ckpt_writer.submit
                    if self._ckpt_writer is not None
                    else save_checkpoint
                )
                _save(
                    self.state,
                    self.output_dir / "last_step",
                    epoch=self.current_epoch,
                    best_metric=self.best_metric,
                    history=self.history,
                    step_in_epoch=step_in_epoch,
                    key_counter=self.keys.counter,
                )
        # trailing partial accumulation group is dropped (the reference
        # leaves its grads un-stepped, trainer.py:245-248)
        if count == 0 and skip_steps > 0:
            # the step checkpoint landed on the epoch's final step: nothing
            # left to run — report the last known train loss instead of a
            # bogus 0.0 in the history
            if self.logger:
                self.logger.info(
                    f"Epoch {self.current_epoch + 1} was already complete at "
                    f"the resumed step checkpoint (step {skip_steps})"
                )
            prior = self.history.get("train_loss") or []
            return float(prior[-1]) if prior else 0.0
        return total / max(count, 1)

    def _validate(self) -> Tuple[float, Dict[str, Any]]:
        if self.val_loader is None:
            return 0.0, {}
        if self.state is None:
            first = next(iter(self.val_loader))
            self.init_state(np.asarray(first["image"][0]))

        from multimodal_organ_segmentation_tpu.data.dataloader import device_prefetch

        data_size = self.mesh.shape["data"] if self.mesh is not None else 1
        total, count = 0.0, 0
        inter = np.zeros(self.num_classes)
        union = np.zeros(self.num_classes)
        for batch in device_prefetch(iter(self.val_loader)):
            # batches arrive already device_put by the prefetch thread —
            # stay on device (a host fetch here costs minutes through the
            # axon relay and defeats the prefetch)
            images = jnp.asarray(batch["image"])
            labels = jnp.asarray(batch["label"]).astype(jnp.int32)
            if data_size > 1:
                # sharded validation: zero-pad the batch to the data axis
                # (device-side), shard the batch dim, and pass the valid
                # count as a static arg — GSPMD psums the loss/∩/∪
                # reductions across devices
                from jax.sharding import NamedSharding, PartitionSpec as P

                b = images.shape[0]
                bp = int(math.ceil(b / data_size)) * data_size
                if bp != b:
                    pad = [(0, bp - b)] + [(0, 0)] * (images.ndim - 1)
                    images = jnp.pad(images, pad)
                    labels = jnp.pad(labels, pad[: labels.ndim])
                bspec = lambda nd: NamedSharding(
                    self.mesh, P(*(["data"] + [None] * (nd - 1)))
                )
                images = jax.device_put(images, bspec(images.ndim))
                labels = jax.device_put(labels, bspec(labels.ndim))
                loss, preds, i, u = self._eval_step(
                    self._infer_params(), self.state.extra, images, labels, b
                )
            else:
                loss, preds, i, u = self._eval_step(
                    self._infer_params(), self.state.extra, images, labels
                )
            total += float(loss)
            count += 1
            inter += np.asarray(i, dtype=np.float64)
            union += np.asarray(u, dtype=np.float64)

        smooth = 1e-5
        per_class = (2.0 * inter + smooth) / (union + smooth)
        metrics = {
            "dice": float(per_class[1:].mean()),
            "dice_per_class": per_class.tolist(),
        }
        return total / max(count, 1), metrics

    def evaluate(self) -> Dict[str, Any]:
        loss, metrics = self._validate()
        metrics["loss"] = loss
        return metrics

    def _native_val_dice(self) -> Optional[float]:
        """Mean foreground Dice of the DEPLOYED pipeline — sliding-window
        inference on the val split's ORIGINAL grids + the configured
        postprocess — computable DURING training (``training.
        native_val_every``). Unlike :meth:`evaluate_native` this keeps the
        optimizer moments resident (training continues afterwards) and
        scores Dice only (no EDT metrics — this runs every N epochs).
        The resized-grid ``_validate`` Dice is a proxy; this is the metric
        the model actually deploys on, so ``training.checkpoint.monitor:
        dice_native`` can select the best checkpoint by it.
        """
        if self._native_val_runner is None:
            from multimodal_organ_segmentation_tpu.data.dataloader import (
                get_dataloader,
            )
            from multimodal_organ_segmentation_tpu.data.transforms import (
                get_transforms,
            )
            from multimodal_organ_segmentation_tpu.ops.sliding_window import (
                SlidingWindowRunner,
            )

            try:
                self._native_val_loader = get_dataloader(
                    self.config,
                    split="val",
                    transform=get_transforms(self.config, mode="native"),
                )
            except Exception as e:  # no val CSV / data_root: disable
                if self.logger:
                    self.logger.warning(
                        f"native_val disabled: cannot build val loader ({e})"
                    )
                self.config.set("training.native_val_every", 0)
                return None
            sw_cfg = self.config.get("inference.sliding_window", {}) or {}
            self._native_val_runner = SlidingWindowRunner(
                self._predict_fn,
                roi_size=tuple(sw_cfg.get("roi_size", [96, 96, 96])),
                num_classes=self.num_classes,
                overlap=float(sw_cfg.get("overlap", 0.5)),
                sw_batch_size=self.config.get("inference.batch_size", 4),
                mode=str(sw_cfg.get("mode", "gaussian")),
                mesh=self._inference_mesh(),
            )

        from multimodal_organ_segmentation_tpu.ops.postprocess import (
            postprocess_from_config,
        )
        from multimodal_organ_segmentation_tpu.train.metrics import DiceMetric

        variables = {"params": self._infer_params(), **self.state.extra}
        dm = DiceMetric(self.num_classes)
        for batch in self._native_val_loader:
            images = np.asarray(batch["image"])
            labels = np.asarray(batch["label"]).astype(np.int32)
            for b in range(images.shape[0]):
                logits = self._native_val_runner(jnp.asarray(images[b]), variables)
                pred = np.asarray(jnp.argmax(logits, axis=-1))
                pred = postprocess_from_config(pred, self.config)
                dm.update(jnp.asarray(pred[None]), jnp.asarray(labels[b][None]))
        return float(dm.compute()["dice"])

    def evaluate_native(self, loader=None) -> Dict[str, Any]:
        """Native-grid evaluation: sliding-window inference on the ORIGINAL
        volume grids, streaming per-class Dice + 95th-percentile Hausdorff.

        The reference (and our default ``evaluate``) can only score on the
        resized-96³ grid because Resize sits in its test transform pipeline
        (SURVEY.md §3.2); this path evaluates where clinical metrics are
        actually defined. Enable from the CLI with
        ``evaluation.sliding_window: true``. Volumes are served through the
        shape-bucketed (and, on a mesh, data-parallel) sliding-window
        runner.
        """
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            SlidingWindowRunner,
        )
        from multimodal_organ_segmentation_tpu.train.metrics import (
            AverageSurfaceDistance,
            DiceMetric,
            HausdorffDistance,
            SurfaceDice,
        )

        loader = loader if loader is not None else self.val_loader
        assert loader is not None, "evaluate_native requires a loader"
        if self.state is None:
            first = next(iter(loader))
            self.init_state(np.asarray(first["image"][0]))

        sw_cfg = self.config.get("inference.sliding_window", {}) or {}
        roi = tuple(sw_cfg.get("roi_size", [96, 96, 96]))
        overlap = float(sw_cfg.get("overlap", 0.5))
        mode = str(sw_cfg.get("mode", "gaussian"))
        # int or "auto"/"auto:N" — the runner resolves auto per bucket
        sw_batch = self.config.get("inference.batch_size", 4)
        # cohort parallelism (evaluation.case_shard, default auto): under a
        # multi-process job each process scores cases[pid::nproc] and the
        # streaming metric states are merged across processes afterwards —
        # instead of every host redundantly scoring the full val set
        shard = self._case_shard("evaluation.case_shard")
        multiproc = shard is not None and jax.process_count() > 1
        # full-cohort merge only for AUTO shards — an explicit [pid,nproc]
        # read identically by every process of a jax.distributed job would
        # double-count every case if merged (documented semantics: explicit
        # shards return per-worker PARTIAL metrics)
        merge_across = multiproc and shard.auto
        dp_mesh = self._inference_mesh()
        if multiproc and dp_mesh is not None:
            # per-process case lists (and volume shapes) diverge — a global
            # mesh would deadlock on its collectives; tile-parallelism
            # stays within the host
            dp_mesh = self._local_data_mesh()
        runner = SlidingWindowRunner(
            self._predict_fn,
            roi_size=roi,
            num_classes=self.num_classes,
            overlap=overlap,
            sw_batch_size=sw_batch,
            mode=mode,
            mesh=dp_mesh,
        )

        members = self._inference_members()
        self.freeze_for_inference()  # moments off-chip before tile chunks
        if multiproc:
            # params may live on the GLOBAL mesh; the local program
            # rejects global-device arrays (see predict)
            members = [
                jax.tree_util.tree_map(
                    lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                    v,
                )
                for v in members
            ]
        if len(members) == 1:
            logits_for = lambda img: runner(img, members[0])
        else:
            # ensemble: average member softmaxes (argmax is unaffected by
            # the missing 1/N normalization)
            def logits_for(img):
                acc = None
                for v in members:
                    p = jax.nn.softmax(runner(img, v), axis=-1)
                    acc = p if acc is None else acc + p
                return acc

        from multimodal_organ_segmentation_tpu.ops.postprocess import (
            postprocess_from_config as _eval_postprocess,
        )
        from multimodal_organ_segmentation_tpu.train.metrics import (
            _dice_update,
        )

        hd_pct = float(self.config.get("evaluation.hd_percentile", 95))
        nsd_tol = float(
            self.config.get("evaluation.surface_dice_tolerance_mm", 2.0)
        )
        dice = DiceMetric(self.num_classes)
        hd = HausdorffDistance(percentile=hd_pct)
        nsd = SurfaceDice(self.num_classes, tolerance_mm=nsd_tol)
        assd = AverageSurfaceDistance(self.num_classes)
        # lesion-wise detection (opt-in): evaluation.lesion_metrics is
        # true (all foreground classes) or a list of lesion-like labels
        lesion_cfg = self.config.get("evaluation.lesion_metrics", False)
        lesions = None
        if lesion_cfg:
            from multimodal_organ_segmentation_tpu.train.metrics import (
                LesionDetectionMetric,
            )

            lesions = LesionDetectionMetric(
                self.num_classes,
                overlap_threshold=float(
                    self.config.get("evaluation.lesion_overlap_threshold", 0.0)
                ),
                classes=(
                    [int(c) for c in lesion_cfg]
                    if isinstance(lesion_cfg, (list, tuple))
                    else None
                ),
            )
        # voxel-level ECE of the model posterior (pre-postprocess: it
        # scores the softmax confidences, not the cleaned label map)
        ece = None
        if self.config.get("evaluation.calibration", False):
            from multimodal_organ_segmentation_tpu.train.metrics import (
                CalibrationError,
            )

            ece = CalibrationError(
                n_bins=int(self.config.get("evaluation.calibration_bins", 10))
            )
        per_case: List[Dict[str, Any]] = []
        case_idx: List[int] = []  # global sample index (stable row order)
        n_cases = 0
        g = 0  # global sample counter across batches (shard ownership)
        smooth = 1e-5
        for batch in loader:
            images = np.asarray(batch["image"])
            labels = np.asarray(batch["label"]).astype(np.int32)
            ids = batch.get("patient_id")
            for b in range(images.shape[0]):
                if shard is not None and g % shard[1] != shard[0]:
                    g += 1
                    continue
                logits = logits_for(jnp.asarray(images[b]))
                case_ece = None
                if ece is not None:
                    # single member returns logits; the ensemble path
                    # returns SUMMED member softmaxes — normalize to a
                    # proper posterior before scoring confidence
                    probs_dev = (
                        logits / len(members)
                        if len(members) > 1
                        else jax.nn.softmax(logits, axis=-1)
                    )
                    case_ece = ece.update(probs_dev, jnp.asarray(labels[b]))
                pred = np.asarray(jnp.argmax(logits, axis=-1))
                # score the DEPLOYED pipeline: the same inference.postprocess
                # filter predict()/serving apply is applied before metrics
                pred = _eval_postprocess(pred, self.config)
                spacing = None
                affines = batch.get("affine")
                if affines is not None and affines[b] is not None:
                    A = np.asarray(affines[b], dtype=np.float64)
                    if A.shape == (4, 4):
                        # voxel size = column norms of the direction matrix
                        spacing = tuple(
                            np.sqrt((A[:3, :3] ** 2).sum(axis=0)).tolist()
                        )
                # streaming aggregates + per-case readouts: the per-case
                # values are the DELTAS of each metric's state, so the
                # expensive EDTs run exactly once per case
                i, u = _dice_update(
                    jnp.asarray(pred[None]), jnp.asarray(labels[b][None]),
                    self.num_classes,
                )
                i, u = np.asarray(i, np.float64), np.asarray(u, np.float64)
                dice.intersection += i
                dice.union += u
                dice.count += 1
                # per-case, a class absent from BOTH pred and GT (union==0)
                # is reported None — not a vacuous 1.0 that would inflate
                # the case mean — matching the hd/surface_dice columns
                case_dice = [
                    float((2.0 * ii + smooth) / (uu + smooth)) if uu > 0 else None
                    for ii, uu in zip(i.tolist(), u.tolist())
                ]

                n_hd = len(hd.distances)
                hd.update(pred[None], labels[b][None], spacing=spacing)
                case_hd = (
                    float(hd.distances[-1])
                    if len(hd.distances) > n_hd else None
                )

                # one EDT pair per (case, class), shared by NSD + ASSD
                edt_cache: Dict[Any, Any] = {}
                n_nsd = [len(s) for s in nsd._scores]
                nsd.update(
                    pred[None], labels[b][None], spacing=spacing,
                    distance_cache=edt_cache,
                )
                case_nsd = [
                    float(s[-1]) if len(s) > n0 else None
                    for s, n0 in zip(nsd._scores, n_nsd)
                ]
                seen = [v for v in case_nsd[1:] if v is not None]

                n_assd = [len(s) for s in assd._scores]
                assd.update(
                    pred[None], labels[b][None], spacing=spacing,
                    distance_cache=edt_cache,
                )
                case_assd = [
                    float(s[-1]) if len(s) > n0 else None
                    for s, n0 in zip(assd._scores, n_assd)
                ]
                assd_seen = [v for v in case_assd[1:] if v is not None]

                lesion_row = (
                    lesions.update(pred[None], labels[b][None])[0]
                    if lesions is not None
                    else {}
                )

                case_id = (
                    str(ids[b]) if ids is not None and b < len(ids)
                    else f"case_{g:03d}"  # GLOBAL index: unique under sharding
                )
                fg_present = [v for v in case_dice[1:] if v is not None]
                per_case.append(
                    {
                        "case": case_id,
                        "dice": (
                            float(np.mean(fg_present)) if fg_present else None
                        ),
                        "dice_per_class": case_dice,
                        f"hd{hd_pct:g}": case_hd,
                        "surface_dice": (
                            float(np.mean(seen)) if seen else None
                        ),
                        "surface_dice_per_class": case_nsd,
                        "assd": (
                            float(np.mean(assd_seen)) if assd_seen else None
                        ),
                        "assd_per_class": case_assd,
                        **lesion_row,
                        **({"ece": case_ece} if ece is not None else {}),
                    }
                )
                case_idx.append(g)
                n_cases += 1
                g += 1

        if merge_across:
            from multimodal_organ_segmentation_tpu.parallel.multihost import (
                allgather_payloads,
            )

            payload = {
                "rows": per_case,
                "idx": case_idx,
                "dice": [
                    dice.intersection.tolist(), dice.union.tolist(),
                    int(dice.count),
                ],
                "hd": [float(d) for d in hd.distances],
                "nsd": [[float(v) for v in s] for s in nsd._scores],
                "assd": [[float(v) for v in s] for s in assd._scores],
                "les": (
                    [list(lesions._tp), list(lesions._fp), list(lesions._fn)]
                    if lesions is not None else None
                ),
                "ece": (
                    [ece.count.tolist(), ece.conf_sum.tolist(),
                     ece.correct_sum.tolist()]
                    if ece is not None else None
                ),
            }
            parts = allgather_payloads(payload)
            dice.reset()
            hd.reset()
            nsd.reset()
            assd.reset()
            if lesions is not None:
                lesions.reset()
            if ece is not None:
                ece.reset()
            indexed_rows: List[Tuple[int, Dict[str, Any]]] = []
            for part in parts:
                dice.intersection += np.asarray(part["dice"][0], np.float64)
                dice.union += np.asarray(part["dice"][1], np.float64)
                dice.count += int(part["dice"][2])
                hd.distances.extend(part["hd"])
                for c in range(self.num_classes):
                    nsd._scores[c].extend(part["nsd"][c])
                    assd._scores[c].extend(part["assd"][c])
                if lesions is not None and part["les"] is not None:
                    for c in range(self.num_classes):
                        lesions._tp[c] += int(part["les"][0][c])
                        lesions._fp[c] += int(part["les"][1][c])
                        lesions._fn[c] += int(part["les"][2][c])
                if ece is not None and part["ece"] is not None:
                    ece.count += np.asarray(part["ece"][0], np.float64)
                    ece.conf_sum += np.asarray(part["ece"][1], np.float64)
                    ece.correct_sum += np.asarray(part["ece"][2], np.float64)
                indexed_rows.extend(zip(part["idx"], part["rows"]))
            indexed_rows.sort(key=lambda t: t[0])
            per_case = [r for _, r in indexed_rows]
            n_cases = len(per_case)

        metrics: Dict[str, Any] = dice.compute()
        hd_m = hd.compute()
        metrics["hd95"] = hd_m.get("hausdorff_distance")
        if "hausdorff_distance_std" in hd_m:
            metrics["hd95_std"] = hd_m["hausdorff_distance_std"]
        metrics.update(nsd.compute())
        metrics.update(assd.compute())
        if lesions is not None:
            metrics.update(lesions.compute())
        if ece is not None:
            metrics.update(ece.compute())
        metrics["num_cases"] = n_cases
        metrics["per_case"] = per_case
        return metrics

    # -- inference ----------------------------------------------------------

    def _discover_cases(self, input_path) -> Dict[str, Dict[str, Path]]:
        """{case_id: {modality: path}} over {input}/{mod.lower()}/*.nii[.gz]
        (reference: trainer.py:327-334)."""
        input_path = Path(input_path)
        modalities = list(self.config.get("data.modalities", ["CT", "PET"]))
        cases: Dict[str, Dict[str, Path]] = {}
        for mod in modalities:
            mdir = input_path / mod.lower()
            if not mdir.exists():
                continue
            for p in sorted(list(mdir.glob("*.nii")) + list(mdir.glob("*.nii.gz"))):
                case = p.name.replace(".nii.gz", "").replace(".nii", "")
                cases.setdefault(case, {})[mod] = p
        return {
            c: mods for c, mods in cases.items() if len(mods) == len(modalities)
        }

    def predict(self, input_path, output_path) -> List[str]:
        """Sliding-window inference over discovered cases; saves
        ``{case}_pred.nii.gz`` (uint8, source affine)."""
        from multimodal_organ_segmentation_tpu.ops.postprocess import (
            postprocess_from_config,
        )
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            predict_labels,
        )
        from multimodal_organ_segmentation_tpu.utils.io import load_case_channels

        output_path = ensure_dir(output_path)
        sw_cfg = self.config.get("inference.sliding_window", {}) or {}
        roi = tuple(sw_cfg.get("roi_size", [96, 96, 96]))
        overlap = float(sw_cfg.get("overlap", 0.5))
        mode = str(sw_cfg.get("mode", "gaussian"))
        # int or "auto"/"auto:N" (divisor search over the tile count)
        sw_batch = self.config.get("inference.batch_size", 4)
        tta = bool(self.config.get("inference.tta", False))

        cases = self._discover_cases(input_path)
        # cohort parallelism: disjoint case subsets per process/worker
        # (inference.case_shard); union over workers == the full cohort
        shard = self._case_shard()
        n_total = len(cases)
        if shard is not None:
            pid, nproc = shard
            keys = sorted(cases)[pid::nproc]
            cases = {k: cases[k] for k in keys}
        if self.logger:
            msg = f"Found {n_total} cases under {input_path}"
            if shard is not None:
                msg += (
                    f" (case shard {shard[0]}/{shard[1]}: "
                    f"{len(cases)} assigned to this worker)"
                )
            self.logger.info(msg)

        predict_fn = self._predict_fn
        # checkpoint ensembling (inference.ensemble): member softmaxes are
        # averaged — the standard multi-fold deployment recipe
        # (nnU-Net-style); the reference has no ensembling
        member_vars = self._inference_members()
        self.freeze_for_inference()  # moments off-chip before tile chunks

        # serving engine: shape-bucketed (one compile per tile-count bucket
        # instead of per volume shape) and, with a >1-device data axis,
        # mesh-parallel (tile chunks sharded over `data`). Both default on;
        # `inference.shape_bucketing: false` falls back to the per-shape
        # static-grid program.
        use_bucket = bool(self.config.get("inference.shape_bucketing", True))
        dp_mesh = self._inference_mesh()
        if shard is not None and jax.process_count() > 1:
            if dp_mesh is not None:
                # per-process case lists diverge — a global mesh would hang
                # on cross-host collectives; keep tile-parallelism within
                # the host
                dp_mesh = self._local_data_mesh()
            # params may live on the GLOBAL mesh (init/restore under the
            # trainer mesh); the per-process-divergent program (local-mesh
            # OR meshless when inference.data_parallel is off) rejects
            # global-device arrays. Inference params are fully replicated,
            # so every shard is addressable here — pull to host and let
            # the local jit re-commit them (once per cohort, not per case).
            member_vars = [
                jax.tree_util.tree_map(
                    lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                    v,
                )
                for v in member_vars
            ]
        runner = None
        if use_bucket:
            from multimodal_organ_segmentation_tpu.ops.sliding_window import (
                SlidingWindowRunner,
            )

            runner = SlidingWindowRunner(
                predict_fn,
                roi_size=roi,
                num_classes=self.num_classes,
                overlap=overlap,
                sw_batch_size=sw_batch,
                mode=mode,
                mesh=dp_mesh,
            )

        # IO/compute overlap: a loader thread decodes the NEXT case's NIfTIs
        # while the device runs the current one, and a writer thread gzips
        # masks behind the device loop (host IO is seconds per clinical
        # volume — serial it would sit between every device dispatch)
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        modalities = list(self.config.get("data.modalities", ["CT", "PET"]))

        def _load_case(case, mods):
            image, affine = load_case_channels(mods, modalities)
            return case, image, affine

        import itertools

        prefetch = max(1, int(self.config.get("hardware.prefetch_depth", 2)))
        loader = ThreadPoolExecutor(max_workers=1, thread_name_prefix="sw-load")
        writer = ThreadPoolExecutor(max_workers=1, thread_name_prefix="sw-write")
        case_iter = iter(cases.items())
        # prime from the SAME iterator the loop advances, so the split
        # between primed and streamed cases is structural
        pending = deque(
            loader.submit(_load_case, c, m)
            for c, m in itertools.islice(case_iter, prefetch)
        )

        if runner is not None:
            run_sw_v = lambda vol, v: runner(vol, v)
        elif dp_mesh is not None:
            from multimodal_organ_segmentation_tpu.ops.sliding_window import (
                resolve_sw_batch,
                sharded_sliding_window_inference,
            )

            run_sw_v = lambda vol, v: sharded_sliding_window_inference(
                vol,
                predict_fn,
                roi_size=roi,
                num_classes=self.num_classes,
                mesh=dp_mesh,
                overlap=overlap,
                sw_batch_size=resolve_sw_batch(
                    sw_batch, tuple(vol.shape[:3]), roi, overlap,
                    chunk_multiple=int(dp_mesh.shape["data"]),
                ),
                mode=mode,
                params=v,
            )
        else:
            from multimodal_organ_segmentation_tpu.ops.sliding_window import (
                resolve_sw_batch,
            )

            def run_sw_v(vol, v):
                return sliding_window_inference(
                    vol,
                    predict_fn,
                    roi_size=roi,
                    num_classes=self.num_classes,
                    overlap=overlap,
                    sw_batch_size=resolve_sw_batch(
                        sw_batch, tuple(vol.shape[:3]), roi, overlap
                    ),
                    mode=mode,
                    params=v,
                )

        is_ensemble = len(member_vars) > 1
        if is_ensemble:

            def run_sw(vol):
                acc = None
                for v in member_vars:
                    p = jax.nn.softmax(run_sw_v(vol, v), axis=-1)
                    acc = p if acc is None else acc + p
                return acc / len(member_vars)

        else:
            run_sw = lambda vol: run_sw_v(vol, member_vars[0])

        normalize = bool(self.config.get("inference.normalize", False))
        if normalize:
            from multimodal_organ_segmentation_tpu.data.transforms import (
                normalize_from_config,
            )
        save_probs = bool(self.config.get("inference.save_probabilities", False))
        save_unc = bool(self.config.get("inference.save_uncertainty", False))

        written = []
        write_futures = []
        try:
            while pending:
                case, image_np, affine = pending.popleft().result()
                nxt = next(case_iter, None)
                if nxt is not None:
                    pending.append(loader.submit(_load_case, *nxt))
                image = jnp.asarray(image_np)
                if normalize:
                    image = normalize_from_config(image, self.config)

                # shared with the HTTP service (serving/server.py) so the
                # two serving surfaces produce identical masks
                probs_np = None
                unc_np = None
                if save_probs or save_unc:
                    labels_dev, probs_dev = predict_labels(
                        run_sw, image, tta=tta, return_probs=True,
                        already_probs=is_ensemble,
                    )
                    pred = np.asarray(labels_dev).astype(np.uint8)
                    if save_unc:
                        from multimodal_organ_segmentation_tpu.ops.sliding_window import (  # noqa: E501
                            predictive_entropy,
                        )

                        unc_np = np.asarray(
                            predictive_entropy(probs_dev), dtype=np.float32
                        )
                    if save_probs:
                        probs_np = np.asarray(probs_dev, dtype=np.float32)
                else:
                    pred = np.asarray(
                        predict_labels(
                            run_sw, image, tta=tta,
                        )
                    ).astype(np.uint8)
                pred = postprocess_from_config(pred, self.config)
                out_file = Path(output_path) / f"{case}_pred.nii.gz"

                def _write(pred=pred, out_file=out_file, affine=affine,
                           probs_np=probs_np, unc_np=unc_np, case=case):
                    save_nifti(pred, out_file, affine=affine)
                    if probs_np is not None:
                        # 4D NIfTI [H, W, D, C] float32 per-class softmax
                        save_nifti(
                            probs_np,
                            Path(output_path) / f"{case}_prob.nii.gz",
                            affine=affine,
                        )
                    if unc_np is not None:
                        # 3D float32 normalized predictive entropy [0, 1]
                        save_nifti(
                            unc_np,
                            Path(output_path) / f"{case}_unc.nii.gz",
                            affine=affine,
                        )
                    if self.logger:
                        self.logger.info(f"Saved {out_file}")

                # bound the backlog: a disk slower than the device would
                # otherwise queue every pending uint8 mask in RAM
                if len(write_futures) >= 2:
                    write_futures.pop(0).result()
                write_futures.append(writer.submit(_write))
                written.append(str(out_file))
            for f in write_futures:
                f.result()  # surface write errors; all masks on disk past here
        finally:
            loader.shutdown(wait=True, cancel_futures=True)
            writer.shutdown(wait=True)
        return written
