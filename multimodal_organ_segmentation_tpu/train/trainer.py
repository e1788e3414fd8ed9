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
)
from multimodal_organ_segmentation_tpu.train.checkpoint import (
    CheckpointPolicy,
    load_checkpoint,
)
from multimodal_organ_segmentation_tpu.train.losses import get_loss
from multimodal_organ_segmentation_tpu.train.metrics import get_metrics
from multimodal_organ_segmentation_tpu.train.optim import (
    LRScheduler,
    make_optimizer,
    set_learning_rate,
)
from multimodal_organ_segmentation_tpu.utils.io import ensure_dir, save_nifti
from multimodal_organ_segmentation_tpu.utils.prng import KeyStream


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    extra: Any  # mutable collections (e.g. batch_stats); {} if none


def make_train_step(
    model, tx, loss_fn: Callable, accum_steps: int
) -> Callable:
    """Build the jitted train step.

    images ``[accum, micro, H, W, D, C]``, labels ``[accum, micro, H, W, D]``.
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

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), state.params
        )
        (grads, loss_sum, extra), _ = jax.lax.scan(
            micro, (zero_grads, jnp.zeros((), jnp.float32), state.extra),
            (images, labels, keys),
        )
        scale = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, extra=extra
        )
        gnorm = jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads))
        )
        return new_state, {"loss": loss_sum * scale, "grad_norm": gnorm}

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, loss_fn: Callable, num_classes: int) -> Callable:
    """Jitted eval: loss + argmax preds + per-class ∩/∪ on device."""

    def eval_step(params, extra, images, labels):
        variables = {"params": params, **extra}
        logits = model.apply(variables, images, train=False)
        loss = loss_fn(logits, labels)
        preds = jnp.argmax(logits, axis=-1)
        pred_oh = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
        tgt_oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
        axes = tuple(range(pred_oh.ndim - 1))
        inter = jnp.sum(pred_oh * tgt_oh, axis=axes)
        union = jnp.sum(pred_oh, axis=axes) + jnp.sum(tgt_oh, axis=axes)
        return loss, preds, inter, union

    return jax.jit(eval_step)


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
        self.loss_fn = get_loss(config)
        self.num_classes = int(config.get("model.out_channels", 8))
        self.epochs = int(config.get("training.epochs", 300))
        self.accum_steps = max(1, int(config.get("training.accumulation_steps", 1)))

        self.tx = make_optimizer(config)
        self.scheduler = LRScheduler(config)

        out_dir = Path(config.get("experiment.output_dir", "outputs")) / str(
            config.get("experiment.name", "exp")
        )
        self.output_dir = ensure_dir(out_dir)
        self.ckpt = CheckpointPolicy(self.output_dir, config)

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

    # -- state ------------------------------------------------------------

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
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=opt_state, extra=extra,
        )
        if self.mesh is not None:
            state = replicate_tree(state, self.mesh)
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
        self.state = ckpt["tree"]
        self.current_epoch = ckpt["epoch"] + 1
        self.best_metric = ckpt["best_metric"]
        self.history = {
            "train_loss": list(ckpt["history"].get("train_loss", [])),
            "val_loss": list(ckpt["history"].get("val_loss", [])),
            "val_dice": list(ckpt["history"].get("val_dice", [])),
        }
        if self.logger:
            self.logger.info(f"Resumed from epoch {self.current_epoch}")

    def load_params(self, path) -> None:
        """Load params-only (eval/inference from a checkpoint)."""
        if self.state is None:
            raise RuntimeError("call init_state first")
        ckpt = load_checkpoint(path, target=self.state)
        self.state = ckpt["tree"]

    # -- batching ---------------------------------------------------------

    def _stack_accum(self, batches: List[Dict]) -> Tuple[jax.Array, jax.Array]:
        images = np.stack([np.asarray(b["image"]) for b in batches], axis=0)
        labels = np.stack(
            [np.asarray(b["label"]).astype(np.int32) for b in batches], axis=0
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_size = self.mesh.shape["data"]
            divisible = images.shape[1] % data_size == 0

            # [accum, micro, ...]: shard the microbatch dim over `data`
            # (replicate when the microbatch doesn't divide the axis)
            def put(x):
                axis = "data" if divisible else None
                spec = P(*([None, axis] + [None] * (x.ndim - 2)))
                return jax.device_put(x, NamedSharding(self.mesh, spec))

            return put(images), put(labels)
        return jnp.asarray(images), jnp.asarray(labels)

    # -- loops ------------------------------------------------------------

    def train(self) -> Dict[str, List[float]]:
        assert self.train_loader is not None, "train requires a train_loader"
        es_cfg = self.config.get("training.early_stopping", {}) or {}
        patience = int(es_cfg.get("patience", 30))
        es_enabled = bool(es_cfg.get("enabled", False))
        no_improve = 0
        prev_metric: Optional[float] = None

        if self._train_step is None:
            self._train_step = make_train_step(
                self.model, self.tx, self.loss_fn, self.accum_steps
            )

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

            if self.logger:
                dt = time.perf_counter() - t0
                self.logger.info(
                    f"Epoch [{epoch + 1}/{self.epochs}] "
                    f"Train Loss: {train_loss:.4f} Val Loss: {val_loss:.4f} "
                    f"Val Dice: {val_dice:.4f} LR: {lr:.2e} ({dt:.1f}s)"
                )

            # best-metric tracking is independent of checkpoint policy
            # (with save_best off, early stopping must still see the best)
            is_best = val_dice >= self.best_metric
            improved = val_dice > self.best_metric
            self.best_metric = max(self.best_metric, val_dice)
            self.ckpt.save(
                self.state, epoch, val_dice, self.best_metric,
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

        return self.history

    def _train_epoch(self, lr: float) -> float:
        if self.state is None:
            first = next(iter(self.train_loader))
            self.init_state(np.asarray(first["image"][0]))

        self.state = self.state.replace(
            opt_state=set_learning_rate(self.state.opt_state, lr)
        )

        total, count = 0.0, 0
        group: List[Dict] = []
        for batch in self.train_loader:
            group.append(batch)
            if len(group) < self.accum_steps:
                continue
            images, labels = self._stack_accum(group)
            group = []
            self.state, metrics = self._train_step(
                self.state, images, labels, self.keys.next()
            )
            total += float(metrics["loss"])
            count += 1
        # trailing partial accumulation group is dropped (the reference
        # leaves its grads un-stepped, trainer.py:245-248)
        return total / max(count, 1)

    def _validate(self) -> Tuple[float, Dict[str, Any]]:
        if self.val_loader is None:
            return 0.0, {}
        if self.state is None:
            first = next(iter(self.val_loader))
            self.init_state(np.asarray(first["image"][0]))

        from multimodal_organ_segmentation_tpu.data.dataloader import device_prefetch

        total, count = 0.0, 0
        inter = np.zeros(self.num_classes)
        union = np.zeros(self.num_classes)
        for batch in device_prefetch(iter(self.val_loader)):
            images = jnp.asarray(batch["image"])
            labels = jnp.asarray(batch["label"]).astype(jnp.int32)
            loss, preds, i, u = self._eval_step(
                self.state.params, self.state.extra, images, labels
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
        from multimodal_organ_segmentation_tpu.utils.io import load_nifti

        output_path = ensure_dir(output_path)
        sw_cfg = self.config.get("inference.sliding_window", {}) or {}
        roi = tuple(sw_cfg.get("roi_size", [96, 96, 96]))
        overlap = float(sw_cfg.get("overlap", 0.5))
        mode = str(sw_cfg.get("mode", "gaussian"))
        sw_batch = int(self.config.get("inference.batch_size", 4))
        tta = bool(self.config.get("inference.tta", False))

        cases = self._discover_cases(input_path)
        if self.logger:
            self.logger.info(f"Found {len(cases)} cases under {input_path}")

        variables = {"params": self.state.params, **self.state.extra}
        predict_fn = self._predict_fn

        written = []
        for case, mods in cases.items():
            channels, affine = [], None
            for mod in self.config.get("data.modalities", ["CT", "PET"]):
                vol, aff = load_nifti(mods[mod], return_affine=True)
                channels.append(vol.astype(np.float32))
                if affine is None:
                    affine = aff
            image = jnp.asarray(np.stack(channels, axis=-1))

            if bool(self.config.get("inference.normalize", False)):
                from multimodal_organ_segmentation_tpu.data.transforms import (
                    modality_normalize,
                )

                pc = self.config.get("data.preprocessing", {}) or {}
                pc = pc.to_dict() if hasattr(pc, "to_dict") else dict(pc)
                image = modality_normalize(
                    image, list(self.config.get("data.modalities")), pc
                )

            def run_sw(vol):
                return sliding_window_inference(
                    vol,
                    predict_fn,
                    roi_size=roi,
                    num_classes=self.num_classes,
                    overlap=overlap,
                    sw_batch_size=sw_batch,
                    mode=mode,
                    params=variables,
                )

            logits = run_sw(image)
            if tta:
                # flip TTA (reference declares inference.tta but never
                # implements it): average logits over the 3 single-axis
                # spatial flips, un-flipping each prediction
                for axis in range(3):
                    flipped = jnp.flip(image, axis=axis)
                    logits = logits + jnp.flip(run_sw(flipped), axis=axis)
                logits = logits / 4.0
            pred = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.uint8)
            out_file = Path(output_path) / f"{case}_pred.nii.gz"
            save_nifti(pred, out_file, affine=affine)
            written.append(str(out_file))
            if self.logger:
                self.logger.info(f"Saved {out_file}")
        return written
