"""Same-weights, same-batches K-step training parity vs the LIVE reference.

The trajectory test in test_reference_parity.py compares independently
initialized runs (tolerance 0.15 Dice — init/RNG slack). This file pins the
*training math itself* — loss + optimizer (+ scheduler) acting on identical
weights and identical batches — to ~1e-3: the torch init is copied into flax
through ``models/torch_import.py`` (forward parity ≤2e-4), both sides take K
optimizer steps on the same fixed batch sequence, and per-step losses must
stay within 1e-3 while final parameters agree in relative norm.

Reference anchors: optimizer construction
/root/reference/src/trainer/trainer.py:104-122 (Adam/AdamW/SGD), loss
factory /root/reference/src/trainer/losses.py:231, train loop
/root/reference/src/trainer/trainer.py:222-263 (plain fp32 path — no AMP,
accumulation_steps=1).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from multimodal_organ_segmentation_tpu.models.build import build_model
from multimodal_organ_segmentation_tpu.models.torch_import import (
    from_torch_unet3d,
)
from multimodal_organ_segmentation_tpu.train.losses import get_loss
from multimodal_organ_segmentation_tpu.train.optim import (
    LRScheduler,
    make_optimizer,
    set_learning_rate,
)
from multimodal_organ_segmentation_tpu.train.trainer import (
    TrainState,
    make_train_step,
)
from multimodal_organ_segmentation_tpu.utils.config import ConfigNode

K_STEPS = 10
BATCH = 2
VOL = (16, 16, 16)
NUM_CLASSES = 4
FEATURES = [8, 16]


def _config(opt_name: str, scheduler: str = "none") -> dict:
    return {
        "experiment": {"name": "step_parity", "seed": 0,
                       "output_dir": "/tmp/step_parity",
                       "log_dir": "/tmp/step_parity"},
        "data": {"modalities": ["CT", "PET"], "primary_modality": "CT"},
        "model": {
            "name": "unet3d", "in_channels": 2, "out_channels": NUM_CLASSES,
            "backbone": {"features": FEATURES, "img_size": list(VOL),
                         "norm": "instance"},
            "fusion": {"type": "early"},
            "head": {"type": "conv", "dropout": 0.0},
        },
        "training": {
            "epochs": K_STEPS,
            "batch_size": BATCH,
            "accumulation_steps": 1,
            "optimizer": {"name": opt_name, "lr": 1.0e-2,
                          "weight_decay": 1.0e-4, "momentum": 0.0},
            "scheduler": {"name": scheduler, "warmup_epochs": 0,
                          "min_lr": 1.0e-4},
            "loss": {"name": "dice_ce", "dice_weight": 0.5, "ce_weight": 0.5},
        },
        "hardware": {"platform": "cpu", "device": "cpu",
                     "mixed_precision": "none"},
    }


def _fixed_batches(seed: int = 0):
    """K identical (images, labels) pairs for both frameworks — structured
    labels (thresholded smooth field) so the Dice term sees real geometry,
    not salt-and-pepper noise."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(K_STEPS):
        img = rng.normal(size=(BATCH, *VOL, 2)).astype(np.float32)
        base = rng.normal(size=(BATCH, *VOL))
        # smooth-ish: box blur once along each axis
        for ax in (1, 2, 3):
            base = (base + np.roll(base, 1, ax) + np.roll(base, -1, ax)) / 3
        q = np.quantile(base, [0.5, 0.75, 0.9], axis=None)
        lbl = np.digitize(base, q).astype(np.int32)  # 0..3
        batches.append((img, lbl))
    return batches


def _torch_run(cfg: dict, batches, lrs=None):
    """K steps with the reference's own model/loss/optimizer classes."""
    from src.models import build_model as ref_build
    from src.trainer.losses import get_loss as ref_get_loss

    torch.manual_seed(0)
    model = ref_build(cfg)
    model.train()
    criterion = ref_get_loss(cfg)
    opt_cfg = cfg["training"]["optimizer"]
    name = opt_cfg["name"].lower()
    if name == "sgd":
        # reference trainer.py:118-120
        opt = torch.optim.SGD(model.parameters(), lr=opt_cfg["lr"],
                              momentum=opt_cfg.get("momentum", 0.9),
                              weight_decay=opt_cfg["weight_decay"])
    else:
        # reference trainer.py:115-117 (betas default)
        opt = torch.optim.AdamW(model.parameters(), lr=opt_cfg["lr"],
                                weight_decay=opt_cfg["weight_decay"])
    losses = []
    for k, (img, lbl) in enumerate(batches):
        if lrs is not None:
            for g in opt.param_groups:
                g["lr"] = lrs[k]
        x = torch.from_numpy(np.transpose(img, (0, 4, 1, 2, 3)))
        y = torch.from_numpy(lbl.astype(np.int64))
        opt.zero_grad()
        loss = criterion(model(x), y)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return model, losses


def _jax_run(cfg: dict, init_state_dict, batches, lrs=None):
    """K steps with OUR model/loss/optimizer, starting from the torch init."""
    config = ConfigNode(cfg)
    model = build_model(config)
    params = {"backbone": from_torch_unet3d(init_state_dict, len(FEATURES))}
    tx = make_optimizer(config)
    # fp64 off: both sides are fp32
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=jax.tree_util.tree_map(jnp.asarray, params),
        opt_state=tx.init(jax.tree_util.tree_map(jnp.asarray, params)),
        extra={},
    )
    loss_fn = get_loss(config)
    step = jax.jit(make_train_step(model, tx, loss_fn, accum_steps=1))
    losses = []
    for k, (img, lbl) in enumerate(batches):
        if lrs is not None:
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lrs[k])
            )
        state, metrics = step(
            state,
            jnp.asarray(img)[None],   # [accum=1, B, H, W, D, C]
            jnp.asarray(lbl)[None],
            jax.random.key(0),
        )
        losses.append(float(metrics["loss"]))
    return state, losses


def _param_rel_err(final_torch_sd, final_jax_params):
    """Global relative error between final parameter trees (same mapping
    as the import, so layout conversions cancel)."""
    want = from_torch_unet3d(
        {k: v.detach().numpy() for k, v in final_torch_sd.items()},
        len(FEATURES),
    )
    got = jax.tree_util.tree_map(np.asarray, final_jax_params["backbone"])
    num = 0.0
    den = 0.0
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    got_by_path = dict(jax.tree_util.tree_leaves_with_path(got))
    got_by_path = {jax.tree_util.keystr(p): v for p, v in got_by_path.items()}
    for path, w in flat_w:
        g = got_by_path[jax.tree_util.keystr(path)]
        num += float(np.sum((np.asarray(w) - g) ** 2))
        den += float(np.sum(np.asarray(w) ** 2))
    return float(np.sqrt(num / max(den, 1e-30)))


@pytest.mark.e2e
class TestStepParity:
    @pytest.mark.parametrize("opt_name", ["sgd", "adamw"])
    def test_k_step_loss_trajectory(self, opt_name):
        cfg = _config(opt_name)
        batches = _fixed_batches()
        tmodel, t_losses = _torch_run(cfg, batches)
        sd = {k: v.detach().numpy() for k, v in
              _torch_init_state_dict(cfg).items()}
        state, j_losses = _jax_run(cfg, sd, batches)

        deltas = [abs(a - b) for a, b in zip(t_losses, j_losses)]
        assert max(deltas) <= 1e-3, (
            f"{opt_name}: per-step loss deltas {deltas}\n"
            f"torch={t_losses}\njax={j_losses}"
        )
        # the run actually optimizes (not a frozen no-op agreeing trivially)
        assert t_losses[-1] < t_losses[0]

        rel = _param_rel_err(tmodel.state_dict(), state.params)
        # sgd updates are linear in the (fp32-identical) gradients → tight.
        # adam divides by sqrt(v)+eps: where v≈0 an fp32-rounding-scale
        # gradient difference flips the update by ~±lr (measured 1.7e-2
        # global rel err over 10 steps at lr 1e-2 — the same eps
        # amplification documented for the multihost equivalence test).
        # The ≤1e-3 per-step LOSS agreement above is the load-bearing
        # training-math claim; this bound just catches gross divergence.
        tol = 5e-3 if opt_name == "sgd" else 3e-2
        assert rel <= tol, f"final params rel err {rel}"

    def test_adamw_with_cosine_schedule(self):
        """Scheduler math included: both sides take the SAME per-step LR
        from our LRScheduler (parity-tested vs torch separately in
        test_trainer), so optimizer+scheduler+loss are pinned together."""
        cfg = _config("adamw", scheduler="cosine")
        sched = LRScheduler(ConfigNode(cfg))
        lrs = [sched.lr_for_epoch(k) for k in range(K_STEPS)]
        assert lrs[0] != lrs[-1]  # schedule actually varies
        batches = _fixed_batches(seed=1)
        tmodel, t_losses = _torch_run(cfg, batches, lrs=lrs)
        sd = {k: v.detach().numpy() for k, v in
              _torch_init_state_dict(cfg).items()}
        state, j_losses = _jax_run(cfg, sd, batches, lrs=lrs)

        deltas = [abs(a - b) for a, b in zip(t_losses, j_losses)]
        assert max(deltas) <= 1e-3, (t_losses, j_losses)
        rel = _param_rel_err(tmodel.state_dict(), state.params)
        assert rel <= 3e-2, f"final params rel err {rel}"  # adam eps amp.


def _torch_init_state_dict(cfg):
    """The exact init _torch_run starts from (same torch.manual_seed)."""
    from src.models import build_model as ref_build

    torch.manual_seed(0)
    return ref_build(cfg).state_dict()
