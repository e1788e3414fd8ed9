"""K-step training parity for the FLAGSHIP models + float64 update-math pin.

test_step_parity.py pins loss+optimizer math on UNet3D/dice_ce. This file
extends the same same-weights same-batches harness to the models the
headline claims are about (VERDICT r4 #3/#8):

- SwinUNETR: torch side = tests/monai_swin_replica.py (the MONAI network
  the reference wraps, src/models/backbones/swin_unetr.py:80-96), weights
  copied into flax through ``from_torch_swin_unetr``; K optimizer steps on
  identical batches must agree ≤1e-3 per-step loss.
- DualEncoder: torch side = the LIVE reference model
  (src/models/backbones/dual_encoder.py), adamw + dice_ce, plus a
  focal-loss variant pinning a second loss under training
  (src/trainer/losses.py:259-260).
- float64: a subprocess with JAX x64 + torch double runs 5 UNet3D adamw
  steps — per-step loss ≤1e-9 and param rel err ≤1e-6, turning the fp32
  Adam eps-amplification gate (3e-2) into a real update-math proof
  (reference optimizer semantics: src/trainer/trainer.py:104-122).
"""

import subprocess
import sys
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from multimodal_organ_segmentation_tpu.models.dual_encoder import DualEncoder
from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR
from multimodal_organ_segmentation_tpu.models.torch_import import (
    from_torch_dual_encoder,
    from_torch_swin_unetr,
)
from multimodal_organ_segmentation_tpu.train.losses import get_loss
from multimodal_organ_segmentation_tpu.train.optim import make_optimizer
from multimodal_organ_segmentation_tpu.train.trainer import (
    TrainState,
    make_train_step,
)
from multimodal_organ_segmentation_tpu.utils.config import ConfigNode

from tests.monai_swin_replica import MonaiSwinUNETR


def _loss_cfg(name: str) -> dict:
    return {"training": {"loss": {"name": name, "dice_weight": 0.5,
                                  "ce_weight": 0.5}}}


def _opt_cfg(lr: float, wd: float = 1e-4) -> dict:
    return {"training": {"optimizer": {"name": "adamw", "lr": lr,
                                       "weight_decay": wd}}}


def _batches(k, batch, vol, in_ch, num_classes, seed=0):
    """K identical (images, labels) pairs; smooth-field labels so Dice
    sees geometry (same recipe as test_step_parity.py)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(k):
        img = rng.normal(size=(batch, *vol, in_ch)).astype(np.float32)
        base = rng.normal(size=(batch, *vol))
        for ax in (1, 2, 3):
            base = (base + np.roll(base, 1, ax) + np.roll(base, -1, ax)) / 3
        q = np.quantile(base, np.linspace(0.5, 0.9, num_classes - 1))
        out.append((img, np.digitize(base, q).astype(np.int32)))
    return out


def _torch_steps(model, loss_name, lr, wd, batches):
    from src.trainer.losses import get_loss as ref_get_loss

    criterion = ref_get_loss(_loss_cfg(loss_name))
    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=wd)
    model.train()
    losses = []
    for img, lbl in batches:
        x = torch.from_numpy(np.transpose(img, (0, 4, 1, 2, 3)))
        y = torch.from_numpy(lbl.astype(np.int64))
        opt.zero_grad()
        loss = criterion(model(x), y)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def _jax_steps(module, params, loss_name, lr, wd, batches):
    config = ConfigNode({"training": {
        "loss": _loss_cfg(loss_name)["training"]["loss"],
        "optimizer": _opt_cfg(lr, wd)["training"]["optimizer"],
    }})
    tx = make_optimizer(config)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), extra={},
    )
    step = jax.jit(make_train_step(module, tx, get_loss(config), accum_steps=1))
    losses = []
    for img, lbl in batches:
        state, metrics = step(
            state, jnp.asarray(img)[None], jnp.asarray(lbl)[None],
            jax.random.key(0),
        )
        losses.append(float(metrics["loss"]))
    return state, losses


def _rel_err(mapped_final_torch, final_jax_params):
    want = jax.tree_util.tree_leaves_with_path(mapped_final_torch)
    got = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, final_jax_params)
        )
    }
    num = den = 0.0
    for path, w in want:
        g = got[jax.tree_util.keystr(path)]
        num += float(np.sum((np.asarray(w) - g) ** 2))
        den += float(np.sum(np.asarray(w) ** 2))
    return float(np.sqrt(num / max(den, 1e-30)))


def _assert_trajectory(t_losses, j_losses, tol=1e-3):
    deltas = [abs(a - b) for a, b in zip(t_losses, j_losses)]
    assert max(deltas) <= tol, (
        f"per-step deltas {deltas}\ntorch={t_losses}\njax={j_losses}"
    )
    assert t_losses[-1] < t_losses[0]  # actually optimizing


@pytest.mark.e2e
class TestSwinStepParity:
    """Training math through shifted windows, rel-pos bias, LayerNorm,
    patch merging and the UNETR decoder — not just the forward pass
    (reference train loop: src/trainer/trainer.py:222-263)."""

    def test_k_step_adamw_dice_ce(self):
        fs, depths, heads, window = 4, (1, 1, 1, 1), (2, 2, 2, 2), (3, 3, 3)
        vol, in_ch, out_ch, k = (32, 64, 64), 2, 4, 4
        torch.manual_seed(0)
        tmodel = MonaiSwinUNETR(
            in_channels=in_ch, out_channels=out_ch, feature_size=fs,
            depths=depths, num_heads=heads, window_size=window,
            merge_order="monai_v1",
        )
        sd0 = {kk: v.detach().clone() for kk, v in tmodel.state_dict().items()}
        jmodel = SwinUNETR(
            out_channels=out_ch, feature_size=fs, depths=depths,
            num_heads=heads, window_size=window, use_fused=False,
            monai_compat=True, merge_order="monai_v1",
        )
        # sd0 tensors are clones, but deep-copy the mapped tree anyway so
        # the jax start point cannot alias live torch storage
        params = jax.tree_util.tree_map(
            np.array, from_torch_swin_unetr(sd0, depths=depths)
        )
        batches = _batches(k, 1, vol, in_ch, out_ch)

        t_losses = _torch_steps(tmodel, "dice_ce", 1e-3, 1e-4, batches)
        state, j_losses = _jax_steps(
            jmodel, params, "dice_ce", 1e-3, 1e-4, batches
        )
        _assert_trajectory(t_losses, j_losses)
        rel = _rel_err(
            from_torch_swin_unetr(tmodel.state_dict(), depths=depths),
            state.params,
        )
        assert rel <= 3e-2, f"final params rel err {rel}"  # adam eps amp.


@pytest.mark.e2e
class TestDualEncoderStepParity:
    """vs the LIVE reference DualEncoder (dual_encoder.py:257-280)."""

    def _pair(self, fusion, seed):
        from src.models.backbones.dual_encoder import (
            DualEncoder as RefDualEncoder,
        )

        features, out_ch = (4, 8), 3
        torch.manual_seed(seed)
        ref = RefDualEncoder(
            in_channels_per_modality=1, num_modalities=2,
            out_channels=out_ch, features=list(features),
            fusion_type=fusion, dropout=0.0,
        )
        ours = DualEncoder(
            num_modalities=2, out_channels=out_ch,
            features=features, fusion_type=fusion, dropout=0.0,
        )
        # deep-copy: the importer's numpy arrays alias the LIVE torch
        # tensors, which the torch run then updates in-place
        params = jax.tree_util.tree_map(
            np.array,
            from_torch_dual_encoder(
                ref.state_dict(), num_levels=len(features),
                num_modalities=2, fusion_type=fusion,
            ),
        )
        return ref, ours, params, features, out_ch

    @pytest.mark.parametrize("loss_name", ["dice_ce", "focal"])
    def test_k_step_adamw(self, loss_name):
        ref, ours, params, features, out_ch = self._pair("concat", seed=3)
        batches = _batches(10, 2, (16, 16, 16), 2, out_ch, seed=5)
        t_losses = _torch_steps(ref, loss_name, 1e-2, 1e-4, batches)
        state, j_losses = _jax_steps(
            ours, params, loss_name, 1e-2, 1e-4, batches
        )
        _assert_trajectory(t_losses, j_losses)
        rel = _rel_err(
            from_torch_dual_encoder(
                ref.state_dict(), num_levels=len(features),
                num_modalities=2, fusion_type="concat",
            ),
            state.params,
        )
        assert rel <= 3e-2, f"final params rel err {rel}"


_X64_SCRIPT = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import torch
    torch.set_default_dtype(torch.float64)
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/reference")

    from src.models.backbones.unet import UNet3D as RefUNet3D
    from src.trainer.losses import get_loss as ref_get_loss

    from multimodal_organ_segmentation_tpu.models.unet3d import UNet3D
    from multimodal_organ_segmentation_tpu.models.torch_import import (
        from_torch_unet3d,
    )
    from multimodal_organ_segmentation_tpu.train.losses import get_loss
    from multimodal_organ_segmentation_tpu.train.optim import make_optimizer
    from multimodal_organ_segmentation_tpu.train.trainer import (
        TrainState, make_train_step,
    )
    from multimodal_organ_segmentation_tpu.utils.config import ConfigNode

    K, B, VOL, OUT = 5, 2, (12, 12, 12), 4
    LR, WD = 1e-2, 1e-4

    torch.manual_seed(0)
    ref = RefUNet3D(in_channels=2, out_channels=OUT, features=[4, 8]).double()
    crit = ref_get_loss({"training": {"loss": {"name": "dice_ce"}}})
    opt = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=WD)

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(K):
        img = rng.normal(size=(B, *VOL, 2))
        base = rng.normal(size=(B, *VOL))
        for ax in (1, 2, 3):
            base = (base + np.roll(base, 1, ax) + np.roll(base, -1, ax)) / 3
        q = np.quantile(base, [0.5, 0.75, 0.9])
        batches.append((img, np.digitize(base, q).astype(np.int32)))

    t_losses = []
    ref.train()
    for img, lbl in batches:
        x = torch.from_numpy(np.transpose(img, (0, 4, 1, 2, 3)))
        y = torch.from_numpy(lbl.astype(np.int64))
        opt.zero_grad()
        loss = crit(ref(x), y)
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    torch.manual_seed(0)
    sd0 = RefUNet3D(in_channels=2, out_channels=OUT, features=[4, 8]).double().state_dict()
    params = {"backbone": from_torch_unet3d(
        {k: v.detach().numpy() for k, v in sd0.items()}, 2)}
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), params)
    assert all(a.dtype == jnp.float64
               for a in jax.tree_util.tree_leaves(params))

    class Wrapper:
        def __init__(self, m): self.m = m
        def apply(self, variables, img, train=True, rngs=None, mutable=None):
            out = self.m.apply(
                {"params": variables["params"]["backbone"]}, img,
                train=train, rngs=rngs)
            return out

    module = UNet3D(out_channels=OUT, features=(4, 8), dtype=jnp.float64)
    config = ConfigNode({"training": {
        "loss": {"name": "dice_ce"},
        "optimizer": {"name": "adamw", "lr": LR, "weight_decay": WD},
    }})
    tx = make_optimizer(config)
    state = TrainState(step=jnp.zeros((), jnp.int64), params=params,
                       opt_state=tx.init(params), extra={})
    step = jax.jit(make_train_step(Wrapper(module), tx, get_loss(config),
                                   accum_steps=1))
    j_losses = []
    for img, lbl in batches:
        state, metrics = step(state, jnp.asarray(img)[None],
                              jnp.asarray(lbl)[None], jax.random.key(0))
        j_losses.append(float(metrics["loss"]))

    deltas = [abs(a - b) for a, b in zip(t_losses, j_losses)]
    assert max(deltas) <= 1e-9, (deltas, t_losses, j_losses)

    want = from_torch_unet3d(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, 2)
    got = jax.tree_util.tree_map(np.asarray, state.params["backbone"])
    num = den = 0.0
    flat = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(got))
    for p, w in jax.tree_util.tree_leaves_with_path(want):
        g = flat[jax.tree_util.keystr(p)]
        num += float(np.sum((np.asarray(w) - g) ** 2))
        den += float(np.sum(np.asarray(w) ** 2))
    rel = float(np.sqrt(num / max(den, 1e-30)))
    assert rel <= 1e-6, rel
    print("X64_PARITY_OK", max(deltas), rel)
    """
)


@pytest.mark.e2e
def test_float64_step_parity_subprocess():
    """JAX x64 vs torch double: per-step loss ≤1e-9 and param rel err
    ≤1e-6 over 5 adamw steps — the update math itself is identical; the
    fp32 tests' 3e-2 Adam gate is pure eps-amplification, not model or
    optimizer divergence. Runs in a subprocess because jax_enable_x64 is
    process-global."""
    r = subprocess.run(
        [sys.executable, "-c", _X64_SCRIPT],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "X64_PARITY_OK" in r.stdout
