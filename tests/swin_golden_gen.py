"""Golden-activation fixture for the MONAI-replica ↔ flax monai_compat pair.

Why this exists (VERDICT r3 "second witness"): the reference's real network
is ``monai.networks.nets.SwinUNETR`` (/root/reference/src/models/backbones/
swin_unetr.py:14,80-96), but MONAI is not installable here, so the torch
side of the import-parity tests is our own transcription
(tests/monai_swin_replica.py). Replica and flax agree today — this module
FREEZES that agreement: it generates deterministic weights + input
(numpy-seeded, independent of torch's RNG so torch version bumps can't
silently reshuffle them), runs the replica once, and records per-stage
activations + logits into ``tests/fixtures/swin_golden.npz``. The test
(tests/test_swin_golden.py) then asserts BOTH the replica and the flax
monai_compat graph still reproduce those recorded values — any future
"fix" to either side that changes numerics trips the test instead of
drifting both sides together.

Regenerate (only after an INTENDED numeric change, with justification in
the commit message):

    JAX_PLATFORMS=cpu python tests/swin_golden_gen.py
"""

from __future__ import annotations

import zlib
from pathlib import Path

import numpy as np

# small but structurally complete (same shape set as tests/test_swin_import):
# 2 blocks/stage → shifted windows fire, window 3 → pad+clamp paths fire,
# heads divide, 64³ input keeps the /32 bottleneck ≥ 2 for InstanceNorm3d.
FS = 4
DEPTHS = (2, 2, 2, 2)
HEADS = (2, 4, 8, 8)
WINDOW = (3, 3, 3)
IN_CH, OUT_CH = 2, 4
INPUT_SHAPE = (1, 64, 64, 64, IN_CH)  # channels-last (flax layout)

FIXTURE = Path(__file__).parent / "fixtures" / "swin_golden.npz"

# keep ≤ SUB_MAX values per recorded tensor (strided flat subsample)
SUB_MAX = 4096


def make_weights(state_dict):
    """Deterministic numpy weights for every replica parameter.

    Each tensor is seeded by crc32 of its own name, so adding/removing a
    parameter elsewhere never reshuffles the others, and the values are
    identical across torch/numpy versions. Norm scales sit near 1, biases
    near 0, everything else is small-normal — a regime where layer norms,
    residuals and attention all produce O(1) activations.
    """
    out = {}
    for name, t in state_dict.items():
        rng = np.random.default_rng(zlib.crc32(name.encode()))
        shape = tuple(t.shape)
        if "norm" in name and name.endswith(".weight"):
            v = 1.0 + 0.05 * rng.standard_normal(shape)
        elif name.endswith(".bias"):
            v = 0.01 * rng.standard_normal(shape)
        else:
            v = 0.05 * rng.standard_normal(shape)
        out[name] = v.astype(np.float32)
    return out


def make_input():
    rng = np.random.default_rng(0xC0FFEE)
    return rng.standard_normal(INPUT_SHAPE).astype(np.float32)


def subsample(a: np.ndarray) -> np.ndarray:
    flat = np.asarray(a, dtype=np.float32).ravel()
    stride = max(1, int(np.ceil(flat.size / SUB_MAX)))
    return flat[::stride].copy()


def build_replica():
    import torch

    from tests.monai_swin_replica import MonaiSwinUNETR

    tmodel = MonaiSwinUNETR(
        in_channels=IN_CH,
        out_channels=OUT_CH,
        feature_size=FS,
        depths=DEPTHS,
        num_heads=HEADS,
        window_size=WINDOW,
        merge_order="monai_v1",
    ).eval()
    weights = make_weights(tmodel.state_dict())
    tmodel.load_state_dict(
        {k: torch.from_numpy(v) for k, v in weights.items()}
    )
    return tmodel


def run_replica(tmodel, x_np):
    """Replica logits + the 5 normalized swinViT hidden states.

    Returns everything channels-last to match the flax layout.
    """
    import torch

    x_t = torch.from_numpy(np.transpose(x_np, (0, 4, 1, 2, 3)))
    with torch.no_grad():
        hidden = tmodel.swinViT(x_t, normalize=True)
        logits = tmodel(x_t)
    to_cl = lambda t: np.transpose(t.numpy(), (0, 2, 3, 4, 1))
    return to_cl(logits), [to_cl(h) for h in hidden]


def run_flax(tmodel, x_np):
    """Flax monai_compat logits + hiddens (param-free-LN'd to MONAI's
    proj_out semantics), from the SAME weights via the import path."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from multimodal_organ_segmentation_tpu.models.swin_unetr import (
        SwinUNETR,
        _param_free_layer_norm,
    )
    from multimodal_organ_segmentation_tpu.models.torch_import import (
        from_torch_swin_unetr,
    )

    jmodel = SwinUNETR(
        out_channels=OUT_CH,
        feature_size=FS,
        depths=DEPTHS,
        num_heads=HEADS,
        window_size=WINDOW,
        use_fused=False,
        monai_compat=True,
        merge_order="monai_v1",
    )
    params = from_torch_swin_unetr(tmodel.state_dict(), depths=DEPTHS)
    logits, hidden = jmodel.apply(
        {"params": params},
        jnp.asarray(x_np),
        train=False,
        capture=True,
    )
    normed = [np.asarray(_param_free_layer_norm(h)) for h in hidden]
    return np.asarray(logits), normed


def generate():
    tmodel = build_replica()
    x = make_input()
    t_logits, t_hidden = run_replica(tmodel, x)
    j_logits, j_hidden = run_flax(tmodel, x)

    rec = {}
    for side, logits, hidden in (
        ("torch", t_logits, t_hidden),
        ("flax", j_logits, j_hidden),
    ):
        rec[f"{side}_logits"] = subsample(logits)
        rec[f"{side}_logits_mean"] = np.float32(logits.mean())
        rec[f"{side}_logits_absmax"] = np.float32(np.abs(logits).max())
        for i, h in enumerate(hidden):
            rec[f"{side}_hidden{i}"] = subsample(h)
            rec[f"{side}_hidden{i}_absmax"] = np.float32(np.abs(h).max())

    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(FIXTURE, **rec)
    cross = max(
        float(np.abs(rec["torch_logits"] - rec["flax_logits"]).max()),
        *(
            float(np.abs(rec[f"torch_hidden{i}"] - rec[f"flax_hidden{i}"]).max())
            for i in range(5)
        ),
    )
    print(
        f"wrote {FIXTURE} ({FIXTURE.stat().st_size} bytes); "
        f"max torch↔flax subsample err {cross:.2e}"
    )


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    generate()
