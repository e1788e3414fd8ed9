"""scan_blocks: each Swin stage as ONE lax.scan body (VERDICT r2 weak #1).

Equivalence: a scan_blocks model with its stacked params un-stacked into
the unrolled model's tree must produce identical logits — the scan is a
program-size optimization, not a different function.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR

FS = 4
DEPTHS = (2, 2, 2, 2)
HEADS = (2, 2, 4, 4)
WINDOW = (3, 3, 3)


def _models(**kw):
    common = dict(
        out_channels=4,
        feature_size=FS,
        depths=DEPTHS,
        num_heads=HEADS,
        window_size=WINDOW,
        use_fused=False,
        **kw,
    )
    return (
        SwinUNETR(scan_blocks=True, **common),
        SwinUNETR(scan_blocks=False, **common),
    )


def _unstack(scan_params, depths):
    """stage{s}/blocks (stacked on depth) → stage{s}_block{bi} trees."""
    out = {}
    for k, v in scan_params.items():
        if k.startswith("stage") and "_block" not in k:
            s = int(k.removeprefix("stage"))
            stacked = v["blocks"]
            for bi in range(depths[s]):
                out[f"stage{s}_block{bi}"] = jax.tree_util.tree_map(
                    lambda a: a[bi], stacked
                )
        else:
            out[k] = v
    return out


class TestScanBlocksEquivalence:
    def test_param_shapes_stack(self):
        scan_m, plain_m = _models()
        x0 = jnp.zeros((1, 32, 32, 32, 2))
        sp = jax.jit(lambda k: scan_m.init(k, x0, train=False))(jax.random.key(0))[
            "params"
        ]
        assert "blocks" in sp["stage0"]
        leaf = jax.tree_util.tree_leaves(sp["stage0"]["blocks"])[0]
        assert leaf.shape[0] == DEPTHS[0]

    def test_identical_logits(self):
        scan_m, plain_m = _models()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 2)).astype(np.float32))
        sp = jax.jit(lambda k: scan_m.init(k, x, train=False))(jax.random.key(0))[
            "params"
        ]
        plain_params = _unstack(sp, DEPTHS)
        # the unrolled model must accept the unstacked tree verbatim
        expected = jax.jit(lambda k: plain_m.init(k, x, train=False))(
            jax.random.key(1)
        )["params"]
        es = jax.tree_util.tree_map(lambda a: a.shape, expected)
        gs = jax.tree_util.tree_map(lambda a: a.shape, plain_params)
        assert es == gs

        out_scan = np.asarray(scan_m.apply({"params": sp}, x, train=False))
        out_plain = np.asarray(
            plain_m.apply({"params": plain_params}, x, train=False)
        )
        np.testing.assert_allclose(out_scan, out_plain, atol=1e-5)

    def test_remat_scan_matches(self):
        scan_m, _ = _models()
        remat_m = SwinUNETR(
            out_channels=4,
            feature_size=FS,
            depths=DEPTHS,
            num_heads=HEADS,
            window_size=WINDOW,
            use_fused=False,
            scan_blocks=True,
            use_remat=True,
        )
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 2)).astype(np.float32))
        sp = jax.jit(lambda k: scan_m.init(k, x, train=False))(jax.random.key(0))[
            "params"
        ]
        a = np.asarray(scan_m.apply({"params": sp}, x, train=False))
        b = np.asarray(remat_m.apply({"params": sp}, x, train=False))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_grads_flow(self):
        """Backward through the scan (remat on) is finite and nonzero."""
        model = SwinUNETR(
            out_channels=4,
            feature_size=FS,
            depths=DEPTHS,
            num_heads=HEADS,
            window_size=WINDOW,
            use_fused=False,
            scan_blocks=True,
            use_remat=True,
        )
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 2)).astype(np.float32))
        params = jax.jit(lambda k: model.init(k, x, train=False))(jax.random.key(0))[
            "params"
        ]

        def loss(p):
            return jnp.mean(model.apply({"params": p}, x, train=False) ** 2)

        grads = jax.jit(jax.grad(loss))(params)
        leaves = jax.tree_util.tree_leaves(grads)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert np.isfinite(total) and total > 0

    def test_dropout_remat_scan_traces(self):
        """remat + scan + dropout>0: the train flag must stay static (a
        traced bool would crash nn.Dropout under jax.checkpoint)."""
        model = SwinUNETR(
            out_channels=4,
            feature_size=FS,
            depths=(1, 1, 1, 1),
            num_heads=(2, 2, 4, 4),
            window_size=WINDOW,
            use_fused=False,
            scan_blocks=True,
            use_remat=True,
            drop_rate=0.1,
        )
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 2)).astype(np.float32))
        variables = jax.jit(lambda k: model.init(k, x, train=False))(
            jax.random.key(0)
        )
        out = model.apply(
            variables, x, train=True, rngs={"dropout": jax.random.key(1)}
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_config_plumbing(self):
        from multimodal_organ_segmentation_tpu.models.swin_unetr import (
            build_swin_unetr,
        )
        from multimodal_organ_segmentation_tpu.utils.config import ConfigNode

        cfg = ConfigNode(
            {"model": {"backbone": {"scan_blocks": True}}, "data": {"modalities": ["CT"]}}
        )
        assert build_swin_unetr(cfg).scan_blocks is True
