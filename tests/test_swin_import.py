"""SwinUNETR torch-checkpoint import: forward + end-to-end Dice parity.

The reference's flagship is MONAI's SwinUNETR
(/root/reference/src/models/backbones/swin_unetr.py:80-96); its checkpoints
(src/models/build.py:153-180) must load here and produce the same
segmentations. The torch side of these tests is ``tests/monai_swin_replica.py``
— a state_dict-compatible re-implementation of the MONAI network (MONAI
itself is not installable in this environment).

Covers VERDICT r1 items 1-2: forward parity ≤1e-3 on random input through
every stage (shifted windows, v1 patch merging, UNETR decoder), plus
sliding-window mean Dice within 0.5% of the torch pipeline on a synthetic
multi-organ volume with identical weights.
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR
from multimodal_organ_segmentation_tpu.models.torch_import import (
    from_torch_swin_unetr,
)
from multimodal_organ_segmentation_tpu.ops.sliding_window import (
    _scan_starts,
    gaussian_importance_map,
    sliding_window_inference,
)

from tests.monai_swin_replica import MonaiSwinUNETR

# small but structurally complete: 2 blocks/stage → shifted windows fire,
# window 3 → pad + clamp paths fire, heads divide (4, 8, 16, 32). Inputs are
# 64³ — the /32 bottleneck grid must be ≥2 or torch InstanceNorm3d rejects
# the 1-voxel spatial (a real MONAI constraint too).
FS = 4
DEPTHS = (2, 2, 2, 2)
HEADS = (2, 4, 8, 8)
WINDOW = (3, 3, 3)
IN_CH, OUT_CH = 2, 4


def _build_pair(merge_order: str, depths=DEPTHS, seed: int = 0):
    torch.manual_seed(seed)
    tmodel = MonaiSwinUNETR(
        in_channels=IN_CH,
        out_channels=OUT_CH,
        feature_size=FS,
        depths=depths,
        num_heads=HEADS,
        window_size=WINDOW,
        merge_order=merge_order,
    ).eval()
    jmodel = SwinUNETR(
        out_channels=OUT_CH,
        feature_size=FS,
        depths=depths,
        num_heads=HEADS,
        window_size=WINDOW,
        use_fused=False,
        monai_compat=True,
        merge_order=merge_order,
    )
    params = from_torch_swin_unetr(tmodel.state_dict(), depths=depths)
    return tmodel, jmodel, {"params": params}


def _forward_pair(tmodel, jmodel, variables, x_np):
    # flax is channels-last [B, s1, s2, s3, C]; torch is [B, C, d, h, w]
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(np.transpose(x_np, (0, 4, 1, 2, 3))))
    t_out = np.transpose(t_out.numpy(), (0, 2, 3, 4, 1))
    j_out = np.asarray(jmodel.apply(variables, jnp.asarray(x_np), train=False))
    return t_out, j_out


class TestForwardParity:
    def test_param_tree_matches(self):
        """The import must populate every parameter the flax model expects."""
        tmodel, jmodel, variables = _build_pair("monai_v1")
        x0 = jnp.zeros((1, 64, 64, 64, IN_CH))
        expected = jax.jit(lambda k: jmodel.init(k, x0, train=False))(
            jax.random.key(0)
        )["params"]
        got = variables["params"]
        exp_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), expected)
        got_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), got)
        assert exp_shapes == got_shapes

    def test_forward_parity_v1_merging(self):
        """Random 32³ input through the full network: ≤1e-3 (fp32)."""
        tmodel, jmodel, variables = _build_pair("monai_v1")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 64, 64, 64, IN_CH)).astype(np.float32)
        t_out, j_out = _forward_pair(tmodel, jmodel, variables, x)
        scale = np.abs(t_out).max()
        assert np.abs(t_out - j_out).max() <= 1e-3 * max(scale, 1.0)

    def test_forward_parity_v2_product_order(self):
        """Same with PatchMergingV2 ("mergingv2") neighbor ordering."""
        tmodel, jmodel, variables = _build_pair("product", seed=1)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 64, 64, 64, IN_CH)).astype(np.float32)
        t_out, j_out = _forward_pair(tmodel, jmodel, variables, x)
        scale = np.abs(t_out).max()
        assert np.abs(t_out - j_out).max() <= 1e-3 * max(scale, 1.0)

    def test_merge_orders_differ(self):
        """v1 and product orders are genuinely different functions — the
        order flag is load-bearing, not decorative."""
        tmodel, jmodel, variables = _build_pair("monai_v1", seed=2)
        jmodel_wrong = SwinUNETR(
            out_channels=OUT_CH,
            feature_size=FS,
            depths=DEPTHS,
            num_heads=HEADS,
            window_size=WINDOW,
            use_fused=False,
            monai_compat=True,
            merge_order="product",
        )
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 64, 64, 64, IN_CH)).astype(np.float32)
        t_out, j_right = _forward_pair(tmodel, jmodel, variables, x)
        j_wrong = np.asarray(
            jmodel_wrong.apply(variables, jnp.asarray(x), train=False)
        )
        assert np.abs(t_out - j_right).max() < np.abs(t_out - j_wrong).max()

    def test_checkpoint_roundtrip_via_pth(self, tmp_path):
        """Import from an actual reference-format .pth file (the
        ``{"model_state_dict": ...}`` layout of src/models/build.py:153-180)
        with the reference wrapper's ``model.`` prefix."""
        tmodel, jmodel, variables = _build_pair("monai_v1", seed=3)
        sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
        path = tmp_path / "ckpt.pth"
        torch.save({"epoch": 7, "model_state_dict": sd}, path)

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        params = from_torch_swin_unetr(ckpt["model_state_dict"], depths=DEPTHS)
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 64, 64, 64, IN_CH)).astype(np.float32)
        t_out, j_out = _forward_pair(tmodel, jmodel, {"params": params}, x)
        scale = np.abs(t_out).max()
        assert np.abs(t_out - j_out).max() <= 1e-3 * max(scale, 1.0)


def _synthetic_volume(shape=(96, 64, 64), seed=0):
    """Multi-organ phantom: background + 3 labeled spheres, 2 modalities."""
    rng = np.random.default_rng(seed)
    coords = np.stack(
        np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    ).astype(np.float32)
    labels = np.zeros(shape, np.int32)
    centers = [(24, 20, 28), (60, 40, 22), (78, 44, 46)]
    radii = [14, 11, 9]
    for organ, (c, r) in enumerate(zip(centers, radii), start=1):
        dist = np.sqrt(((coords - np.asarray(c)[:, None, None, None]) ** 2).sum(0))
        labels[dist < r] = organ
    ct = labels.astype(np.float32)[..., None] * 0.3 + rng.normal(
        size=(*shape, 1)
    ).astype(np.float32) * 0.1
    pet = (labels == 2).astype(np.float32)[..., None] * 2.0 + rng.normal(
        size=(*shape, 1)
    ).astype(np.float32) * 0.1
    return np.concatenate([ct, pet], axis=-1), labels


def _torch_sliding_window(tmodel, vol_np, roi, overlap):
    """MONAI-semantics sliding window on the torch side: same tile grid
    (trainer.py:370-395 envelope) and gaussian blend as our XLA op."""
    h, w, d, c = vol_np.shape
    starts = [
        (sh, sw, sd)
        for sh in _scan_starts(h, roi[0], overlap)
        for sw in _scan_starts(w, roi[1], overlap)
        for sd in _scan_starts(d, roi[2], overlap)
    ]
    weight = gaussian_importance_map(roi).astype(np.float32)
    acc = np.zeros((h, w, d, OUT_CH), np.float32)
    wacc = np.zeros((h, w, d, 1), np.float32)
    with torch.no_grad():
        for sh, sw, sd in starts:
            patch = vol_np[sh : sh + roi[0], sw : sw + roi[1], sd : sd + roi[2]]
            t_in = torch.from_numpy(np.transpose(patch[None], (0, 4, 1, 2, 3)))
            logits = np.transpose(tmodel(t_in).numpy()[0], (1, 2, 3, 0))
            acc[sh : sh + roi[0], sw : sw + roi[1], sd : sd + roi[2]] += (
                logits * weight[..., None]
            )
            wacc[sh : sh + roi[0], sw : sw + roi[1], sd : sd + roi[2]] += weight[
                ..., None
            ]
    return acc / wacc


def _mean_foreground_dice(pred, labels, num_classes):
    """Reference Dice definition (metrics.py:69-88): mean over foreground
    classes, smooth 1e-5."""
    dices = []
    for k in range(1, num_classes):
        p, t = pred == k, labels == k
        inter = float(np.logical_and(p, t).sum())
        dices.append((2 * inter + 1e-5) / (p.sum() + t.sum() + 1e-5))
    return float(np.mean(dices))


class TestEndToEndDiceParity:
    def test_sliding_window_dice_within_half_percent(self):
        """Same imported weights, full sliding-window pipeline both sides:
        mean Dice must agree within 0.5% (the SURVEY §6 north-star bar)."""
        depths = (1, 1, 1, 1)  # keep the CPU compile tractable
        tmodel, jmodel, variables = _build_pair("monai_v1", depths=depths, seed=4)
        vol, labels = _synthetic_volume()
        roi, overlap = (64, 64, 64), 0.5

        t_logits = _torch_sliding_window(tmodel, vol, roi, overlap)

        def predict_fn(v, patches):
            return jmodel.apply(v, patches, train=False)

        j_logits = np.asarray(
            sliding_window_inference(
                jnp.asarray(vol),
                predict_fn,
                roi_size=roi,
                num_classes=OUT_CH,
                overlap=overlap,
                sw_batch_size=4,
                mode="gaussian",
                params=variables,
            )
        )

        t_pred = t_logits.argmax(-1)
        j_pred = j_logits.argmax(-1)

        agreement = float((t_pred == j_pred).mean())
        assert agreement >= 0.999, f"voxel agreement {agreement}"

        t_dice = _mean_foreground_dice(t_pred, labels, OUT_CH)
        j_dice = _mean_foreground_dice(j_pred, labels, OUT_CH)
        assert abs(t_dice - j_dice) <= 0.005, (t_dice, j_dice)


# ---------------------------------------------------------------------------
# window-size transfer (VERDICT r3 #1): rel-pos-bias table resampling lets a
# checkpoint trained at one window (MONAI's 7³ default,
# /root/reference/src/models/backbones/swin_unetr.py:30-35) serve under a
# different window (the zero-padding perf configs) without quality loss.
# ---------------------------------------------------------------------------

from multimodal_organ_segmentation_tpu.models.torch_import import (
    _infer_cubic_window,
    resample_rel_pos_bias,
)


class TestBiasTableResample:
    def test_identity_when_windows_match(self):
        t = np.random.default_rng(0).normal(size=(5 * 5 * 5, 3)).astype(np.float32)
        out = resample_rel_pos_bias(t, (3, 3, 3), (3, 3, 3))
        np.testing.assert_array_equal(out, t)

    def test_shapes_7_to_6(self):
        t = np.zeros((13 * 13 * 13, 4), np.float32)
        out = resample_rel_pos_bias(t, (7, 7, 7), (6, 6, 6))
        assert out.shape == (11 * 11 * 11, 4)

    def test_linear_fields_are_exact(self):
        """Trilinear interpolation reproduces any bias that is linear in the
        displacement vector EXACTLY — and proportional axis scaling maps
        displacement d to d·(ws-1)/(wt-1)."""
        ws, wt = (7, 7, 7), (6, 6, 6)
        sh = [2 * w - 1 for w in ws]
        dh, dw, dd = np.meshgrid(
            *[np.arange(s) - (w - 1) for s, w in zip(sh, ws)], indexing="ij"
        )
        # bias(d) = 2dh - 3dw + 0.5dd + 1  per head (head 1 scaled)
        lin = 2.0 * dh - 3.0 * dw + 0.5 * dd + 1.0
        table = np.stack([lin.ravel(), 2 * lin.ravel()], axis=-1)
        out = resample_rel_pos_bias(table, ws, wt)
        th = [2 * w - 1 for w in wt]
        gh, gw, gd = np.meshgrid(
            *[np.arange(s) - (w - 1) for s, w in zip(th, wt)], indexing="ij"
        )
        scale = (ws[0] - 1) / (wt[0] - 1)
        want = 2.0 * gh * scale - 3.0 * gw * scale + 0.5 * gd * scale + 1.0
        np.testing.assert_allclose(out[:, 0].reshape(th), want, atol=1e-9)
        np.testing.assert_allclose(out[:, 1].reshape(th), 2 * want, atol=1e-9)

    def test_center_row_preserved(self):
        """Zero displacement maps to zero displacement: the center entry of
        the source grid survives any window change bit-for-bit (within
        float interp error)."""
        rng = np.random.default_rng(1)
        ws, wt = (4, 4, 4), (3, 3, 3)
        sh = [2 * w - 1 for w in ws]
        table = rng.normal(size=(int(np.prod(sh)), 2)).astype(np.float64)
        out = resample_rel_pos_bias(table, ws, wt)
        th = [2 * w - 1 for w in wt]
        src_center = (np.ravel_multi_index([w - 1 for w in ws], sh),)
        dst_center = (np.ravel_multi_index([w - 1 for w in wt], th),)
        np.testing.assert_allclose(out[dst_center], table[src_center], atol=1e-12)

    def test_numeric_golden_13_to_11_vs_scipy(self):
        """The production 7³→6³ transfer (13³→11³ table) pinned by VALUES,
        not shapes (VERDICT r4 #4): an independent witness — scipy's
        RegularGridInterpolator (linear) over the same proportional
        displacement mapping — must match everywhere on a deterministic
        random (non-linear) multi-head table."""
        from scipy.interpolate import RegularGridInterpolator

        ws, wt = (7, 7, 7), (6, 6, 6)
        sh = [2 * w - 1 for w in ws]  # 13³
        th = [2 * w - 1 for w in wt]  # 11³
        heads = 3
        table = np.random.default_rng(13).normal(
            size=(int(np.prod(sh)), heads)
        )
        out = resample_rel_pos_bias(table, ws, wt)
        assert out.shape == (int(np.prod(th)), heads)
        # independent mapping: target displacement d reads the source grid
        # at d·(ws−1)/(wt−1), plus the center offset ws−1
        axes = [np.arange(s, dtype=np.float64) for s in sh]
        pts = np.meshgrid(
            *[
                (np.arange(t, dtype=np.float64) - (w - 1)) * (s - 1) / (w - 1)
                + (s - 1)
                for t, w, s in zip(th, wt, ws)
            ],
            indexing="ij",
        )
        coords = np.stack([p.ravel() for p in pts], axis=-1)
        for h in range(heads):
            witness = RegularGridInterpolator(
                axes, table[:, h].reshape(sh), method="linear"
            )
            np.testing.assert_allclose(out[:, h], witness(coords), atol=1e-12)

    def test_infer_cubic_window(self):
        assert _infer_cubic_window(13**3) == (7, 7, 7)
        assert _infer_cubic_window(11**3) == (6, 6, 6)
        assert _infer_cubic_window(5**3) == (3, 3, 3)
        with pytest.raises(ValueError):
            _infer_cubic_window(100)


class TestWindowTransferServing:
    def _train_and_serve_ab(self, src_w, dst_w, n_steps=110, sched_T=None):
        """Train a replica checkpoint at ``src_w``, then serve it through
        the flax import at its native window AND bias-resampled onto
        ``dst_w``; return ``(dice_src, dice_dst)``. Recipe calibrated
        offline (r4): feature_size 8 + weighted CE + soft Dice + cosine
        decay reaches Dice ≈0.98 by step ~100 on the high-contrast
        phantom; FS=4 or low-contrast collapses to background."""
        depths = (1, 1, 1, 1)
        fs = 8
        torch.manual_seed(5)
        tmodel = MonaiSwinUNETR(
            in_channels=IN_CH,
            out_channels=OUT_CH,
            feature_size=fs,
            depths=depths,
            num_heads=HEADS,
            window_size=src_w,
            merge_order="monai_v1",
        )
        # high-contrast variant of the phantom (unit intensity step per
        # class, σ=0.05 noise) — learnable in ~100 single-sample steps
        _, labels = _synthetic_volume()
        rng = np.random.default_rng(7)
        shape = labels.shape
        ct = labels.astype(np.float32)[..., None] + rng.normal(
            size=(*shape, 1)
        ).astype(np.float32) * 0.05
        pet = (labels == 2).astype(np.float32)[..., None] * 2.0 + rng.normal(
            size=(*shape, 1)
        ).astype(np.float32) * 0.05
        vol = np.concatenate([ct, pet], axis=-1)

        def soft_dice(logits, y):
            p = torch.softmax(logits, 1)
            oh = (
                torch.nn.functional.one_hot(y, OUT_CH)
                .permute(0, 4, 1, 2, 3)
                .float()
            )
            inter = (p * oh).sum(dim=(2, 3, 4))
            denom = p.sum(dim=(2, 3, 4)) + oh.sum(dim=(2, 3, 4))
            return 1 - ((2 * inter + 1e-5) / (denom + 1e-5)).mean()

        opt = torch.optim.Adam(tmodel.parameters(), lr=3e-3)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=sched_T or n_steps
        )
        cls_w = torch.tensor([0.1, 1.0, 1.0, 1.0])
        tmodel.train()
        for i in range(n_steps):
            h0 = (0, 32)[i % 2]  # alternate halves → all 3 organs seen
            x = torch.from_numpy(
                np.transpose(vol[h0 : h0 + 64][None], (0, 4, 1, 2, 3))
            )
            y = torch.from_numpy(labels[h0 : h0 + 64][None].astype(np.int64))
            opt.zero_grad()
            out = tmodel(x)
            loss = torch.nn.functional.cross_entropy(
                out, y, weight=cls_w
            ) + soft_dice(out, y)
            loss.backward()
            opt.step()
            sched.step()
        tmodel.eval()

        def _serve(window):
            jmodel = SwinUNETR(
                out_channels=OUT_CH,
                feature_size=fs,
                depths=depths,
                num_heads=HEADS,
                window_size=window,
                use_fused=False,
                monai_compat=True,
                merge_order="monai_v1",
            )
            params = from_torch_swin_unetr(
                tmodel.state_dict(), depths=depths, target_window=window
            )
            logits = np.asarray(
                sliding_window_inference(
                    jnp.asarray(vol),
                    lambda v, p: jmodel.apply(v, p, train=False),
                    roi_size=(64, 64, 64),
                    num_classes=OUT_CH,
                    overlap=0.5,
                    sw_batch_size=4,
                    mode="gaussian",
                    params={"params": params},
                )
            )
            return _mean_foreground_dice(logits.argmax(-1), labels, OUT_CH)

        d_src = _serve(src_w)
        d_dst = _serve(dst_w)
        assert d_src >= 0.90, f"training failed to converge (dice {d_src})"
        return d_src, d_dst

    def test_imported_checkpoint_serves_at_smaller_window(self):
        """4³→3³: the fast odd→even transfer A/B (same structure as the
        production pair at lower CPU cost); Dice within 0.5% (SURVEY §6)."""
        d_src, d_dst = self._train_and_serve_ab((4, 4, 4), (3, 3, 3))
        assert abs(d_src - d_dst) <= 0.005, (d_src, d_dst)

    def test_production_pair_7_to_6(self):
        """THE production transfer (VERDICT r4 #4): a checkpoint trained at
        the reference's 7³ window (13³ bias table,
        /root/reference/src/models/backbones/swin_unetr.py:30-35) serves
        under the 6³ perf window (zero padding at every 96³ stage) within
        0.5% Dice of its own 7³ serving. Every encoder stage of the 64³
        test ROI pads under 7³ (32→35, 16→21, 8→14, 4→7) — the same
        pad-everywhere regime as 96³ production. Recipe calibrated r5: the
        13³ bias tables train slower than 4³'s (needs the long-schedule
        high-LR phase — Dice 0.59/0.72/0.98/0.99 at steps 50/100/200/250 on
        a T_max=400 cosine; a T_max=220 schedule stalls at 0.81). TPU
        serving A/B of this transfer at production scale:
        scripts/bench_window_transfer.py (7³ as-trained 40.2 → 6³
        transferred 44.1 vol/min, +9.7%)."""
        d_src, d_dst = self._train_and_serve_ab(
            (7, 7, 7), (6, 6, 6), n_steps=250, sched_T=400
        )
        assert abs(d_src - d_dst) <= 0.005, (d_src, d_dst)
