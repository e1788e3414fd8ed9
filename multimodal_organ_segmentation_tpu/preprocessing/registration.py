"""JAX-native image registration (replaces SimpleITK/ITK C++,
reference: src/preprocessing/registration.py:21-288).

Capabilities mirrored:

- methods: translation / rigid (Euler 3D about the volume center) /
  affine / deformable (cubic B-spline FFD: mesh_size M → (M+3)³ control
  points per axis, uniform cubic basis, matching SimpleITK's
  BSplineTransformInitializer convention, registration.py:209-222);
- metrics: mattes_mutual_information (differentiable Parzen soft-binned
  joint histogram, 50 bins), correlation (negative NCC), mean_squares
  (registration.py:237-244);
- 3-level multi-resolution pyramid, shrink [4,2,1] / smoothing [2,1,0]
  (registration.py:266-268);
- geometric center initialization (CenteredTransformInitializer GEOMETRY,
  registration.py:226-231) — both images are first resampled onto the
  fixed grid through their affines, which aligns physical centers;
- resampling via trilinear ``jax.scipy.ndimage.map_coordinates``;
- outputs ``{mod}_registered.nii.gz`` + ``{mod}_transform.json``.

TPU-first: the optimization loop is ``jit(grad(metric))`` — the entire
multiresolution level (warp + metric + backward) is one compiled XLA
program per level, optimized with Adam instead of ITK's
RegularStepGradientDescent.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from multimodal_organ_segmentation_tpu.utils.io import (
    ensure_dir,
    load_nifti,
    save_json,
    save_nifti,
)

# ---------------------------------------------------------------------------
# resampling / warping
# ---------------------------------------------------------------------------

def _identity_coords(shape: Tuple[int, int, int]) -> jnp.ndarray:
    """[3, H, W, D] voxel coordinate grid."""
    h, w, d = shape
    return jnp.stack(
        jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            jnp.arange(d, dtype=jnp.float32),
            indexing="ij",
        )
    )


def _sample(moving: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of moving at [3, ...] voxel coords (order=1)."""
    return jax.scipy.ndimage.map_coordinates(moving, list(coords), order=1, mode="constant")


def _sample_nearest(moving: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample — the correct interpolator for LABEL maps
    (trilinear would invent fractional labels on boundaries). Out-of-bounds
    coords sample 0, matching ``_sample``'s constant mode."""
    idx = jnp.round(coords).astype(jnp.int32)
    inside = jnp.ones(idx.shape[1:], dtype=bool)
    gather = []
    for i in range(3):
        inside &= (idx[i] >= 0) & (idx[i] < moving.shape[i])
        gather.append(jnp.clip(idx[i], 0, moving.shape[i] - 1))
    return jnp.where(inside, moving[gather[0], gather[1], gather[2]], 0)


def _euler_matrix(rx, ry, rz):
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def transform_coords(
    params: Dict[str, jnp.ndarray],
    coords: jnp.ndarray,
    method: str,
    center: jnp.ndarray,
    grid_shape: Optional[Tuple[int, int, int]] = None,
) -> jnp.ndarray:
    """Map fixed-grid voxel coords → moving-image voxel coords."""
    c = coords.reshape(3, -1)
    if method == "translation":
        out = c + params["t"][:, None]
    elif method == "rigid":
        R = _euler_matrix(*params["r"])
        out = R @ (c - center[:, None]) + center[:, None] + params["t"][:, None]
    elif method == "affine":
        A = jnp.eye(3) + params["A"]
        out = A @ (c - center[:, None]) + center[:, None] + params["t"][:, None]
    elif method == "deformable":
        # cubic B-spline FFD displacement field from the control grid
        full = bspline_upsample(params["grid"], grid_shape)
        out = c + full.reshape(-1, 3).T + params["t"][:, None]
    else:
        raise ValueError(f"unknown method {method}")
    return out.reshape(coords.shape)


def init_params(method: str, mesh_size: int = 4) -> Dict[str, jnp.ndarray]:
    p = {"t": jnp.zeros(3)}
    if method == "rigid":
        p["r"] = jnp.zeros(3)
    elif method == "affine":
        p["A"] = jnp.zeros((3, 3))
    elif method == "deformable":
        g = mesh_size + 3  # cubic spline: mesh cells + order control points
        p["grid"] = jnp.zeros((g, g, g, 3))
    return p


def _bspline_weights_1d(out_len: int, n_ctrl: int) -> jnp.ndarray:
    """Dense [out_len, n_ctrl] uniform-cubic-B-spline evaluation matrix.

    The physical extent is divided into ``n_ctrl - 3`` cells (SimpleITK
    BSplineTransform convention: mesh_size cells need mesh_size + order
    control points per axis). Output position h maps to spline coordinate
    u = h·M/(out_len-1) ∈ [0, M]; with cell i = ⌊u⌋ and t = u - i the four
    uniform cubic basis functions weight control points i..i+3.

    Rows have 4 non-zeros; built dense because out_len ≤ a few hundred and
    n_ctrl is tiny, so the whole displacement upsample runs as three MXU
    matmuls (same design as ops/resize.py).
    """
    m = n_ctrl - 3
    u = jnp.arange(out_len, dtype=jnp.float32) * (m / max(out_len - 1, 1))
    i = jnp.clip(jnp.floor(u), 0, m - 1)
    t = u - i
    b0 = (1 - t) ** 3 / 6.0
    b1 = (3 * t**3 - 6 * t**2 + 4) / 6.0
    b2 = (-3 * t**3 + 3 * t**2 + 3 * t + 1) / 6.0
    b3 = t**3 / 6.0
    cols = i[:, None].astype(jnp.int32) + jnp.arange(4)[None, :]  # [H, 4]
    vals = jnp.stack([b0, b1, b2, b3], axis=1)  # [H, 4]
    onehot = jax.nn.one_hot(cols, n_ctrl, dtype=jnp.float32)  # [H, 4, n_ctrl]
    return jnp.einsum("hk,hkc->hc", vals, onehot)


def bspline_upsample(
    control: jnp.ndarray, out_shape: Tuple[int, int, int]
) -> jnp.ndarray:
    """[g0, g1, g2, C] control grid → [H, W, D, C] cubic-B-spline field."""
    g0, g1, g2, _ = control.shape
    w0 = _bspline_weights_1d(out_shape[0], g0)
    w1 = _bspline_weights_1d(out_shape[1], g1)
    w2 = _bspline_weights_1d(out_shape[2], g2)
    out = jnp.einsum("ha,awdc->hwdc", w0, control)
    out = jnp.einsum("wb,hbdc->hwdc", w1, out)
    return jnp.einsum("dg,hwgc->hwdc", w2, out)


# ---------------------------------------------------------------------------
# metrics (to minimize)
# ---------------------------------------------------------------------------

def mean_squares(fixed: jnp.ndarray, warped: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((fixed - warped) ** 2)


def neg_correlation(fixed: jnp.ndarray, warped: jnp.ndarray) -> jnp.ndarray:
    f = fixed - jnp.mean(fixed)
    m = warped - jnp.mean(warped)
    cc = jnp.sum(f * m) / (
        jnp.sqrt(jnp.sum(f**2)) * jnp.sqrt(jnp.sum(m**2)) + 1e-8
    )
    return -cc


def neg_mattes_mi(
    fixed: jnp.ndarray, warped: jnp.ndarray, bins: int = 50
) -> jnp.ndarray:
    """Negative mutual information via Parzen soft binning (linear kernel)."""
    def normalize(x):
        lo, hi = jnp.min(x), jnp.max(x)
        return (x - lo) / (hi - lo + 1e-8)

    f = normalize(fixed.reshape(-1)) * (bins - 1)
    m = normalize(warped.reshape(-1)) * (bins - 1)
    centers = jnp.arange(bins, dtype=jnp.float32)
    # linear (tent) kernel weights [N, bins]
    wf = jnp.maximum(0.0, 1.0 - jnp.abs(f[:, None] - centers[None]))
    wm = jnp.maximum(0.0, 1.0 - jnp.abs(m[:, None] - centers[None]))
    joint = wf.T @ wm  # [bins, bins]
    joint = joint / (jnp.sum(joint) + 1e-8)
    pf = jnp.sum(joint, axis=1)
    pm = jnp.sum(joint, axis=0)
    eps = 1e-10
    mi = jnp.sum(joint * (jnp.log(joint + eps) - jnp.log(pf[:, None] * pm[None] + eps)))
    return -mi


_METRICS = {
    "mattes_mutual_information": neg_mattes_mi,
    "correlation": neg_correlation,
    "mean_squares": mean_squares,
}


# ---------------------------------------------------------------------------
# pyramid helpers
# ---------------------------------------------------------------------------

def _gaussian_smooth(vol: jnp.ndarray, sigma: float) -> jnp.ndarray:
    if sigma <= 0:
        return vol
    radius = int(3 * sigma)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    for axis in range(3):
        v = jnp.moveaxis(vol, axis, -1)
        shape = v.shape
        v2 = v.reshape(-1, shape[-1])[:, None, :]  # [rows, 1, L]
        out = jax.vmap(lambda row: jnp.convolve(row[0], k, mode="same"))(v2)
        vol = jnp.moveaxis(out.reshape(shape), -1, axis)
    return vol


def _shrink(vol: jnp.ndarray, factor: int) -> jnp.ndarray:
    if factor <= 1:
        return vol
    from multimodal_organ_segmentation_tpu.ops.resize import resize_linear

    out_shape = tuple(max(s // factor, 8) for s in vol.shape)
    return resize_linear(vol, out_shape, spatial_axes=(0, 1, 2))


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

class ImageRegistration:
    """Multi-resolution gradient-descent registration."""

    def __init__(self, config=None):
        config = config or {}
        reg_cfg = config.get("data.registration", {}) if hasattr(config, "get") else {}
        reg_cfg = reg_cfg or {}
        self.method = str(reg_cfg.get("method", "translation"))
        self.metric = str(reg_cfg.get("metric", "mattes_mutual_information"))
        self.iterations = int(reg_cfg.get("iterations", 100))
        self.shrink_factors = list(reg_cfg.get("shrink_factors", [4, 2, 1]))
        self.smoothing_sigmas = list(reg_cfg.get("smoothing_sigmas", [2, 1, 0]))
        self.lr = float(reg_cfg.get("lr", 0.5))
        self.mesh_size = int(reg_cfg.get("mesh_size", 4))
        self.config = config

    # -- core optimization --------------------------------------------------

    def register_arrays(
        self,
        fixed: np.ndarray,
        moving: np.ndarray,
        method: Optional[str] = None,
        metric: Optional[str] = None,
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        """Register moving → fixed (same grid); returns (warped, transform)."""
        method = method or self.method
        metric_name = metric or self.metric
        metric_fn = _METRICS[metric_name]

        fixed_j = jnp.asarray(fixed, dtype=jnp.float32)
        moving_j = jnp.asarray(moving, dtype=jnp.float32)
        params = init_params(method, self.mesh_size)

        for factor, sigma in zip(self.shrink_factors, self.smoothing_sigmas):
            f_level = _shrink(_gaussian_smooth(fixed_j, sigma), factor)
            m_level = _shrink(_gaussian_smooth(moving_j, sigma), factor)
            scale = jnp.asarray(
                [fs / ms for fs, ms in zip(fixed_j.shape, f_level.shape)],
                dtype=jnp.float32,
            )
            coords = _identity_coords(f_level.shape)
            center = jnp.asarray(
                [(s - 1) / 2 for s in f_level.shape], dtype=jnp.float32
            )

            def level_params(p):
                # translations are stored in full-res voxels; scale to level
                q = dict(p)
                q["t"] = p["t"] / scale
                if method == "deformable":
                    q["grid"] = p["grid"] / scale[None, None, None, :]
                return q

            # evaluate the metric on the interior only: zero-fill outside the
            # moving volume would otherwise bias the optimum toward zero shift
            margin = [max(1, s // 8) for s in f_level.shape]
            interior = tuple(slice(m, s - m) for m, s in zip(margin, f_level.shape))

            def loss_fn(p):
                q = level_params(p)
                c = transform_coords(q, coords, method, center, f_level.shape)
                warped = _sample(m_level, c)
                loss = metric_fn(f_level[interior], warped[interior])
                if method == "deformable":
                    loss = loss + 1e-4 * jnp.mean(q["grid"] ** 2)
                return loss

            tx = optax.adam(self.lr if method == "translation" else self.lr * 0.2)
            opt_state = tx.init(params)

            @jax.jit
            def step(p, s):
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = tx.update(grads, s, p)
                return optax.apply_updates(p, updates), s, loss

            for _ in range(self.iterations):
                params, opt_state, loss = step(params, opt_state)
            # metric of the *returned* parameters at this level (also covers
            # iterations == 0, where the loop never binds `loss`)
            final_metric = float(jax.jit(loss_fn)(params))

        # final warp at full resolution
        coords = _identity_coords(fixed_j.shape)
        center = jnp.asarray([(s - 1) / 2 for s in fixed_j.shape], dtype=jnp.float32)
        c = transform_coords(params, coords, method, center, fixed_j.shape)
        warped = np.asarray(_sample(moving_j, c), dtype=np.float32)

        transform = {
            "method": method,
            "metric": metric_name,
            "params": {k: np.asarray(v).tolist() for k, v in params.items()},
            "final_metric": final_metric,
        }
        return warped, transform

    # -- grid alignment -------------------------------------------------------

    @staticmethod
    def resample_to_fixed_grid(
        moving: np.ndarray,
        moving_affine: np.ndarray,
        fixed_shape: Tuple[int, int, int],
        fixed_affine: np.ndarray,
        interpolation: str = "linear",
    ) -> np.ndarray:
        """Resample moving onto the fixed grid through the affines
        (coords_m = A_m⁻¹ · A_f · coords_f)."""
        A = np.linalg.inv(moving_affine) @ fixed_affine  # voxel_f → voxel_m
        coords = np.asarray(_identity_coords(fixed_shape))
        flat = coords.reshape(3, -1)
        hom = np.vstack([flat, np.ones((1, flat.shape[1]))])
        m_coords = (A @ hom)[:3].reshape(coords.shape)
        sampler = _sample_nearest if interpolation == "nearest" else _sample
        out = sampler(jnp.asarray(moving, jnp.float32), jnp.asarray(m_coords))
        return np.asarray(out, dtype=np.float32)

    # -- file-level API (reference: register/register_pair/apply_transform) ---

    def register_pair(
        self,
        fixed_path,
        moving_path,
        output_path=None,
        transform_path=None,
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        fixed, f_aff = load_nifti(fixed_path, return_affine=True)
        moving, m_aff = load_nifti(moving_path, return_affine=True)

        if moving.shape != fixed.shape or not np.allclose(m_aff, f_aff):
            moving = self.resample_to_fixed_grid(moving, m_aff, fixed.shape, f_aff)

        warped, transform = self.register_arrays(fixed, moving)

        if output_path is not None:
            save_nifti(warped, output_path, affine=f_aff)
        if transform_path is not None:
            save_json(transform, transform_path)
        return warped, transform

    def register(self, data_dir, primary_modality: str = "CT") -> Dict[str, str]:
        """Register every modality volume under ``data_dir`` to the primary.

        Expects ``{data_dir}/{MOD}/{mod}.nii.gz`` (preprocess layout).
        """
        data_dir = Path(data_dir)
        primary = primary_modality.upper()
        fixed_path = data_dir / primary / f"{primary.lower()}.nii.gz"
        if not fixed_path.exists():
            raise FileNotFoundError(f"primary modality volume missing: {fixed_path}")

        results = {}
        for mod_dir in sorted(p for p in data_dir.iterdir() if p.is_dir()):
            mod = mod_dir.name.upper()
            if mod == primary:
                continue
            moving_path = mod_dir / f"{mod.lower()}.nii.gz"
            if not moving_path.exists():
                continue
            out = mod_dir / f"{mod.lower()}_registered.nii.gz"
            tfm = mod_dir / f"{mod.lower()}_transform.json"
            self.register_pair(fixed_path, moving_path, out, tfm)
            results[mod] = str(out)
        return results

    def apply_transform(
        self, moving_path, transform_path, output_path, reference_path=None,
        interpolation: str = "linear", dtype=None,
    ) -> str:
        """Apply a saved transform to a new volume.

        ``interpolation="nearest"`` warps LABEL maps without inventing
        fractional labels (and preserves the integer dtype) — what you use
        to carry a segmentation through a registration found on the
        underlying images. SimpleITK exposes the same switch
        (sitkNearestNeighbor); the reference, delegating to SimpleITK,
        never wires it."""
        moving, m_aff = load_nifti(moving_path, return_affine=True)
        with open(transform_path) as f:
            transform = json.load(f)
        method = transform["method"]
        params = {
            k: jnp.asarray(np.asarray(v, dtype=np.float32))
            for k, v in transform["params"].items()
        }

        if interpolation not in ("linear", "nearest"):
            raise ValueError(
                f"interpolation must be 'linear' or 'nearest', got {interpolation!r}"
            )
        if reference_path is not None:
            ref, r_aff = load_nifti(reference_path, return_affine=True)
            if moving.shape != ref.shape or not np.allclose(m_aff, r_aff):
                moving = self.resample_to_fixed_grid(
                    moving, m_aff, ref.shape, r_aff, interpolation=interpolation
                )
            out_affine = r_aff
        else:
            out_affine = m_aff

        vol = jnp.asarray(moving, jnp.float32)
        coords = _identity_coords(vol.shape)
        center = jnp.asarray([(s - 1) / 2 for s in vol.shape], dtype=jnp.float32)
        c = transform_coords(params, coords, method, center, vol.shape)
        sampler = _sample_nearest if interpolation == "nearest" else _sample
        warped = np.asarray(sampler(vol, c), dtype=np.float32)
        if dtype is not None:
            # e.g. uint8 for a warped label map (nearest keeps the values
            # exact, so the cast is lossless)
            warped = np.round(warped).astype(dtype) if np.issubdtype(
                np.dtype(dtype), np.integer
            ) else warped.astype(dtype)
        save_nifti(warped, output_path, affine=out_affine)
        return str(output_path)
