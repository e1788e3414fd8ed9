"""Sliding-window inference compiled to one XLA program.

Replaces MONAI's ``sliding_window_inference`` (used by the reference at
src/trainer/trainer.py:370-395): static tile grid from roi/overlap, a
precomputed separable Gaussian importance map, ``lax.scan`` over tile
chunks with dynamic-slice extraction and read-modify-write accumulation,
then a final normalize. Everything is static-shaped so XLA pipelines the
whole volume without host round-trips — this is the benchmark path
(BASELINE.md north star).

Three entry points:

- ``sliding_window_inference`` — single-device, tile grid baked in as
  constants (one compile per volume shape).
- ``sharded_sliding_window_inference`` — mesh-parallel serving: the tile
  chunks are sharded over a mesh axis with ``shard_map``; each device
  accumulates its tiles into a full-volume accumulator and a final
  ``psum`` merges them (blending is an associative weighted sum, so the
  merged result is exactly the single-device program's). The reference
  can only serve on one GPU (src/trainer/trainer.py:370-395).
- ``SlidingWindowRunner`` — serving front-end with volume-shape
  bucketing: the tile start offsets are *runtime data*, so every volume
  whose per-axis tile counts match reuses one compiled program. A
  clinical cohort triggers O(buckets) compiles instead of O(shapes),
  with bit-identical logits to the unbucketed program (tile placement is
  computed from the ORIGINAL shape; padded voxels are covered by no tile
  and sliced away).

Tiling contract (MONAI-compatible):
  interval_i = int(roi_i * (1 - overlap))   (roi_i if interval would be 0)
  n_i        = ceil((dim_i - roi_i) / interval_i) + 1
  start_k    = min(k * interval_i, dim_i - roi_i)

Gaussian blending: separable gaussian centered at (roi-1)/2 with
sigma = 0.125 * roi, max-normalized (MONAI default sigma_scale=0.125).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

try:  # jax ≥ 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _scan_starts(dim: int, roi: int, overlap: float) -> list:
    """Tile start offsets along one axis (MONAI dense_patch_slices rule)."""
    if dim <= roi:
        return [0]
    interval = int(roi * (1.0 - overlap))
    if interval <= 0:
        interval = roi
    n = int(math.ceil((dim - roi) / interval)) + 1
    return [min(k * interval, dim - roi) for k in range(n)]


def tile_count(
    shape: Tuple[int, int, int],
    roi_size: Tuple[int, int, int],
    overlap: float,
) -> int:
    """Number of tiles the scan grid places over ``shape``."""
    n = 1
    for dim, roi in zip(shape, roi_size):
        n *= len(_scan_starts(dim, roi, overlap))
    return n


def auto_sw_batch_size(
    n_tiles: int, target: int, slack: int = 4, chunk_multiple: int = 1
) -> int:
    """Chunk size ≤ ``target`` minimizing padded tile slots.

    Padded slots run the model on duplicate tiles whose outputs are masked
    away — pure waste. Measured on the flagship (45 tiles, v5e): sw 15
    (0 padded) → 40.4 vol/min vs sw 16 (3 padded) → 39.4 and sw 12
    (3 padded, smaller chunks) → 32.9 — so minimize waste first, then take
    the largest chunk (the MXU wants batch). Single-device the search stays
    within ``slack`` of ``target`` (tiny chunks feed the MXU too poorly for
    zero waste to pay for them); with ``chunk_multiple`` > 1 (a data mesh
    rounds the chunk count up to the mesh size) waste dominates, so the
    candidates are the per-quantum optima ``ceil(n / (cm·k))`` instead —
    a fixed window would keep e.g. sw 15 for 45 tiles on 8 devices, paying
    75 padded slots where sw 6 pays 3.
    """
    n = max(1, int(n_tiles))
    cm = max(1, int(chunk_multiple))
    target = max(1, min(int(target), n))

    def waste(sw: int) -> int:
        chunks = math.ceil(math.ceil(n / sw) / cm) * cm
        return chunks * sw - n

    if cm == 1:
        candidates = list(range(target, max(0, target - slack - 1), -1))
    else:
        candidates, k = [], 1
        while True:
            sw = math.ceil(n / (cm * k))
            if sw <= target and sw not in candidates:
                candidates.append(sw)
            if sw <= 1:
                break
            k += 1
    best, best_waste = None, None
    for sw in candidates:  # decreasing sw; strict < keeps the largest on ties
        w_ = waste(sw)
        if best is None or w_ < best_waste:
            best, best_waste = sw, w_
    return best


def resolve_sw_batch(
    value,
    shape: Tuple[int, int, int],
    roi_size: Tuple[int, int, int],
    overlap: float,
    default: int = 4,
    chunk_multiple: int = 1,
) -> int:
    """Resolve a config ``inference.batch_size`` to a concrete chunk size.

    ``value`` may be an int, ``"auto"`` (waste-minimizing search capped at
    16), or ``"auto:N"`` (capped at N). ``chunk_multiple`` is the data-mesh
    size when the tile chunks will be sharded (the chunk count rounds up to
    it, which changes which chunk size wastes least).
    """
    if value is None:
        return int(default)
    if isinstance(value, str):
        v = value.strip().lower()
        if v.startswith("auto"):
            cap = int(v.split(":", 1)[1]) if ":" in v else 16
            return auto_sw_batch_size(
                tile_count(shape, roi_size, overlap), cap,
                chunk_multiple=chunk_multiple,
            )
        return int(v)
    return int(value)


def gaussian_importance_map(
    roi_size: Sequence[int], sigma_scale: float = 0.125, dtype=np.float32
) -> np.ndarray:
    """Separable Gaussian weight map over a ROI, max-normalized to 1."""
    maps = []
    for r in roi_size:
        center = (r - 1) / 2.0
        sigma = sigma_scale * r
        x = np.arange(r, dtype=np.float64)
        g = np.exp(-0.5 * ((x - center) / sigma) ** 2)
        maps.append(g)
    w = maps[0][:, None, None] * maps[1][None, :, None] * maps[2][None, None, :]
    w = w / w.max()
    # avoid exact zeros so normalization is safe everywhere
    w = np.maximum(w, w.max() * 1e-3)
    return w.astype(dtype)


def make_tile_grid(
    shape: Tuple[int, int, int],
    roi_size: Tuple[int, int, int],
    overlap: float,
    sw_batch_size: int,
    min_chunks: int = 0,
    chunk_multiple: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side tile grid: ``(starts [n_chunks, sw, 3], valid [n_chunks, sw])``.

    Padded slots (to fill the last chunk, reach ``min_chunks``, or round the
    chunk count up to ``chunk_multiple``) repeat the last tile with
    ``valid=0`` so they contribute nothing to the blend.
    """
    starts = [
        (sh, sw_, sd)
        for sh in _scan_starts(shape[0], roi_size[0], overlap)
        for sw_ in _scan_starts(shape[1], roi_size[1], overlap)
        for sd in _scan_starts(shape[2], roi_size[2], overlap)
    ]
    n_tiles = len(starts)
    n_chunks = max(int(math.ceil(n_tiles / sw_batch_size)), min_chunks, 1)
    n_chunks = int(math.ceil(n_chunks / chunk_multiple)) * chunk_multiple
    n_padded = n_chunks * sw_batch_size
    valid = np.zeros((n_padded,), dtype=np.float32)
    valid[:n_tiles] = 1.0
    while len(starts) < n_padded:
        starts.append(starts[-1])
    starts_arr = np.asarray(starts, dtype=np.int32).reshape(
        n_chunks, sw_batch_size, 3
    )
    return starts_arr, valid.reshape(n_chunks, sw_batch_size)


def _blend_weight(roi_size, mode: str) -> np.ndarray:
    if mode == "gaussian":
        w = gaussian_importance_map(roi_size)
    else:
        w = np.ones(roi_size, dtype=np.float32)
    return w[..., None]  # [rh, rw, rd, 1]


def _sw_accumulate(
    vol: jax.Array,
    starts_arr: jax.Array,
    valid_arr: jax.Array,
    run_predict: Callable,
    roi_size: Tuple[int, int, int],
    num_classes: int,
    weight4: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Scan tile chunks over ``vol`` [H, W, D, C] → (acc, wacc) blends."""
    H, W, D, c = vol.shape
    rh, rw, rd = roi_size
    sw_batch_size = starts_arr.shape[1]

    # derive the accumulator init from starts_arr so it carries the same
    # manual-axis variance under shard_map (starts are the per-device
    # varying input; a plain zeros init would be device-invariant and the
    # scan carry types would mismatch — same trick as ring_attention)
    vzero = jnp.sum(starts_arr).astype(jnp.float32) * 0.0
    acc = jnp.zeros((H, W, D, num_classes), dtype=jnp.float32) + vzero
    wacc = jnp.zeros((H, W, D, 1), dtype=jnp.float32) + vzero

    def extract(start):
        return jax.lax.dynamic_slice(
            vol, (start[0], start[1], start[2], 0), (rh, rw, rd, c)
        )

    def chunk_body(carry, chunk):
        acc, wacc = carry
        chunk_starts, chunk_valid = chunk
        patches = jax.vmap(extract)(chunk_starts)  # [sw, rh, rw, rd, c]
        logits = run_predict(patches).astype(jnp.float32)  # [sw, rh, rw, rd, K]
        weighted = logits * weight4[None]

        def add_one(i, carry):
            acc, wacc = carry
            s = chunk_starts[i]
            v = chunk_valid[i]  # 0 for padded duplicate tiles
            idx = (s[0], s[1], s[2], 0)
            cur = jax.lax.dynamic_slice(acc, idx, (rh, rw, rd, num_classes))
            acc = jax.lax.dynamic_update_slice(acc, cur + weighted[i] * v, idx)
            curw = jax.lax.dynamic_slice(wacc, idx, (rh, rw, rd, 1))
            wacc = jax.lax.dynamic_update_slice(wacc, curw + weight4 * v, idx)
            return acc, wacc

        acc, wacc = jax.lax.fori_loop(0, sw_batch_size, add_one, (acc, wacc))
        return (acc, wacc), None

    (acc, wacc), _ = jax.lax.scan(
        chunk_body, (acc, wacc), (starts_arr, valid_arr)
    )
    return acc, wacc


@partial(
    jax.jit,
    static_argnames=("predict_fn", "roi_size", "overlap", "sw_batch_size", "mode", "num_classes"),
)
def sliding_window_inference(
    volume: jax.Array,
    predict_fn: Callable[..., jax.Array],
    roi_size: Tuple[int, int, int],
    num_classes: int,
    overlap: float = 0.5,
    sw_batch_size: int = 4,
    mode: str = "gaussian",
    params=None,
) -> jax.Array:
    """Run tiled inference over ``volume``.

    Args:
        volume: ``[H, W, D, C]`` (single volume) or ``[B, H, W, D, C]``.
        predict_fn: maps ``[n, *roi, C]`` patches → ``[n, *roi, num_classes]``
            logits. Must be jit-traceable. If ``params`` is given, the
            signature is ``predict_fn(params, patches)``.
        roi_size: tile size.
        num_classes: output channel count.
        overlap: fractional tile overlap (default 0.5 like the reference
            config inference.sliding_window.overlap).
        sw_batch_size: tiles per model forward (reference inference.batch_size).
        mode: "gaussian" or "constant" blending.
        params: optional pytree of model variables, threaded through the jit
            as a real argument. IMPORTANT for performance: closing over the
            weights in ``predict_fn`` instead would embed them as program
            constants (slow lowering, host transfers, recompile per
            checkpoint).

    Returns:
        logits with the same spatial shape as ``volume`` and ``num_classes``
        channels.
    """
    run_predict = (
        predict_fn if params is None else (lambda p: predict_fn(params, p))
    )
    if volume.ndim == 5:
        return jax.vmap(
            lambda v: sliding_window_inference(
                v,
                predict_fn,
                roi_size,
                num_classes,
                overlap,
                sw_batch_size,
                mode,
                params,
            )
        )(volume)

    h, w, d, c = volume.shape
    rh, rw, rd = roi_size

    # Pad spatial dims up to at least roi
    ph, pw, pd = max(rh - h, 0), max(rw - w, 0), max(rd - d, 0)
    vol = jnp.pad(volume, ((0, ph), (0, pw), (0, pd), (0, 0)))
    H, W, D = h + ph, w + pw, d + pd

    starts_np, valid_np = make_tile_grid((H, W, D), roi_size, overlap, sw_batch_size)
    starts_arr = jnp.asarray(starts_np)
    valid_arr = jnp.asarray(valid_np)
    weight4 = jnp.asarray(_blend_weight(roi_size, mode))

    acc, wacc = _sw_accumulate(
        vol, starts_arr, valid_arr, run_predict, roi_size, num_classes, weight4
    )
    out = acc / wacc
    return out[:h, :w, :d, :]


def sharded_sliding_window_inference(
    volume: jax.Array,
    predict_fn: Callable[..., jax.Array],
    roi_size: Tuple[int, int, int],
    num_classes: int,
    mesh,
    axis_name: str = "data",
    overlap: float = 0.5,
    sw_batch_size: int = 4,
    mode: str = "gaussian",
    params=None,
) -> jax.Array:
    """Mesh-parallel sliding window: tile chunks sharded over ``axis_name``.

    Each device runs the same scan body over its own slice of the chunk
    list, accumulating into a private full-volume (acc, wacc) pair; a final
    ``psum`` over the mesh axis merges them. Because Gaussian blending is an
    associative weighted sum, the merged logits equal the single-device
    program's exactly (up to f32 summation order). The reference's serving
    path is single-GPU only (src/trainer/trainer.py:370-395); on an N-chip
    mesh this runs the model forwards N-wide.

    Same contract as :func:`sliding_window_inference` for a single volume
    ``[H, W, D, C]``.
    """
    from jax.sharding import PartitionSpec as P

    h, w, d, c = volume.shape
    rh, rw, rd = roi_size
    ph, pw, pd = max(rh - h, 0), max(rw - w, 0), max(rd - d, 0)
    vol = jnp.pad(volume, ((0, ph), (0, pw), (0, pd), (0, 0)))
    H, W, D = h + ph, w + pw, d + pd

    n_dev = mesh.shape[axis_name]
    starts_np, valid_np = make_tile_grid(
        (H, W, D), roi_size, overlap, sw_batch_size, chunk_multiple=n_dev
    )
    starts_arr = jnp.asarray(starts_np)
    valid_arr = jnp.asarray(valid_np)
    weight4 = jnp.asarray(_blend_weight(roi_size, mode))

    run_predict = (
        (lambda prm, p: predict_fn(p)) if params is None else predict_fn
    )
    prm = params if params is not None else {}

    def local_run(vol, starts, valid, prm):
        acc, wacc = _sw_accumulate(
            vol, starts, valid, lambda p: run_predict(prm, p),
            roi_size, num_classes, weight4,
        )
        acc = jax.lax.psum(acc, axis_name)
        wacc = jax.lax.psum(wacc, axis_name)
        return acc / wacc

    fn = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=P(),
    )
    out = fn(vol, starts_arr, valid_arr, prm)
    return out[:h, :w, :d, :]


def bucket_shape(
    shape: Tuple[int, int, int],
    roi_size: Tuple[int, int, int],
    overlap: float,
) -> Tuple[int, int, int]:
    """Smallest canonical shape with the same per-axis tile count as
    ``shape``: roi + interval·ceil((dim − roi)/interval). Every shape in a
    bucket shares tile counts, so bucketed programs waste zero tile slots."""
    out = []
    for dim, roi in zip(shape, roi_size):
        if dim <= roi:
            out.append(roi)
            continue
        interval = int(roi * (1.0 - overlap)) or roi
        out.append(roi + interval * int(math.ceil((dim - roi) / interval)))
    return tuple(out)


class SlidingWindowRunner:
    """Serving front-end: shape-bucketed, optionally mesh-parallel.

    Compiles one XLA program per (bucket shape, channel count) and reuses
    it for every volume in the bucket — the tile start offsets are runtime
    arguments computed from each volume's ORIGINAL shape, so logits are
    identical to the unbucketed program on the original region (padded
    voxels are covered by no tile and sliced away before returning).

    Without bucketing, `sliding_window_inference` recompiles per volume
    shape (BENCH_CONFIGS.json records 478–557 s single compiles through
    the axon relay); a clinical cohort of varying shapes would pay that
    per case.
    """

    def __init__(
        self,
        predict_fn: Callable,
        roi_size: Tuple[int, int, int],
        num_classes: int,
        overlap: float = 0.5,
        sw_batch_size=4,
        mode: str = "gaussian",
        mesh=None,
        axis_name: str = "data",
    ):
        self.predict_fn = predict_fn
        self.roi_size = tuple(roi_size)
        self.num_classes = int(num_classes)
        self.overlap = float(overlap)
        # "auto"/"auto:N" → per-bucket divisor search (the bucket fixes the
        # tile count, so every volume in a bucket shares the resolved size
        # and the compiled program)
        self._sw_spec = sw_batch_size
        self.sw_batch_size = (
            sw_batch_size if isinstance(sw_batch_size, str) else int(sw_batch_size)
        )
        self.mode = str(mode)
        self.mesh = mesh
        self.axis_name = axis_name
        self._cache: Dict[Tuple, Callable] = {}

    def _chunk_multiple(self) -> int:
        if self.mesh is not None:
            return int(self.mesh.shape[self.axis_name])
        return 1

    def _build(self, bucket: Tuple[int, int, int], c: int, n_chunks: int):
        roi = self.roi_size
        weight4 = jnp.asarray(_blend_weight(roi, self.mode))
        predict_fn = self.predict_fn
        num_classes = self.num_classes

        if self.mesh is None:

            def run(prm, vol, starts, valid):
                acc, wacc = _sw_accumulate(
                    vol, starts, valid, lambda p: predict_fn(prm, p),
                    roi, num_classes, weight4,
                )
                return jnp.where(wacc > 0, acc / jnp.where(wacc > 0, wacc, 1.0), 0.0)

            return jax.jit(run)

        from jax.sharding import PartitionSpec as P

        axis_name = self.axis_name

        def local_run(prm, vol, starts, valid):
            acc, wacc = _sw_accumulate(
                vol, starts, valid, lambda p: predict_fn(prm, p),
                roi, num_classes, weight4,
            )
            acc = jax.lax.psum(acc, axis_name)
            wacc = jax.lax.psum(wacc, axis_name)
            return jnp.where(wacc > 0, acc / jnp.where(wacc > 0, wacc, 1.0), 0.0)

        fn = shard_map(
            local_run,
            mesh=self.mesh,
            in_specs=(P(), P(), P(axis_name), P(axis_name)),
            out_specs=P(),
        )
        return jax.jit(fn)

    def __call__(self, volume, params) -> jax.Array:
        """``[H, W, D, C]`` volume → ``[H, W, D, num_classes]`` logits."""
        h, w, d, c = volume.shape
        bucket = bucket_shape((h, w, d), self.roi_size, self.overlap)
        H, W, D = bucket
        sw = resolve_sw_batch(
            self._sw_spec, bucket, self.roi_size, self.overlap,
            chunk_multiple=self._chunk_multiple(),
        )
        # tile grid from the ORIGINAL shape (bit-parity with the unbucketed
        # program); chunk count from the bucket shape (shared compile key)
        b_starts, _ = make_tile_grid(bucket, self.roi_size, self.overlap, sw)
        n_chunks = int(
            math.ceil(b_starts.shape[0] / self._chunk_multiple())
        ) * self._chunk_multiple()
        starts_np, valid_np = make_tile_grid(
            (max(h, self.roi_size[0]), max(w, self.roi_size[1]), max(d, self.roi_size[2])),
            self.roi_size,
            self.overlap,
            sw,
            min_chunks=n_chunks,
            chunk_multiple=self._chunk_multiple(),
        )
        assert starts_np.shape[0] == n_chunks, (
            f"bucket {bucket} chunk count {n_chunks} < volume's "
            f"{starts_np.shape[0]} — bucket_shape must dominate tile counts"
        )

        key = (bucket, c, n_chunks)
        if key not in self._cache:
            self._cache[key] = self._build(bucket, c, n_chunks)
        fn = self._cache[key]

        vol = jnp.pad(
            jnp.asarray(volume), ((0, H - h), (0, W - w), (0, D - d), (0, 0))
        )
        out = fn(params, vol, jnp.asarray(starts_np), jnp.asarray(valid_np))
        return out[:h, :w, :d, :]

    @property
    def num_compiled(self) -> int:
        return len(self._cache)


def predict_labels(
    run_sw: Callable,
    image: jax.Array,
    tta: bool = False,
    return_probs: bool = False,
    already_probs: bool = False,
):
    """Blended logits → label map for one ``[H, W, D, C]`` volume.

    ``run_sw`` maps a volume to full-volume logits (any of this module's
    three entry points). With ``tta``, averages over the 3 single-axis
    spatial flips, un-flipping each prediction (the reference declares
    ``inference.tta`` but never implements it —
    /root/reference/configs/default.yaml:121). Shared by the batch CLI
    (``Trainer.predict``) and the HTTP service so the two serving surfaces
    cannot diverge. Returns a DEVICE int array — callers fetch it
    (``np.asarray``) outside any device lock they hold.

    ``return_probs`` additionally returns per-class probabilities
    ``[H, W, D, C]`` (softmax of the blended logits). ``already_probs``
    marks ``run_sw`` as returning probabilities rather than logits (the
    checkpoint-ensemble path averages member softmaxes); argmax and TTA
    averaging are unchanged, but the softmax must then be skipped.
    """
    out = run_sw(image)
    if tta:
        for axis in range(3):
            flipped = jnp.flip(image, axis=axis)
            out = out + jnp.flip(run_sw(flipped), axis=axis)
        out = out / 4.0
    labels = jnp.argmax(out, axis=-1)
    if not return_probs:
        return labels
    probs = out if already_probs else jax.nn.softmax(out, axis=-1)
    return labels, probs


def predictive_entropy(probs: jax.Array) -> jax.Array:
    """Normalized predictive entropy ``[H, W, D]`` in [0, 1] from per-class
    probabilities ``[H, W, D, C]``.

    ``H(p) / log C`` — 0 where the model is certain, 1 at a uniform
    posterior. The standard single-pass uncertainty readout for review
    triage (which slices need a radiologist's eye); the checkpoint-ensemble
    path makes it an ensemble predictive entropy, which also captures
    model disagreement. Shared by the batch CLI and the HTTP service
    (the reference has no uncertainty output at all). Runs on device —
    callers fetch the 3D map, not the 4D posterior.
    """
    c = probs.shape[-1]
    h = -(probs * jnp.log(jnp.clip(probs, 1e-12))).sum(axis=-1)
    return h / jnp.log(float(c))
