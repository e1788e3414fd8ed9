"""StableHLO deployment artifacts: compile-free, model-code-free serving.

``export_stablehlo`` serializes the ROI forward pass (the unit the
sliding-window engine calls) via ``jax.export`` with the trained weights
baked in as constants. The artifact is a single zip holding the portable
StableHLO module plus a JSON metadata sidecar; ``load_stablehlo`` returns
a plain callable — no flax module, no checkpoint, no Python model code on
the serving host.

The batch (``sw_batch``) dimension is exported *symbolically*, so one
artifact serves any tile-batch size; the module is lowered for both
``cpu`` and ``tpu`` targets. The reference has no deployment-export
surface at all — its only interchange is raw ``torch.save`` state dicts
(/root/reference/src/models/build.py:153-180), which require the full
model source tree to consume.
"""

from __future__ import annotations

import json
import zipfile
from pathlib import Path
from typing import Any, Callable, Dict, Tuple

_ARTIFACT_MEMBER = "model.stablehlo"
_METADATA_MEMBER = "metadata.json"
_FORMAT_VERSION = 1


def export_stablehlo(
    model,
    variables: Dict[str, Any],
    out_path,
    *,
    roi: Tuple[int, int, int],
    in_channels: int,
    metadata: Dict[str, Any] | None = None,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
) -> Path:
    """Serialize ``model.apply(variables, x, train=False)`` to ``out_path``.

    ``variables`` must already hold the deployment weights (EMA-selected —
    see ``train.trainer.select_infer_params``). Input signature is
    ``f32[b, *roi, in_channels]`` with ``b`` symbolic.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    def forward(x):
        return model.apply(variables, x, train=False)

    (b,) = jexport.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, *roi, in_channels), jnp.float32)
    exported = jexport.export(jax.jit(forward), platforms=tuple(platforms))(spec)
    blob = exported.serialize()

    meta = {
        "format_version": _FORMAT_VERSION,
        "input": {
            "shape": ["b", *map(int, roi), int(in_channels)],
            "dtype": "float32",
            "layout": "NDHWC (channels-last; b = symbolic tile batch)",
        },
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        **(metadata or {}),
    }
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    # ZIP_STORED for the module: the serialized bytes are already compact
    # and a flat member keeps load time I/O-bound, not CPU-bound
    with zipfile.ZipFile(out_path, "w") as zf:
        zf.writestr(_ARTIFACT_MEMBER, blob, compress_type=zipfile.ZIP_STORED)
        zf.writestr(
            _METADATA_MEMBER,
            json.dumps(meta, indent=2),
            compress_type=zipfile.ZIP_DEFLATED,
        )
    return out_path


def load_stablehlo(path) -> Tuple[Callable, Dict[str, Any]]:
    """Load an exported artifact; returns ``(call, metadata)``.

    ``call(x)`` runs the baked-weights forward on the current default JAX
    backend. Raises ``ValueError`` on a malformed or future-versioned
    artifact instead of failing deep inside deserialization.
    """
    from jax import export as jexport

    path = Path(path)
    try:
        with zipfile.ZipFile(path, "r") as zf:
            names = set(zf.namelist())
            if _ARTIFACT_MEMBER not in names or _METADATA_MEMBER not in names:
                raise ValueError(
                    f"{path} is not a stablehlo export artifact "
                    f"(members: {sorted(names)})"
                )
            meta = json.loads(zf.read(_METADATA_MEMBER))
            blob = zf.read(_ARTIFACT_MEMBER)
    except zipfile.BadZipFile as e:
        raise ValueError(f"{path} is not a stablehlo export artifact: {e}") from e
    version = int(meta.get("format_version", 0))
    if version > _FORMAT_VERSION:
        raise ValueError(
            f"{path} was written by a newer exporter "
            f"(format_version {version} > supported {_FORMAT_VERSION})"
        )
    exported = jexport.deserialize(blob)
    return exported.call, meta
