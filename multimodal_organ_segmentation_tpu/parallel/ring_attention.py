"""Ring attention: sequence-parallel attention over the voxel-token axis.

The sequence-parallel analog for 3D medical volumes (SURVEY.md §2.10):
for 128³+ token grids whose K/V don't fit one chip's HBM, shard the token
axis over a mesh axis and rotate K/V blocks around the ring with
``jax.lax.ppermute`` while each device accumulates its queries' attention
with the flash (running max / denominator) recurrence.

Per ring step, each device attends its local Q block against the visiting
K/V block, then passes the block to its neighbor — after ``axis_size``
steps every Q has seen every K/V. Communication rides ICI; compute and
comm overlap under XLA's scheduler.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax ≥ 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _ring_attention_local(q, k, v, axis_name: str, scale: float):
    """Per-shard body: q, k, v are the local [B, n_local, H, D] blocks."""
    axis_size = jax.lax.psum(1, axis_name)

    qf = q.astype(jnp.float32) * scale

    def step(carry, _):
        k_blk, v_blk, m_run, l_run, acc = carry
        s = jnp.einsum("bnhd,bmhd->bhnm", qf, k_blk.astype(jnp.float32))
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m_run - m_new)
        l_new = l_run * corr + jnp.sum(p, axis=-1)
        acc = acc * corr.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bhnm,bmhd->bnhd", p, v_blk.astype(jnp.float32)
        )
        # rotate K/V to the next device on the ring
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_next, v_next, m_new, l_new, acc), None

    b, n, h, d = q.shape
    # derive carry inits from q so they carry the same varying-axis type
    # as the loop outputs (shard_map tracks manual-axis variance)
    bhn = jnp.swapaxes(qf[..., 0], 1, 2)  # [b, h, n]
    init = (
        k,
        v,
        bhn * 0.0 - 1e30,
        bhn * 0.0,
        qf * 0.0,
    )
    (k, v, m_run, l_run, acc), _ = jax.lax.scan(
        step, init, None, length=axis_size
    )
    out = acc / l_run.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
    scale: Optional[float] = None,
) -> jax.Array:
    """Sequence-parallel attention: tokens sharded over ``axis_name``.

    Args:
        q, k, v: ``[B, N, H, D]`` with N divisible by the mesh axis size.
        mesh: the device mesh.
        axis_name: mesh axis carrying the token shards.

    Returns:
        ``[B, N, H, D]``, sharded like the inputs.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5

    spec = P(None, axis_name, None, None)
    fn = shard_map(
        functools.partial(_ring_attention_local, axis_name=axis_name, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    # under jit, device_put is not allowed on tracers — use a sharding
    # constraint instead (no-op when the data is already laid out right)
    if isinstance(q, jax.core.Tracer):
        sh = NamedSharding(mesh, spec)
        q = jax.lax.with_sharding_constraint(q, sh)
        k = jax.lax.with_sharding_constraint(k, sh)
        v = jax.lax.with_sharding_constraint(v, sh)
    else:
        sh = NamedSharding(mesh, spec)
        q, k, v = (jax.device_put(x, sh) for x in (q, k, v))
    return fn(q, k, v)
