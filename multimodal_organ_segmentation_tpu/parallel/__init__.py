"""Parallelism: device mesh + sharding rules (SURVEY.md §2.10).

The reference has only a dead ``distributed`` config stub; here data
parallelism (and an optional tensor/model axis) is first-class via
``jax.sharding.Mesh`` — XLA inserts the collectives (grad psum, eval
all-gathers) over ICI/DCN; there is no explicit comm backend.
"""

from multimodal_organ_segmentation_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_opt_state,
    zero1_constrainer,
    zero1_spec,
)
from multimodal_organ_segmentation_tpu.parallel.multihost import (  # noqa: F401
    maybe_initialize_distributed,
    multihost_env_detected,
    process_info,
    resolve_distributed_args,
)
