"""Parallelism: device meshes, param/activation shardings, chunk batching.

The reference is single-process, single-device (SURVEY.md §2.5). The TPU
build's scaling story: VAD/diarization chunks become a padded batch axis
(data parallel), `jax.sharding.Mesh` + NamedSharding lay params out for
tensor parallelism when a model doesn't fit one chip, and XLA inserts the
ICI collectives.
"""

from .batching import ChunkWindow, plan_windows, iter_batches
from .mesh import (
    make_mesh,
    shard_params,
    param_sharding_spec,
    data_sharding,
    replicate,
)
