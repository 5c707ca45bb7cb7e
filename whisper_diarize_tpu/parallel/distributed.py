"""Multi-host initialization and mesh construction.

The reference has no distributed backend (SURVEY.md §2.5); here multi-host
scale-out is `jax.distributed` over DCN with per-host data feeding, ICI
within each slice. Single-host callers never need this module.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (idempotent).

    With no arguments, relies on the TPU environment auto-detection
    (GKE/Cloud TPU metadata); explicit args cover manual clusters.
    """
    global _initialized
    if _initialized:
        return
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        logger.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except Exception as e:
        if explicit:
            # the caller configured a cluster — a failure is a real error,
            # not a single-host fallback
            raise
        logger.info("jax.distributed not initialized (single host?): %s", e)


def global_mesh(n_model: int = 1):
    """("data", "model") mesh over ALL processes' devices; model groups are
    kept within a host/slice so TP collectives ride ICI, DCN only carries
    data-parallel traffic."""
    from .mesh import make_mesh

    return make_mesh(n_model=n_model, devices=jax.devices())


def local_batch_slice(global_batch: int) -> slice:
    """Row range of the global batch owned by this process."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
