"""Multi-host / multi-slice initialization.

The reference's multi-process story is torchrun + NCCL rendezvous
(`valley/train/train.sh:1`); the JAX equivalent is one process per host
with `jax.distributed.initialize` and a mesh whose outermost (``data``)
axis spans slices over DCN while ``fsdp``/``model`` stay inside a slice on
ICI (scaling-book layout).  On Cloud TPU the coordinator/host metadata is
auto-detected; explicit args are for GPU/CPU clusters.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from valley_tpu.parallel.mesh import AXES

logger = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (idempotent)."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
        logger.info("jax.distributed up: process %d/%d, %d local / %d "
                    "global devices", jax.process_index(),
                    jax.process_count(), jax.local_device_count(),
                    jax.device_count())
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def multislice_mesh(fsdp: Optional[int] = None, model: int = 1) -> Mesh:
    """Mesh for N slices: ``data`` = num_slices (DCN), ``fsdp`` x ``model``
    inside each slice (ICI).  Falls back to a single-slice mesh when slice
    metadata is unavailable (CPU, single slice)."""
    devices = jax.devices()
    slice_ids = sorted({getattr(d, "slice_index", 0) for d in devices})
    num_slices = len(slice_ids)
    per_slice = len(devices) // num_slices
    if fsdp is None:
        fsdp = per_slice // model
    if fsdp * model != per_slice:
        raise ValueError(
            f"fsdp({fsdp}) x model({model}) != devices per slice "
            f"({per_slice})")
    # order devices so the slice index is the slowest-varying axis => the
    # data-parallel gradient all-reduce is the only DCN collective
    ordered = sorted(devices, key=lambda d: (
        getattr(d, "slice_index", 0), d.id))
    arr = np.asarray(ordered).reshape(num_slices, fsdp, model)
    return Mesh(arr, AXES)
