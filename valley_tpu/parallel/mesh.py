"""Device mesh construction.

The reference's distribution is torchrun DDP + DeepSpeed ZeRO
(`valley/train/train.sh:1`, `valley/configs/deepspeed/*`); here the whole
topology is one `jax.sharding.Mesh` with three axes:

* ``data``  — pure data parallelism (multi-slice DCN axis goes here);
* ``fsdp``  — parameter/optimizer sharding (the ZeRO-2/3 equivalent:
  sharding the params over this axis makes XLA emit the same
  all-gather/reduce-scatter schedule DeepSpeed hand-codes);
* ``model`` — tensor parallelism (megatron-style head/ffn partitioning),
  needed for 13B on small slices.

Collectives ride ICI within a slice; the ``data`` axis is laid out
outermost so a multi-slice job puts only gradient all-reduce on DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "model")


def create_mesh(data: int = -1, fsdp: int = 1, model: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, fsdp, model) mesh; ``-1`` infers that axis from the
    device count."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = [data, fsdp, model]
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis may be -1")
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    want = int(np.prod(sizes))
    if want > n:
        raise ValueError(f"mesh {sizes} needs {want} devices, have {n}")
    # explicit sizes may use a subset of the devices (e.g. a 2-chip TP
    # serving mesh on an 8-chip host)
    arr = np.asarray(devices[:want]).reshape(sizes)
    return Mesh(arr, AXES)


def local_mesh(fsdp: Optional[int] = None, model: int = 1) -> Mesh:
    """Single-slice default: all devices on fsdp (ZeRO-style), optional TP."""
    n = len(jax.devices())
    if fsdp is None:
        fsdp = n // model
    return create_mesh(data=n // (fsdp * model), fsdp=fsdp, model=model)
