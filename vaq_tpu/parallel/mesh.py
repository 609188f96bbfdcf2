"""Device-mesh construction helpers.

Axis convention:
  * ``"db"`` — database rows (the scale axis of this workload: encoded code
    rows are sharded along it; the per-shard top-k merge collective rides it).
  * ``"q"``  — query batch (data parallel): optional second axis for
    multi-host serving where each host takes a slice of the query stream.

On a real pod, ``jax.distributed.initialize()`` must run first on each host;
the mesh then spans all global devices, with "q" mapped to the DCN-connected
host dimension and "db" to the ICI-connected intra-slice dimension so the
top-k merge collective stays on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("db",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    With no arguments, all devices go to a 1-D "db" mesh. Pass
    ``shape=(q, db)`` + ``axis_names=("q", "db")`` for 2-D query×database
    sharding.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    devs = np.asarray(devices)[: int(np.prod(shape))].reshape(shape)
    return Mesh(devs, axis_names=tuple(axis_names))
