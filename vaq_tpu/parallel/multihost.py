"""Multi-host initialization + pod-mesh helpers.

On a TPU pod slice, each host runs the same program;
``jax.distributed.initialize()`` wires the hosts together and
``jax.devices()`` then spans the global slice. The search programs in
`vaq_tpu.parallel.sharded` are already global-SPMD (shard_map over named
axes), so multi-host is a mesh-construction concern only:

* ``"db"`` (database rows) should map to the ICI-connected intra-slice
  device dimension — the k-row top-k merge all_gather rides ICI;
* ``"q"`` (query data parallelism) maps to the host dimension — query
  ingest/result egress is per-host, and no hot-path collective crosses DCN.

Single-chip sessions (like this dev environment) exercise the identical
code via ``xla_force_host_platform_device_count`` virtual meshes
(tests/conftest.py) and the driver's ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op when single-process).

    On Cloud TPU the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
    except (RuntimeError, ValueError):
        # single-process run (dev box / tests): nothing to do
        pass


def pod_mesh(q_hosts: bool = True) -> Tuple[Mesh, Optional[str]]:
    """Build the serving mesh for the current topology.

    With q_hosts=True on a multi-host slice: ("q", "db") with q = host
    count, db = devices per host (ICI). Otherwise a flat ("db",) mesh over
    all global devices.
    Returns (mesh, q_axis) suitable for ``VAQIndex.shard``.
    """
    devs = jax.devices()
    nproc = jax.process_count()
    if q_hosts and nproc > 1 and len(devs) % nproc == 0:
        arr = np.asarray(devs).reshape(nproc, len(devs) // nproc)
        return Mesh(arr, ("q", "db")), "q"
    return Mesh(np.asarray(devs), ("db",)), None
