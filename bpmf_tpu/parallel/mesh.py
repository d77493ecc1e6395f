"""Mesh construction and multi-host initialization.

The reference's two-level hybrid (MPI across nodes x OpenMP within,
BPMF_HYBRID_COMM, c++/bpmf.h:26-28) maps to ONE SPMD program over all
chips of all hosts: `jax.distributed.initialize()` + a 1-D mesh over the
global device list.  The item axis is the only model axis BPMF has, so a
1-D mesh is the complete sharding story; XLA routes the per-half-sweep
collectives hierarchically (ICI within a pod slice, DCN across hosts)
without any code changes here.

Device order: `jax.devices()` orders TPUs so that ICI neighbors are
adjacent; keeping mesh order = device order makes the all_gather /
psum_scatter rings ride ICI first, which is what the reference's
node-level assignment tried to approximate with its connectivity maps.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

AXIS = "i"


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None,
                         platform: str | None = None) -> bool:
    """Join a multi-host run (no-op on a single host).  The analog of the
    reference's MPI_Init (c++/mpi_common.h:9-17) — call once per process
    before building the sampler (i.e. before the first jax backend use).

    ``platform`` forces the jax platform (e.g. ``"cpu"`` for the
    oversubscribed multi-process CI run — the analog of the reference's
    ``mpirun -np 4`` ctest on one machine, CMakeLists.txt:143,158).  The
    env var alone is not enough when a site customization pins another
    platform, so this goes through ``jax.config``.

    Returns True if a distributed runtime was initialized.
    """
    if platform:
        jax.config.update("jax_platforms", platform)
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    return False


def initialize_from_env() -> bool:
    """Multi-host init from the environment: ``BPMF_DIST`` is
    ``coordinator_host:port,num_processes,process_id`` (the mpirun-rank
    analog; set it per process by your launcher).  ``BPMF_PLATFORM``
    optionally forces the jax platform.  No-op when unset."""
    import os

    spec = os.environ.get("BPMF_DIST", "")
    platform = os.environ.get("BPMF_PLATFORM") or None
    if not spec:
        if platform:
            jax.config.update("jax_platforms", platform)
        return False
    try:
        coord, nproc, pid = spec.rsplit(",", 2)
        return initialize_multihost(coord, int(nproc), int(pid), platform)
    except ValueError as e:
        raise ValueError(
            f"BPMF_DIST must be 'host:port,num_processes,process_id', got {spec!r}"
        ) from e


def to_host(x, dtype=None) -> np.ndarray:
    """Fetch a (possibly globally-sharded) array to host memory.

    On a single host this is ``np.asarray``.  In a multi-process run a
    sharded ``jax.Array`` spans devices this process cannot address, so the
    missing shards are exchanged first (``process_allgather`` — the analog
    of the reference's bcast+gather of items before output,
    c++/bpmf.cpp:217-224).  Collective: every process must call it.
    """
    if isinstance(x, jax.Array) and not (
        x.is_fully_addressable or x.is_fully_replicated
    ):
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x, dtype) if dtype is not None else np.asarray(x)


def make_mesh(n_devices: int = 0) -> Mesh:
    """1-D mesh over the first n (default: all) global devices."""
    devs = jax.devices()
    n = n_devices if n_devices > 0 else len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (AXIS,))
