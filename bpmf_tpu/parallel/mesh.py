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
                         process_id: int | None = None) -> None:
    """Join a multi-host run (no-op on a single host).  The analog of the
    reference's MPI_Init (c++/mpi_common.h:9-17) — call once per process
    before building the sampler."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(n_devices: int = 0) -> Mesh:
    """1-D mesh over the first n (default: all) global devices."""
    devs = jax.devices()
    n = n_devices if n_devices > 0 else len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (AXIS,))
