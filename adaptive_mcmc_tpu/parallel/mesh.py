"""Device mesh management for chain-parallel sampling.

The reference has no distributed backend at all (SURVEY §2.9) — its only
parallelism is ``vmap`` inside one process.  Here the scale axis is a
``chains`` mesh dimension: chains are embarrassingly parallel, so sharding
the chain batch over devices costs zero per-step communication; collectives
(``psum``/``all_gather``) appear only at diagnostic boundaries (cross-chain
R-hat / ESS, pooled metric reductions) and ride ICI.

Multi-host: call :func:`initialize_distributed` once per process before
building the mesh (DCN bootstraps via ``jax.distributed.initialize``;
after that the same SPMD program spans the slice).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chains"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (no-op for a single process).  Controller-less:
    every host runs the same program; JAX wires the slice over DCN."""
    if num_processes is None:
        num_processes = int(os.environ.get("MCMC_NUM_PROCESSES", "1"))
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def chain_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first ``n_devices``) devices with a single
    ``chains`` axis — the natural layout for this workload (SURVEY §2.9)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (chains, ...) arrays: leading axis split over devices."""
    return NamedSharding(mesh, P(CHAIN_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
