"""Multi-host initialization + mesh construction.

New capability — the reference has no distributed layer at all (SURVEY.md
§2.5: no NCCL/MPI/Gloo anywhere).  The TPU design uses jax.distributed +
XLA's ICI/DCN collectives as the transport; this module is the only place
that touches process-level topology, so apps/trainers stay mesh-agnostic:

    init_distributed()                  # no-op on a single process
    mesh = data_parallel_mesh()         # ("cam",) over every chip everywhere
    # Trainer(..., mesh=mesh) pmeans grads over ICI within hosts and DCN
    # across hosts automatically (axis order puts chips-within-host minor).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process; else no-op.

    Reads the standard env (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID or TPU pod env) when args are None.  Returns True if a
    multi-process runtime was initialized.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator is None and num_processes is None:
        return False  # single-process (or TPU pod auto-detection handles it)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def data_parallel_mesh(axis: str = "cam") -> Mesh:
    """1D mesh over every chip of every host (camera/ray data parallel).

    jax.devices() orders devices host-major, so neighboring mesh positions
    within a host communicate over ICI and the grad pmean becomes a
    hierarchical ICI-then-DCN reduction, per BASELINE.json's plan.
    """
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_batch_slice(global_batch: int, axis_size: Optional[int] = None,
                      index: Optional[int] = None) -> slice:
    """The slice of a global camera batch owned by this process."""
    n = axis_size or jax.process_count()
    i = index if index is not None else jax.process_index()
    per = global_batch // n
    assert per * n == global_batch, (global_batch, n)
    return slice(i * per, (i + 1) * per)
