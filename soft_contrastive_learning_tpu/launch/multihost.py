"""Multi-host TPU bootstrap.

New capability (the reference is strictly single-device, SURVEY.md §2): start
N identical processes — one per TPU host — each calling
``initialize_multihost``; jax.distributed wires the DCN control plane and
every process sees the full pod as ``jax.devices()``. The launcher preserves
the array-job contract: process_id comes from the scheduler's task id
(``--task_id`` flag, $SGE_TASK_ID / $SLURM_ARRAY_TASK_ID) or from the TPU
metadata environment when running on Cloud TPU VMs.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed (no-op for single-process runs) and return
    topology facts. Arguments default to the standard env vars so Cloud TPU
    pods need no explicit flags."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator_address and (num_processes or 0) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def is_primary() -> bool:
    """True on the process that should write checkpoints/metrics."""
    return jax.process_index() == 0
