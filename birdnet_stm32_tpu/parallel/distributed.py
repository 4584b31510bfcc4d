"""Multi-host initialization and host-sharding helpers.

The reference has no distributed runtime (SURVEY.md section 2.3/5.8); the
TPU-native story is: `jax.distributed.initialize()` per host, GSPMD
collectives over ICI inside the jit'd step, and the input pipeline sharded
per host over DCN-free local reads (AudioLoader shard_index/num_shards).
"""

from __future__ import annotations

import os

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Resolution: explicit args > JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars > single-process (returns False). On TPU pods
    with default runtime metadata, `jax.distributed.initialize()` needs no
    arguments; call this before any other JAX API.

    Returns:
        True when a multi-process runtime was initialized.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = num_processes if num_processes is not None else _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if addr is None and n is None and pid is None:
        return False
    jax.distributed.initialize(coordinator_address=addr, num_processes=n,
                               process_id=pid)
    return True


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def host_shard() -> tuple[int, int]:
    """(shard_index, num_shards) for this host's input pipeline."""
    return jax.process_index(), jax.process_count()
