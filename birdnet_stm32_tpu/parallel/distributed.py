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
    JAX_PROCESS_ID env vars > TPU-pod auto-detect (no-arg
    `jax.distributed.initialize()` when pod runtime metadata is present) >
    single-process (returns False). Call this before any other JAX API.

    Without the auto-detect, launching on a real pod with default metadata
    would leave every host at process_count()==1 — each training on the
    FULL dataset and racing writes to the same run_dir.

    Returns:
        True when a multi-process runtime was initialized.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = num_processes if num_processes is not None else _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if addr is None and n is None and pid is None:
        # TPU pods export per-worker metadata the no-arg initializer reads.
        # (TPU_WORKER_HOSTNAMES is NOT a reliable marker: tunneled
        # single-chip runtimes set it too.) Fail-soft: on anything that
        # isn't actually a pod the initializer raises immediately and the
        # run proceeds single-process.
        pod_markers = ("TPU_PROCESS_BOUNDS", "CLOUD_TPU_TASK_ID",
                       "MEGASCALE_COORDINATOR_ADDRESS")
        if not any(os.environ.get(m) for m in pod_markers):
            return False
        try:
            jax.distributed.initialize()
        except Exception:
            return False
        return jax.process_count() > 1
    jax.distributed.initialize(coordinator_address=addr, num_processes=n,
                               process_id=pid)
    return True


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def host_shard() -> tuple[int, int]:
    """(shard_index, num_shards) for this host's input pipeline."""
    return jax.process_index(), jax.process_count()


def globalize_batch(batch, mesh):
    """Assemble per-host local batches into logical global arrays.

    Single-process: identity — jit consumes the host's numpy/jax arrays
    directly. Multi-process: each host holds a DISJOINT slice of the
    logical batch (AudioLoader shard_index/num_shards), and feeding
    different per-host arrays into a jit whose in_shardings span the
    global mesh violates JAX's single-controller contract (each process
    would contribute only its own rows and half the decode work would be
    silently dropped). jax.make_array_from_process_local_data stitches
    the local slices into one global batch-sharded array per leaf.

    Args:
        batch: pytree of [B_local, ...] arrays (numpy or device).
        mesh: The global mesh whose batch axis the arrays shard over.

    Returns:
        The pytree with each leaf a global jax.Array (or unchanged when
        single-process).
    """
    if jax.process_count() == 1:
        return batch
    import numpy as np

    from birdnet_stm32_tpu.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
        batch,
    )
