"""Multi-host (multi-process) runtime over DCN + ICI.

TPU-native replacement for the reference's SSHCluster deployment
(gtsfm/runner/gtsfm_runner_base.py:244-273, CLUSTER.md): instead of a Dask
scheduler + SSH-spawned workers exchanging objects over TCP, every host runs
the SAME program (multi-controller SPMD), `jax.distributed.initialize` wires
the processes together, and a global `Mesh` spans all hosts' devices. XLA
collectives then ride ICI within a slice and DCN across slices — no
application-level message passing at all.

Launch procedure (the CLUSTER.md analog — see also repo-root CLUSTER.md):

  * TPU pod slice: every host runs the identical command; JAX auto-detects
    the coordinator from the TPU metadata — `initialize()` with no args.
  * CPU/GPU clusters (and the 2-process localhost test): pass
    coordinator_address="host0:port", num_processes=N, process_id=rank
    (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

Data model: host-side pipeline state (the SceneData pytree, pair lists,
feature tables) is computed IDENTICALLY on every host (same inputs, same
seeds — the pipeline is deterministic), so no broadcast is needed; only
device arrays are made global. `shard_inputs` turns host-full arrays into
global jax.Arrays (each process donates its row-slice of sharded axes);
`gather_outputs` returns full host-local numpy from global outputs.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

logger = logging.getLogger("gtsfm_tpu")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-controller runtime (idempotent).

    On TPU pods all three args are auto-detected (call with none). Otherwise
    falls back to JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars. The runner exposes these as
    --coordinator_address / --num_processes / --process_id.
    """
    # NOTE: must run before anything touches the XLA backend (jax.devices()
    # etc.) — do NOT query process_count() here, that would initialize it.
    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    logger.info(
        "multihost: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over ALL devices of ALL processes (process-major order, so a
    contiguous row-block of any sharded axis lives on one host — sharded-axis
    collectives ride ICI within the host/slice before touching DCN)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def _leading_sharded(spec, axis_name: str) -> bool:
    return len(spec) > 0 and spec[0] == axis_name


def shard_inputs(mesh: Mesh, specs, values):
    """Host-full arrays -> global jax.Arrays laid out per `specs`.

    Single-process: identity (shard_map handles placement). Multi-process:
    every host holds the FULL array (identical pipeline state); for
    axis-sharded specs each process donates its contiguous row-slice, for
    replicated specs its full copy. specs/values are matching pytrees of
    PartitionSpec / arrays.
    """
    if not is_multiprocess():
        return values
    from jax.experimental import multihost_utils

    axis = mesh.axis_names[0]
    pid, npc = jax.process_index(), jax.process_count()

    def to_local(spec, v):
        v = np.asarray(v)
        if _leading_sharded(spec, axis):
            if v.shape[0] % npc != 0:
                raise ValueError(
                    f"sharded axis {v.shape[0]} not divisible by {npc} processes"
                )
            chunk = v.shape[0] // npc
            return v[pid * chunk : (pid + 1) * chunk]
        return v

    is_spec = lambda x: isinstance(x, P)
    local = jax.tree_util.tree_map(to_local, specs, values, is_leaf=None)
    return multihost_utils.host_local_array_to_global_array(local, mesh, specs)


def gather_outputs(mesh: Mesh, specs, outputs):
    """Global outputs -> full host-local numpy on EVERY host (replicated
    leaves are read locally; axis-sharded leaves are process-allgathered)."""
    if not is_multiprocess():
        return outputs
    from jax.experimental import multihost_utils

    axis = mesh.axis_names[0]

    def back(spec, o):
        if _leading_sharded(spec, axis):
            return multihost_utils.process_allgather(o, tiled=True)
        return np.asarray(
            multihost_utils.global_array_to_host_local_array(o, mesh, P())
        )

    return jax.tree_util.tree_map(back, specs, outputs)
