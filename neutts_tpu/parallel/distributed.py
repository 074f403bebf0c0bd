"""Multi-host data-parallel synthesis/training (DCN across hosts, ICI within).

The reference is strictly single-process (SURVEY.md §2c); this module adds
the pod-scale path from the north star: `jax.distributed` initialization, a
global mesh spanning all hosts, and per-host batch feeding that assembles
globally-sharded arrays from host-local shards
(`jax.make_array_from_process_local_data`).

Launch pattern (one process per host):

    import neutts_tpu.parallel.distributed as dist
    dist.initialize()                     # env-driven (TPU pods auto-config)
    mesh = dist.global_mesh(tp=1)         # dp = total chips / tp
    params = meshlib.shard_params(params, mesh, cfg)   # replicated weights
    batch = dist.host_local_batch(mesh, my_prompts)    # this host's shard
    out = generate(... batch ...)         # XLA runs the same program per host

On a single host this degrades to the local mesh — all helpers are no-ops.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from neutts_tpu.parallel import mesh as meshlib


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env/TPU auto-config when args omitted.

    Safe to call on a single host (no-op if already initialized or if no
    multi-process env is configured).
    """
    # NB: jax.process_count() would itself initialize the XLA backend and
    # break jax.distributed.initialize — probe the distributed client only
    if jax.distributed.is_initialized():
        return  # already initialized
    if coordinator_address:
        # explicit multi-process setup: failures must raise, not silently
        # degrade to a single-process run
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    try:
        jax.distributed.initialize()
    except Exception:
        # single-process run (no coordinator configured): local devices only
        pass


def global_mesh(tp: int = 1) -> Mesh:
    """Mesh over ALL processes' devices: dp = total_devices // tp.

    DP shards ride DCN across hosts; TP stays within a host's ICI domain
    (jax device order groups local devices, so adjacent mesh columns are
    host-local)."""
    devices = jax.devices()
    return meshlib.make_mesh(dp=len(devices) // tp, tp=tp, devices=devices)


def process_batch_slice(mesh: Mesh, global_batch: int) -> slice:
    """Rows of the global batch owned by this process (contiguous blocks)."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def host_local_batch(mesh: Mesh, local_rows: np.ndarray) -> jax.Array:
    """Assemble a globally-sharded array from this host's rows.

    `local_rows` is the slice of the global batch this process owns
    (see `process_batch_slice`); the result is one global jax.Array sharded
    over the mesh's data axis.
    """
    sharding = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    global_shape = (local_rows.shape[0] * jax.process_count(),) + local_rows.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_rows, global_shape)
