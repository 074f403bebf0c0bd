"""Multi-host helpers on the virtual mesh (single process => degenerate path,
global mesh shapes, host-local batch assembly)."""

import jax
import jax.numpy as jnp
import numpy as np

from neutts_tpu.parallel import distributed as dist
from neutts_tpu.parallel import mesh as meshlib


def test_global_mesh_shapes():
    m = dist.global_mesh(tp=1)
    assert m.shape["data"] == len(jax.devices())
    m2 = dist.global_mesh(tp=2)
    assert m2.shape["model"] == 2


def test_host_local_batch_single_process():
    m = dist.global_mesh(tp=1)
    rows = np.arange(16 * 3, dtype=np.int32).reshape(16, 3)
    arr = dist.host_local_batch(m, rows)
    assert arr.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(arr), rows)
    # sharded over the data axis
    assert arr.sharding.spec == jax.sharding.PartitionSpec(meshlib.DATA_AXIS)


def test_process_batch_slice():
    m = dist.global_mesh()
    s = dist.process_batch_slice(m, 32)
    assert s == slice(0, 32)  # single process owns everything


def test_initialize_noop_single_host():
    dist.initialize()  # must not raise
    assert jax.process_count() == 1
