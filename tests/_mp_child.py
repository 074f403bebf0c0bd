"""Child process for the 2-process jax.distributed test (test_distributed.py).

Each process owns 2 virtual CPU devices; the two processes form a dp=4 global
mesh over DCN (localhost). Every process computes the full-batch single-device
oracle locally, feeds only ITS rows through `host_local_batch`, runs the
sharded greedy generate, and asserts its addressable output shards equal the
oracle rows. Prints MP_CHILD_OK on success.
"""

import os
import sys

# force a clean 2-device CPU backend in this process (no TPU tunnel)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from neutts_tpu import config  # noqa: E402
from neutts_tpu.models import backbone as bb  # noqa: E402
from neutts_tpu.parallel import distributed as dist  # noqa: E402
from neutts_tpu.parallel import mesh as meshlib  # noqa: E402
from neutts_tpu.runtime import decode as dec  # noqa: E402


def main() -> None:
    coord, pid = sys.argv[1], int(sys.argv[2])
    dist.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    cfg = config.TINY
    eos = cfg.layout.speech_gen_end
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    params = bb.init_params(cfg, jax.random.PRNGKey(0), dtype=np.float32)

    prompts = [[3 + i, 7, 1 + i, 8] for i in range(4)]
    toks, lens = dec.pad_prompts(prompts, pad_id=0, bucket=16)
    toks, lens = np.asarray(toks), np.asarray(lens)

    # full-batch oracle on one local device (identical in both processes)
    ref = dec.generate(
        cfg, scfg, eos, 8, params, toks, lens, jax.random.PRNGKey(1)
    )
    want = [dec.extract(ref, i, eos) for i in range(4)]

    mesh = dist.global_mesh(tp=1)
    assert mesh.shape["data"] == 4
    params_sh = meshlib.shard_params(params, mesh, cfg)
    sl = dist.process_batch_slice(mesh, 4)
    assert sl == slice(pid * 2, pid * 2 + 2), sl
    toks_g = dist.host_local_batch(mesh, toks[sl])
    lens_g = dist.host_local_batch(mesh, lens[sl])
    assert toks_g.shape == (4, 16)

    out = dec.generate(
        cfg, scfg, eos, 8, params_sh, toks_g, lens_g, jax.random.PRNGKey(1)
    )
    # each process checks the rows it can address
    owned = {}
    for shard in out.tokens.addressable_shards:
        r = shard.index[0]
        rows = np.asarray(shard.data)
        for j in range(rows.shape[0]):
            owned.setdefault((r.start or 0) + j, {})["tokens"] = rows[j]
    for shard in out.lengths.addressable_shards:
        r = shard.index[0]
        lens_arr = np.asarray(shard.data)
        for j in range(lens_arr.shape[0]):
            owned.setdefault((r.start or 0) + j, {})["n"] = int(lens_arr[j])
    checked = 0
    for i, rec in sorted(owned.items()):
        got = [int(t) for t in rec["tokens"][: rec["n"]]]
        if got and got[-1] == eos:
            got = got[:-1]
        assert got == want[i], (i, got, want[i])
        checked += 1
    assert checked >= 2, checked  # this process owns 2 rows
    print(f"MP_CHILD_OK pid={pid} checked={checked}", flush=True)


if __name__ == "__main__":
    main()
