"""Child process for the 2-process SERVING test (r4 VERDICT #8).

The multi-host serving story (serving/multichip.py: replica-per-chip, DCN
carries only requests/results): each of two jax.distributed processes owns
2 virtual CPU devices and drives a MultiChipEngine over its LOCAL devices;
a deterministic front-end routes request j to process j % 2; finished
token streams are exchanged over DCN via process_allgather, and BOTH
processes assert the merged global results equal the single-device
lockstep oracle per request. Prints MP_SERVING_OK on success.
"""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from neutts_tpu import config  # noqa: E402
from neutts_tpu.models import backbone as bb  # noqa: E402
from neutts_tpu.parallel import distributed as dist  # noqa: E402
from neutts_tpu.runtime import decode as dec  # noqa: E402
from neutts_tpu.serving.multichip import MultiChipEngine  # noqa: E402

MAX_NEW = 12


def main() -> None:
    coord, pid = sys.argv[1], int(sys.argv[2])
    dist.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 2

    cfg = config.TINY
    eos = cfg.layout.speech_gen_end
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    params = bb.init_params(cfg, jax.random.PRNGKey(0), dtype=np.float32)

    # deterministic global workload, identical in both processes
    prompts = [[3 + i, 7, 2 + (i % 5), 9] for i in range(10)]

    # single-device lockstep oracle (local, identical across processes)
    want = []
    for p in prompts:
        toks, lens = dec.pad_prompts([p], pad_id=0, bucket=16)
        res = dec.generate(cfg, scfg, eos, MAX_NEW, params, toks, lens,
                           jax.random.PRNGKey(7))
        want.append(dec.extract(res, 0, eos))

    # replica-per-LOCAL-device serving engine; front-end routes j -> j % 2
    eng = MultiChipEngine(
        cfg, params, eos_id=eos, n_slots=2,
        devices=jax.local_devices(), sampling=scfg, segment_steps=8,
    )
    assert eng.n_replicas == 2
    mine = {}
    for j, p in enumerate(prompts):
        if j % 2 == pid:
            mine[j] = eng.submit(p, max_new=MAX_NEW)
    results = eng.run()

    # DCN result gather: pad my rows into the global [N, MAX_NEW] buffer
    # (-1 fill), allgather, merge by ownership
    buf = np.full((len(prompts), MAX_NEW), -1, np.int32)
    for j, rid in mine.items():
        toks = results[rid]
        buf[j, : len(toks)] = toks
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    assert gathered.shape == (2, len(prompts), MAX_NEW)
    merged = [gathered[j % 2, j] for j in range(len(prompts))]

    for j, (row, w) in enumerate(zip(merged, want)):
        got = [int(t) for t in row if t >= 0]
        assert got == w, (j, got, w)

    print("MP_SERVING_OK")


if __name__ == "__main__":
    main()
