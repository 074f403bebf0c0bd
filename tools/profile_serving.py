"""Per-phase timing of the serving engine on real hardware.

Breaks one bench_serving-style run into: admission (grouped prefills),
decode-segment dispatch, readback/bookkeeping — the three host-visible
phases of Engine.step — to locate the gap between the pure decode loop
(bench.py) and serving throughput (tools/bench_serving.py).

Usage: python tools/profile_serving.py [--slots 512] [--requests 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="air")
    ap.add_argument("--slots", type=int, default=512)
    ap.add_argument("--requests", type=int, default=1024)
    ap.add_argument("--prompt-min", type=int, default=380)
    ap.add_argument("--prompt-max", type=int, default=512)
    ap.add_argument("--gen", type=int, default=250)
    ap.add_argument("--segment", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from neutts_tpu.utils import enable_compile_cache as _ecc; _ecc()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neutts_tpu import config
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.serving.engine import Engine

    cfg = config.BY_NAME[args.model].scaled(
        kv_dtype="int8", logits_dtype="bfloat16"
    )
    layout = cfg.layout
    params = jax.device_put(bb.quantize_params(
        bb.init_params(cfg, jax.random.PRNGKey(0))
    ))
    sampling = config.SamplingConfig(min_new_tokens=args.gen + 1)
    eng = Engine(cfg, params, eos_id=layout.speech_gen_end,
                 n_slots=args.slots, sampling=sampling,
                 segment_steps=args.segment, seed=0)

    rng = np.random.default_rng(0)
    prompts = [
        (rng.integers(0, 1000, size=int(rng.integers(
            args.prompt_min, args.prompt_max + 1))) + layout.speech_base).tolist()
        for _ in range(args.requests)
    ]
    # warmup compiles: every (admission group, prompt bucket) variant
    from neutts_tpu.runtime.decode import bucket_length

    buckets = sorted({min(bucket_length(len(p)), cfg.max_context) for p in prompts})
    warm = []
    for b in buckets:
        for g in eng.ADMIT_GROUPS:
            warm += [[layout.speech_base + 1] * (b - 1)] * g
    for chunk in range(0, len(warm), args.slots):
        for p in warm[chunk : chunk + args.slots]:
            eng.submit(p, max_new=2)
        eng.run()

    eng.reset_stats()  # warmup's max_new=2 requests would skew the tax ratios
    for p in prompts:
        eng.submit(p, max_new=args.gen)

    t_admit = t_dispatch = t_collect = 0.0
    n_ticks = n_prefills = 0
    prefill_calls = []
    orig_admit = eng._admit

    admit_times = []

    def timed_admit():
        nonlocal t_admit, n_prefills
        t0 = time.perf_counter()
        newly = orig_admit()
        # block on the prefill writes to attribute their device time here
        if newly:
            jax.block_until_ready(eng.state.token)
        dt = time.perf_counter() - t0
        t_admit += dt
        n_prefills += len(newly)
        if newly:
            prefill_calls.append(len(newly))
            admit_times.append(dt)
        return newly

    eng._admit = timed_admit

    t_total0 = time.perf_counter()
    while eng.pending():
        t0 = time.perf_counter()
        pending = eng.step_dispatch()
        jax.block_until_ready(eng.state.lens)
        t1 = time.perf_counter()
        if pending is not None:
            eng.step_collect(pending)
        t2 = time.perf_counter()
        t_dispatch += t1 - t0
        t_collect += t2 - t1
        n_ticks += 1
    total = time.perf_counter() - t_total0

    results = eng.pop_finished()
    n_tok = sum(len(r.tokens) for r in results)
    print(f"# ticks={n_ticks} prefilled={n_prefills} "
          f"admission_waves={len(prefill_calls)} "
          f"wave_sizes p50={np.median(prefill_calls):.0f}")
    print("# admit wave times (s): "
          + " ".join(f"{t:.2f}" for t in admit_times))
    print(f"# admit(prefill): {t_admit:.2f}s  "
          f"decode-dispatch+wait: {t_dispatch - t_admit:.2f}s  "
          f"collect/host: {t_collect:.2f}s  total: {total:.2f}s")
    print(f"# {n_tok} tokens -> {n_tok/total:,.0f} tok/s "
          f"(decode-only would be {n_tok/max(t_dispatch - t_admit, 1e-9):,.0f})")
    s = eng.stats
    disp = max(s["dispatched_token_slots"], 1)
    print(
        "# decode-slot utilization: "
        f"useful {s['useful_tokens']/disp:.1%}  "
        f"post-done (pipelined discard) {s['post_done_token_slots']/disp:.1%}  "
        f"post-eos {s['post_eos_token_slots']/disp:.1%}  "
        f"empty {s['empty_token_slots']/disp:.1%}  "
        f"of {disp} dispatched token-slots"
    )


if __name__ == "__main__":
    main()
