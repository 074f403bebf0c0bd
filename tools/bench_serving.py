"""Serving-engine throughput bench (continuous batching) on the TPU chip.

Measures sustained generated-tokens/s and utterances/s for the Engine with
realistic TTS shapes: ~460-token cloning prompts, ~250 generated codec tokens
(5 s of audio), Air backbone. This is the apples-to-apples analogue of the
reference's vLLM RTX-4090 configuration (reference README.md:54, 64).

Usage: python tools/bench_serving.py [--slots 256] [--requests 768]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# reference README.md:64 — vLLM batched decode on an RTX 4090, per model
BASELINES = {"air": 16_194.0, "nano": 19_268.0, "tiny": 16_194.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="air")
    ap.add_argument("--slots", type=int, default=256)
    ap.add_argument("--requests", type=int, default=768)
    ap.add_argument("--prompt-min", type=int, default=380)
    ap.add_argument("--prompt-max", type=int, default=512)
    ap.add_argument("--gen", type=int, default=250)
    ap.add_argument("--segment", type=int, default=32)
    ap.add_argument("--kv-dtype", default="int8", choices=["bfloat16", "int8", "int4"])
    ap.add_argument("--weights", default="int8", choices=["int8", "bfloat16"])
    ap.add_argument("--sampling", default="speech", choices=["speech", "full"],
                    help="speech: constrained to speech tokens + EOS with the "
                    "pre-sliced speech head (TTS deployment mode). full: "
                    "unconstrained 217k-vocab head.")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-pipeline", action="store_true",
                    help="collect each segment before dispatching the next "
                    "(pays the host tick, avoids the post-done discard)")
    ap.add_argument("--json-out", default=None,
                    help="also write the JSON result line to this file "
                    "(driver-visible artifact, e.g. SERVING_r03.json)")
    args = ap.parse_args()

    import jax

    from neutts_tpu.utils import enable_compile_cache as _ecc; _ecc()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neutts_tpu import config
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.serving.engine import Engine

    cfg = config.BY_NAME[args.model].scaled(kv_dtype=args.kv_dtype,
                                            logits_dtype="bfloat16")
    layout = cfg.layout
    params = bb.init_params(cfg, jax.random.PRNGKey(0))
    if args.weights == "int8":
        params = bb.quantize_params(params)
    params = jax.device_put(params)

    # random model never emits EOS naturally at min_new large; bound by max_new
    sampling = config.SamplingConfig(min_new_tokens=args.gen + 1)
    if args.sampling == "speech":
        sampling = sampling.constrained_to(layout)
    eng = Engine(cfg, params, eos_id=layout.speech_gen_end,
                 n_slots=args.slots, sampling=sampling,
                 segment_steps=args.segment, seed=0)

    rng = np.random.default_rng(0)
    prompts = []
    for _ in range(args.requests):
        L = int(rng.integers(args.prompt_min, args.prompt_max + 1))
        prompts.append(
            (rng.integers(0, 1000, size=L) + layout.speech_base).tolist()
        )

    # warmup: compile every admission group size FOR EVERY PROMPT BUCKET the
    # workload touches, plus the decode segment — an unwarmed (group, bucket)
    # prefill variant compiling mid-run costs seconds and skews the measure
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
    for p in prompts[: min(args.slots, len(prompts))]:
        eng.submit(p, max_new=2)
    t0 = time.perf_counter()
    eng.run()
    print(f"# warmup (compiles): {time.perf_counter() - t0:.1f}s")

    eng.reset_stats()  # warmup's max_new=2 requests would skew the tax ratios
    for p in prompts:
        eng.submit(p, max_new=args.gen)
    t0 = time.perf_counter()
    results = eng.run(pipelined=not args.no_pipeline)
    dt = time.perf_counter() - t0

    n_tok = sum(len(t) for t in results.values())
    n_utt = len(results)
    audio_s = n_tok / 50.0
    print(
        f"# {n_utt} utterances, {n_tok} tokens in {dt:.2f}s -> "
        f"{n_tok/dt:,.0f} gen tok/s, {n_utt/dt:.1f} utt/s, "
        f"{audio_s/dt:,.0f}x realtime audio"
    )
    s = eng.stats
    disp = max(s["dispatched_token_slots"], 1)
    line = {
        "metric": "serving_gen_tokens_per_s_incl_prefill",
        "value": round(n_tok / dt, 1),
        "unit": "tok/s",
        "vs_baseline": round(n_tok / dt / BASELINES[args.model], 3),
        "sampling": args.sampling,
        "slots": args.slots,
        "requests": args.requests,
        "gen": args.gen,
        "segment": args.segment,
        "pipelined": not args.no_pipeline,
        "utterances_per_s": round(n_utt / dt, 2),
        "slot_utilization": round(s["useful_tokens"] / disp, 4),
        "post_done_frac": round(s["post_done_token_slots"] / disp, 4),
        "post_eos_frac": round(s["post_eos_token_slots"] / disp, 4),
        "empty_frac": round(s["empty_token_slots"] / disp, 4),
    }
    import json

    print(json.dumps(line))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(line, f, indent=1)


if __name__ == "__main__":
    main()
