"""Benchmark: NeuTTS-Air decode throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N/16194}

Baseline: the reference's best published number — vLLM batched decode of Air
Q4 on an RTX 4090, 16,194 tok/s (reference README.md:64; BASELINE.md). Same
definition here: speech-LM decode throughput only, codec excluded
(reference README.md:70-71), measured in steady state over a KV cache
primed with a realistic prompt length.

Run on the default environment (TPU via the axon tunnel). Use --cpu for a
quick functional check on the host.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# reference README.md:64 — vLLM batched decode on an RTX 4090
BASELINES = {"air": 16_194.0, "nano": 19_268.0, "tiny": 16_194.0}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="run on CPU (functional check)")
    ap.add_argument("--model", default="air", choices=["air", "nano", "tiny"])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--kv-dtype", default="int8",
                    choices=["int8", "bfloat16", "int4", "auto"],
                    help="KV cache dtype. int8 (default): per-token-scaled, "
                    "the finest-quantization deployment mode. int4: 2x "
                    "int8's capacity and measured FASTER at every context "
                    "after the r5 retunes (+6-10%%; KV_AUTO_r05.json) at "
                    "coarser 15-level quantization. auto: resolve by "
                    "config.resolve_kv_dtype.")
    ap.add_argument("--logits-dtype", default="bfloat16", choices=["bfloat16", "float32"],
                    help="decode logits buffer dtype (bf16 halves logit HBM traffic; "
                    "top-k candidates are upcast to f32 before the gumbel draw)")
    ap.add_argument("--weights", default="int8", choices=["int8", "bfloat16"],
                    help="backbone weight precision (int8 W8A8 matches the "
                    "reference's quantized-GGUF deployment regime; its Q4 "
                    "baselines are quantized too)")
    ap.add_argument("--sampling", default="speech", choices=["speech", "full"],
                    help="speech: sampling constrained to speech tokens + EOS "
                    "with a pre-sliced 65.5k-column speech head (the TTS "
                    "deployment mode; the reference regex-DROPS non-speech "
                    "tokens, neutts.py:276, so constraining is behavior-"
                    "preserving). full: unconstrained 217k-vocab head.")
    ap.add_argument("--prompt-len", type=int, default=512, help="primed KV length")
    ap.add_argument("--steps", type=int, default=128, help="decode steps per segment")
    ap.add_argument("--segments", type=int, default=2, help="timed segments "
                    "(default 2x128 = 256 decoded tokens on a 512-token prompt "
                    "— the reference's llama-bench workload is 500 prefill + "
                    "250 generated, reference README.md:52)")
    args = ap.parse_args()

    import jax

    from neutts_tpu.utils import enable_compile_cache

    enable_compile_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    def hard_sync(x):
        # block_until_ready is not a reliable barrier over the axon TPU
        # tunnel; a host readback is.
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    from neutts_tpu import config
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.runtime import decode as dec

    cfg = config.BY_NAME[args.model].scaled(
        kv_dtype=args.kv_dtype, logits_dtype=args.logits_dtype
    )
    dev = jax.devices()[0]
    print(f"# device: {dev}, model: {cfg.name}, batch: {args.batch}", file=sys.stderr)

    params = bb.init_params(cfg, jax.random.PRNGKey(0))
    if args.weights == "int8":
        params = bb.quantize_params(params)
    # Sampled decode with reference settings (temp 1.0, top_k 50); EOS
    # suppressed throughout so every sequence runs the full segment.
    scfg = config.SamplingConfig(
        temperature=1.0, top_k=50, min_new_tokens=10**9, greedy=False
    )
    if args.sampling == "speech":
        scfg = scfg.constrained_to(cfg.layout)
        params = bb.add_speech_head(cfg, params)
    eos = cfg.layout.speech_gen_end

    B, Lp = args.batch, args.prompt_len
    rng = jax.random.PRNGKey(1)
    tokens = jax.random.randint(
        rng, (B, Lp), cfg.layout.speech_base, cfg.layout.speech_base + 1000, jnp.int32
    )
    lens = jnp.full((B,), Lp, jnp.int32)

    # drain the async setup work BEFORE the prefill timer — eager dispatch
    # otherwise bleeds its cost into the next sync. Sync the LAST-dispatched
    # program's output: the speech head when present, else the quantized head
    last = params.get("lm_head_speech", params.get("lm_head", params["embed"]))
    hard_sync(last["q"] if isinstance(last, dict) else last)
    t0 = time.time()
    state, _ = dec.prefill_init(cfg, scfg, eos, params, tokens, lens, jax.random.PRNGKey(2))
    hard_sync(state.token)
    print(f"# prefill+compile: {time.time()-t0:.1f}s", file=sys.stderr)

    # warmup segment (compiles decode_segment)
    t0 = time.time()
    state, out = dec.decode_segment(cfg, scfg, eos, args.steps, params, state)
    hard_sync(out)
    print(f"# decode compile+warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    n_tokens = 0
    t0 = time.time()
    for _ in range(args.segments):
        state, out = dec.decode_segment(cfg, scfg, eos, args.steps, params, state)
        n_tokens += args.batch * args.steps
    hard_sync(out)
    dt = time.time() - t0

    tok_s = n_tokens / dt
    per_step_ms = 1000.0 * dt / (args.segments * args.steps)
    print(
        f"# {n_tokens} tokens in {dt:.2f}s -> {tok_s:,.0f} tok/s "
        f"({per_step_ms:.2f} ms/step, {tok_s/50:.0f}x realtime streams)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"decode_tokens_per_s_per_chip_{args.model}",
                "value": round(tok_s, 1),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / BASELINES[args.model], 3),
                "sampling": args.sampling,
            }
        )
    )


if __name__ == "__main__":
    main()
