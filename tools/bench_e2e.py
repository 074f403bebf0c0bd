"""Full-service TTS throughput bench: LM serving + vocoder + watermark.

The decode and serving benches follow the reference's convention of
excluding the codec (reference README.md:70-71). This one measures the
WHOLE pipeline a deployment runs per utterance on one chip:

  continuous-batched speech-LM generation (Engine)
    -> NeuCodec vocoding (exact full-utterance decode, length-batched)
    -> watermark (host DSP)

Reports per-phase time plus combined audio-seconds/s and utterances/s.

Usage: python tools/bench_e2e.py [--slots 512] [--requests 1024]
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
    ap.add_argument("--vocoder-batch", type=int, default=32,
                    help="utterances per vocoder decode batch")
    ap.add_argument("--sampling", default="speech", choices=["speech", "full"],
                    help="speech (default): the TTS deployment mode — "
                    "sampling constrained to speech tokens + EOS through the "
                    "pre-sliced speech head, same default as "
                    "tools/bench_serving.py. full: unconstrained 217k-vocab "
                    "head (the pre-r5 behavior).")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from neutts_tpu.utils import enable_compile_cache as _ecc; _ecc()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from neutts_tpu import config
    from neutts_tpu.audio.watermark import get_watermarker
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.models import codec as cd
    from neutts_tpu.serving.engine import Engine

    cfg = config.BY_NAME[args.model].scaled(kv_dtype="int8",
                                            logits_dtype="bfloat16")
    layout = cfg.layout
    params = bb.quantize_params(bb.init_params(cfg, jax.random.PRNGKey(0)))
    params = jax.device_put(params)
    ccfg = config.CODEC
    # NOTE: no jax.device_put here — the codec param tree carries python-int
    # conv dilations that device_put would turn into traced arrays
    from _host_init import init_codec_params

    # CPU-subprocess init: eager codec init through the remote-compile
    # tunnel costs many minutes (see tools/_host_init.py)
    cparams = jax.device_put(init_codec_params(ccfg, seed=1))
    wm = get_watermarker()

    sampling = config.SamplingConfig(min_new_tokens=args.gen + 1)
    if args.sampling == "speech":
        sampling = sampling.constrained_to(layout)
    eng = Engine(cfg, params, eos_id=layout.speech_gen_end,
                 n_slots=args.slots, sampling=sampling,
                 segment_steps=args.segment, seed=0)

    import functools

    _dec = jax.jit(functools.partial(cd.decode, ccfg))

    def decode_fn(codes):
        # params as a runtime arg: a closure would bake 1.3 GB of weights
        # into the HLO (overflows the remote-compile request limit)
        return _dec(cparams, codes)

    rng = np.random.default_rng(0)
    prompts = []
    for _ in range(args.requests):
        L = int(rng.integers(args.prompt_min, args.prompt_max + 1))
        prompts.append(
            (rng.integers(0, 1000, size=L) + layout.speech_base).tolist())

    # ---- warmup (compiles): engine admission groups + decode + vocoder ----
    n_warm = min(sum(eng.ADMIT_GROUPS), args.slots, len(prompts))
    for p in prompts[:n_warm]:
        eng.submit(p, max_new=2)
    t0 = time.perf_counter()
    eng.run()
    print(f"# warmup (compiles): {time.perf_counter() - t0:.1f}s")

    # ---- phase 1: LM generation -------------------------------------------
    for p in prompts:
        eng.submit(p, max_new=args.gen)
    t0 = time.perf_counter()
    results = eng.run()
    t_lm = time.perf_counter() - t0
    # free the 512-slot KV cache before vocoding: full-utterance decode
    # intermediates (~[VB, 120k, C] conv activations) don't fit HBM next to
    # an idle 7.8 GB cache. A deployment either sizes slots with vocoder
    # headroom or runs the phases on disjoint chips.
    del eng
    wv = decode_fn(jnp.zeros((args.vocoder_batch, args.gen), jnp.int32))
    np.asarray(wv[0, :1])  # vocoder warm-up compile (post-cache-free)

    # token id -> codec code (direct integer flow; the reference regex-parses
    # "<|speech_N|>" strings here, reference neutts/neutts.py:276). The
    # RANDOM-weight model emits tokens across the whole vocab; map every
    # token into code space so the vocoder phase sees the full production
    # workload (a real checkpoint emits ~100% speech tokens).
    all_codes = []
    for rid in sorted(results):
        toks = np.asarray(results[rid], np.int32)
        all_codes.append(np.abs(toks) % layout.codebook_size)

    # ---- phase 2: vocode (EXACT full-utterance decode, batched) ------------
    # Batch synthesis vocodes each utterance's full code sequence in one
    # pass, exactly like NeuTTS.infer — the streaming window geometry (25-
    # frame chunks with 50+5 frames of context each) exists for LATENCY, and
    # re-decodes ~3.2x the frames. Utterances are grouped by EXACT length so
    # batching introduces no padding (a convolutional decoder's tail would
    # see pad codes inside its receptive field).
    t0 = time.perf_counter()
    by_len: dict = {}
    for u, arr in enumerate(all_codes):
        by_len.setdefault(len(arr), []).append(u)
    VB = args.vocoder_batch
    dev_wavs = []  # (utt indices, device array)
    for n, utts in sorted(by_len.items()):
        for i in range(0, len(utts), VB):
            group = utts[i:i + VB]
            codes = np.stack([all_codes[u] for u in group])
            w = decode_fn(jnp.asarray(codes))
            np.asarray(w[0, :1])  # 4-byte sync: completion w/o bulk readback
            dev_wavs.append((group, w))
    t_voc = time.perf_counter() - t0

    # bulk device->host copy, reported separately: through the axon tunnel
    # this runs at a few MB/s and would misattribute environment transfer
    # cost to the vocoder (real PCIe D2H is >10 GB/s)
    t0 = time.perf_counter()
    host_wavs = [(g, np.asarray(w)) for g, w in dev_wavs]
    t_d2h = time.perf_counter() - t0

    # ---- phase 3: watermark -------------------------------------------------
    t0 = time.perf_counter()
    total_samples = 0
    for group, wavs in host_wavs:
        for j, u in enumerate(group):
            wav = wm.apply_watermark(wavs[j], ccfg.sample_rate_out)
            total_samples += wav.size
    t_post = time.perf_counter() - t0

    dt = t_lm + t_voc + t_post
    audio_s = total_samples / ccfg.sample_rate_out
    n_tok = sum(len(c) for c in all_codes)
    print(f"# phases: LM {t_lm:.2f}s, vocoder {t_voc:.2f}s, "
          f"watermark {t_post:.2f}s "
          f"(+ {t_d2h:.2f}s tunnel-limited device->host copy, excluded)")
    print(f"# {len(all_codes)} utterances, {n_tok} codec tokens, "
          f"{audio_s:,.0f}s of 24 kHz audio in {dt:.2f}s")
    print(f"# end-to-end: {audio_s/dt:,.0f}x realtime, "
          f"{len(all_codes)/dt:.1f} utt/s, {n_tok/dt:,.0f} tok/s incl codec")


if __name__ == "__main__":
    main()
