"""Full-service TTS throughput bench: LM serving + vocoder + watermark.

The decode and serving benches follow the reference's convention of
excluding the codec (reference README.md:70-71). This one measures the
WHOLE pipeline a deployment runs per utterance on one chip:

  continuous-batched speech-LM generation (Engine)
    -> NeuCodec vocoding (streaming windows batched across utterances)
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
    ap.add_argument("--vocoder-batch", type=int, default=128,
                    help="codec windows per decode batch")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/neutts_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from neutts_tpu import config
    from neutts_tpu.audio.overlap_add import linear_overlap_add
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
    cparams = cd.init_params(ccfg, jax.random.PRNGKey(1))
    s = config.STREAMING
    window = (s.lookback + s.overlap_frames + s.frames_per_chunk
              + s.lookforward + s.overlap_frames)
    chunk = s.frames_per_chunk
    lb = s.lookback + s.overlap_frames
    emit = chunk + 2 * s.overlap_frames
    hop = ccfg.hop_out
    wm = get_watermarker()

    sampling = config.SamplingConfig(min_new_tokens=args.gen + 1)
    eng = Engine(cfg, params, eos_id=layout.speech_gen_end,
                 n_slots=args.slots, sampling=sampling,
                 segment_steps=args.segment, seed=0)

    import functools

    decode_fn = jax.jit(functools.partial(cd.decode, ccfg, cparams))

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
    wv = decode_fn(jnp.zeros((args.vocoder_batch, window), jnp.int32))
    np.asarray(wv[0, :1])
    print(f"# warmup (compiles): {time.perf_counter() - t0:.1f}s")

    # ---- phase 1: LM generation -------------------------------------------
    for p in prompts:
        eng.submit(p, max_new=args.gen)
    t0 = time.perf_counter()
    results = eng.run()
    t_lm = time.perf_counter() - t0

    # token id -> codec code (direct integer flow; the reference regex-parses
    # "<|speech_N|>" strings here, reference neutts/neutts.py:276). The
    # RANDOM-weight model emits tokens across the whole vocab; map every
    # token into code space so the vocoder phase sees the full production
    # workload (a real checkpoint emits ~100% speech tokens).
    all_codes = []
    for rid in sorted(results):
        toks = np.asarray(results[rid], np.int32)
        all_codes.append(np.abs(toks) % layout.codebook_size)

    # ---- phase 2: vocode (windows batched ACROSS utterances) ---------------
    t0 = time.perf_counter()
    metas = []  # (utt_idx, n_codes, n_windows)
    windows = []
    for u, arr in enumerate(all_codes):
        n = len(arr)
        n_chunks = max(1, -(-n // chunk))
        padded = np.concatenate([
            np.zeros(lb, np.int32), arr,
            np.full(n_chunks * chunk - n + s.lookforward + s.overlap_frames,
                    arr[-1] if n else 0, np.int32),
        ])
        for i in range(n_chunks):
            windows.append(padded[i * chunk: i * chunk + window])
        metas.append((u, n, n_chunks))
    W = np.stack(windows)
    VB = args.vocoder_batch
    pad_w = (-len(W)) % VB
    if pad_w:
        W = np.concatenate([W, np.zeros((pad_w, window), np.int32)])
    dev_wavs = []
    for i in range(0, len(W), VB):
        w = decode_fn(jnp.asarray(W[i:i + VB]))
        np.asarray(w[0, :1])  # 4-byte sync: completion without bulk readback
        dev_wavs.append(w)
    t_voc = time.perf_counter() - t0

    # bulk device->host copy, reported separately: through the axon tunnel
    # this runs at a few MB/s and would misattribute environment transfer
    # cost to the vocoder (real PCIe D2H is >10 GB/s)
    t0 = time.perf_counter()
    wavs = np.concatenate([np.asarray(w) for w in dev_wavs])[: len(windows)]
    t_d2h = time.perf_counter() - t0

    # ---- phase 3: overlap-add + watermark ----------------------------------
    t0 = time.perf_counter()
    total_samples = 0
    wpos = 0
    a = lb * hop
    for (u, n, n_chunks) in metas:
        frames = [wavs[wpos + i][a: a + emit * hop] for i in range(n_chunks)]
        wpos += n_chunks
        wav = linear_overlap_add(frames, stride=s.stride_samples)[: n * hop]
        wav = wm.apply_watermark(wav, ccfg.sample_rate_out)
        total_samples += wav.size
    t_post = time.perf_counter() - t0

    dt = t_lm + t_voc + t_post
    audio_s = total_samples / ccfg.sample_rate_out
    n_tok = sum(len(c) for c in all_codes)
    print(f"# phases: LM {t_lm:.2f}s, vocoder {t_voc:.2f}s, "
          f"overlap-add+watermark {t_post:.2f}s "
          f"(+ {t_d2h:.2f}s tunnel-limited device->host copy, excluded)")
    print(f"# {len(all_codes)} utterances, {n_tok} codec tokens, "
          f"{audio_s:,.0f}s of 24 kHz audio in {dt:.2f}s")
    print(f"# end-to-end: {audio_s/dt:,.0f}x realtime, "
          f"{len(all_codes)/dt:.1f} utt/s, {n_tok/dt:,.0f} tok/s incl codec")


if __name__ == "__main__":
    main()
