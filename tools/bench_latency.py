"""Streaming-latency bench: time-to-first-audio and chunk cadence on TPU.

The throughput benches (bench.py, tools/bench_serving.py) measure the
batched serving regime; this one measures the single-utterance interactive
regime the reference targets on-device: how long until the first audio
chunk, and whether the steady chunk cadence beats realtime.

Pipeline timed end-to-end through `NeuTTS.infer_stream` (prefill ->
25-frame decode segments -> windowed vocode -> watermark -> overlap-add),
reference chunk geometry (reference neutts/neutts.py:86-91).

Note: timings include the axon-tunnel dispatch latency (~15-30 ms per
device call in this environment); on-host serving would sit below these
numbers.

Usage: python tools/bench_latency.py [--model air] [--chunks 12]
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
    ap.add_argument("--chunks", type=int, default=12, help="chunks to time")
    ap.add_argument("--ref-codes", type=int, default=372, help="cloning prompt codes (dave.pt length)")
    ap.add_argument("--kv-dtype", default="int8", choices=["bfloat16", "int8", "int4"])
    ap.add_argument("--weights", default="int8", choices=["int8", "bfloat16"])
    ap.add_argument("--first-chunk", type=int, default=None,
                    help="frames in the FIRST chunk (TTFA knob, "
                    "config.StreamingConfig.first_chunk_frames; e.g. 10 "
                    "cuts time-to-first-audio ~2.3x vs the reference's 25)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from neutts_tpu.utils import enable_compile_cache as _ecc; _ecc()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neutts_tpu import config
    from neutts_tpu.pipeline import NeuTTS

    cfg = config.BY_NAME[args.model].scaled(kv_dtype=args.kv_dtype)
    codec_cfg = config.CODEC_TINY if args.cpu else config.CODEC
    import dataclasses

    streaming = config.STREAMING
    if args.first_chunk is not None:
        streaming = dataclasses.replace(
            streaming, first_chunk_frames=args.first_chunk)
    # codec init happens in a CPU subprocess: eager init of ~200 small
    # tensors through the remote-compile tunnel costs many minutes
    from _host_init import init_codec_params
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.models import codec as cd  # noqa: F401

    bparams = bb.init_params(cfg, jax.random.PRNGKey(0))
    cparams = jax.device_put(init_codec_params(codec_cfg, seed=0))
    tts = NeuTTS(
        cfg, bparams, codec_cfg, cparams,
        quantize="int8" if args.weights == "int8" else None,
        streaming=streaming,
    )
    tts.vocoder_mode = "chunked"  # streaming: one compile for every window
    # random model never emits EOS: bound the run by draining N chunks only
    rng = np.random.default_rng(0)
    codes = rng.integers(0, cfg.layout.codebook_size, size=args.ref_codes).astype(np.int32)
    text = "The quick brown fox jumps over the lazy dog near the river bank."
    ref_text = "And this is roughly three seconds of reference speech to clone."

    def run(n_chunks):
        t0 = time.perf_counter()
        arrivals, sizes = [], []
        for chunk in tts.infer_stream(text, codes, ref_text):
            arrivals.append(time.perf_counter() - t0)
            sizes.append(len(chunk))
            if len(arrivals) >= n_chunks:
                break
        return arrivals, sizes

    run(2)  # warmup: compiles prefill + segment + vocode windows
    arrivals, sizes = run(args.chunks)

    sr = tts.sample_rate
    audio_t = np.cumsum(np.asarray(sizes)) / sr
    print(f"# model={cfg.name} weights={args.weights} kv={args.kv_dtype} "
          f"prompt~{args.ref_codes + 60} tokens")
    print(f"# time-to-first-audio: {arrivals[0]*1000:.0f} ms "
          f"({sizes[0]/sr*1000:.0f} ms of audio in the first chunk)")
    if len(arrivals) >= 3:
        gaps = np.diff(arrivals)
        chunk_audio = np.asarray(sizes[1:]) / sr
        rtf = chunk_audio / gaps  # >1 means faster than realtime
        print(f"# steady chunk cadence: {np.median(gaps)*1000:.0f} ms per "
              f"{np.median(chunk_audio)*1000:.0f} ms chunk -> "
              f"{np.median(rtf):.1f}x realtime single-stream")
    print(f"# cumulative: {audio_t[-1]:.2f}s of audio in {arrivals[-1]:.2f}s wall")


if __name__ == "__main__":
    main()
