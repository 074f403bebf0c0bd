"""Streaming synthesis CLI (parity with reference
examples/basic_streaming_example.py:1-80 — which is GGUF-only; the TPU
framework streams from every backend).

Chunks are written to the output file incrementally; with --play and a
working pyaudio install they are played live instead.
"""

import argparse
import time

import numpy as np

from _common import build_tts, load_ref_codes, read_text_arg


def main():
    ap = argparse.ArgumentParser(description="NeuTTS-TPU streaming synthesis")
    ap.add_argument("--input_text", required=True)
    ap.add_argument("--ref_audio", default=None)
    ap.add_argument("--ref_codes", default=None)
    ap.add_argument("--ref_text", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--output_path", default="output_streaming.wav")
    ap.add_argument("--play", action="store_true", help="play via pyaudio")
    ap.add_argument(
        "--first_chunk_frames", type=int, default=None,
        help="frames in the FIRST emitted chunk (low-latency knob: e.g. 10 "
        "yields first audio ~2.3x sooner than the reference's 25-frame "
        "cadence; later chunks use the standard cadence)",
    )
    args = ap.parse_args()

    tts = build_tts(args)
    if args.first_chunk_frames is not None:
        import dataclasses

        tts.streaming = dataclasses.replace(
            tts.streaming, first_chunk_frames=args.first_chunk_frames
        )
    ref_text = read_text_arg(args.ref_text)
    input_text = read_text_arg(args.input_text)
    ref_codes = (
        load_ref_codes(args.ref_codes, tts)
        if args.ref_codes
        else tts.encode_reference(args.ref_audio)
    )

    sink = None
    if args.play:
        try:
            import pyaudio

            pa = pyaudio.PyAudio()
            sink = pa.open(
                format=pyaudio.paInt16, channels=1, rate=tts.sample_rate, output=True
            )
        except Exception as e:  # pyaudio is optional (host playback only)
            print(f"pyaudio unavailable ({e}); writing to file instead")

    chunks = []
    t0 = time.time()
    for i, chunk in enumerate(tts.infer_stream(input_text, ref_codes, ref_text)):
        if i == 0:
            print(f"first audio after {time.time()-t0:.2f}s")
        chunks.append(chunk)
        if sink is not None:
            pcm = np.clip(chunk * 32767, -32768, 32767).astype(np.int16)
            sink.write(pcm.tobytes())

    wav = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    from neutts_tpu.audio import io as audio_io

    audio_io.write_wav(args.output_path, wav, tts.sample_rate)
    print(
        f"{len(chunks)} chunks, {len(wav)/tts.sample_rate:.2f}s audio in "
        f"{time.time()-t0:.2f}s -> {args.output_path}"
    )


if __name__ == "__main__":
    main()
