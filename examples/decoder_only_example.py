"""Decode-only deployment: pre-encoded reference codes, no codec encoder.

Parity with reference examples/onnx_example.py:1-71, which pairs a GGUF
backbone with the ONNX codec *decoder* and pre-encoded `--ref_codes` — the
low-latency embedded mode. Here the decoder is the same jitted JAX/Pallas
codec (no separate export format needed); the mode is simply "skip the
encoder, feed .pt/.npy codes".
"""

import argparse

from _common import build_tts, load_ref_codes, read_text_arg


def main():
    ap = argparse.ArgumentParser(description="NeuTTS-TPU decoder-only synthesis")
    ap.add_argument("--input_text", required=True)
    ap.add_argument("--ref_codes", required=True, help=".pt or .npy pre-encoded codes")
    ap.add_argument("--ref_text", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--output_path", default="output.wav")
    args = ap.parse_args()

    tts = build_tts(args)
    wav = tts.infer(
        read_text_arg(args.input_text),
        load_ref_codes(args.ref_codes, tts),
        read_text_arg(args.ref_text),
    )
    from neutts_tpu.audio import io as audio_io

    audio_io.write_wav(args.output_path, wav, tts.sample_rate)
    print(f"Saved {len(wav)/tts.sample_rate:.2f}s to {args.output_path}")


if __name__ == "__main__":
    main()
