"""Batch synthesis CLI (parity with reference examples/basic_example.py:1-67).

Usage:
    python examples/basic_example.py \
        --input_text "My name is Dave, and um, I'm from London" \
        --ref_audio  /root/reference/samples/dave.wav \
        --ref_text   /root/reference/samples/dave.txt \
        --checkpoint /path/to/converted   # or --synthetic for a random model
        --output_path output.wav
"""

import argparse

from _common import build_tts, load_ref_codes, read_text_arg


def main():
    ap = argparse.ArgumentParser(description="NeuTTS-TPU batch synthesis")
    ap.add_argument("--input_text", required=True, help="text to synthesize (or a .txt path)")
    ap.add_argument("--ref_audio", default=None, help="reference speaker wav")
    ap.add_argument("--ref_codes", default=None, help="pre-encoded codes (.pt/.npy)")
    ap.add_argument("--ref_text", required=True, help="reference transcript (or a .txt path)")
    ap.add_argument("--checkpoint", default=None, help="converted checkpoint dir")
    ap.add_argument("--synthetic", action="store_true", help="random tiny model (demo/test)")
    ap.add_argument("--output_path", default="output.wav")
    args = ap.parse_args()

    tts = build_tts(args)
    ref_text = read_text_arg(args.ref_text)
    input_text = read_text_arg(args.input_text)

    if args.ref_codes:
        ref_codes = load_ref_codes(args.ref_codes, tts)
    else:
        print(f"Encoding reference: {args.ref_audio}")
        ref_codes = tts.encode_reference(args.ref_audio)

    print(f"Generating audio for: {input_text!r}")
    wav = tts.infer(input_text, ref_codes, ref_text)

    from neutts_tpu.audio import io as audio_io

    audio_io.write_wav(args.output_path, wav, tts.sample_rate)
    print(f"Saved {len(wav)/tts.sample_rate:.2f}s to {args.output_path}")


if __name__ == "__main__":
    main()
