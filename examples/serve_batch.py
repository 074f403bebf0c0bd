"""Continuous-batching synthesis server demo (beyond the reference: this is
the role its RTX-4090 numbers delegate to vLLM, reference README.md:54).

Synthesizes many utterances concurrently through the slot engine, then
vocodes each to a wav.
"""

import argparse
import time

from _common import build_tts, load_ref_codes, read_text_arg

SENTENCES = [
    "The quick brown fox jumps over the lazy dog.",
    "Parallel synthesis keeps every TPU core busy.",
    "Continuous batching admits new work as slots free up.",
    "This sentence is short.",
    "Speech models decode fifty codec tokens for every second of audio.",
]


def main():
    ap = argparse.ArgumentParser(description="NeuTTS-TPU continuous batching demo")
    ap.add_argument("--ref_audio", default=None)
    ap.add_argument("--ref_codes", default=None)
    ap.add_argument("--ref_text", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--n_slots", type=int, default=4)
    ap.add_argument("--out_prefix", default="served_")
    args = ap.parse_args()

    tts = build_tts(args)
    ref_text = read_text_arg(args.ref_text)
    ref_codes = (
        load_ref_codes(args.ref_codes, tts)
        if args.ref_codes
        else tts.encode_reference(args.ref_audio)
    )

    from neutts_tpu.serving.engine import Engine
    from neutts_tpu.text.prompt import build_prompt_ids
    from neutts_tpu.text.tokenizer import extract_speech_codes
    from neutts_tpu.audio import io as audio_io

    eng = Engine(
        tts.backbone_cfg,
        tts.backbone_params,
        eos_id=tts.tokenizer.layout.speech_gen_end,
        n_slots=args.n_slots,
        sampling=tts.sampling,
    )
    t0 = time.time()
    rids = {}
    for i, s in enumerate(SENTENCES):
        ids = build_prompt_ids(tts.tokenizer, tts.g2p, list(ref_codes), ref_text, s)
        rids[eng.submit(ids)] = i
    results = eng.run()
    dt = time.time() - t0
    total_tokens = sum(len(v) for v in results.values())
    print(f"{len(results)} utterances, {total_tokens} tokens in {dt:.2f}s "
          f"({total_tokens/dt:,.0f} tok/s)")

    for rid, toks in results.items():
        codes = extract_speech_codes(toks, tts.tokenizer.layout)
        if not codes:
            continue
        wav = tts._watermark(tts._vocode(codes))
        path = f"{args.out_prefix}{rids[rid]}.wav"
        audio_io.write_wav(path, wav, tts.sample_rate)
        print(f"  {path}: {len(wav)/tts.sample_rate:.2f}s")


if __name__ == "__main__":
    main()
