"""Pre-encode a reference speaker wav to codec codes (parity with reference
examples/encode_reference.py:1-47, which torch.saves a .pt).

Saves .npy by default; .pt when the output path ends in .pt and torch is
available — interchangeable with the reference's sample artifacts.
"""

import argparse
from pathlib import Path

import numpy as np

from _common import build_tts


def main():
    ap = argparse.ArgumentParser(description="Encode a reference wav to codes")
    ap.add_argument("--ref_audio", required=True)
    ap.add_argument("--output_path", default="ref_codes.npy")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    tts = build_tts(args)
    codes = tts.encode_reference(args.ref_audio)
    out = Path(args.output_path)
    if out.suffix == ".pt":
        import torch

        torch.save(torch.from_numpy(np.asarray(codes, np.int32)), out)
    else:
        np.save(out, codes)
    print(f"{len(codes)} codes ({len(codes)/50:.2f}s @50Hz) -> {out}")


if __name__ == "__main__":
    main()
