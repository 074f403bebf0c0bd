"""Shared helpers for the example CLIs."""

import os
import sys
from pathlib import Path

import numpy as np

# make `python examples/foo.py` work from a source checkout without
# installation: the repo root is the parent of this file's directory
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def read_text_arg(value: str) -> str:
    p = Path(value)
    if p.suffix == ".txt" and p.exists():
        return p.read_text().strip()
    return value


def build_tts(args):
    from neutts_tpu import NeuTTS

    if getattr(args, "checkpoint", None):
        return NeuTTS.from_checkpoint(args.checkpoint)
    if getattr(args, "synthetic", False):
        print("Using a SYNTHETIC random model (demo mode — output is noise).")
        from neutts_tpu import config

        # tiny geometry but the full 2048-token window so real reference
        # clips (e.g. dave's 372 codes + phonemes) fit the prompt
        tts = NeuTTS.initialize_random(
            backbone_cfg=config.TINY.scaled(max_context=2048)
        )
        tts.sampling = config.SamplingConfig(min_new_tokens=25)
        return tts
    raise SystemExit("Provide --checkpoint DIR or --synthetic")


def load_ref_codes(path: str, tts) -> np.ndarray:
    """Load pre-encoded reference codes: .npy, or torch .pt (reference
    samples/dave.pt layout — int32 [T])."""
    p = Path(path)
    if p.suffix == ".npy":
        codes = np.load(p)
    elif p.suffix == ".pt":
        import torch

        codes = torch.load(p, map_location="cpu", weights_only=True).numpy()
    else:
        raise SystemExit(f"unsupported ref codes format: {p.suffix}")
    codes = np.asarray(codes, np.int64).reshape(-1)
    cb = tts.tokenizer.layout.codebook_size
    if codes.max() >= cb:
        print(f"NOTE: clamping codes into the model's {cb}-entry codebook")
        codes = codes % cb
    return codes.astype(np.int32)
