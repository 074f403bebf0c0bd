"""Capture espeak-ng golden phoneme strings for the G2P parity corpus.

Run this in an environment that has `phonemizer` + espeak-ng installed (the
reference's text front-end, reference neutts/neutts.py:102-104); it writes
tests/fixtures/espeak_goldens.json mapping each corpus line to the exact
phoneme string produced by

    EspeakBackend("en-us", preserve_punctuation=True, with_stress=True)

with the reference's single-space re-join (:299-301). Once the fixture file
exists, tests/test_text.py::test_g2p_matches_espeak_goldens activates and
pins RuleG2P (and EspeakG2P itself) against it — the VERDICT r1 #3 gate.

Usage: python tools/capture_espeak_goldens.py [--out tests/fixtures/espeak_goldens.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = Path(__file__).resolve().parent.parent
CORPUS = ROOT / "tests" / "fixtures" / "g2p_corpus.txt"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=str(ROOT / "tests" / "fixtures" / "espeak_goldens.json")
    )
    args = ap.parse_args()

    from neutts_tpu.text.g2p import EspeakG2P

    g2p = EspeakG2P()  # raises if phonemizer/espeak-ng are missing
    lines = [
        ln for ln in CORPUS.read_text().splitlines()
        if ln.strip() and not ln.startswith("#")
    ]
    goldens = {ln: g2p.phonemize(ln) for ln in lines}
    Path(args.out).write_text(
        json.dumps(goldens, ensure_ascii=False, indent=1)
    )
    print(f"captured {len(goldens)} goldens -> {args.out}")


if __name__ == "__main__":
    main()
