"""Finetuning data pipeline: filtering + preprocessing.

Re-implements the reference's dataset preparation (reference
examples/finetune.py:25-100) for the JAX trainer:

  * `data_filter` — reject empty text, digits, multi-uppercase acronyms,
    currency symbols, and bad final punctuation (reference :29-47 semantics);
  * `preprocess_sample` — phonemize -> chat-format ids with
    <|SPEECH_GENERATION_END|> appended -> pad/truncate to max_seq_len ->
    labels = IGNORE before <|SPEECH_GENERATION_START|> -> attention mask
    (reference :50-100);
  * `batches` — simple host-side batcher producing device-ready arrays.

Works on any iterable of {"text": str, "codes": list[int]} records — an HF
dataset (e.g. the emilia-yodas-neucodec layout the reference trains on,
reference examples/finetune.py:131-137) or local lists.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Iterator, List, Optional

import numpy as np

from neutts_tpu.text import prompt as prompt_lib
from neutts_tpu.train.trainer import IGNORE_INDEX

# reference examples/finetune.py:25-27
ACRONYM = re.compile(r"\b[A-Z]{2,}\b")
CURRENCY = re.compile(r"[$€£¥₩₹]")
FINAL_PUNCT_OK = (".", "!", "?", '"', "'", ")")


def data_filter(sample: Dict) -> bool:
    """True if the sample should be kept (reference :29-47 rules)."""
    text = (sample.get("text") or "").strip()
    if not text:
        return False
    if any(ch.isdigit() for ch in text):
        return False
    if ACRONYM.search(text):
        return False
    if CURRENCY.search(text):
        return False
    if not text.endswith(FINAL_PUNCT_OK):
        return False
    return True


def preprocess_sample(
    sample: Dict,
    tokenizer,
    g2p,
    max_seq_len: int = 2048,
) -> Optional[Dict[str, np.ndarray]]:
    """-> {"tokens", "labels", "attn_mask"} fixed-length arrays, or None if
    the sample does not fit `max_seq_len` (reference pads/truncates at :78-85;
    we drop over-length samples instead of silently truncating the target)."""
    cb = tokenizer.layout.codebook_size
    bad = [c for c in sample["codes"] if not 0 <= int(c) < cb]
    if bad:
        raise ValueError(
            f"codec codes out of range for the {cb}-entry codebook: {bad[:5]}"
        )
    ids = prompt_lib.build_training_ids(
        tokenizer, g2p, sample["codes"], sample["text"]
    )
    if len(ids) > max_seq_len:
        return None
    pad_id = getattr(tokenizer, "pad_id", 0)
    n = len(ids)
    tokens = np.full((max_seq_len,), pad_id, np.int32)
    tokens[:n] = ids
    attn = np.zeros((max_seq_len,), bool)
    attn[:n] = True
    start_id = tokenizer.convert_token_to_id("<|SPEECH_GENERATION_START|>")
    labels = np.full((max_seq_len,), IGNORE_INDEX, np.int32)
    try:
        s = ids.index(start_id)
    except ValueError:
        return None
    labels[s:n] = ids[s:n]
    return {"tokens": tokens, "labels": labels, "attn_mask": attn}


def batches(
    records: Iterable[Dict],
    tokenizer,
    g2p,
    batch_size: int,
    max_seq_len: int = 2048,
    apply_filter: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Filter + preprocess + batch. Yields stacked device-ready dicts."""
    buf: List[Dict[str, np.ndarray]] = []
    for rec in records:
        if apply_filter and not data_filter(rec):
            continue
        ex = preprocess_sample(rec, tokenizer, g2p, max_seq_len)
        if ex is None:
            continue
        buf.append(ex)
        if len(buf) == batch_size:
            yield {k: np.stack([e[k] for e in buf]) for k in buf[0]}
            buf = []
