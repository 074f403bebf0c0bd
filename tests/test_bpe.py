"""Self-contained byte-level BPE vs the HF `tokenizers` runtime.

The reference tokenizer is Qwen2.5 byte-level BPE + added speech tokens
(reference TRAINING.md:38-58). Real vocab files are not available offline, so
these tests TRAIN a small byte-level BPE with the exact Qwen2 pipeline
(Split regex + ByteLevel) using the `tokenizers` library as the ground-truth
implementation, then require our first-party encoder (text/bpe.py) to match
it token-for-token — the algorithmic parity that transfers to the real
tokenizer.json / GGUF metadata.
"""

from pathlib import Path

import pytest

tokenizers = pytest.importorskip("tokenizers")

from tokenizers import Regex, Tokenizer, decoders, models, pre_tokenizers, trainers  # noqa: E402

from neutts_tpu.text.bpe import QWEN2_SPLIT, ByteLevelBPE  # noqa: E402

SPECIALS = [
    "<|TEXT_REPLACE|>", "<|TEXT_PROMPT_START|>", "<|TEXT_PROMPT_END|>",
    "<|SPEECH_REPLACE|>", "<|SPEECH_GENERATION_START|>",
    "<|SPEECH_GENERATION_END|>",
]
SPEECH = [f"<|speech_{i}|>" for i in (0, 1, 7, 650, 65_535)]

TEXTS = [
    Path("/root/reference/samples/dave.txt").read_text().strip(),
    Path("/root/reference/samples/jo.txt").read_text().strip(),
    "Hello, world!  It's 2026-08-20... can't won't we'll I'd they're",
    "multi\nline\n\n  spaces\tand tabs",
    "numbers 1234567890 99 and mixed a1b2c3",
    "unicode: naïve café über 東京 🙂 emoji",
    "punctuation?! (brackets) [and] {more} --- ***",
    "",
    " leading and trailing ",
]


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    """A byte-level BPE trained with the Qwen2 pre-tokenization pipeline."""
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.Sequence(
        [
            pre_tokenizers.Split(Regex(QWEN2_SPLIT), behavior="isolated"),
            pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
        ]
    )
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=700,
        show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        special_tokens=[],
    )
    corpus = TEXTS * 4 + [
        "the quick brown fox jumps over the lazy dog " * 3,
        "speech synthesis with instant voice cloning on device",
    ]
    tok.train_from_iterator(corpus, trainer)
    tok.add_special_tokens(SPECIALS + SPEECH)
    path = tmp_path_factory.mktemp("bpe") / "tokenizer.json"
    tok.save(str(path))
    return tok, path


def test_encode_matches_tokenizers(oracle):
    tok, path = oracle
    ours = ByteLevelBPE.from_tokenizer_json(path)
    for text in TEXTS:
        want = tok.encode(text, add_special_tokens=False).ids
        got = ours.encode(text)
        assert got == want, (text, got, want)


def test_added_tokens_split_and_roundtrip(oracle):
    tok, path = oracle
    ours = ByteLevelBPE.from_tokenizer_json(path)
    text = (
        "user: Convert the text to speech:<|TEXT_PROMPT_START|>hello"
        "<|TEXT_PROMPT_END|>\nassistant:<|SPEECH_GENERATION_START|>"
        "<|speech_0|><|speech_650|><|speech_65535|>"
    )
    want = tok.encode(text, add_special_tokens=False).ids
    got = ours.encode(text)
    assert got == want
    assert ours.decode(got) == tok.decode(want, skip_special_tokens=False)


def test_decode_roundtrip(oracle):
    tok, path = oracle
    ours = ByteLevelBPE.from_tokenizer_json(path)
    for text in TEXTS:
        ids = ours.encode(text)
        assert ours.decode(ids) == text or text == ""


def test_gguf_metadata_source_matches_json(oracle):
    """The same vocab delivered as GGUF metadata (tokenizer.ggml.*) must
    build an identical encoder — GGUF releases then need no tokenizer.json."""
    tok, path = oracle
    import json

    blob = json.loads(Path(path).read_text())
    vocab = blob["model"]["vocab"]
    added = {t["content"]: t["id"] for t in blob.get("added_tokens", [])}
    n = max(max(vocab.values()), max(added.values())) + 1
    tokens = [""] * n
    types = [1] * n
    for t, i in vocab.items():
        tokens[i] = t
    for t, i in added.items():
        tokens[i] = t
        types[i] = 4  # USER_DEFINED
    merges = [
        m if isinstance(m, str) else " ".join(m) for m in blob["model"]["merges"]
    ]
    meta = {
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.token_type": types,
    }
    ours = ByteLevelBPE.from_gguf_metadata(meta)
    ref = ByteLevelBPE.from_tokenizer_json(path)
    for text in TEXTS + ["<|speech_0|>ok<|SPEECH_GENERATION_END|>"]:
        assert ours.encode(text) == ref.encode(text)


def test_hftokenizer_first_party_layout_and_parity(oracle):
    """HFTokenizer over a tokenizer.json dir must use the first-party BPE
    (no transformers), detect the layout from the vocab, and encode exactly
    like the tokenizers runtime."""
    import shutil

    from neutts_tpu.text.tokenizer import HFTokenizer

    tok, path = oracle
    d = path.parent / "ckpt_dir"
    d.mkdir(exist_ok=True)
    shutil.copy(path, d / "tokenizer.json")
    ht = HFTokenizer(str(d))
    assert ht._bpe is not None and ht._tok is None
    first_special = tok.token_to_id(SPECIALS[0])
    assert ht.layout.n_text_tokens == first_special
    assert ht.layout.speech_base == tok.token_to_id("<|speech_0|>")
    for text in TEXTS:
        assert ht.encode(text) == tok.encode(text, add_special_tokens=False).ids


def test_full_speech_vocab_scales():
    """65,536 speech added tokens must not blow up construction or encoding
    (the literal-alternation trap): one numeric branch handles them."""
    import time

    vocab = {chr(c): i for i, c in enumerate(range(33, 127))}
    base = len(vocab)
    added = {s: base + i for i, s in enumerate(SPECIALS)}
    sb = base + len(SPECIALS)
    added.update({f"<|speech_{i}|>": sb + i for i in range(65_536)})
    t0 = time.time()
    bpe = ByteLevelBPE(vocab, [], added)
    assert time.time() - t0 < 5.0
    ids = bpe.encode("<|speech_0|>a<|speech_65535|><|SPEECH_GENERATION_END|>")
    assert ids == [sb, vocab["a"], sb + 65_535, added["<|SPEECH_GENERATION_END|>"]]
    # an out-of-range speech literal is NOT an added token: falls back to text
    ids2 = bpe.encode("<|speech_99999|>")
    assert added["<|SPEECH_GENERATION_END|>"] not in ids2
    assert all(i < base for i in ids2)
