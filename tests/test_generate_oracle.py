"""HF generate-loop equivalence oracle (the strongest runnable offline proxy
for the north-star parity gate).

The real-weight gates in test_parity.py can only run with downloadable
checkpoints; this module proves the DECODE-LOOP SEMANTICS — KV-cache
indexing, RoPE positions, EOS handling, min_new_tokens suppression,
max_length truncation, left-pad invariance — against `transformers`
`generate()` on a converted synthetic Qwen2-style checkpoint,
token-for-token over hundreds of steps (reference torch path:
neutts/neutts.py:334-352 — greedy analogue of do_sample/top_k=50 with
min_new_tokens=50, max_length=2048, eos=<|SPEECH_GENERATION_END|>).

Numerics note: both stacks run float32; cross-implementation drift is ~3e-3
max on logits (see test_convert.py). Greedy equality is meaningful only while
the top-1/top-2 logit margin clears that drift, so the fixture asserts the
margin on every compared step — if a future seed change makes the fixture
ill-conditioned, the margin assert fails loudly instead of the token compare
failing flakily.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from neutts_tpu import config
from neutts_tpu.models import convert
from neutts_tpu.runtime import decode as dec
from neutts_tpu.serving.engine import Engine

from synthetic_ckpt import build_hf_model, make_weights, write_gguf_file, write_hf_dir

# f32 KV + f32 activations keep cross-impl drift ~3e-3; margins are asserted.
BASE = config.TINY.scaled(max_context=1024, kv_dtype="float32")
EOS = 325  # arbitrary in-vocab id; reference eos is <|SPEECH_GENERATION_END|>
MARGIN = 0.02  # min acceptable top1-top2 logit gap on compared steps

GREEDY = config.SamplingConfig(greedy=True, min_new_tokens=1)


@pytest.fixture(scope="module")
def oracle():
    """(cfg, params, hf_model, weights) — one conversion for the module."""
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        # seed 14: min top1-top2 margin 0.36 over a 500-step greedy rollout
        # (scanned seeds 0-23; most land >0.1, a few degenerate to <1e-3)
        weights = write_hf_dir(Path(d), BASE, make_weights(BASE, seed=14))
        cfg, params = convert.from_hf(Path(d), dtype="float32")
    cfg = cfg.scaled(max_context=BASE.max_context, kv_dtype="float32",
                     dtype="float32")
    model = build_hf_model(BASE, weights)
    return cfg, params, model, weights


def hf_generate(model, prompt_ids, *, max_new, min_new=1, eos=EOS):
    """transformers greedy rollout; returns (tokens, per-step top1-top2 gap)."""
    ids = torch.tensor([list(prompt_ids)], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            ids,
            do_sample=False,
            max_new_tokens=max_new,
            min_new_tokens=min_new,
            eos_token_id=eos,
            pad_token_id=0,
            use_cache=True,
            output_scores=True,
            return_dict_in_generate=True,
        )
    toks = out.sequences[0, len(prompt_ids):].tolist()
    gaps = []
    for s in out.scores:
        top2 = torch.topk(s[0], 2).values
        gaps.append(float(top2[0] - top2[1]))
    return toks, gaps


def assert_margins(gaps, n):
    """The fixture must be well-conditioned on every compared step."""
    m = min(gaps[:n]) if gaps else np.inf
    assert m > MARGIN, (
        f"oracle fixture ill-conditioned: top1-top2 margin {m:.4f} <= "
        f"{MARGIN} — pick a new weight seed, do not loosen the token compare"
    )


def our_generate(cfg, params, prompt_ids, *, max_new, min_new=1, eos=EOS,
                 bucket=None):
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=min_new)
    toks, lens = dec.pad_prompts([list(prompt_ids)], pad_id=0, bucket=bucket)
    res = dec.generate(cfg, scfg, eos, max_new, params, toks, lens,
                       jax.random.PRNGKey(0))
    return dec.extract(res, 0, eos)


def test_generate_loop_500_steps(oracle):
    """Token-for-token over 500 greedy decode steps (no EOS in range)."""
    cfg, params, model, _ = oracle
    rng = np.random.default_rng(1)
    prompt = rng.integers(1, cfg.vocab_size, size=12).tolist()
    want, gaps = hf_generate(model, prompt, max_new=500)
    assert len(want) == 500 or want[-1] == EOS
    got = our_generate(cfg, params, prompt, max_new=500)
    assert_margins(gaps, len(want))
    assert got == [t for t in want if t != EOS] or got == want, (
        f"diverged at step {next(i for i, (a, b) in enumerate(zip(got, want)) if a != b) if got != want[:len(got)] else len(got)}"
    )


def test_eos_and_min_new_tokens(oracle):
    """EOS inside the suppression window: both stacks must suppress it until
    min_new_tokens and stop at the first occurrence after (reference
    min_new_tokens=50 semantics, neutts/neutts.py:346)."""
    cfg, params, model, _ = oracle
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size, size=9).tolist()
    # pick an eos that the unsuppressed rollout emits early (step < 40)
    free, _ = hf_generate(model, prompt, max_new=60, eos=-1)
    eos = free[10]
    want, gaps = hf_generate(model, prompt, max_new=400, min_new=50, eos=eos)
    assert_margins(gaps, len(want))
    got = our_generate(cfg, params, prompt, max_new=400, min_new=50, eos=eos)
    # HF keeps the terminating EOS in sequences; ours trims it
    want_trim = want[:-1] if want and want[-1] == eos else want
    assert len(want_trim) >= 50 - 1
    assert eos not in want_trim[:50]
    assert got == want_trim


def test_eos_exactly_at_min_new_tokens(oracle):
    """min_new_tokens == the step where EOS becomes argmax: the first legal
    EOS slot must terminate identically in both stacks."""
    cfg, params, model, _ = oracle
    rng = np.random.default_rng(4)
    prompt = rng.integers(1, cfg.vocab_size, size=5).tolist()
    free, _ = hf_generate(model, prompt, max_new=30, eos=-1)
    eos = free[10]
    # min_new = 10: EOS is argmax exactly when suppression lifts
    want, gaps = hf_generate(model, prompt, max_new=100, min_new=10, eos=eos)
    assert_margins(gaps, len(want))
    got = our_generate(cfg, params, prompt, max_new=100, min_new=10, eos=eos)
    want_trim = want[:-1] if want and want[-1] == eos else want
    assert got == want_trim


def test_mixed_length_batch_leftpad_invariance(oracle):
    """A left-padded mixed-length batch must reproduce HF's UNPADDED batch-1
    rollouts row-for-row (HF pads right in training; the reference runs
    batch-1 — left-pad invariance is what makes our batching legal)."""
    cfg, params, model, _ = oracle
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, size=n).tolist()
               for n in (7, 33, 61, 100)]
    wants = []
    for p in prompts:
        w, gaps = hf_generate(model, p, max_new=120)
        assert_margins(gaps, len(w))
        wants.append([t for t in w if t != EOS])
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    toks, lens = dec.pad_prompts(prompts, pad_id=0)
    res = dec.generate(cfg, scfg, EOS, 120, params, toks, lens,
                       jax.random.PRNGKey(0))
    for i, want in enumerate(wants):
        assert dec.extract(res, i, EOS) == want, f"row {i} diverged"


def test_context_boundary_truncation(oracle):
    """Prompt near max_context: generation must stop when the REAL length
    (prompt + new, excluding left-pad) hits max_context — reference
    max_length=2048 counts real tokens (neutts/neutts.py:340)."""
    cfg, params, model, _ = oracle
    rng = np.random.default_rng(0)
    n = cfg.max_context - 24  # 1000: bucket pads to 1024 == max_context
    prompt = rng.integers(1, cfg.vocab_size, size=n).tolist()
    want, gaps = hf_generate(model, prompt, max_new=cfg.max_context)
    with torch.no_grad():  # HF caps at max_length == cfg.max_context
        capped = model.generate(
            torch.tensor([prompt]), do_sample=False,
            max_length=cfg.max_context, eos_token_id=EOS, pad_token_id=0,
        )[0, n:].tolist()
    assert len(capped) == 24
    assert_margins(gaps, len(capped))
    got = our_generate(cfg, params, prompt, max_new=500)
    assert got == [t for t in capped if t != EOS]


def test_gguf_converted_copy_matches(oracle):
    """The GGUF-serialized copy of the same weights must generate the same
    tokens (reference GGUF path parity, neutts/neutts.py:354-371)."""
    cfg, params, model, weights = oracle
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        path = write_gguf_file(Path(d) / "m.gguf", BASE, weights)
        gcfg, gparams = convert.from_gguf(path, dtype="float32")
    gcfg = gcfg.scaled(max_context=cfg.max_context, kv_dtype="float32",
                       dtype="float32")
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size, size=21).tolist()
    want, gaps = hf_generate(model, prompt, max_new=150)
    assert_margins(gaps, len(want))
    got = our_generate(gcfg, gparams, prompt, max_new=150)
    assert got == [t for t in want if t != EOS]


def test_serving_engine_matches_hf(oracle):
    """The continuous-batching Engine (slot admission, segmented decode,
    retirement) must reproduce HF's batch-1 rollouts token-for-token."""
    cfg, params, model, _ = oracle
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, size=m).tolist()
               for m in (13, 45, 70, 8, 130, 27)]
    wants = []
    for p in prompts:
        w, gaps = hf_generate(model, p, max_new=90)
        assert_margins(gaps, len(w))
        wants.append([t for t in w if t != EOS])
    eng = Engine(
        cfg, params, eos_id=EOS, n_slots=4,
        sampling=config.SamplingConfig(greedy=True, min_new_tokens=1),
        segment_steps=16,
    )
    rids = [eng.submit(p, max_new=90) for p in prompts]
    results = eng.run()
    for rid, want in zip(rids, wants):
        assert results[rid] == want, f"request {rid} diverged"
