"""Backbone correctness: causality, cache consistency, batching invariance.

The reference suite is smoke-only (reference tests/test_neutts.py:55-58); per
SURVEY.md §4 we go further: unit-level oracles that pin the decode path to the
full-context forward pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutts_tpu import config
from neutts_tpu.models import backbone as bb
from neutts_tpu.runtime import decode as dec

CFG = config.TINY
EOS = CFG.layout.speech_gen_end


@pytest.fixture(scope="module")
def params():
    return bb.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def full_logits(params, tokens_1d):
    """Oracle: run the whole sequence through prefill and return [S, V] logits
    by doing prefill at every prefix length (no cache reuse)."""
    cache = bb.KVCache.create(CFG, 1, max_len=CFG.max_context, dtype=jnp.float32)
    toks = jnp.asarray(tokens_1d, jnp.int32)[None, :]
    lens = jnp.asarray([len(tokens_1d)], jnp.int32)
    logits, _ = bb.prefill(CFG, params, toks, lens, cache)
    return logits  # [1, V] logits at the last position


def test_prefill_decode_consistency(params):
    """logits from (prefill prefix + cached decode) == prefill of longer prefix."""
    rng = np.random.default_rng(0)
    seq = rng.integers(0, CFG.layout.n_text_tokens, size=12).tolist()
    # Oracle logits at each position via fresh prefill of each prefix.
    oracle = [np.asarray(full_logits(params, seq[: i + 1])[0]) for i in range(6, 12)]

    # Cached path: prefill first 7 tokens, then decode the rest step by step.
    cache = bb.KVCache.create(CFG, 1, max_len=CFG.max_context, dtype=jnp.float32)
    toks = jnp.asarray(seq[:7], jnp.int32)[None, :]
    lens = jnp.asarray([7], jnp.int32)
    logits, cache = bb.prefill(CFG, params, toks, lens, cache)
    got = [np.asarray(logits[0])]
    pad = jnp.zeros((1,), jnp.int32)
    for i in range(7, 12):
        tok = jnp.asarray([seq[i]], jnp.int32)
        logits, cache = bb.decode_step(CFG, params, tok, cache, jnp.int32(i), pad)
        got.append(np.asarray(logits[0]))

    for o, g in zip(oracle, got):
        np.testing.assert_allclose(o, g, rtol=2e-4, atol=2e-4)


def test_left_padding_invariance(params):
    """A left-padded prompt must produce identical last-position logits."""
    seq = [5, 6, 7, 8, 9]
    cache = bb.KVCache.create(CFG, 1, max_len=CFG.max_context, dtype=jnp.float32)
    l_short, _ = bb.prefill(
        CFG, params, jnp.asarray([seq], jnp.int32), jnp.asarray([5], jnp.int32), cache
    )
    padded = [0] * 6 + seq
    cache = bb.KVCache.create(CFG, 1, max_len=CFG.max_context, dtype=jnp.float32)
    l_pad, _ = bb.prefill(
        CFG, params, jnp.asarray([padded], jnp.int32), jnp.asarray([5], jnp.int32), cache
    )
    np.testing.assert_allclose(np.asarray(l_short), np.asarray(l_pad), rtol=2e-4, atol=2e-4)


def test_causality(params):
    """Changing a future token must not change past-position logits."""
    base = [1, 2, 3, 4, 5, 6]
    a = full_logits(params, base[:4])
    b = full_logits(params, base[:4])  # deterministic repeat
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # position-3 logits computed inside a longer full-sequence forward must
    # match the logits of prefilling only the 4-token prefix
    toks = jnp.asarray([base], jnp.int32)
    attn = jnp.ones((1, 6), bool)
    all_logits = bb.forward_train(CFG, params, toks, attn)
    np.testing.assert_allclose(
        np.asarray(a[0]), np.asarray(all_logits[0, 3, :]), rtol=2e-4, atol=2e-4
    )


def test_batched_greedy_matches_single(params):
    """Batched decode with ragged prompts == per-sequence single decode."""
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    prompts = [[3, 1, 4, 1, 5, 9, 2, 6], [2, 7, 1, 8]]
    toks, lens = dec.pad_prompts(prompts, pad_id=0, bucket=16)
    batched = dec.generate(CFG, scfg, EOS, 12, params, toks, lens, jax.random.PRNGKey(2))
    for i, p in enumerate(prompts):
        t1, l1 = dec.pad_prompts([p], pad_id=0, bucket=16)
        single = dec.generate(CFG, scfg, EOS, 12, params, t1, l1, jax.random.PRNGKey(2))
        assert dec.extract(batched, i, EOS) == dec.extract(single, 0, EOS)


def test_min_new_tokens_suppression(params):
    """EOS must not appear among the first min_new_tokens generated tokens."""
    # Rig the bias so EOS would otherwise dominate: put a huge bias on the EOS
    # logit by spiking the final-norm -> head path is hard; instead just check
    # the masking op directly plus an end-to-end greedy run.
    from neutts_tpu.ops import sampling as smp

    logits = jnp.zeros((2, CFG.padded_vocab), jnp.float32).at[:, EOS].set(1e9)
    masked = smp.mask_eos(logits, EOS, jnp.int32(0), 5)
    assert np.asarray(masked[:, EOS] == -np.inf).all()
    unmasked = smp.mask_eos(logits, EOS, jnp.int32(5), 5)
    assert np.asarray(unmasked[:, EOS] == 1e9).all()


def test_top_k_support():
    from neutts_tpu.ops import sampling as smp

    logits = jnp.asarray(np.linspace(0, 1, 100)[None, :], jnp.float32)
    picks = set()
    for i in range(64):
        t = smp.sample_tokens(logits, jax.random.PRNGKey(i), temperature=1.0, top_k=5)
        picks.add(int(t[0]))
    assert picks.issubset(set(range(95, 100)))  # only top-5 ever sampled


def test_greedy_is_argmax():
    from neutts_tpu.ops import sampling as smp

    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 37))
    t = smp.sample_tokens(logits, jax.random.PRNGKey(1), greedy=True)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(jnp.argmax(logits, -1)))


def test_param_counts_air_nano():
    """Air/Nano configs must land near the published sizes (README.md:44-45)."""
    for cfg, lo, hi in [(config.AIR, 330e6, 390e6), (config.NANO, 90e6, 150e6)]:
        D, L, F = cfg.hidden_size, cfg.n_layers, cfg.intermediate_size
        attn = L * (D * cfg.q_dim + 2 * D * cfg.kv_dim + cfg.q_dim * D)
        mlp = L * 3 * D * F
        active = attn + mlp
        assert lo < active < hi, (cfg.name, active)
        emb = cfg.vocab_size * D
        total = active + emb
        if cfg is config.AIR:
            assert 5.0e8 < total < 6.0e8


# --- int8 (W8A8) quantized weights -------------------------------------------


def test_quantized_forward_close_to_bf16(params):
    """quantize_params: greedy decode path agrees with the full-precision
    forward — top-1 match on random activations (per-channel weight scales +
    per-token activation scales keep W8A8 within noise for this model size)."""
    qparams = bb.quantize_params(params)
    assert bb.quantized_weights(qparams)
    assert qparams["layers"]["wq"]["q"].dtype == jnp.int8

    rng = np.random.default_rng(3)
    seq = rng.integers(0, CFG.layout.n_text_tokens, size=10).tolist()
    ref = np.asarray(full_logits(params, seq)[0])

    cache = bb.KVCache.create(CFG, 1, max_len=CFG.max_context, dtype=jnp.float32)
    toks = jnp.asarray(seq, jnp.int32)[None, :]
    lens = jnp.asarray([len(seq)], jnp.int32)
    got, _ = bb.prefill(CFG, qparams, toks, lens, cache)
    got = np.asarray(got[0])

    assert got.shape == ref.shape
    assert np.argmax(got) == np.argmax(ref)
    # logits correlate strongly even though values shift a little
    c = np.corrcoef(ref, got)[0, 1]
    assert c > 0.999, c


def test_quantized_generate_runs(params):
    """End-to-end generate with int8 weights: deterministic greedy decode."""
    qparams = bb.quantize_params(params)
    toks, lens = dec.pad_prompts([[1, 2, 3, 4, 5]], pad_id=0)
    sampling = config.SamplingConfig(greedy=True, min_new_tokens=0)
    r1 = dec.generate(CFG, sampling, EOS, 8, qparams, toks, lens, jax.random.PRNGKey(0))
    r2 = dec.generate(CFG, sampling, EOS, 8, qparams, toks, lens, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


# --- int4 (nibble-packed) KV cache --------------------------------------------


def test_pack4_roundtrip():
    rng = np.random.default_rng(0)
    q4 = rng.integers(-7, 8, size=(3, 10, 128)).astype(np.int8)
    packed = bb.pack4_pairs(jnp.asarray(q4))
    lo, hi = bb.unpack4(packed)
    np.testing.assert_array_equal(np.asarray(lo), q4[:, 0::2])
    np.testing.assert_array_equal(np.asarray(hi), q4[:, 1::2])


def test_dequant_kv4_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 128)).astype(np.float32))
    kq, ksc = bb.quantize_kv4(x)
    deq = bb.dequant_kv4(bb.pack4_pairs(kq), bb.scales4_block(ksc))
    ref = kq.astype(jnp.float32) * ksc[..., None]
    np.testing.assert_allclose(np.asarray(deq), np.asarray(ref), rtol=1e-6)
    # quantization error bounded by scale/2 per element
    err = np.max(np.abs(np.asarray(deq) - np.asarray(x)))
    assert err <= float(jnp.max(ksc)) * 0.5 + 1e-6


def test_int4_cache_decode_consistency(params):
    """Full decode loop with int4 cache agrees with the f32-cache loop over a
    meaningful greedy prefix (int4 noise on a random model diverges later)."""
    cfg4 = CFG.scaled(kv_dtype="int4")
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    toks, lens = dec.pad_prompts([[3, 1, 4, 1, 5, 9], [2, 7, 1, 8]], pad_id=0, bucket=16)
    r16 = dec.generate(CFG, scfg, EOS, 16, params, toks, lens, jax.random.PRNGKey(1))
    r4 = dec.generate(cfg4, scfg, EOS, 16, params, toks, lens, jax.random.PRNGKey(1))
    for i in range(2):
        a = dec.extract(r16, i, EOS)
        b = dec.extract(r4, i, EOS)
        n = min(len(a), len(b), 6)
        assert a[:n] == b[:n], (a, b)


def test_int4_odd_prompt_write_preserves_prompt_nibble(params):
    """The serving path's int4 prev-nibble pairing must never corrupt the
    prompt's LAST token: decode writes share packed bytes with earlier
    tokens, and a clobber would change its dequantized K/V. (Admission is
    LEFT-padded, so the prompt's last real token sits at bucket index Lp-1 —
    an odd index whenever the bucket is even — and the first decode write at
    even Lp opens a fresh byte whose hi nibble pairs via the prev register.)"""
    from neutts_tpu.runtime import batching

    cfg4 = CFG.scaled(kv_dtype="int4")
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    prompt = [3, 1, 4, 1, 5]
    Lp = 8  # bucket; prompt occupies [3, 8) — last real token at odd index 7
    L = Lp  # slot index of the prompt's last token + 1 (left-padded layout)
    state = batching.SlotState.create(cfg4, 2, jax.random.PRNGKey(3))
    toks = jnp.asarray([[0, 0, 0] + prompt], jnp.int32)
    state = batching.prefill_slots(
        cfg4, scfg, EOS, params, state,
        toks, jnp.asarray([len(prompt)], jnp.int32), jnp.asarray([0], jnp.int32))

    def deq_last_token(state):
        # dequantized K of the prompt's last token, all layers, slot 0
        out = []
        for layer in range(cfg4.n_layers):
            d = bb.dequant_kv4(state.cache.k[layer, 0:1],
                               state.cache.k_scale[layer, 0:1])
            out.append(np.asarray(d[0, L - 1]))
        return np.stack(out)

    before = deq_last_token(state)
    state, outs = batching.decode_steps(cfg4, scfg, EOS, 5, params, state)
    after = deq_last_token(state)
    np.testing.assert_array_equal(before, after)
    # and decoding actually progressed past the shared byte
    assert int(np.asarray(state.lens)[0]) > L


def test_kv_dtype_auto_resolution():
    """kv_dtype="auto" (r5): int8 below the crossover context, int4 at/above;
    explicit dtypes pass through untouched."""
    from neutts_tpu import config as cfglib
    from neutts_tpu.config import TINY, resolve_kv_dtype

    auto = TINY.scaled(kv_dtype="auto")
    # r5: crossover is 0 — int4 measured faster at every context (bench.py
    # A/Bs in KV_AUTO_r05.json), so auto always resolves to int4 on this
    # hardware; the mechanism remains for targets where int8 wins short ctx
    assert resolve_kv_dtype(auto, 512).kv_dtype == "int4"
    assert resolve_kv_dtype(auto, 2048).kv_dtype == "int4"
    assert resolve_kv_dtype(TINY, 2048).kv_dtype == TINY.kv_dtype
    # the crossover path itself (exercised with a nonzero threshold)
    import neutts_tpu.config as _c
    old = _c.KV_AUTO_CROSSOVER
    _c.KV_AUTO_CROSSOVER = 1024
    try:
        assert resolve_kv_dtype(auto, 512).kv_dtype == "int8"
        assert resolve_kv_dtype(auto, 1024).kv_dtype == "int4"
    finally:
        _c.KV_AUTO_CROSSOVER = old


def test_generate_auto_matches_explicit():
    """generate() with auto must produce exactly the resolved explicit run."""
    import jax
    import numpy as np

    from neutts_tpu import config
    from neutts_tpu.runtime import decode as dec

    cfg = config.TINY
    eos = cfg.layout.speech_gen_end
    params = bb.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    toks, lens = dec.pad_prompts([[5, 6, 7, 8], [9, 10]], pad_id=0, bucket=128)
    key = jax.random.PRNGKey(1)
    # r5 crossover 0: auto resolves to int4 at every context
    r_auto = dec.generate(cfg.scaled(kv_dtype="auto"), scfg, eos, 16,
                          params, toks, lens, key)
    r_int4s = dec.generate(cfg.scaled(kv_dtype="int4"), scfg, eos, 16,
                           params, toks, lens, key)
    np.testing.assert_array_equal(np.asarray(r_auto.tokens),
                                  np.asarray(r_int4s.tokens))
    # long-window config resolves to int4
    cfg_long = cfg.scaled(kv_dtype="auto", max_context=2048)
    r_auto4 = dec.generate(cfg_long, scfg, eos, 1024, params, toks, lens, key)
    r_int4 = dec.generate(cfg_long.scaled(kv_dtype="int4"), scfg, eos, 1024,
                          params, toks, lens, key)
    np.testing.assert_array_equal(np.asarray(r_auto4.tokens),
                                  np.asarray(r_int4.tokens))
