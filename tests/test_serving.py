"""Continuous-batching engine: greedy outputs must match the lockstep
generate path per request, across admission orders and slot reuse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutts_tpu import config
from neutts_tpu.models import backbone as bb
from neutts_tpu.runtime import decode as dec
from neutts_tpu.serving.engine import Engine

CFG = config.TINY
EOS = CFG.layout.speech_gen_end


@pytest.fixture(scope="module")
def params():
    return bb.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def lockstep_greedy(params, prompt, max_new=24):
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    toks, lens = dec.pad_prompts([prompt], pad_id=0, bucket=128)
    res = dec.generate(CFG, scfg, EOS, max_new, params, toks, lens, jax.random.PRNGKey(7))
    return dec.extract(res, 0, EOS)


def test_engine_matches_lockstep(params):
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    eng = Engine(CFG, params, eos_id=EOS, n_slots=2, sampling=scfg, segment_steps=8)
    prompts = [
        [3, 1, 4, 1, 5],
        [9, 2, 6, 5, 3, 5, 8],
        [2, 7, 1],
        [8, 2, 8, 1, 8],
        [31, 41, 59],
    ]
    rids = [eng.submit(p, max_new=24) for p in prompts]
    results = eng.run()
    assert set(results) == set(rids)
    for rid, prompt in zip(rids, prompts):
        want = lockstep_greedy(params, prompt, 24)
        assert results[rid] == want, (rid, results[rid][:8], want[:8])


def test_engine_slot_reuse_more_requests_than_slots(params):
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    eng = Engine(CFG, params, eos_id=EOS, n_slots=1, sampling=scfg, segment_steps=4)
    rids = [eng.submit([5 + i, 6, 7], max_new=6) for i in range(4)]
    results = eng.run()
    assert len(results) == 4
    for i, rid in enumerate(rids):
        want = lockstep_greedy(params, [5 + i, 6, 7], 6)
        assert results[rid] == want


def test_engine_max_new_cap(params):
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    eng = Engine(CFG, params, eos_id=EOS, n_slots=2, sampling=scfg, segment_steps=8)
    rid = eng.submit([1, 2, 3], max_new=5)
    results = eng.run()
    assert len(results[rid]) <= 5


def test_engine_rejects_oversize_prompt(params):
    eng = Engine(CFG, params, eos_id=EOS, n_slots=1)
    with pytest.raises(ValueError):
        eng.submit(list(range(CFG.max_context)))


def test_engine_grouped_admission_matches_lockstep(params):
    """7 requests into 8 slots: one grouped prefill padded with duplicate
    slot rows (G=16 over 7 real admissions) — results must still be
    per-request exact vs the lockstep path."""
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    eng = Engine(CFG, params, eos_id=EOS, n_slots=8, sampling=scfg, segment_steps=8)
    prompts = [[3 + i, 7, 2, 9] for i in range(7)]
    rids = [eng.submit(p, max_new=12) for p in prompts]
    results = eng.run()
    for rid, prompt in zip(rids, prompts):
        assert results[rid] == lockstep_greedy(params, prompt, 12), rid


def test_prefill_slots_duplicate_padding_idempotent(params):
    """prefill_slots with duplicated trailing rows (group padding) must leave
    the same state as admitting the real rows alone."""
    from neutts_tpu.runtime import batching

    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    prompts = [[5, 6, 7], [8, 9, 1, 2]]
    Lp = 8

    def admit(pad_to):
        state = batching.SlotState.create(CFG, 4, jax.random.PRNGKey(3))
        group = list(enumerate(prompts))
        group = group + [group[-1]] * (pad_to - len(group))
        toks = np.zeros((pad_to, Lp), np.int32)
        lens = np.zeros((pad_to,), np.int32)
        slots = np.zeros((pad_to,), np.int32)
        for j, (slot, p) in enumerate(group):
            toks[j, Lp - len(p):] = p  # LEFT-padded (engine admission layout)
            lens[j] = len(p)
            slots[j] = slot
        return batching.prefill_slots(
            CFG, scfg, EOS, params, state,
            jnp.asarray(toks), jnp.asarray(lens), jnp.asarray(slots),
        )

    plain = admit(2)
    padded = admit(4)
    np.testing.assert_array_equal(np.asarray(plain.token), np.asarray(padded.token))
    np.testing.assert_array_equal(np.asarray(plain.lens), np.asarray(padded.lens))
    np.testing.assert_array_equal(
        np.asarray(plain.cache.k[:, :2]), np.asarray(padded.cache.k[:, :2])
    )


def test_staged_decode_matches_scatter_path(params, monkeypatch):
    """The segment-staged decode (TPU serving path: lockstep staging writes +
    staged flash kernel + Pallas reconcile, run here in interpret mode) must
    produce the same greedy tokens, lens, and reconciled cache contents as
    the direct-scatter path."""
    import functools

    from neutts_tpu.ops import attention as attn
    from neutts_tpu.runtime import batching

    cfg8 = CFG.scaled(kv_dtype="int8")
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    S = 8
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [2, 7, 1, 8, 2, 8], [5]]
    Lp = 8  # mult of SEGMENT_ALIGN (test-sized bucket)

    def admit(state):
        toks = np.zeros((len(prompts), Lp), np.int32)
        lens = np.zeros((len(prompts),), np.int32)
        for j, p in enumerate(prompts):
            toks[j, Lp - len(p):] = p
            lens[j] = len(p)
        return batching.prefill_slots(
            cfg8, scfg, EOS, params, state,
            jnp.asarray(toks), jnp.asarray(lens),
            jnp.arange(len(prompts), dtype=jnp.int32),
        )

    sA = admit(batching.SlotState.create(cfg8, 4, jax.random.PRNGKey(3)))
    sB = admit(batching.SlotState.create(cfg8, 4, jax.random.PRNGKey(3)))

    monkeypatch.setattr(
        attn, "decode_attention_staged",
        functools.partial(attn.decode_attention_staged, interpret=True,
                          row_block=4),
    )
    monkeypatch.setattr(
        attn, "reconcile_segment",
        functools.partial(attn.reconcile_segment, interpret=True,
                          row_block=4),
    )
    # two segments: the second exercises bases advanced by +S
    for _ in range(2):
        sA, outA = batching._decode_steps_staged(
            cfg8, scfg, EOS, S, params, sA)
        sB, outB = batching._decode_steps_scatter(
            cfg8, scfg, EOS, S, params, sB)
        np.testing.assert_array_equal(np.asarray(outA), np.asarray(outB))
    np.testing.assert_array_equal(np.asarray(sA.lens), np.asarray(sB.lens))
    np.testing.assert_array_equal(np.asarray(sA.active), np.asarray(sB.active))
    # prompt region untouched by decode: bit-exact
    np.testing.assert_array_equal(
        np.asarray(sA.cache.k[:, :, :Lp]), np.asarray(sB.cache.k[:, :, :Lp]))
    # decoded region: the staged kernel's probability dot runs in bf16 (the
    # scatter path's XLA oracle in f32), so K/V bytes can round one LSB
    # apart — compare DEQUANTIZED values. A reconcile placement bug would
    # put entirely different vectors here, far outside this tolerance.
    lens = np.asarray(sA.lens)
    for b in range(len(prompts)):
        n = int(lens[b])
        for cache, scale in (("k", "k_scale"), ("v", "v_scale")):
            da = np.asarray(getattr(sA.cache, cache)[:, b, :n], np.float32) * \
                np.asarray(getattr(sA.cache, scale)[:, b, :n])[..., None]
            db = np.asarray(getattr(sB.cache, cache)[:, b, :n], np.float32) * \
                np.asarray(getattr(sB.cache, scale)[:, b, :n])[..., None]
            np.testing.assert_allclose(da, db, atol=0.15, rtol=0.05)


def test_multichip_engine_matches_single(params):
    """Replica-per-device serving over the virtual CPU devices: every
    request's greedy output must match the lockstep oracle, and work must
    actually spread across replicas."""
    from neutts_tpu.serving.multichip import MultiChipEngine

    devices = jax.devices()[:4]
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    eng = MultiChipEngine(
        CFG, params, eos_id=EOS, n_slots=2, devices=devices,
        sampling=scfg, segment_steps=8,
    )
    assert eng.n_replicas == 4
    prompts = [[3 + i, 7, 2, 9] for i in range(10)]
    rids = [eng.submit(p, max_new=12) for p in prompts]
    results = eng.run()
    assert set(results) == set(rids)
    for rid, prompt in zip(rids, prompts):
        assert results[rid] == lockstep_greedy(params, prompt, 12), rid
    used = {i for (i, _) in eng._route.values()}
    assert len(used) >= 3, used  # requests spread over replicas


def test_constrained_sampling_stays_in_speech_range(params):
    """speech_range constraint (ops/sampling.py): every generated token from
    a random-init model must be a speech code or nothing (EOS escape)."""
    lay = CFG.layout
    scfg = config.SamplingConfig(min_new_tokens=1, top_k=50).constrained_to(lay)
    eng = Engine(CFG, params, eos_id=EOS, n_slots=2, sampling=scfg, segment_steps=8)
    rids = [eng.submit([3, 1, 4, 1, 5], max_new=40), eng.submit([2, 7, 1], max_new=40)]
    results = eng.run()
    n_tokens = 0
    for rid in rids:
        for t in results[rid]:
            assert lay.speech_base <= t < lay.vocab_size, t
            n_tokens += 1
    assert n_tokens > 0  # random logits + top-50 must yield in-range picks


def test_cache_slack_covers_worst_pad_plus_segment():
    """ADVICE r1 (medium): the physical-headroom bound must never bind before
    the reference max_length semantics — slack >= worst left-pad + segment."""
    from neutts_tpu.ops.attention import SEG_PAD
    from neutts_tpu.runtime import batching
    from neutts_tpu.runtime.decode import PROMPT_BUCKETS

    gaps = [b - a for a, b in zip((0,) + PROMPT_BUCKETS[:-1], PROMPT_BUCKETS)]
    assert batching.CACHE_SLACK >= max(gaps) - 1 + SEG_PAD


def test_no_silent_truncation_with_large_bucket_pad(params, monkeypatch):
    """Regression for ADVICE r1 (medium): a prompt whose bucket left-pad is
    large must still be able to generate up to max_context - len(prompt)
    tokens; the old CACHE_SLACK=256 force-EOS'd the row early and returned a
    silently truncated result."""
    from neutts_tpu.serving import engine as eng_mod

    # buckets with a gap of 384 at TINY scale: a 130-token prompt pads to 512
    monkeypatch.setattr(
        eng_mod, "bucket_length", lambda n: 128 if n <= 128 else 512
    )
    scfg = config.SamplingConfig(min_new_tokens=10_000, top_k=50)  # EOS suppressed
    eng = Engine(CFG, params, eos_id=EOS, n_slots=1, sampling=scfg, segment_steps=8)
    prompt = [(i * 7) % 300 for i in range(130)]
    cap = CFG.max_context - len(prompt)  # 382: reference max_length semantics
    rid = eng.submit(prompt, max_new=cap)
    results = eng.run()
    assert len(results[rid]) == cap, (len(results[rid]), cap)


def test_pallas_prefill_write_matches_xla_scatter(params, monkeypatch):
    """The Pallas admission-group cache write (scatter_prefill: one DMA per
    row, replaces the per-layer XLA scatter) must land exactly the same
    bytes: K/V, scales, and untouched neighbor slots. Runs the kernel in
    interpret mode on a 128-aligned bucket (the production invariant)."""
    import functools

    from neutts_tpu.models import backbone as bbm
    from neutts_tpu.ops import attention as attn
    from neutts_tpu.runtime import batching

    cfg8 = CFG.scaled(kv_dtype="int8")
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    Lp, G = 128, 4
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [2, 7, 1, 8], [11]]
    toks = np.zeros((G, Lp), np.int32)
    lens = np.zeros((G,), np.int32)
    for j, p in enumerate(prompts):
        toks[j, Lp - len(p):] = p
        lens[j] = len(p)
    # slots 1,3,5,7 of 8 — the even slots must stay untouched; include a
    # duplicated final admission (engine group padding) in a second call
    slots = np.asarray([1, 3, 5, 7], np.int32)

    def admit(force_pallas):
        if force_pallas:
            monkeypatch.setattr(bbm, "use_pallas_attention",
                                lambda cfg=None: True)
            monkeypatch.setattr(
                attn, "scatter_prefill",
                functools.partial(attn.scatter_prefill, interpret=True),
            )
        else:
            monkeypatch.setattr(bbm, "use_pallas_attention",
                                lambda cfg=None: False)
        state = batching.SlotState.create(cfg8, 8, jax.random.PRNGKey(3))
        return batching.prefill_slots(
            cfg8, scfg, EOS, params, state,
            jnp.asarray(toks), jnp.asarray(lens), jnp.asarray(slots),
        )

    sA = admit(True)
    sB = admit(False)
    np.testing.assert_array_equal(np.asarray(sA.token), np.asarray(sB.token))
    np.testing.assert_array_equal(np.asarray(sA.lens), np.asarray(sB.lens))
    np.testing.assert_array_equal(
        np.asarray(sA.cache.k), np.asarray(sB.cache.k))
    np.testing.assert_array_equal(
        np.asarray(sA.cache.v), np.asarray(sB.cache.v))
    np.testing.assert_array_equal(
        np.asarray(sA.cache.k_scale), np.asarray(sB.cache.k_scale))
    np.testing.assert_array_equal(
        np.asarray(sA.cache.v_scale), np.asarray(sB.cache.v_scale))


def test_pallas_prefill_write_duplicate_slots(params, monkeypatch):
    """Engine group padding repeats the last admission: duplicate slot
    indices must write the row exactly once (primary-occurrence gating)."""
    import functools

    from neutts_tpu.models import backbone as bbm
    from neutts_tpu.ops import attention as attn
    from neutts_tpu.runtime import batching

    cfg8 = CFG.scaled(kv_dtype="int8")
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    Lp, G = 128, 4
    toks = np.zeros((G, Lp), np.int32)
    toks[:2, Lp - 3:] = [5, 6, 7]
    toks[2:, Lp - 2:] = [8, 9]  # rows 2,3 identical (padded duplicates)
    lens = np.asarray([3, 3, 2, 2], np.int32)
    toks[1, Lp - 3:] = [5, 6, 7]
    slots = np.asarray([0, 2, 4, 4], np.int32)  # duplicate slot 4

    monkeypatch.setattr(bbm, "use_pallas_attention", lambda cfg=None: True)
    monkeypatch.setattr(
        attn, "scatter_prefill",
        functools.partial(attn.scatter_prefill, interpret=True),
    )
    state = batching.SlotState.create(cfg8, 6, jax.random.PRNGKey(3))
    s = batching.prefill_slots(
        cfg8, scfg, EOS, params, state,
        jnp.asarray(toks), jnp.asarray(lens), jnp.asarray(slots),
    )
    # slot 4 got the duplicated row's data; slots 1,3,5 untouched (zero-init)
    assert np.asarray(s.lens)[4] == Lp
    assert np.any(np.asarray(s.cache.k[:, 4, :Lp]) != 0)
    for empty in (1, 3, 5):
        np.testing.assert_array_equal(np.asarray(s.cache.k[:, empty]), 0)


def test_speech_head_matches_constrained_full_vocab():
    """The pre-sliced speech-head decode (backbone.add_speech_head +
    sample_step_speech) must emit exactly the tokens of the full-vocab path
    with constrain_to_speech masking — same distribution family, 3.3x less
    head work. Greedy pins token-for-token equality through prefill_init,
    decode_segment, and the serving Engine."""
    import jax

    from neutts_tpu import config
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.runtime import decode as dec
    from neutts_tpu.serving.engine import Engine

    cfg = config.TINY.scaled(kv_dtype="float32")
    lay = cfg.layout
    params = bb.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    scfg = config.SamplingConfig(
        greedy=True, min_new_tokens=3
    ).constrained_to(lay)
    eos = lay.speech_gen_end
    prompts = [[lay.speech_base + i, lay.speech_base + 5, 7] for i in range(3)]
    toks, lens = dec.pad_prompts(prompts, pad_id=0, bucket=128)

    def run(p):
        state, first = dec.prefill_init(
            cfg, scfg, eos, p, toks, lens, jax.random.PRNGKey(0)
        )
        state, seg = dec.decode_segment(cfg, scfg, eos, 24, p, state)
        return np.asarray(first), np.asarray(seg)

    f_full, s_full = run(params)  # no speech head attached -> full path
    p_speech = bb.add_speech_head(cfg, params)
    f_sp, s_sp = run(p_speech)
    np.testing.assert_array_equal(f_sp, f_full)
    np.testing.assert_array_equal(s_sp, s_full)
    # every emitted token is EOS or a speech code
    assert ((s_sp == eos) | (s_sp >= lay.speech_base)).all()

    # Engine attaches the head automatically when sampling is constrained
    eng = Engine(cfg, params, eos_id=eos, n_slots=2, sampling=scfg,
                 segment_steps=8)
    assert "lm_head_speech" in eng.params
    rids = [eng.submit(p, max_new=20) for p in prompts]
    results = eng.run()
    eng2 = Engine(cfg, params, eos_id=eos, n_slots=2,
                  sampling=config.SamplingConfig(greedy=True, min_new_tokens=3),
                  segment_steps=8)
    rids2 = [eng2.submit(p, max_new=20) for p in prompts]
    res2 = eng2.run()
    # unconstrained greedy may differ when argmax is off-range; constrained
    # greedy equals it whenever the argmax was already a speech token
    for r, r2 in zip(rids, rids2):
        assert len(results[r]) > 0
        assert all(t == eos or t >= lay.speech_base for t in results[r])


def test_predictive_retirement_caps_frees_at_queue_depth(params):
    """ADVICE r3: when more slots become budget-complete than there are
    queued requests, only queue-depth slots may be predictively freed — a
    freed-but-unadmitted slot is never passed to retire_slots and its
    device row would keep decoding discarded tokens (miscounted as empty).
    With the cap, the surplus completers retire through the normal path and
    the empty-slot counter stays at the structural tail only."""
    scfg = config.SamplingConfig(min_new_tokens=64)
    eng = Engine(CFG, params, eos_id=EOS, n_slots=4, sampling=scfg,
                 segment_steps=8)
    rng = np.random.default_rng(0)
    prompts = [
        (rng.integers(0, 50, size=12) + CFG.layout.speech_base).tolist()
        for _ in range(5)
    ]
    # 4 synchronized requests fill all slots; ONE queued request means the
    # predictive tick may free at most 1 of the 4 completers
    for p in prompts[:4]:
        eng.submit(p, max_new=17)
    eng.submit(prompts[4], max_new=9)
    res = eng.run(pipelined=True)
    assert sorted(len(t) for t in res.values()) == [9, 17, 17, 17, 17]
    s = eng.stats
    # pre-fix, the 3 orphaned slots rode every later segment as "empty";
    # post-fix only the tail segments where the queue has drained (the
    # 5th request finishing alone) contribute empties
    disp = s["dispatched_token_slots"]
    assert s["useful_tokens"] == 9 + 4 * 17
    assert s["empty_token_slots"] <= disp // 2, s


def test_staged_decode_matches_scatter_path_int4(params, monkeypatch):
    """int4 segment-staged decode (r5: unpacked staging + packed reconcile at
    16-token-aligned byte offsets) must match the int4 direct-scatter path
    EXACTLY — tokens, lens, and every reconciled cache byte/scale.

    The staged ATTENTION is swapped for its exact XLA oracle here so the
    comparison pins the staging/reconcile machinery bit-for-bit (the bf16
    Pallas kernel itself is pinned against the same oracle in
    tests/test_attention.py::test_staged_int4_matches_oracle; its ~1e-3
    output noise flips greedy argmax on this random-init TINY model, which
    is sampling sensitivity, not a placement bug). reconcile_segment4 DOES
    run its real Pallas DMA path (interpret mode) — a wrong byte offset or
    scale deinterleave shows up as exact-compare failures below."""
    import functools

    from neutts_tpu.ops import attention as attn
    from neutts_tpu.runtime import batching

    cfg4 = CFG.scaled(kv_dtype="int4")
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    S = 16  # SEGMENT_ALIGN_INT4
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [2, 7, 1, 8, 2, 8], [5]]
    Lp = 16

    def admit(state):
        toks = np.zeros((len(prompts), Lp), np.int32)
        lens = np.zeros((len(prompts),), np.int32)
        for j, p in enumerate(prompts):
            toks[j, Lp - len(p):] = p
            lens[j] = len(p)
        return batching.prefill_slots(
            cfg4, scfg, EOS, params, state,
            jnp.asarray(toks), jnp.asarray(lens),
            jnp.arange(len(prompts), dtype=jnp.int32),
        )

    sA = admit(batching.SlotState.create(cfg4, 4, jax.random.PRNGKey(3)))
    sB = admit(batching.SlotState.create(cfg4, 4, jax.random.PRNGKey(3)))

    def staged_oracle(q, all_k, all_v, ks, vs, sk, sv, sks, svs,
                      layer, step, base, pad, **kw):
        return attn.decode_attention_staged_xla(
            q, all_k, all_v, ks, vs, sk, sv, sks, svs, layer, step, base, pad)

    monkeypatch.setattr(attn, "decode_attention_staged", staged_oracle)
    monkeypatch.setattr(
        attn, "reconcile_segment4",
        functools.partial(attn.reconcile_segment4, interpret=True,
                          row_block=4),
    )
    for _ in range(2):
        sA, outA = batching._decode_steps_staged(
            cfg4, scfg, EOS, S, params, sA)
        sB, outB = batching._decode_steps_scatter(
            cfg4, scfg, EOS, S, params, sB)
        np.testing.assert_array_equal(np.asarray(outA), np.asarray(outB))
    np.testing.assert_array_equal(np.asarray(sA.lens), np.asarray(sB.lens))
    np.testing.assert_array_equal(np.asarray(sA.active), np.asarray(sB.active))
    # prompt byte region untouched by decode: bit-exact
    np.testing.assert_array_equal(
        np.asarray(sA.cache.k[:, :, :Lp // 2]),
        np.asarray(sB.cache.k[:, :, :Lp // 2]))
    # Decoded region: the two attention oracles reduce in different orders
    # (concat [T+S] vs whole [T]), so hidden states differ by f32 ulps —
    # scales inherit ~1e-7 rel noise and a quantizer tie can flip a nibble
    # by one step. A reconcile PLACEMENT bug puts unrelated vectors (or
    # stale zeros) here — far outside these bounds.
    lens = np.asarray(sA.lens)
    half = sA.cache.k_scale.shape[2] // 2
    for b in range(len(prompts)):
        nb = int(lens[b]) // 2  # complete bytes
        for field in ("k", "v"):
            a = np.asarray(getattr(sA.cache, field)[:, b, :nb]).astype(np.int32)
            c = np.asarray(getattr(sB.cache, field)[:, b, :nb]).astype(np.int32)
            lo_a, hi_a = a - 16 * ((a + 8) >> 4), (a + 8) >> 4
            lo_c, hi_c = c - 16 * ((c + 8) >> 4), (c + 8) >> 4
            assert np.max(np.abs(lo_a - lo_c)) <= 1, f"{field} lo row {b}"
            assert np.max(np.abs(hi_a - hi_c)) <= 1, f"{field} hi row {b}"
        ne, no = (int(lens[b]) + 1) // 2, int(lens[b]) // 2
        for field in ("k_scale", "v_scale"):
            a = np.asarray(getattr(sA.cache, field)[:, b])
            c = np.asarray(getattr(sB.cache, field)[:, b])
            np.testing.assert_allclose(a[:, :ne], c[:, :ne], rtol=1e-5,
                                       err_msg=f"{field} even row {b}")
            np.testing.assert_allclose(a[:, half:half + no],
                                       c[:, half:half + no], rtol=1e-5,
                                       err_msg=f"{field} odd row {b}")


def test_pallas_prefill_write_matches_xla_scatter_int4(params, monkeypatch):
    """int4 Pallas admission write (scatter_prefill4: packed-byte DMA +
    deinterleaved scale fold) must land the same bytes as the XLA scatter
    admission path (r4 gap: int4 admission was XLA-only)."""
    import functools

    from neutts_tpu.models import backbone as bbm
    from neutts_tpu.ops import attention as attn
    from neutts_tpu.runtime import batching

    cfg4 = CFG.scaled(kv_dtype="int4")
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    Lp, G = 128, 4
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [2, 7, 1, 8], [11]]
    toks = np.zeros((G, Lp), np.int32)
    lens = np.zeros((G,), np.int32)
    for j, p in enumerate(prompts):
        toks[j, Lp - len(p):] = p
        lens[j] = len(p)
    slots = np.asarray([1, 3, 5, 7], np.int32)

    def admit(force_pallas):
        if force_pallas:
            monkeypatch.setattr(bbm, "use_pallas_attention",
                                lambda cfg=None: True)
            monkeypatch.setattr(
                attn, "scatter_prefill4",
                functools.partial(attn.scatter_prefill4, interpret=True),
            )
        else:
            monkeypatch.setattr(bbm, "use_pallas_attention",
                                lambda cfg=None: False)
        state = batching.SlotState.create(cfg4, 8, jax.random.PRNGKey(3))
        return batching.prefill_slots(
            cfg4, scfg, EOS, params, state,
            jnp.asarray(toks), jnp.asarray(lens), jnp.asarray(slots),
        )

    sA = admit(True)
    sB = admit(False)
    np.testing.assert_array_equal(np.asarray(sA.token), np.asarray(sB.token))
    np.testing.assert_array_equal(np.asarray(sA.lens), np.asarray(sB.lens))
    for field in ("k", "v", "k_scale", "v_scale", "k_prev", "v_prev"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sA.cache, field)),
            np.asarray(getattr(sB.cache, field)), err_msg=field)


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_engine_randomized_workloads_match_lockstep(params, seed):
    """Property test over random workload shapes: any mix of prompt
    lengths, budgets, slot counts, and segment sizes must reproduce the
    lockstep oracle per request — exercising admission grouping, predictive
    retirement, pipelined collection, and slot reuse paths together."""
    rng = np.random.default_rng(seed)
    n_slots = int(rng.integers(1, 5))
    segment = int(rng.choice([8, 16]))
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    eng = Engine(CFG, params, eos_id=EOS, n_slots=n_slots, sampling=scfg,
                 segment_steps=segment)
    n_req = int(rng.integers(3, 9))
    prompts = [
        [int(t) for t in rng.integers(1, 300, size=int(rng.integers(1, 90)))]
        for _ in range(n_req)
    ]
    budgets = [int(rng.integers(1, 40)) for _ in range(n_req)]
    rids = [eng.submit(p, max_new=b) for p, b in zip(prompts, budgets)]
    results = eng.run()
    assert set(results) == set(rids)
    for rid, p, b in zip(rids, prompts, budgets):
        want = lockstep_greedy(params, p, b)
        assert results[rid] == want, (seed, rid, results[rid][:6], want[:6])
