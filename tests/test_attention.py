"""Pallas flash-decode attention vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutts_tpu.ops import attention as attn


def _mk(B, K, G, T, D, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, K, G, D), dtype)
    ck = jax.random.normal(ks[1], (B, T, K * D), dtype)
    cv = jax.random.normal(ks[2], (B, T, K * D), dtype)
    return q, ck, cv


@pytest.mark.parametrize("lens_pad", [
    ([512, 512], [0, 0]),
    ([513, 100], [0, 3]),        # cross block boundary + ragged
    ([1024, 7], [5, 0]),          # full blocks + tiny row
    ([1, 1], [0, 0]),             # single-slot attention
])
def test_matches_xla_oracle(lens_pad):
    B, K, G, T, D = 2, 2, 7, 1024, 64
    q, ck, cv = _mk(B, K, G, T, D)
    lens = jnp.asarray(lens_pad[0], jnp.int32)
    pad = jnp.asarray(lens_pad[1], jnp.int32)
    want = attn.decode_attention_xla(q, ck, cv, lens, pad)
    got = attn.decode_attention(q, ck, cv, lens, pad, block_t=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_dynamic_trip_count_ignores_tail():
    """Garbage beyond lens must not affect the output (the kernel should not
    even read it, but correctness is what we can assert portably)."""
    B, K, G, T, D = 1, 2, 7, 512, 64
    q, ck, cv = _mk(B, K, G, T, D)
    lens = jnp.asarray([100], jnp.int32)
    pad = jnp.asarray([0], jnp.int32)
    base = attn.decode_attention(q, ck, cv, lens, pad, block_t=128, interpret=True)
    ck2 = ck.at[:, 200:, :].set(1e6)
    cv2 = cv.at[:, 200:, :].set(-1e6)
    got = attn.decode_attention(q, ck2, cv2, lens, pad, block_t=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=1e-6)


def test_bf16_cache():
    B, K, G, T, D = 2, 2, 7, 512, 64
    q, ck, cv = _mk(B, K, G, T, D, dtype=jnp.bfloat16)
    lens = jnp.asarray([300, 512], jnp.int32)
    pad = jnp.asarray([0, 2], jnp.int32)
    want = attn.decode_attention_xla(q, ck, cv, lens, pad)
    got = attn.decode_attention(q, ck, cv, lens, pad, block_t=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_int8_quantized_matches_dequantized_oracle():
    """int8 kernel path vs XLA on the dequantized cache."""
    from neutts_tpu.models.backbone import quantize_kv

    B, K, G, T, D = 2, 2, 7, 512, 64
    q, ck, cv = _mk(B, K, G, T, D)
    kq, ks = quantize_kv(ck)  # [B, T, KD], [B, T]
    vq, vs = quantize_kv(cv)
    lens = jnp.asarray([300, 512], jnp.int32)
    pad = jnp.asarray([0, 2], jnp.int32)
    deq_k = kq.astype(jnp.float32) * ks[..., None]
    deq_v = vq.astype(jnp.float32) * vs[..., None]
    want = attn.decode_attention_xla(q, deq_k, deq_v, lens, pad)
    got = attn.decode_attention_stacked(
        q, kq[None], vq[None], jnp.int32(0), lens, pad,
        k_scale=ks[None], v_scale=vs[None], block_t=256, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_int8_cache_decode_consistency():
    """Full decode loop with int8 cache stays close to the bf16-cache loop."""
    import jax as _jax
    from neutts_tpu import config
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.runtime import decode as dec

    cfg16 = config.TINY
    cfg8 = config.TINY.scaled(kv_dtype="int8")
    params = bb.init_params(cfg16, _jax.random.PRNGKey(0), dtype=jnp.float32)
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=2)
    prompts = [[3, 1, 4, 1, 5, 9], [2, 7, 1, 8]]
    toks, lens = dec.pad_prompts(prompts, pad_id=0, bucket=16)
    eos = cfg16.layout.speech_gen_end
    r16 = dec.generate(cfg16, scfg, eos, 16, params, toks, lens, _jax.random.PRNGKey(1))
    r8 = dec.generate(cfg8, scfg, eos, 16, params, toks, lens, _jax.random.PRNGKey(1))
    a = [dec.extract(r16, i, eos) for i in range(2)]
    b = [dec.extract(r8, i, eos) for i in range(2)]
    # greedy paths may diverge after many steps on a random model; demand
    # agreement over a meaningful prefix
    for x, y in zip(a, b):
        n = min(len(x), len(y), 8)
        assert x[:n] == y[:n], (x, y)


def test_int4_quantized_matches_dequantized_oracle():
    """int4 (nibble-packed, arithmetic-coded) kernel path vs XLA on the
    dequantized cache."""
    from neutts_tpu.models import backbone as bb

    B, K, G, T, D = 2, 2, 7, 512, 64
    q, ck, cv = _mk(B, K, G, T, D)
    kq, ks = bb.quantize_kv4(ck)
    vq, vs = bb.quantize_kv4(cv)
    kp, vp = bb.pack4_pairs(kq), bb.pack4_pairs(vq)
    ksb, vsb = bb.scales4_block(ks), bb.scales4_block(vs)
    lens = jnp.asarray([300, 512], jnp.int32)
    pad = jnp.asarray([0, 2], jnp.int32)
    want = attn.decode_attention_xla(
        q, bb.dequant_kv4(kp, ksb), bb.dequant_kv4(vp, vsb), lens, pad)
    got = attn.decode_attention_stacked(
        q, kp[None], vp[None], jnp.int32(0), lens, pad,
        k_scale=ksb[None], v_scale=vsb[None], block_t=256, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("S,pads", [
    (256, (0, 3, 100, 255)),          # single q block
    (448, (0, 68, 132, 447)),         # the serving 448-token bucket
    (768, (0, 64, 700, 767)),         # multi q block (QB=384)
])
def test_prefill_attention_matches_dense(S, pads):
    """VMEM-resident prefill kernel == the dense masked-softmax path
    (with pad rows zeroed, matching the XLA flash path's valid-zeroing)."""
    from neutts_tpu.models import backbone as bb

    rng = np.random.default_rng(0)
    B, H, K, D = len(pads), 14, 2, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, K, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, K, D)), jnp.bfloat16)
    padv = jnp.asarray(pads, jnp.int32)
    idx = jnp.arange(S)
    mask = (idx[None, None, :] <= idx[None, :, None]) & (
        idx[None, None, :] >= padv[:, None, None]
    )
    valid = idx[None, :] >= padv[:, None]
    want = bb._attend_block_dense(q, k, v, mask)
    want = jnp.where(valid[:, :, None, None], want, 0)
    got = attn.prefill_attention(q, k, v, padv, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_staged_int4_matches_oracle():
    """int4 staged flash-decode (settled packed cache unpacked hi-only +
    unpacked int8 staging) vs the XLA oracle, across layers/steps/ragged
    bases. Pins the r5 int4 serving decode kernel."""
    import numpy as np

    from neutts_tpu.ops import attention as attn

    rng = np.random.default_rng(0)
    L, B, Tb, K, G, D = 2, 4, 512, 2, 2, 16
    KD = K * D
    T = 2 * Tb
    S = 16
    q = jnp.asarray(rng.normal(size=(B, K, G, D)), jnp.float32)
    all_k = jnp.asarray(rng.integers(-119, 120, (L, B, Tb, KD)), jnp.int8)
    all_v = jnp.asarray(rng.integers(-119, 120, (L, B, Tb, KD)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, T)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, T)), jnp.float32)
    sk = jnp.asarray(rng.integers(-7, 8, (L, B, S, KD)), jnp.int8)
    sv = jnp.asarray(rng.integers(-7, 8, (L, B, S, KD)), jnp.int8)
    sks = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, attn.SEG_PAD)), jnp.float32)
    svs = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, attn.SEG_PAD)), jnp.float32)
    base = jnp.asarray([16, 64, 272, 640], jnp.int32)
    pad = jnp.asarray([3, 0, 5, 1], jnp.int32)
    for layer in (0, 1):
        for step in (0, 7, 15):
            got = attn.decode_attention_staged(
                q, all_k, all_v, ks, vs, sk, sv, sks, svs,
                jnp.int32(layer), jnp.int32(step), base, pad,
                interpret=True, row_block=4)
            want = attn.decode_attention_staged_xla(
                q, all_k, all_v, ks, vs, sk, sv, sks, svs,
                layer, step, base, pad)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want, np.float32),
                atol=0.02, rtol=0.05)
