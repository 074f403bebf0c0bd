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
