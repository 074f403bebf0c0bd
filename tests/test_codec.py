"""Codec unit tests: FSQ exactness, shape invariants, receptive field bounds.

The reference pins only the codec's surface (50 Hz, 65,536 codes, 16 kHz in /
24 kHz out — SURVEY.md §0); these tests pin our implementation to that surface
plus the streaming-window contract (reference neutts/neutts.py:86-91).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutts_tpu import config
from neutts_tpu.models import codec as cd

CFG = config.CODEC_TINY


@pytest.fixture(scope="module")
def params():
    return cd.init_params(CFG, jax.random.PRNGKey(0))


def test_fsq_roundtrip_exact():
    """digits -> code -> digits is bit-exact over the whole 65,536 codebook."""
    levels = config.CODEC.fsq_levels
    codes = jnp.arange(65_536, dtype=jnp.int32)
    digits = cd.code_to_digits(codes, levels)
    back = cd.digits_to_code(digits, levels)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))
    assert int(digits.max()) == 3 and int(digits.min()) == 0


def test_fsq_quantize_dequantize_stable():
    """quantize(dequantize(d)) == d for every digit value."""
    levels = (4, 4, 4, 4, 4, 4, 4, 4)
    digits = cd.code_to_digits(jnp.arange(256, dtype=jnp.int32), levels)
    z = cd.fsq_dequantize(digits, levels)
    again = cd.fsq_quantize(z, levels)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(digits))


def test_encode_shapes(params):
    """floor(T/320) codes — 372 codes for dave's 119,157 16-kHz samples
    (matches the shipped dave.pt; SURVEY.md §0)."""
    for t in [320, 321, 639, 16000, 208_960]:
        wav = jnp.zeros((1, t), jnp.float32)
        codes = cd.encode(CFG, params, wav)
        assert codes.shape == (1, t // 320), (t, codes.shape)
    assert cd.encode(CFG, params, jnp.zeros((1, 119_157))).shape == (1, 372)


def test_decode_shapes(params):
    """N codes -> exactly N*480 samples @24 kHz (hop 480, neutts.py:86)."""
    for n in [1, 25, 81]:
        codes = jnp.zeros((1, n), jnp.int32)
        wav = cd.decode(CFG, params, codes)
        assert wav.shape == (1, n * 480)
        w = np.asarray(wav)
        assert np.isfinite(w).all() and np.abs(w).max() <= 1.0


def test_code_range(params):
    wav = jax.random.uniform(jax.random.PRNGKey(1), (2, 6400), minval=-1, maxval=1)
    codes = np.asarray(cd.encode(CFG, params, wav))
    assert codes.min() >= 0 and codes.max() < 65_536
    assert codes.dtype == np.int32


def test_decoder_receptive_field_fits_streaming_windows(params):
    """Perturbing a code must not affect samples further than the streaming
    lookback/lookforward windows away (50 past / 5 future frames)."""
    rng = np.random.default_rng(0)
    n = 120
    codes = jnp.asarray(rng.integers(0, 65_536, size=(1, n)), jnp.int32)
    base = np.asarray(cd.decode(CFG, params, codes))
    mid = 60
    codes2 = codes.at[0, mid].set((int(codes[0, mid]) + 17) % 65_536)
    pert = np.asarray(cd.decode(CFG, params, codes2))
    diff = np.abs(base - pert)[0]
    changed = np.nonzero(diff > 1e-7)[0]
    assert changed.size > 0  # the code must matter at all
    lo_frame = changed.min() // 480
    hi_frame = changed.max() // 480
    # future side: outputs BEFORE the perturbed frame that change = lookforward need
    assert mid - lo_frame <= config.STREAMING.lookforward, (lo_frame, mid)
    # past side: outputs AFTER the perturbed frame that change = lookback need
    assert hi_frame - mid <= config.STREAMING.lookback, (hi_frame, mid)


def test_chunked_decode_matches_full(params):
    """Decoding with the reference streaming windows reproduces the full
    decode on interior chunks (the seam contract behind infer_stream,
    reference neutts/neutts.py:407-429)."""
    s = config.STREAMING
    rng = np.random.default_rng(1)
    n = 110
    codes = np.asarray(rng.integers(0, 65_536, size=(1, n)), np.int32)
    full = np.asarray(cd.decode(CFG, params, jnp.asarray(codes)))

    # interior chunk starting at frame 55
    start = 55
    lo = start - s.lookback
    hi = start + s.frames_per_chunk + s.lookforward
    window = jnp.asarray(codes[:, lo:hi])
    part = np.asarray(cd.decode(CFG, params, window))
    got = part[:, (start - lo) * 480 : (start - lo + s.frames_per_chunk) * 480]
    want = full[:, start * 480 : (start + s.frames_per_chunk) * 480]
    np.testing.assert_allclose(got, want, atol=2e-5)
