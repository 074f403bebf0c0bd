"""Vocoder runtime: exact mode bit-matches codec.decode; chunked mode matches
to receptive-field tolerance and is compile-stable across lengths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutts_tpu import config
from neutts_tpu.models import codec as cd
from neutts_tpu.runtime.vocoder import ChunkedVocoder, ExactVocoder

CFG = config.CODEC_TINY


@pytest.fixture(scope="module")
def params():
    return cd.init_params(CFG, jax.random.PRNGKey(0))


def test_exact_matches_codec(params):
    voc = ExactVocoder(CFG, params)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 65_536, size=73).astype(np.int32)
    want = np.asarray(cd.decode(CFG, params, jnp.asarray(codes)[None])[0])
    got = voc(codes)
    np.testing.assert_array_equal(got, want)


def test_chunked_matches_exact_interior(params):
    voc_e = ExactVocoder(CFG, params)
    voc_c = ChunkedVocoder(CFG, params)
    rng = np.random.default_rng(1)
    for n in [25, 60, 137, 372]:
        codes = rng.integers(0, 65_536, size=n).astype(np.int32)
        exact = voc_e(codes)
        chunked = voc_c(codes)
        assert chunked.shape == exact.shape == (n * 480,)
        # interior frames are sample-exact; only the zero-warmed first window
        # and the fabricated tail lookforward differ (the same approximation
        # the reference's own streaming mode makes vs its batch mode,
        # neutts/neutts.py:407-429)
        a, b = 8 * 480, max((n - 8) * 480, 8 * 480)
        if b > a:
            d = np.abs(chunked[a:b] - exact[a:b]).max()
            assert d < 1e-4, (n, d)
        assert np.abs(chunked - exact).max() < 0.2  # bounded at boundaries


def test_chunked_single_compile(params):
    """Different lengths must not trigger new XLA compiles of the decoder."""
    voc = ChunkedVocoder(CFG, params)
    rng = np.random.default_rng(2)
    voc(rng.integers(0, 65_536, size=30).astype(np.int32))
    compiled_sizes = set()
    real_jit = voc._decode

    calls = []
    def spy(arr):
        calls.append(arr.shape)
        return real_jit(arr)

    voc._decode = spy
    for n in [26, 51, 77, 103]:
        voc(rng.integers(0, 65_536, size=n).astype(np.int32))
    # all batches hit the same window width; batch dims come from one bucket list
    widths = {s[1] for s in calls}
    assert widths == {voc.window}
    batches = {s[0] for s in calls}
    assert batches.issubset(set(voc.buckets))
