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
    np.testing.assert_allclose(got, want, atol=2e-6)  # jit-vs-eager fp drift


@pytest.mark.parametrize("backbone", ["transformer", "convnext"])
def test_masked_decode_ulp_exact(backbone):
    """Length-masked decode at a padded bucket must match the unpadded decode
    on valid samples to float32 ULP (pad frames contribute exact zeros; the
    residual ~1e-7 rel difference is shape-dependent XLA fusion reordering,
    measured 1.5e-8 convnext / 1.0e-7 transformer — what makes bucketed
    ExactVocoder legitimately 'exact')."""
    cfgb = CFG.scaled(dec_backbone=backbone)
    p = cd.init_params(cfgb, jax.random.PRNGKey(5))
    rng = np.random.default_rng(6)
    for n, nb in [(7, 32), (73, 128), (100, 128)]:
        codes = rng.integers(0, 65_536, size=n).astype(np.int32)
        want = np.asarray(jax.jit(cd.decode, static_argnums=0)(
            cfgb, p, jnp.asarray(codes)[None])[0])
        padded = np.zeros(nb, np.int32)
        padded[:n] = codes
        got = np.asarray(
            jax.jit(cd.decode, static_argnums=0)(
                cfgb, p, jnp.asarray(padded)[None], jnp.int32(n)
            )[0, : n * cfgb.hop_out]
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_exact_vocoder_compile_churn_bounded(params):
    """100 random-length utterances must trigger <= 3 vocoder compiles
    (r2 VERDICT #6: serving-shaped workloads previously compiled per length)."""
    voc = ExactVocoder(CFG, params)
    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(20, 500))
        wav = voc(rng.integers(0, 65_536, size=n).astype(np.int32))
        assert wav.shape == (n * CFG.hop_out,)
    assert voc._decode_masked._cache_size() <= 3
    assert not voc._fns  # per-length path never used with buckets on


def test_chunked_matches_window_oracle(params):
    """ChunkedVocoder must exactly implement the reference streaming window
    semantics (reference neutts/neutts.py:407-429): per-window decode of
    [lookback+overlap | chunk | lookforward+overlap], emit
    [lb, lb+chunk+2*overlap), linear overlap-add at stride chunk*hop."""
    from neutts_tpu.audio.overlap_add import linear_overlap_add

    s = config.STREAMING
    voc_c = ChunkedVocoder(CFG, params)
    rng = np.random.default_rng(1)
    for n in [25, 60, 137]:
        codes = rng.integers(0, 65_536, size=n).astype(np.int32)
        chunked = voc_c(codes)
        assert chunked.shape == (n * 480,)

        lb = s.lookback + s.overlap_frames
        chunk = s.frames_per_chunk
        n_chunks = max(1, -(-n // chunk))
        padded = np.concatenate([
            np.zeros(lb, np.int32), codes,
            np.full(n_chunks * chunk - n + s.lookforward + s.overlap_frames,
                    codes[-1], np.int32),
        ])
        frames = []
        for i in range(n_chunks):
            win = padded[i * chunk : i * chunk + voc_c.window]
            wav = np.asarray(cd.decode(CFG, params, jnp.asarray(win)[None])[0])
            emit = chunk + 2 * s.overlap_frames
            frames.append(wav[lb * 480 : (lb + emit) * 480])
        want = linear_overlap_add(frames, stride=s.stride_samples)[: n * 480]
        np.testing.assert_allclose(chunked, want, atol=2e-6)


def test_chunked_seam_free_when_receptive_field_fits(params):
    """With a conv backbone (finite receptive field) and windows sized past
    that field, the chunked mode must reproduce the full decode on interior
    samples — the property the reference's window geometry is built on. (The
    transformer backbone has global attention, so its windowed streaming is
    approximate-by-design, exactly like the reference's own streaming mode.)"""
    cfgc = CFG.scaled(dec_backbone="convnext")
    pc = cd.init_params(cfgc, jax.random.PRNGKey(3))
    # RF: embed k7 (+-3) + 2 convnext k7 blocks (+-3 each) + istft smear
    # (n_fft-hop)/2/hop = 1.5 -> +-10.5 frames; use lookback/forward 16
    s = config.StreamingConfig(lookback=16, lookforward=16)
    voc_e = ExactVocoder(cfgc, pc)
    voc_c = ChunkedVocoder(cfgc, pc, streaming=s)
    rng = np.random.default_rng(4)
    n = 137
    codes = rng.integers(0, 65_536, size=n).astype(np.int32)
    exact = voc_e(codes)
    chunked = voc_c(codes)
    # skip the zero-warmed head and fabricated tail windows
    a, b = 20 * 480, (n - 20) * 480
    np.testing.assert_allclose(chunked[a:b], exact[a:b], atol=1e-4)


def test_chunked_single_compile(params):
    """Different lengths must not trigger new XLA compiles of the decoder."""
    voc = ChunkedVocoder(CFG, params)
    rng = np.random.default_rng(2)
    voc(rng.integers(0, 65_536, size=30).astype(np.int32))
    compiled_sizes = set()
    real_jit = voc._decode

    calls = []
    def spy(cfg_, params_, arr):
        calls.append(arr.shape)
        return real_jit(cfg_, params_, arr)

    voc._decode = spy
    for n in [26, 51, 77, 103]:
        voc(rng.integers(0, 65_536, size=n).astype(np.int32))
    # all batches hit the same window width; batch dims come from one bucket list
    widths = {s[1] for s in calls}
    assert widths == {voc.window}
    batches = {s[0] for s in calls}
    assert batches.issubset(set(voc.buckets))
