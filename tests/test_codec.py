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


def test_convnext_receptive_field_is_local(params):
    """The convnext backbone has a finite receptive field (embed k7 + L
    depthwise k7 blocks + the ISTFT window smear): perturbing a code must
    only move samples within that field. (The transformer backbone is global
    by construction — its windowed streaming is approximate-by-design,
    exactly like the reference streaming mode, neutts/neutts.py:407-429.)"""
    cfgc = CFG.scaled(dec_backbone="convnext")
    pc = cd.init_params(cfgc, jax.random.PRNGKey(2))
    rng = np.random.default_rng(0)
    n = 120
    codes = jnp.asarray(rng.integers(0, 65_536, size=(1, n)), jnp.int32)
    base = np.asarray(cd.decode(cfgc, pc, codes))
    mid = 60
    codes2 = codes.at[0, mid].set((int(codes[0, mid]) + 17) % 65_536)
    pert = np.asarray(cd.decode(cfgc, pc, codes2))
    diff = np.abs(base - pert)[0]
    changed = np.nonzero(diff > 1e-7)[0]
    assert changed.size > 0  # the code must matter at all
    lo_frame = changed.min() // 480
    hi_frame = changed.max() // 480
    # conv RF: +-3 (embed) + 2 * +-3 (blocks) + 2 (istft smear) = +-11 frames
    rf = 3 + cfgc.dec_layers * 3 + 2
    assert mid - lo_frame <= rf, (lo_frame, mid)
    assert hi_frame - mid <= rf, (hi_frame, mid)


def test_transformer_decode_deterministic_and_code_sensitive(params):
    """Transformer decode: deterministic across calls, every code matters."""
    rng = np.random.default_rng(1)
    codes = jnp.asarray(rng.integers(0, 65_536, size=(1, 40)), jnp.int32)
    a = np.asarray(cd.decode(CFG, params, codes))
    b = np.asarray(cd.decode(CFG, params, codes))
    np.testing.assert_array_equal(a, b)
    pert = codes.at[0, 20].set((int(codes[0, 20]) + 9) % 65_536)
    c = np.asarray(cd.decode(CFG, params, pert))
    assert np.abs(a - c).max() > 1e-6


def test_semantic_codec_checkpoint_roundtrip(tmp_path):
    """A full codec (semantic branch set) must survive save_pipeline /
    load_pipeline with cfg.semantic rehydrated as a SemanticConfig, and
    encode_reference must run on the reloaded pipeline (code-review catch:
    json round-trips the nested dataclass as a plain dict)."""
    import dataclasses

    from neutts_tpu import config as cfglib
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.models import checkpoint as ckpt
    from neutts_tpu.pipeline import NeuTTS

    sem = cfglib.SemanticConfig(
        input_dim=160, hidden=16, n_layers=1, n_heads=2, intermediate=32,
        conv_kernel=5, left_max=4, right_max=2, output_layer=1,
    )
    ccfg = cfglib.CODEC_TINY.scaled(semantic=sem, sem_proj_dim=8)
    cparams = cd.init_params(ccfg, jax.random.PRNGKey(0))
    bcfg = cfglib.TINY
    bparams = bb.init_params(bcfg, jax.random.PRNGKey(1))
    ckpt.save_pipeline(tmp_path / "pipe", bcfg, bparams, ccfg, cparams)
    b2, bp2, c2, cp2 = ckpt.load_pipeline(tmp_path / "pipe")
    assert isinstance(c2.semantic, cfglib.SemanticConfig)
    assert c2.semantic == sem and c2.sem_proj_dim == 8
    assert dataclasses.asdict(c2) == dataclasses.asdict(ccfg)

    tts = NeuTTS(b2, bp2, c2, cp2)
    from neutts_tpu.audio import io as audio_io

    wav = (np.sin(np.linspace(0, 600, 16000)) * 0.1).astype(np.float32)
    audio_io.write_wav(tmp_path / "ref.wav", wav, 16000)
    codes = tts.encode_reference(tmp_path / "ref.wav")
    assert codes.dtype == np.int32 and codes.shape[0] == 16000 // 320
