"""End-to-end pipeline tests (mirrors the reference's smoke matrix,
tests/test_neutts.py, plus the stronger checks SURVEY.md §4 calls for)."""

import numpy as np
import pytest

from neutts_tpu import config
from neutts_tpu.pipeline import NeuTTS

REF_TEXT = "So I'm live on radio."
TEXT = "Hello there, this is a test."


@pytest.fixture(scope="module")
def tts():
    t = NeuTTS.initialize_random(seed=0)
    # keep runs fast: tiny min_new so random models stop quickly via cap
    t.sampling = config.SamplingConfig(min_new_tokens=8, max_context=t.max_context)
    return t


@pytest.fixture(scope="module")
def ref_codes():
    rng = np.random.default_rng(0)
    return rng.integers(0, config.TEST_LAYOUT.codebook_size, size=24).astype(np.int32)


def _cap_generation(tts, n):
    """Cap decode length via a small max_context for test speed."""
    import dataclasses

    tts.backbone_cfg = dataclasses.replace(tts.backbone_cfg, max_context=n)
    tts.max_context = n


def test_infer_smoke(tts, ref_codes):
    """Reference smoke assertions: ndarray, non-empty, finite, float dtype
    (reference tests/test_neutts.py:55-58) + exact hop-length duration."""
    wav = tts.infer(TEXT, ref_codes, REF_TEXT)
    assert isinstance(wav, np.ndarray)
    assert wav.size > 0
    assert np.isfinite(wav).all()
    assert wav.dtype in (np.float32, np.float64)
    assert wav.size % 480 == 0  # whole codec frames @ hop 480


def test_infer_accepts_torch_tensor(tts, ref_codes):
    """Reference API accepts torch tensors for ref_codes (neutts.py:216)."""
    torch = pytest.importorskip("torch")
    wav = tts.infer(TEXT, torch.from_numpy(np.asarray(ref_codes)), REF_TEXT)
    assert wav.size > 0


def test_infer_batch(tts, ref_codes):
    wavs = tts.infer_batch(
        [TEXT, "Short one."], [ref_codes, ref_codes[:10]], [REF_TEXT, REF_TEXT]
    )
    assert len(wavs) == 2
    for w in wavs:
        assert w.size > 0 and np.isfinite(w).all()


def test_infer_stream_yields_chunks(tts, ref_codes):
    """Streaming drains to >=1 ndarray chunk (reference tests:63-85 intent)
    and the total stream length is whole frames."""
    chunks = list(tts.infer_stream(TEXT, ref_codes, REF_TEXT))
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert total.size > 0 and np.isfinite(total).all()


def test_stream_matches_batch_duration(tts, ref_codes):
    """Stream and batch synthesize the same token count for greedy decode."""
    import dataclasses

    tts_g = NeuTTS.initialize_random(seed=0)
    tts_g.sampling = config.SamplingConfig(greedy=True, min_new_tokens=8)
    wav = tts_g.infer(TEXT, ref_codes, REF_TEXT)
    chunks = list(tts_g.infer_stream(TEXT, ref_codes, REF_TEXT))
    stream = np.concatenate(chunks)
    # duration parity within one chunk of samples (stream emits only full
    # frames; the batch path vocodes all frames at once)
    assert abs(stream.size - wav.size) <= 480 * 31


def test_encode_reference_on_sample_wavs(tts):
    codes = tts.encode_reference("/root/reference/samples/dave.wav")
    assert codes.dtype == np.int32
    assert codes.shape == (372,)  # matches shipped dave.pt length (SURVEY §0)
    codes_jo = tts.encode_reference("/root/reference/samples/jo.wav")
    assert codes_jo.shape == (653,)  # matches shipped jo.pt length


def test_empty_codes_raises(tts):
    with pytest.raises(ValueError, match="No valid speech tokens"):
        tts._vocode([])


def test_checkpoint_roundtrip(tmp_path, tts, ref_codes):
    from neutts_tpu.models import checkpoint as ckpt
    from neutts_tpu.pipeline import NeuTTS as P

    ckpt.save_pipeline(
        tmp_path / "m", tts.backbone_cfg, tts.backbone_params, tts.codec_cfg, tts.codec_params
    )
    tts2 = P.from_checkpoint(tmp_path / "m")
    tts2.sampling = config.SamplingConfig(greedy=True, min_new_tokens=4)
    tts.sampling = config.SamplingConfig(greedy=True, min_new_tokens=4)
    w1 = tts.infer(TEXT, ref_codes, REF_TEXT)
    w2 = tts2.infer(TEXT, ref_codes, REF_TEXT)
    np.testing.assert_allclose(w1, w2, atol=1e-5)


def test_near_window_odd_prompt_int4_auto():
    """Near the context edge _pick_bucket pads to the exact prompt length;
    an ODD length must round to even or int4 (kv auto) prefill asserts.
    Regression for the r5 auto-always-int4 change."""
    import jax

    from neutts_tpu import config
    from neutts_tpu.pipeline import NeuTTS

    cfg = config.TINY.scaled(kv_dtype="auto")
    tts = NeuTTS.initialize_random(backbone_cfg=cfg, seed=0)
    assert tts._pick_bucket(509) == 510  # TINY max_context 512
    assert tts._pick_bucket(508) == 508
    # max_context-1 odd: no even bucket fits under the window — the exact
    # odd length is kept and decode's auto resolution falls back to int8
    assert tts._pick_bucket(511) == 511
    import jax
    import numpy as np

    from neutts_tpu.models import backbone as bbm
    from neutts_tpu.runtime import decode as dec2

    params = bbm.init_params(cfg, jax.random.PRNGKey(0))
    toks, lens = dec2.pad_prompts([[5] * 511], pad_id=0, bucket=511)
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=1)
    res = dec2.generate(cfg, scfg, cfg.layout.speech_gen_end, 4, params,
                        toks, lens, jax.random.PRNGKey(1))
    assert np.asarray(res.tokens).shape[0] == 1  # runs without asserting
    # and an in-range bucket stays bucketed
    assert tts._pick_bucket(100) == dec_bucket(100)


def dec_bucket(n):
    from neutts_tpu.runtime.decode import bucket_length

    return bucket_length(n)
