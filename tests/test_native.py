"""Native C++ audio frontend vs the Python/SciPy implementations."""

import numpy as np
import pytest

from neutts_tpu import native
from neutts_tpu.audio import io as audio_io
from neutts_tpu.audio.overlap_add import linear_overlap_add

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_read_wav_matches_python():
    for path in ["/root/reference/samples/jo.wav", "/root/reference/samples/dave.wav"]:
        a, sr_a = native.read_wav(path)
        b, sr_b = audio_io.read_wav(path)
        assert sr_a == sr_b
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_write_wav_roundtrip(tmp_path):
    sr = 24_000
    x = np.tanh(np.sin(np.arange(sr) / 50.0)).astype(np.float32)
    p = tmp_path / "n.wav"
    native.write_wav(p, x, sr)
    y, sr2 = audio_io.read_wav(p)  # python reader reads native writer output
    assert sr2 == sr
    np.testing.assert_allclose(x, y, atol=1.0 / 32767 + 1.0 / 65536)


def test_resample_matches_scipy():
    """The C++ polyphase resampler mirrors scipy.resample_poly's design."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(44_100).astype(np.float32) * 0.3
    for sr_in, sr_out in [(44_100, 16_000), (22_050, 16_000), (16_000, 24_000)]:
        a = native.resample(x, sr_in, sr_out)
        b = audio_io.resample(x, sr_in, sr_out)
        assert a.shape == b.shape, (sr_in, sr_out, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_resample_identity():
    x = np.sin(np.arange(1000) / 7).astype(np.float32)
    np.testing.assert_array_equal(native.resample(x, 16_000, 16_000), x)


def test_overlap_add_matches_python():
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((5, 150)).astype(np.float32)
    a = native.overlap_add(frames, stride=100)
    b = linear_overlap_add(list(frames), stride=100)
    np.testing.assert_allclose(a, b, atol=1e-6)
