"""Vocoder runtime: jit-managed NeuCodec decoding for arbitrary code lengths.

Two modes around the same codec decoder (models/codec.py):

* `ExactVocoder` — decodes the true length; one XLA compile per distinct
  length (LRU-cached). Bit-identical to `codec.decode`; used for parity
  gates and one-off synthesis.
* `ChunkedVocoder` — ONE compiled shape ever: the code sequence is split
  into the reference's streaming windows (lookback 50 / chunk 25 /
  lookforward 5 / overlap 1, reference neutts/neutts.py:86-91), all windows
  decode as a single batch on the MXU, and chunks are stitched with the
  triangular overlap-add. Matches the full decode to conv-receptive-field
  tolerance (the same approximation the reference's own streaming mode
  makes, :407-429) while being compile-stable and embarrassingly parallel —
  the production/serving path.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neutts_tpu.config import CodecConfig, StreamingConfig
from neutts_tpu.audio.overlap_add import linear_overlap_add
from neutts_tpu.models import codec as cd


class ExactVocoder:
    """Bit-exact decode with BUCKETED compile shapes.

    Code lengths are padded up to a small geometric bucket set and decoded
    through the codec's length-masked path (models/codec.py `decode`
    n_valid): pad frames contribute exact zeros everywhere (attention keys
    masked, conv inputs zeroed, ISTFT spectra + envelope masked), so the
    valid samples match an unpadded decode to float32 ULP (~1e-7 rel, pure
    shape-dependent XLA fusion reordering; pinned by
    tests/test_vocoder.py::test_masked_decode_ulp_exact) while a
    serving-shaped workload (every utterance a distinct length) compiles at
    most len(buckets) variants instead of one per length.

    buckets=None disables padding (one compile per exact length, LRU) — the
    mode the real-artifact parity gates pin against torch goldens.
    """

    def __init__(self, cfg: CodecConfig, params, max_cached: int = 32,
                 buckets: Sequence[int] | None = (128, 512, 2048)):
        self.cfg = cfg
        self.params = params
        self._fns: Dict[int, object] = {}
        self._max = max_cached
        self.buckets = tuple(buckets) if buckets else None

        # params are a runtime ARGUMENT, never a closure: closed-over params
        # bake the multi-GB weight tree into the HLO as constants, which
        # bloats executables and overflows remote-compile request limits
        @functools.partial(jax.jit, static_argnums=0)
        def decode_masked(cfg_, params_, codes, n_valid):
            return cd.decode(cfg_, params_, codes, n_valid=n_valid)

        self._decode_masked = decode_masked

    def _fn(self, n: int):
        fn = self._fns.get(n)
        if fn is None:
            if len(self._fns) >= self._max:
                self._fns.pop(next(iter(self._fns)))

            @functools.partial(jax.jit, static_argnums=0)
            def decode(cfg_, params_, codes):
                return cd.decode(cfg_, params_, codes)

            fn = decode
            self._fns[n] = fn
        return fn

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        top = self.buckets[-1]
        return ((n + top - 1) // top) * top

    def __call__(self, codes: Sequence[int] | np.ndarray) -> np.ndarray:
        arr = np.asarray(codes, np.int32).reshape(1, -1)
        n = arr.shape[1]
        if self.buckets is None:
            return np.asarray(
                self._fn(n)(self.cfg, self.params, jnp.asarray(arr))[0]
            )
        nb = self._bucket(n)
        padded = np.zeros((1, nb), np.int32)
        padded[0, :n] = arr[0]
        wav = self._decode_masked(
            self.cfg, self.params, jnp.asarray(padded), jnp.int32(n)
        )
        return np.asarray(wav[0, : n * self.cfg.hop_out])


class ChunkedVocoder:
    """Fixed-window batched decode + overlap-add; one compile total."""

    def __init__(
        self,
        cfg: CodecConfig,
        params,
        streaming: StreamingConfig = StreamingConfig(),
        batch_buckets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128),
    ):
        self.cfg = cfg
        self.params = params
        self.s = streaming
        self.window = (
            streaming.lookback
            + streaming.overlap_frames
            + streaming.frames_per_chunk
            + streaming.lookforward
            + streaming.overlap_frames
        )  # 82 frames
        self.buckets = tuple(batch_buckets)

        @functools.partial(jax.jit, static_argnums=0)
        def _dec(cfg_, params_, codes):
            return cd.decode(cfg_, params_, codes)

        self._decode = _dec

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return ((n + self.buckets[-1] - 1) // self.buckets[-1]) * self.buckets[-1]

    def __call__(self, codes: Sequence[int] | np.ndarray) -> np.ndarray:
        s = self.s
        hop = self.cfg.hop_out
        arr = np.asarray(codes, np.int32).reshape(-1)
        n = len(arr)
        if n == 0:
            raise ValueError("No valid speech tokens found in the output.")
        lb = s.lookback + s.overlap_frames  # left context frames
        chunk = s.frames_per_chunk
        emit = chunk + 2 * s.overlap_frames  # frames emitted per window
        n_chunks = max(1, -(-n // chunk))

        # pad so every window is full: left pad with zeros (only affects the
        # first window's warmup context), right pad with edge codes (only
        # affects windows past the real end, which are dropped)
        padded = np.concatenate(
            [
                np.zeros(lb, np.int32),
                arr,
                np.full(n_chunks * chunk - n + s.lookforward + s.overlap_frames,
                        arr[-1], np.int32),
            ]
        )
        windows = np.stack(
            [padded[i * chunk : i * chunk + self.window] for i in range(n_chunks)]
        )
        nb = self._bucket(n_chunks)
        if nb > n_chunks:
            windows = np.concatenate(
                [windows, np.zeros((nb - n_chunks, self.window), np.int32)]
            )
        wavs = np.asarray(
            self._decode(self.cfg, self.params, jnp.asarray(windows))
        )[:n_chunks]
        # emission region per window: local frames [lb, lb+emit) -> global
        # [i*chunk, i*chunk+emit), matching the reference's sample_start math
        # (neutts/neutts.py:416-421)
        a = lb * hop
        frames = [w[a : a + emit * hop] for w in wavs]
        out = linear_overlap_add(frames, stride=s.stride_samples)
        return out[: n * hop]
