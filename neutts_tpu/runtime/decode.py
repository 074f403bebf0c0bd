"""Jit-compiled autoregressive decode: prefill + `lax.while_loop` generation.

This is the TPU-native replacement for the reference's hot loop — HF
`backbone.generate(...)` (reference neutts/neutts.py:334-352) and llama.cpp's
C++ decode (reference neutts/neutts.py:354-371). Design:

* static shapes everywhere: prompts are LEFT-padded to a bucket length, the KV
  cache is preallocated at `max_context`, and the output buffer is
  `[B, max_new]`;
* the whole generate (prefill + while_loop) is one jitted function — tokens
  never visit the host until the final buffer readback;
* per-sequence EOS masking: finished rows keep emitting EOS into the buffer
  but stop advancing their length; the loop exits when all rows are done or
  the context fills (reference semantics: max_length=2048, eos =
  <|SPEECH_GENERATION_END|>, min_new_tokens=50);
* sampling (temperature/top-k) happens on device with a counted PRNG key.

Buckets: `generate` is compiled per (batch, prompt_bucket) pair; callers
round prompt lengths up to a small set of buckets to bound recompiles.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from neutts_tpu.config import BackboneConfig, SamplingConfig
from neutts_tpu.config import round_up as _round_up
from neutts_tpu.models import backbone as bb
from neutts_tpu.ops import sampling as smp


def _cache_align(cfg: BackboneConfig) -> int:
    """Physical KV-cache lengths must divide into the Pallas decode kernel's
    DMA blocks: BLOCK_T (256) for bf16/int8, 512 for int4 (whose smaller
    blocks hit a Mosaic scale-slice alignment limit — ops/attention.py)."""
    from neutts_tpu.ops.attention import BLOCK_T

    return 512 if cfg.kv_dtype == "int4" else BLOCK_T


class GenerateResult(NamedTuple):
    tokens: jax.Array  # [B, max_new] int32 — generated continuation (EOS-filled)
    lengths: jax.Array  # [B] int32 — number of valid tokens per row (incl. EOS)
    steps: jax.Array  # scalar int32 — loop iterations executed


class _LoopState(NamedTuple):
    cache: bb.KVCache
    token: jax.Array  # [B] last emitted token
    out: jax.Array  # [B, max_new]
    done: jax.Array  # [B] bool
    lengths: jax.Array  # [B] int32
    step: jax.Array  # scalar int32
    key: jax.Array


def _generate_impl(
    cfg: BackboneConfig,
    sampling: SamplingConfig,
    eos_id: int,
    max_new: int,
    params,
    tokens: jax.Array,  # [B, Lp] left-padded prompts
    prompt_lens: jax.Array,  # [B]
    key: jax.Array,
) -> GenerateResult:
    B, Lp = tokens.shape
    pad = (Lp - prompt_lens).astype(jnp.int32)
    # Loop bound: every row stops once its REAL length (prompt_lens + new,
    # excluding left-pad) reaches max_context — the reference's max_length
    # semantics (neutts/neutts.py:340) count real tokens, so a padded row
    # must not lose budget to its pad. The physical cache is sized for the
    # worst case (write indices go up to Lp + cap - 1; pad eats slots).
    cap = max(min(max_new, cfg.max_context - 1), 1)
    cache_len = _round_up(Lp + cap, _cache_align(cfg))
    cache = bb.KVCache.create(cfg, B, max_len=cache_len)

    logits, cache = bb.prefill(cfg, params, tokens, prompt_lens, cache)

    def sample(logits, step, key):
        return smp.sample_step(
            logits, key, sampling, eos_id, step < sampling.min_new_tokens,
            vocab_size=cfg.vocab_size,
        )

    k0, key = jax.random.split(key)
    first = sample(logits, jnp.int32(0), k0)
    out = jnp.full((B, max_new), eos_id, jnp.int32)
    out = out.at[:, 0].set(first)
    done0 = first == eos_id
    state = _LoopState(
        cache=cache,
        token=first,
        out=out,
        done=done0,
        lengths=jnp.ones((B,), jnp.int32),
        step=jnp.int32(1),
        key=key,
    )

    def cond(s: _LoopState):
        return (s.step < cap) & ~jnp.all(s.done)

    def body(s: _LoopState):
        cur_index = Lp + s.step - 1  # cache slot for the token we feed in
        logits, cache = bb.decode_step(
            cfg, params, s.token, s.cache, cur_index, pad, trim_logits=False
        )
        kstep, key = jax.random.split(s.key)
        nxt = sample(logits, s.step, kstep)
        # per-row real-length cap (reference max_length counts real tokens)
        in_ctx = (prompt_lens + s.step) < cfg.max_context
        nxt = jnp.where(s.done | ~in_ctx, eos_id, nxt)
        out = lax.dynamic_update_slice(s.out, nxt[:, None], (0, s.step))
        newly_done = nxt == eos_id
        lengths = s.lengths + jnp.where(s.done, 0, 1)
        return _LoopState(
            cache=cache,
            token=nxt,
            out=out,
            done=s.done | newly_done,
            lengths=lengths,
            step=s.step + 1,
            key=key,
        )

    final = lax.while_loop(cond, body, state)
    return GenerateResult(tokens=final.out, lengths=final.lengths, steps=final.step)


@functools.partial(
    jax.jit, static_argnames=("cfg", "sampling", "eos_id", "max_new"), donate_argnums=()
)
def _generate_jit(
    cfg: BackboneConfig,
    sampling: SamplingConfig,
    eos_id: int,
    max_new: int,
    params,
    tokens: jax.Array,
    prompt_lens: jax.Array,
    key: jax.Array,
) -> GenerateResult:
    return _generate_impl(cfg, sampling, eos_id, max_new, params, tokens, prompt_lens, key)


def generate(
    cfg: BackboneConfig,
    sampling: SamplingConfig,
    eos_id: int,
    max_new: int,
    params,
    tokens: jax.Array,
    prompt_lens: jax.Array,
    key: jax.Array,
) -> GenerateResult:
    """Jitted prefill + AR decode. See `_generate_impl` for semantics.

    kv_dtype="auto" resolves here from the actual total context of this
    call (prompt bucket + generation budget) via config.resolve_kv_dtype.
    int4 packs token pairs and needs an EVEN prompt bucket; an odd bucket
    (only reachable at the max_context-1 window edge) makes auto fall back
    to int8 instead of tripping the int4 prefill assertion."""
    from neutts_tpu.config import resolve_kv_dtype

    cap = max(min(max_new, cfg.max_context - 1), 1)
    cfg = resolve_kv_dtype(cfg, int(tokens.shape[1]) + cap)
    if cfg.kv_dtype == "int4" and tokens.shape[1] % 2:
        cfg = cfg.scaled(kv_dtype="int8")
    return _generate_jit(cfg, sampling, eos_id, max_new, params, tokens, prompt_lens, key)


# --- host-side helpers --------------------------------------------------------

# Dense 64-step buckets: compiles are LAZY (only buckets a workload actually
# uses are jitted, and the persistent compile cache carries them across runs),
# so density costs nothing at steady state while (a) cutting prefill padding
# waste — padded rows/tokens are full-price prefill compute; at the serving
# workload's 380-512-token prompts, 64-granularity halves the average pad vs
# 128 — and (b) capping the worst-case left-pad at 63, which keeps the
# serving cache slack small (runtime/batching.py CACHE_SLACK). Alignment:
# every bucket is a multiple of 64, satisfying the staged-decode reconcile
# (8-aligned bases) and the admission DMA kernel (ops/attention.py
# scatter_prefill: int8 time-axis sublane tiling).
PROMPT_BUCKETS = tuple(range(128, 2048 + 1, 64))


def bucket_length(n: int, buckets=PROMPT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds max bucket {buckets[-1]}")


def pad_prompts(prompts, pad_id: int, bucket: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LEFT-pad a list of id-lists to a shared bucketed length.

    Left padding puts every row's last prompt token at the same index, so the
    decode loop writes new KV rows at one shared slot per step (no scatter).
    """
    lens = [len(p) for p in prompts]
    L = bucket or bucket_length(max(lens))
    if max(lens) > L:
        raise ValueError(f"prompt of length {max(lens)} does not fit bucket {L}")
    arr = [[pad_id] * (L - len(p)) + list(p) for p in prompts]
    return jnp.asarray(arr, jnp.int32), jnp.asarray(lens, jnp.int32)


def extract(result: GenerateResult, row: int, eos_id: int) -> list:
    """Host-side: trim row `row` to its valid continuation, excluding EOS."""
    toks = list(map(int, result.tokens[row]))
    n = int(result.lengths[row])
    toks = toks[:n]
    if toks and toks[-1] == eos_id:
        toks = toks[:-1]
    return toks


# --- segmented decode (streaming) --------------------------------------------
#
# `lax.while_loop` cannot yield to the host mid-generation, so streaming uses
# a segmented loop: prefill once, then one jitted call per chunk of
# `frames_per_chunk` tokens, with all state (KV cache, rng, done flags) kept
# on device between calls. This is the decode half of the reference's
# streaming path (reference neutts/neutts.py:373-465), with llama.cpp's
# per-token Python callback replaced by per-chunk device steps.


class DecodeState(NamedTuple):
    cache: bb.KVCache
    token: jax.Array  # [B] last emitted token
    done: jax.Array  # [B] bool
    lengths: jax.Array  # [B] int32 — generated tokens so far (incl. EOS)
    step: jax.Array  # scalar int32 — tokens generated so far
    key: jax.Array
    pad: jax.Array  # [B] left-pad amounts
    prompt_end: jax.Array  # scalar int32 — Lp


@functools.partial(jax.jit, static_argnames=("cfg", "sampling", "eos_id"))
def _prefill_init_jit(
    cfg: BackboneConfig,
    sampling: SamplingConfig,
    eos_id: int,
    params,
    tokens: jax.Array,  # [B, Lp] left-padded
    prompt_lens: jax.Array,
    key: jax.Array,
) -> Tuple[DecodeState, jax.Array]:
    B, Lp = tokens.shape
    pad = (Lp - prompt_lens).astype(jnp.int32)
    cache = bb.KVCache.create(
        cfg, B, max_len=_round_up(cfg.max_context, _cache_align(cfg))
    )
    speech = smp.use_speech_head(cfg, sampling, params)
    logits, cache = bb.prefill(
        cfg, params, tokens, prompt_lens, cache, speech_head=speech
    )
    k0, key = jax.random.split(key)
    # sample_logits handles EOS suppression AND the optional speech_range
    # constraint (the old mask_eos + sample_tokens pair silently ignored
    # speech_range for the FIRST token — caught by the speech-head parity
    # test)
    first = smp.sample_logits(
        logits, k0, cfg, sampling, eos_id,
        jnp.int32(0) < sampling.min_new_tokens, speech=speech,
    )
    state = DecodeState(
        cache=cache,
        token=first,
        done=first == eos_id,
        lengths=jnp.ones((B,), jnp.int32),
        step=jnp.int32(1),
        key=key,
        pad=pad,
        prompt_end=jnp.int32(Lp),
    )
    return state, first


def prefill_init(
    cfg: BackboneConfig,
    sampling: SamplingConfig,
    eos_id: int,
    params,
    tokens: jax.Array,  # [B, Lp] left-padded
    prompt_lens: jax.Array,
    key: jax.Array,
) -> Tuple[DecodeState, jax.Array]:
    """Prefill + first sampled token. Returns (state, first_token [B]).

    Streaming is open-ended (the cache is sized at max_context), so
    kv_dtype="auto" resolves against max_context — int4 at the default
    2048 window (capacity-safe for the longest utterances; the serving
    sweep showed int4 >= int8 everywhere, SERVING_CAPACITY_r05.json)."""
    from neutts_tpu.config import resolve_kv_dtype

    cfg = resolve_kv_dtype(cfg, cfg.max_context)
    if cfg.kv_dtype == "int4" and tokens.shape[1] % 2:
        # odd bucket (max_context-1 window edge): int4 packs token pairs
        cfg = cfg.scaled(kv_dtype="int8")
    return _prefill_init_jit(cfg, sampling, eos_id, params, tokens,
                             prompt_lens, key)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "eos_id", "n_steps"),
    donate_argnums=(5,),  # state (KV cache) updates in place across segments
)
def decode_segment(
    cfg: BackboneConfig,
    sampling: SamplingConfig,
    eos_id: int,
    n_steps: int,
    params,
    state: DecodeState,
) -> Tuple[DecodeState, jax.Array]:
    """Generate up to n_steps tokens; returns (state, tokens [B, n_steps]).

    Rows that finish keep emitting EOS; the caller checks `state.done` /
    `state.lengths` to know how much is real. Steps that would overflow the
    context emit EOS.
    """
    B = state.token.shape[0]

    T_phys = state.cache.max_len
    speech = smp.use_speech_head(cfg, sampling, params)

    def body(i, carry):
        s, out = carry
        cur_index = s.prompt_end + s.step - 1
        # Per-row REAL-length cap (reference max_length counts real tokens,
        # not left-pad) plus the physical bound of the preallocated cache:
        # the token emitted now is fed next step at slot prompt_end + step.
        in_ctx = ((s.prompt_end - s.pad + s.step) < cfg.max_context) & (
            s.prompt_end + s.step < T_phys
        )
        logits, cache = bb.decode_step(
            cfg, params, s.token, s.cache, cur_index, s.pad,
            trim_logits=False, speech_head=speech,
        )
        kstep, key = jax.random.split(s.key)
        nxt = smp.sample_logits(
            logits, kstep, cfg, sampling, eos_id,
            s.step < sampling.min_new_tokens, speech=speech,
        )
        nxt = jnp.where(s.done | ~in_ctx, eos_id, nxt)
        out = lax.dynamic_update_slice(out, nxt[:, None], (0, i))
        lengths = s.lengths + jnp.where(s.done, 0, 1)
        s = DecodeState(
            cache=cache,
            token=nxt,
            done=s.done | (nxt == eos_id),
            lengths=lengths,
            step=s.step + 1,
            key=key,
            pad=s.pad,
            prompt_end=s.prompt_end,
        )
        return s, out

    out0 = jnp.full((B, n_steps), eos_id, jnp.int32)
    if n_steps == 0:
        return state, out0
    state, out = lax.fori_loop(0, n_steps, body, (state, out0))
    return state, out
