"""Continuous-batching decode core: per-slot cache state, jitted steps.

The lockstep `runtime/decode.py` path assumes every row shares one write
index (one batch admitted together). This module generalizes to a slot model
— the heart of a vLLM-style serving engine (reference role N9, SURVEY.md §2b:
the reference's RTX-4090 numbers come from vLLM continuous batching):

  * a fixed pool of B slots, each an independent sequence with its own
    cached length, phase (empty / active / done), and PRNG stream;
  * `prefill_slots` admits a group of requests into free slots (bucketed,
    LEFT-padded prompts — rows occupy cache slots [pad, Lp) so every slot's
    settled length is bucket-aligned);
  * `decode_steps` advances ALL active slots n_steps tokens in one jitted
    call. On TPU with the int8 cache it runs SEGMENT-STAGED: each step's
    quantized K/V goes to a small staging buffer at the lockstep column i
    (contiguous dynamic_update_slice — no scatter), the Pallas kernel
    attends settled-cache [pad, base) + staging [0, i], and ONE Pallas
    reconcile folds staging into the per-row cache slots at segment end.
    The per-step XLA scatter this replaces cost 4.3 ms/step at B=512 on
    v5e — 32% of the decode step. bf16/int4 caches and CPU keep the
    direct-scatter path;
  * retirement/admission happen on the host between segments (the engine in
    neutts_tpu/serving/engine.py).

Alignment invariant (what makes the reconcile DMA legal): admission buckets
are multiples of 64 (runtime/decode.py PROMPT_BUCKETS) and segments a
multiple of 8 steps, so every row that is active at a segment start has an
8-aligned settled length — exactly Mosaic's HBM sublane tiling granularity.
`SEGMENT_ALIGN` pins it.

All state lives on device between calls; only small token buffers cross the
host boundary per segment.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from neutts_tpu.config import BackboneConfig, SamplingConfig, round_up
from neutts_tpu.models import backbone as bb
from neutts_tpu.ops import sampling as smp
from neutts_tpu.ops.attention import BLOCK_T, SEG_PAD
from neutts_tpu.runtime.decode import PROMPT_BUCKETS

SEGMENT_ALIGN = 8  # segment step counts must be multiples of this
# int4 staged decode packs token pairs into bytes at reconcile, so segment
# bases must stay 16-token aligned (byte offset base/2 must be 8-aligned for
# the Mosaic reconcile DMA) — segments are multiples of 16 steps.
SEGMENT_ALIGN_INT4 = 16

# Extra physical cache slots per row beyond max_context. Sized to the worst
# case so the physical-headroom bound in `_in_ctx` can NEVER bind before the
# reference's real-length semantics (max_length=2048 incl. prompt): a
# left-padded admission can waste up to (max bucket gap - 1) slots of pad, and
# the staged reconcile needs a full segment (<= SEG_PAD steps) of headroom.
# Under-sizing this silently truncated long generations (ADVICE r1, medium).
_MAX_BUCKET_GAP = max(
    b - a for a, b in zip((0,) + PROMPT_BUCKETS[:-1], PROMPT_BUCKETS)
)
CACHE_SLACK = round_up(_MAX_BUCKET_GAP - 1 + SEG_PAD, 128)  # 256


def slot_cache_len(cfg: BackboneConfig) -> int:
    """Physical per-slot cache length for the serving path (logical context
    plus reconcile slack, kept a multiple of the attention DMA block —
    512 for int4, whose kernel blocks need bth % 128 == 0)."""
    align = 512 if cfg.kv_dtype == "int4" else BLOCK_T
    return round_up(cfg.max_context + CACHE_SLACK, align)


class SlotState(NamedTuple):
    cache: bb.KVCache  # [L, B, T, K*D] x2
    token: jax.Array  # [B] int32 — next input token per slot
    lens: jax.Array  # [B] int32 — cache slots used (left-pad + real tokens)
    pad: jax.Array  # [B] int32 — left-pad per slot (attend t >= pad)
    prompt_lens: jax.Array  # [B] int32 — padded prompt portion (min_new bookkeeping)
    active: jax.Array  # [B] bool — decoding (not empty, not finished)
    key: jax.Array

    @staticmethod
    def create(cfg: BackboneConfig, n_slots: int, key: jax.Array) -> "SlotState":
        return SlotState(
            cache=bb.KVCache.create(cfg, n_slots, max_len=slot_cache_len(cfg)),
            token=jnp.zeros((n_slots,), jnp.int32),
            lens=jnp.zeros((n_slots,), jnp.int32),
            pad=jnp.zeros((n_slots,), jnp.int32),
            prompt_lens=jnp.zeros((n_slots,), jnp.int32),
            active=jnp.zeros((n_slots,), bool),
            key=key,
        )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "eos_id"),
    donate_argnums=(4,),  # slot state (KV cache) updates in place
)
def prefill_slots(
    cfg: BackboneConfig,
    sampling: SamplingConfig,
    eos_id: int,
    params,
    state: SlotState,
    tokens: jax.Array,  # [G, Lp] int32, LEFT-padded to a bucket
    true_lens: jax.Array,  # [G] int32
    slots: jax.Array,  # [G] int32 — target slots; duplicates must carry
    #                    identical rows (the engine pads a partial group by
    #                    repeating its last admission — an idempotent write)
) -> SlotState:
    """Admit a GROUP of requests in one jitted call: one batched prefill
    forward. Prompts arrive LEFT-padded (row j's ids at [Lp - true_len, Lp)),
    so each slot's settled cache length is the full bucket Lp — the
    bucket-alignment the staged decode's reconcile DMA requires. The pad
    region [0, pad) holds junk K/V that every attention masks out."""
    G, Lp = tokens.shape
    pads = Lp - true_lens  # [G]
    idx = jnp.arange(Lp, dtype=jnp.int32)
    positions = jnp.maximum(idx[None, :] - pads[:, None], 0)  # [G, Lp]
    mask = (idx[None, None, :] <= idx[None, :, None]) & (
        idx[None, None, :] >= pads[:, None, None]
    )  # [G, Lp, Lp]
    valid = idx[None, :] >= pads[:, None]  # [G, Lp]
    cos, sin = bb.rope_tables(cfg.head_dim, cfg.rope_theta, positions)
    x = params["embed"].astype(jnp.dtype(cfg.dtype))[tokens]

    quant = state.cache.quantized
    int4 = state.cache.int4
    # TPU int8/int4 path: the scan emits the quantized prompt K/V as stacked
    # outputs and ONE Pallas DMA kernel writes them to the slot rows after
    # the scan — the per-layer XLA scatter it replaces cost ~33 ms per
    # [64, 512] admission group (~13% of serving prefill admission time;
    # tools/probe_prefill.py `writeonly`). int4 emits nibble-packed bytes
    # (the r4 gap: int4 admission was XLA-scatter only, one reason 512-slot
    # int4 serving ran 29% behind int8 — SERVING_CAPACITY_r04.json).
    pallas_write = (
        bb.use_pallas_attention(cfg) and quant and Lp % 64 == 0
    )

    def body_stacked(x, lp_l):
        # pallas_write mode: the cache NEVER enters the scan — an identity
        # cache carry + a later aliased pallas_call defeats XLA's in-place
        # aliasing and copies the multi-GB cache (measured: admit 3.9 -> 6.1 s
        # at 512 slots). The scan emits stacked quantized K/V instead.
        lp, l = lp_l
        x, k, v = bb._block_fresh(cfg, lp, x, cos, sin, mask, valid=valid,
                                  pads=pads)
        if int4:
            kq, ksc = bb.quantize_kv4(k.reshape(G, Lp, -1))
            vq, vsc = bb.quantize_kv4(v.reshape(G, Lp, -1))
            # packed bytes + token-order scales + last-token int4 values
            # (prev-nibble registers for the scatter-decode compatibility)
            return x, (bb.pack4_pairs(kq), bb.pack4_pairs(vq), ksc, vsc,
                       kq[:, -1], vq[:, -1])
        kq, ksc = bb.quantize_kv(k.reshape(G, Lp, -1))
        vq, vsc = bb.quantize_kv(v.reshape(G, Lp, -1))
        return x, (kq, vq, ksc, vsc)

    def body(carry, lp_l):
        x, all_k, all_v, ks, vs, kp, vp = carry
        lp, l = lp_l
        x, k, v = bb._block_fresh(cfg, lp, x, cos, sin, mask, valid=valid,
                                  pads=pads)
        kf = k.reshape(G, Lp, -1)
        vf = v.reshape(G, Lp, -1)
        if int4:
            kq, ksc = bb.quantize_kv4(kf)   # [G, Lp, KD], [G, Lp]
            vq, vsc = bb.quantize_kv4(vf)
            all_k = all_k.at[l, slots, : Lp // 2, :].set(bb.pack4_pairs(kq))
            all_v = all_v.at[l, slots, : Lp // 2, :].set(bb.pack4_pairs(vq))
            half = ks.shape[2] // 2
            ks = ks.at[l, slots, : Lp // 2].set(ksc[:, 0::2])
            ks = ks.at[l, slots, half : half + Lp // 2].set(ksc[:, 1::2])
            vs = vs.at[l, slots, : Lp // 2].set(vsc[:, 0::2])
            vs = vs.at[l, slots, half : half + Lp // 2].set(vsc[:, 1::2])
            # prev-nibble registers from the LAST token (Lp-1: left padding
            # puts the prompt's last real token at the bucket end)
            kp = kp.at[l, slots].set(kq[:, -1])
            vp = vp.at[l, slots].set(vq[:, -1])
        elif quant:
            kq, ksc = bb.quantize_kv(kf)
            vq, vsc = bb.quantize_kv(vf)
            all_k = all_k.at[l, slots, :Lp, :].set(kq)
            all_v = all_v.at[l, slots, :Lp, :].set(vq)
            ks = ks.at[l, slots, :Lp].set(ksc)
            vs = vs.at[l, slots, :Lp].set(vsc)
        else:
            all_k = all_k.at[l, slots, :Lp, :].set(kf.astype(all_k.dtype))
            all_v = all_v.at[l, slots, :Lp, :].set(vf.astype(all_v.dtype))
        return (x, all_k, all_v, ks, vs, kp, vp), None

    layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    dummy = jnp.zeros((), jnp.float32)
    new_kp, new_vp = dummy, dummy
    if pallas_write:
        from neutts_tpu.ops import attention as attn_ops

        x, stacked = lax.scan(body_stacked, x, (params["layers"], layer_ids))
        eq = slots[:, None] == slots[None, :]
        primary = jnp.argmax(eq, axis=1) == jnp.arange(G)  # first occurrence
        if int4:
            kq_st, vq_st, ks_st, vs_st, kp_st, vp_st = stacked
            new_k, new_v, new_ks, new_vs = attn_ops.scatter_prefill4(
                state.cache.k, state.cache.v,
                state.cache.k_scale, state.cache.v_scale,
                kq_st, vq_st, ks_st, vs_st, slots, primary,
            )
            # prev-nibble registers: tiny [L, G, KD] scatter (kept for the
            # scatter-decode path's odd-parity pairing invariant). Duplicate
            # slots carry identical rows, so write order is irrelevant.
            new_kp = state.cache.k_prev.at[:, slots].set(kp_st)
            new_vp = state.cache.v_prev.at[:, slots].set(vp_st)
        else:
            kq_st, vq_st, ks_st, vs_st = stacked  # each [L, G, Lp, ...]
            new_k, new_v, new_ks, new_vs = attn_ops.scatter_prefill(
                state.cache.k, state.cache.v,
                state.cache.k_scale, state.cache.v_scale,
                kq_st, vq_st, ks_st, vs_st, slots, primary,
            )
    else:
        (x, new_k, new_v, new_ks, new_vs, new_kp, new_vp), _ = lax.scan(
            body,
            (x, state.cache.k, state.cache.v,
             state.cache.k_scale if quant else dummy,
             state.cache.v_scale if quant else dummy,
             state.cache.k_prev if int4 else dummy,
             state.cache.v_prev if int4 else dummy),
            (params["layers"], layer_ids),
        )
    x = bb.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    last = x[:, -1, :]  # left padding: the last position is always real
    k0, key = jax.random.split(state.key)
    first = smp.sample_from_hidden(
        cfg, sampling, params, last, k0, eos_id,
        jnp.int32(0) < sampling.min_new_tokens,
    )  # [G]
    if int4:
        new_cache = bb.KVCache(new_k, new_v, new_ks, new_vs, new_kp, new_vp)
    elif quant:
        new_cache = bb.KVCache(new_k, new_v, new_ks, new_vs)
    else:
        new_cache = bb.KVCache(new_k, new_v)
    return SlotState(
        cache=new_cache,
        token=state.token.at[slots].set(first),
        lens=state.lens.at[slots].set(Lp),
        pad=state.pad.at[slots].set(pads),
        prompt_lens=state.prompt_lens.at[slots].set(Lp),
        active=state.active.at[slots].set(first != eos_id),
        key=key,
    )


def prefill_slot(
    cfg: BackboneConfig,
    sampling: SamplingConfig,
    eos_id: int,
    params,
    state: SlotState,
    tokens: jax.Array,  # [Lp] int32, LEFT-padded to a bucket
    true_len: jax.Array,  # scalar int32
    slot: jax.Array,  # scalar int32
) -> SlotState:
    """Single-request admission (thin wrapper over the grouped prefill)."""
    return prefill_slots(
        cfg, sampling, eos_id, params, state,
        tokens[None, :],
        jnp.reshape(true_len, (1,)).astype(jnp.int32),
        jnp.reshape(slot, (1,)).astype(jnp.int32),
    )


@functools.partial(
    jax.jit,
    donate_argnums=(0,),
)
def retire_slots(state: SlotState, retire_mask: jax.Array) -> SlotState:
    """Deactivate a batch of slots in ONE device op."""
    return state._replace(
        active=state.active & ~retire_mask,
        lens=jnp.where(retire_mask, 0, state.lens),
        pad=jnp.where(retire_mask, 0, state.pad),
    )


def _in_ctx(cfg: BackboneConfig, lens_new, pad, t_phys: int, n_steps: int):
    """A row may keep decoding while its REAL length (reference semantics:
    max_length=2048 including the prompt) and its physical slot usage (the
    reconcile needs S slots of headroom) both have room."""
    return ((lens_new - pad) < cfg.max_context) & (
        lens_new <= t_phys - n_steps
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "eos_id", "n_steps"),
    donate_argnums=(5,),  # slot state (KV cache) updates in place
)
def decode_steps(
    cfg: BackboneConfig,
    sampling: SamplingConfig,
    eos_id: int,
    n_steps: int,
    params,
    state: SlotState,
) -> Tuple[SlotState, jax.Array]:
    """Advance all active slots n_steps. Returns (state, tokens [B, n_steps]).

    Emitted entries for inactive slots (or post-EOS steps) are `eos_id`; the
    engine slices per-slot valid counts from the lens delta. Note: the first
    emitted token of a freshly-admitted slot is produced by `prefill_slots`
    and lives in `state.token` — the engine records it at admission.
    """
    from neutts_tpu.ops import attention as attn_ops

    pallas = bb.use_pallas_attention(cfg)
    quant = state.cache.quantized
    int4 = state.cache.int4
    if pallas and quant:
        align = SEGMENT_ALIGN_INT4 if int4 else SEGMENT_ALIGN
        assert n_steps % align == 0, (n_steps, align)
        # staging scale buffers are lane-padded to SEG_PAD (attention.py)
        assert n_steps <= attn_ops.SEG_PAD, n_steps
        return _decode_steps_staged(cfg, sampling, eos_id, n_steps, params, state)
    return _decode_steps_scatter(cfg, sampling, eos_id, n_steps, params, state)


def _decode_steps_staged(cfg, sampling, eos_id, n_steps, params, state):
    """Segment-staged decode (TPU, int8/int4 cache): lockstep staging writes,
    the staged flash kernel, one reconcile at segment end. See module
    docstring. int4 mode stages UNPACKED int4 values (int8 buffers, same
    lockstep column writes); nibble packing happens once per segment in
    reconcile_segment4. The cache's prev-nibble registers are NOT maintained
    here — they are a scatter-path invariant, and segment bases stay even
    (SEGMENT_ALIGN_INT4) so every reconciled byte holds a complete pair."""
    from neutts_tpu.ops import attention as attn_ops

    B = state.token.shape[0]
    T = state.cache.max_len
    L = cfg.n_layers
    K, G = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads
    KD = K * cfg.head_dim
    S = n_steps
    int4 = state.cache.int4

    base = state.lens  # settled length per row — constant over the segment
    pad = state.pad
    active0 = state.active
    all_k, all_v = state.cache.k, state.cache.v
    ks_c, vs_c = state.cache.k_scale, state.cache.v_scale

    stag_k = jnp.zeros((L, B, S, KD), jnp.int8)
    stag_v = jnp.zeros((L, B, S, KD), jnp.int8)
    stag_ks = jnp.zeros((L, B, attn_ops.SEG_PAD), jnp.float32)
    stag_vs = jnp.zeros((L, B, attn_ops.SEG_PAD), jnp.float32)

    def step(carry, i):
        token, lens, active, key, sk, sv, sks, svs = carry
        positions = (lens - pad)[:, None]  # RoPE: count of real tokens before
        cos, sin = bb.rope_tables(cfg.head_dim, cfg.rope_theta, positions)
        x = params["embed"].astype(jnp.dtype(cfg.dtype))[token[:, None]]

        def body(carry, lp_l):
            x, sk, sv, sks, svs = carry
            lp, l = lp_l
            h = bb.rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
            q, k, v = bb._qkv(cfg, lp, h, cos, sin)
            kf = k[:, 0].reshape(B, -1)
            vf = v[:, 0].reshape(B, -1)
            if int4:
                kq, ksc = bb.quantize_kv4(kf)
                vq, vsc = bb.quantize_kv4(vf)
            else:
                kq, ksc = bb.quantize_kv(kf)
                vq, vsc = bb.quantize_kv(vf)
            # lockstep staging writes: column i shared by every row
            sk = lax.dynamic_update_slice(sk, kq[None, :, None, :], (l, 0, i, 0))
            sv = lax.dynamic_update_slice(sv, vq[None, :, None, :], (l, 0, i, 0))
            sks = lax.dynamic_update_slice(sks, ksc[None, :, None], (l, 0, i))
            svs = lax.dynamic_update_slice(svs, vsc[None, :, None], (l, 0, i))
            qg = q[:, 0].reshape(B, K, G, cfg.head_dim)
            a = attn_ops.decode_attention_staged(
                qg, all_k, all_v, ks_c, vs_c, sk, sv, sks, svs,
                l, i, base, pad,
            )
            a = a.astype(x.dtype).reshape(B, 1, cfg.q_dim)
            x = x + bb._mm(a, lp["wo"]).astype(x.dtype)
            x = bb._mlp(cfg, lp, x)
            return (x, sk, sv, sks, svs), None

        layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        (x, sk, sv, sks, svs), _ = lax.scan(
            body, (x, sk, sv, sks, svs), (params["layers"], layer_ids)
        )
        x = bb.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)

        lens_new = lens + 1  # the fed token occupies slot `lens`
        n_generated = lens_new - state.prompt_lens
        suppress = n_generated < sampling.min_new_tokens

        kstep, key = jax.random.split(key)
        nxt = smp.sample_from_hidden(
            cfg, sampling, params, x[:, 0, :], kstep, eos_id, suppress
        )
        in_ctx = _in_ctx(cfg, lens_new, pad, T, n_steps)
        nxt = jnp.where(active & in_ctx, nxt, eos_id)
        new_active = active & (nxt != eos_id) & in_ctx
        lens = jnp.where(active, lens_new, lens)
        return (nxt, lens, new_active, key, sk, sv, sks, svs), nxt

    carry = (state.token, state.lens, state.active, state.key,
             stag_k, stag_v, stag_ks, stag_vs)
    carry, outs = lax.scan(step, carry, jnp.arange(n_steps))
    token, lens, active, key, stag_k, stag_v, stag_ks, stag_vs = carry

    reconcile = attn_ops.reconcile_segment4 if int4 else attn_ops.reconcile_segment
    new_k, new_v, new_ks, new_vs = reconcile(
        all_k, all_v, ks_c, vs_c, stag_k, stag_v, stag_ks, stag_vs,
        base, active0,
    )
    if int4:
        new_cache = bb.KVCache(new_k, new_v, new_ks, new_vs,
                               state.cache.k_prev, state.cache.v_prev)
    else:
        new_cache = bb.KVCache(new_k, new_v, new_ks, new_vs)
    new_state = SlotState(
        cache=new_cache,
        token=token,
        lens=lens,
        pad=state.pad,
        prompt_lens=state.prompt_lens,
        active=active,
        key=key,
    )
    return new_state, outs.T  # [B, n_steps]


def _decode_steps_scatter(cfg, sampling, eos_id, n_steps, params, state):
    """Direct per-step cache-scatter decode (bf16/int4 caches, CPU oracle)."""
    from neutts_tpu.ops import attention as attn_ops

    B = state.token.shape[0]
    T = state.cache.max_len
    K, G = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads

    pallas = bb.use_pallas_attention(cfg)
    quant = state.cache.quantized
    int4 = state.cache.int4

    def step(carry, i):
        state = carry
        write_at = jnp.minimum(state.lens, T - 1)  # [B] per-slot write index
        positions = (write_at - state.pad)[:, None]
        cos, sin = bb.rope_tables(cfg.head_dim, cfg.rope_theta, positions)
        x = params["embed"].astype(jnp.dtype(cfg.dtype))[state.token[:, None]]
        lens_new = write_at + 1  # attend [pad, lens] incl. the fresh token
        ar = jnp.arange(B)

        def body(carry, lp_l):
            x, all_k, all_v, ks, vs, kp, vp = carry
            lp, l = lp_l
            h = bb.rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
            q, k, v = bb._qkv(cfg, lp, h, cos, sin)
            kf = k[:, 0].reshape(B, -1)
            vf = v[:, 0].reshape(B, -1)
            if int4:
                # per-slot parity: even writes store lo alone; odd writes
                # pair with the slot's prev-nibble register (no cache READ —
                # an RMW would force XLA to copy the layer slice)
                t2 = jnp.right_shift(write_at, 1)
                par = (write_at & 1)[:, None]
                kq, ksc = bb.quantize_kv4(kf)   # [B, KD], [B]
                vq, vsc = bb.quantize_kv4(vf)
                pk = lax.dynamic_index_in_dim(kp, l, 0, keepdims=False)
                pv_ = lax.dynamic_index_in_dim(vp, l, 0, keepdims=False)
                newk = jnp.where(par == 0, kq, pk + jnp.int8(16) * kq)
                newv = jnp.where(par == 0, vq, pv_ + jnp.int8(16) * vq)
                all_k = all_k.at[l, ar, t2, :].set(newk)
                all_v = all_v.at[l, ar, t2, :].set(newv)
                sidx = bb.deint4_index(write_at, ks.shape[2] // 2)
                ks = ks.at[l, ar, sidx].set(ksc)
                vs = vs.at[l, ar, sidx].set(vsc)
                # update prev ONLY on even writes: an INACTIVE slot parked at
                # an odd write_at re-writes its byte every step, and must keep
                # pairing with the real token at write_at-1 — clobbering prev
                # with its junk kq would destroy that token's nibble
                kp = lax.dynamic_update_slice(
                    kp, jnp.where(par == 0, kq, pk)[None], (l, 0, 0))
                vp = lax.dynamic_update_slice(
                    vp, jnp.where(par == 0, vq, pv_)[None], (l, 0, 0))
            elif quant:
                kq, ksc = bb.quantize_kv(kf)
                vq, vsc = bb.quantize_kv(vf)
                all_k = all_k.at[l, ar, write_at, :].set(kq)
                all_v = all_v.at[l, ar, write_at, :].set(vq)
                ks = ks.at[l, ar, write_at].set(ksc)
                vs = vs.at[l, ar, write_at].set(vsc)
            else:
                all_k = all_k.at[l, ar, write_at, :].set(kf.astype(all_k.dtype))
                all_v = all_v.at[l, ar, write_at, :].set(vf.astype(all_v.dtype))
            qg = q[:, 0].reshape(B, K, G, cfg.head_dim)
            if pallas:
                a = attn_ops.decode_attention_stacked(
                    qg, all_k, all_v, l, lens_new, state.pad,
                    k_scale=ks if quant else None,
                    v_scale=vs if quant else None,
                )
            else:
                ck = lax.dynamic_index_in_dim(all_k, l, 0, keepdims=False)
                cv = lax.dynamic_index_in_dim(all_v, l, 0, keepdims=False)
                if int4:
                    ck = bb.dequant_kv4(ck, lax.dynamic_index_in_dim(ks, l, 0, keepdims=False))
                    cv = bb.dequant_kv4(cv, lax.dynamic_index_in_dim(vs, l, 0, keepdims=False))
                elif quant:
                    ck = ck.astype(jnp.float32) * lax.dynamic_index_in_dim(ks, l, 0, keepdims=False)[..., None]
                    cv = cv.astype(jnp.float32) * lax.dynamic_index_in_dim(vs, l, 0, keepdims=False)[..., None]
                a = attn_ops.decode_attention_xla(qg, ck, cv, lens_new, state.pad)
            a = a.astype(x.dtype).reshape(B, 1, cfg.q_dim)
            x = x + bb._mm(a, lp["wo"]).astype(x.dtype)
            x = bb._mlp(cfg, lp, x)
            return (x, all_k, all_v, ks, vs, kp, vp), None

        layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        dummy = jnp.zeros((), jnp.float32)
        (x, new_k, new_v, new_ks, new_vs, new_kp, new_vp), _ = lax.scan(
            body,
            (x, state.cache.k, state.cache.v,
             state.cache.k_scale if quant else dummy,
             state.cache.v_scale if quant else dummy,
             state.cache.k_prev if int4 else dummy,
             state.cache.v_prev if int4 else dummy),
            (params["layers"], layer_ids),
        )
        x = bb.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)

        n_generated = lens_new - state.prompt_lens  # incl. the token being fed
        suppress = n_generated < sampling.min_new_tokens

        kstep, key = jax.random.split(state.key)
        nxt = smp.sample_from_hidden(
            cfg, sampling, params, x[:, 0, :], kstep, eos_id, suppress
        )
        in_ctx = _in_ctx(cfg, lens_new, state.pad, T, n_steps)
        nxt = jnp.where(state.active & in_ctx, nxt, eos_id)
        new_active = state.active & (nxt != eos_id) & in_ctx
        lens = jnp.where(state.active, lens_new, state.lens)
        if int4:
            new_cache = bb.KVCache(new_k, new_v, new_ks, new_vs, new_kp, new_vp)
        elif quant:
            new_cache = bb.KVCache(new_k, new_v, new_ks, new_vs)
        else:
            new_cache = bb.KVCache(new_k, new_v)
        new_state = SlotState(
            cache=new_cache,
            token=nxt,
            lens=lens,
            pad=state.pad,
            prompt_lens=state.prompt_lens,
            active=new_active,
            key=key,
        )
        return new_state, nxt

    state, outs = lax.scan(step, state, jnp.arange(n_steps))
    return state, outs.T  # [B, n_steps]
