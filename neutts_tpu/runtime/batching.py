"""Continuous-batching decode core: per-slot cache state, jitted steps.

The lockstep `runtime/decode.py` path assumes every row shares one write
index (one batch admitted together). This module generalizes to a slot model
— the heart of a vLLM-style serving engine (reference role N9, SURVEY.md §2b:
the reference's RTX-4090 numbers come from vLLM continuous batching):

  * a fixed pool of B slots, each an independent sequence with its own
    cached length, phase (empty / active / done), and PRNG stream;
  * `prefill_slot` admits one request into a free slot (bucketed prompt
    lengths bound recompiles; right padding — slot rows [0, len) are valid);
  * `decode_steps` advances ALL active slots n_steps tokens in one jitted
    call: per-row K/V scatter at each slot's own length, Pallas flash-decode
    attention with per-row lens, per-row EOS masking and min_new_tokens;
  * retirement/admission happen on the host between segments (the engine in
    neutts_tpu/serving/engine.py).

All state lives on device between calls; only small token buffers cross the
host boundary per segment.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from neutts_tpu.config import BackboneConfig, SamplingConfig
from neutts_tpu.models import backbone as bb
from neutts_tpu.ops import sampling as smp


class SlotState(NamedTuple):
    cache: bb.KVCache  # [L, B, T, K*D] x2
    token: jax.Array  # [B] int32 — next input token per slot
    lens: jax.Array  # [B] int32 — tokens currently in the slot's cache
    prompt_lens: jax.Array  # [B] int32 — prompt portion (for min_new bookkeeping)
    active: jax.Array  # [B] bool — decoding (not empty, not finished)
    key: jax.Array

    @staticmethod
    def create(cfg: BackboneConfig, n_slots: int, key: jax.Array) -> "SlotState":
        return SlotState(
            cache=bb.KVCache.create(cfg, n_slots),
            token=jnp.zeros((n_slots,), jnp.int32),
            lens=jnp.zeros((n_slots,), jnp.int32),
            prompt_lens=jnp.zeros((n_slots,), jnp.int32),
            active=jnp.zeros((n_slots,), bool),
            key=key,
        )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "eos_id"),
    donate_argnums=(4,),  # slot state (KV cache) updates in place
)
def prefill_slot(
    cfg: BackboneConfig,
    sampling: SamplingConfig,
    eos_id: int,
    params,
    state: SlotState,
    tokens: jax.Array,  # [Lp] int32, RIGHT-padded to a bucket
    true_len: jax.Array,  # scalar int32
    slot: jax.Array,  # scalar int32
) -> SlotState:
    """Admit one request into `slot`: fill its cache, sample its first token."""
    Lp = tokens.shape[0]
    toks = tokens[None, :]
    idx = jnp.arange(Lp, dtype=jnp.int32)
    positions = idx[None, :]
    cos, sin = bb.rope_tables(cfg.head_dim, cfg.rope_theta, positions)
    mask = (idx[None, None, :] <= idx[None, :, None]) & (
        idx[None, None, :] < true_len
    )  # [1, Lp, Lp]
    valid = (idx < true_len)[None, :]  # [1, Lp]
    x = params["embed"].astype(jnp.dtype(cfg.dtype))[toks]

    quant = state.cache.quantized
    int4 = state.cache.int4
    K = cfg.n_kv_heads

    def body(carry, lp_l):
        x, all_k, all_v, ks, vs, kp, vp = carry
        lp, l = lp_l
        x, k, v = bb._block_fresh(cfg, lp, x, cos, sin, mask, valid=valid)
        kf = k.reshape(1, Lp, -1)[0]
        vf = v.reshape(1, Lp, -1)[0]
        if int4:
            kq, ksc = bb.quantize_kv4(kf)   # [Lp, KD], [Lp]
            vq, vsc = bb.quantize_kv4(vf)
            all_k = lax.dynamic_update_slice(
                all_k, bb.pack4_pairs(kq)[None, None], (l, slot, 0, 0))
            all_v = lax.dynamic_update_slice(
                all_v, bb.pack4_pairs(vq)[None, None], (l, slot, 0, 0))
            half = ks.shape[2] // 2
            ks = lax.dynamic_update_slice(ks, ksc[0::2][None, None], (l, slot, 0))
            ks = lax.dynamic_update_slice(ks, ksc[1::2][None, None], (l, slot, half))
            vs = lax.dynamic_update_slice(vs, vsc[0::2][None, None], (l, slot, 0))
            vs = lax.dynamic_update_slice(vs, vsc[1::2][None, None], (l, slot, half))
            # prev-nibble registers from the LAST VALID token (true_len-1)
            KD = kf.shape[-1]
            kl = lax.dynamic_slice(kq, (true_len - 1, 0), (1, KD))
            vl = lax.dynamic_slice(vq, (true_len - 1, 0), (1, KD))
            kp = lax.dynamic_update_slice(kp, kl[None], (l, slot, 0))
            vp = lax.dynamic_update_slice(vp, vl[None], (l, slot, 0))
        elif quant:
            kq, ksc = bb.quantize_kv(kf)
            vq, vsc = bb.quantize_kv(vf)
            all_k = lax.dynamic_update_slice(all_k, kq[None, None], (l, slot, 0, 0))
            all_v = lax.dynamic_update_slice(all_v, vq[None, None], (l, slot, 0, 0))
            ks = lax.dynamic_update_slice(ks, ksc[None, None], (l, slot, 0))
            vs = lax.dynamic_update_slice(vs, vsc[None, None], (l, slot, 0))
        else:
            all_k = lax.dynamic_update_slice(
                all_k, kf.astype(all_k.dtype)[None, None], (l, slot, 0, 0)
            )
            all_v = lax.dynamic_update_slice(
                all_v, vf.astype(all_v.dtype)[None, None], (l, slot, 0, 0)
            )
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
    last = jnp.take_along_axis(x, (true_len - 1)[None, None, None], axis=1)[:, 0, :]
    logits = bb._logits(cfg, params, last)  # [1, V]
    k0, key = jax.random.split(state.key)
    first = smp.sample_step(
        logits, k0, sampling, eos_id, jnp.int32(0) < sampling.min_new_tokens
    )[0]
    if int4:
        new_cache = bb.KVCache(new_k, new_v, new_ks, new_vs, new_kp, new_vp)
    elif quant:
        new_cache = bb.KVCache(new_k, new_v, new_ks, new_vs)
    else:
        new_cache = bb.KVCache(new_k, new_v)
    return SlotState(
        cache=new_cache,
        token=state.token.at[slot].set(first),
        lens=state.lens.at[slot].set(true_len),
        prompt_lens=state.prompt_lens.at[slot].set(true_len),
        active=state.active.at[slot].set(first != eos_id),
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
    tokens: jax.Array,  # [G, Lp] int32, RIGHT-padded to a bucket
    true_lens: jax.Array,  # [G] int32
    slots: jax.Array,  # [G] int32 — target slots; duplicates must carry
    #                    identical rows (the engine pads a partial group by
    #                    repeating its last admission — an idempotent write)
) -> SlotState:
    """Admit a GROUP of requests in one jitted call: one batched prefill
    forward (vs the per-request `prefill_slot`, which runs the backbone at
    batch 1 and costs one host->device dispatch per admission — the dominant
    serving overhead at high slot counts)."""
    G, Lp = tokens.shape
    idx = jnp.arange(Lp, dtype=jnp.int32)
    positions = idx[None, :]
    mask = (idx[None, None, :] <= idx[None, :, None]) & (
        idx[None, None, :] < true_lens[:, None, None]
    )  # [G, Lp, Lp]
    valid = idx[None, :] < true_lens[:, None]  # [G, Lp]
    cos, sin = bb.rope_tables(cfg.head_dim, cfg.rope_theta, positions)
    x = params["embed"].astype(jnp.dtype(cfg.dtype))[tokens]

    quant = state.cache.quantized
    int4 = state.cache.int4
    K = cfg.n_kv_heads

    def body(carry, lp_l):
        x, all_k, all_v, ks, vs, kp, vp = carry
        lp, l = lp_l
        x, k, v = bb._block_fresh(cfg, lp, x, cos, sin, mask, valid=valid)
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
            last = (true_lens - 1)[:, None, None]
            kp = kp.at[l, slots].set(
                jnp.take_along_axis(kq, last, axis=1)[:, 0])
            vp = vp.at[l, slots].set(
                jnp.take_along_axis(vq, last, axis=1)[:, 0])
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
    last = jnp.take_along_axis(x, (true_lens - 1)[:, None, None], axis=1)[:, 0, :]
    logits = bb._logits(cfg, params, last, trim=False)  # [G, Vpad]
    k0, key = jax.random.split(state.key)
    first = smp.sample_step(
        logits, k0, sampling, eos_id,
        jnp.int32(0) < sampling.min_new_tokens, vocab_size=cfg.vocab_size,
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
        lens=state.lens.at[slots].set(true_lens),
        prompt_lens=state.prompt_lens.at[slots].set(true_lens),
        active=state.active.at[slots].set(first != eos_id),
        key=key,
    )


@functools.partial(
    jax.jit,
    donate_argnums=(0,),
)
def retire_slots(state: SlotState, retire_mask: jax.Array) -> SlotState:
    """Deactivate a batch of slots in ONE device op (the engine previously
    issued two `.at[slot].set` dispatches per retirement)."""
    return state._replace(
        active=state.active & ~retire_mask,
        lens=jnp.where(retire_mask, 0, state.lens),
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
    emitted token of a freshly-admitted slot is produced by `prefill_slot`
    and lives in `state.token` — the engine records it at admission.
    """
    B = state.token.shape[0]
    T = state.cache.max_len
    K, G = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads
    from neutts_tpu.ops import attention as attn_ops

    pallas = bb.use_pallas_attention()
    zero_pad = jnp.zeros((B,), jnp.int32)
    quant = state.cache.quantized
    int4 = state.cache.int4

    def step(carry, i):
        state = carry
        write_at = jnp.minimum(state.lens, T - 1)  # [B] per-slot write index
        positions = write_at[:, None]
        cos, sin = bb.rope_tables(cfg.head_dim, cfg.rope_theta, positions)
        x = params["embed"].astype(jnp.dtype(cfg.dtype))[state.token[:, None]]
        lens_new = write_at + 1  # attend [0, lens] incl. the fresh token
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
                    qg, all_k, all_v, l, lens_new, zero_pad,
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
                a = attn_ops.decode_attention_xla(qg, ck, cv, lens_new, zero_pad)
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
        logits = bb._logits(cfg, params, x[:, 0, :], trim=False)  # [B, Vpad]

        n_generated = lens_new - state.prompt_lens  # incl. the token being fed
        suppress = n_generated < sampling.min_new_tokens

        kstep, key = jax.random.split(state.key)
        nxt = smp.sample_step(
            logits, kstep, sampling, eos_id, suppress, vocab_size=cfg.vocab_size
        )
        in_ctx = lens_new < T
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
            prompt_lens=state.prompt_lens,
            active=new_active,
            key=key,
        )
        return new_state, nxt

    state, outs = lax.scan(step, state, jnp.arange(n_steps))
    return state, outs.T  # [B, n_steps]
