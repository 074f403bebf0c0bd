"""Qwen2.5-style speech-LM backbone, pure-functional JAX.

TPU-first design notes
----------------------
* Per-layer weights are **stacked** along a leading layer axis and the block is
  applied with `lax.scan` — one compiled block regardless of depth, MXU-sized
  matmuls, fast compile.
* All activations are bf16 by default; softmax/norm statistics in f32.
* The decode path (`decode_step`) is written to live inside a jitted
  `lax.while_loop` (see neutts_tpu/runtime/decode.py): static shapes,
  preallocated KV cache, no host round-trips.
* The LM head is evaluated only on positions that need logits (last position at
  prefill, the single new token at decode) — the 217k-row vocab matmul is the
  decode hot spot and is kept to [B, D] @ [D, V].

Capability parity: this is the TPU replacement for the reference's
transformers/llama.cpp backbone inference (reference neutts/neutts.py:123-166,
334-371); architecture provenance Qwen2.5-0.5B per reference TRAINING.md:33.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from neutts_tpu.config import BackboneConfig

Params = Dict[str, Any]


# --- initialisation -----------------------------------------------------------


def init_params(cfg: BackboneConfig, key: jax.Array, dtype=None) -> Params:
    """Random init (for tests / from-scratch training). Converters build the
    same pytree from real checkpoints (neutts_tpu/models/convert.py)."""
    dtype = dtype or jnp.dtype(cfg.dtype)
    keys = jax.random.split(key, 12)
    D, L = cfg.hidden_size, cfg.n_layers
    Q, KV, F, V = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size, cfg.padded_vocab

    def dense(k, shape, scale=None):
        scale = scale if scale is not None else (shape[-2] ** -0.5)
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params: Params = {
        "embed": dense(keys[0], (V, D), scale=0.02),
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "wq": dense(keys[1], (L, D, Q)),
            "bq": jnp.zeros((L, Q), dtype),
            "wk": dense(keys[2], (L, D, KV)),
            "bk": jnp.zeros((L, KV), dtype),
            "wv": dense(keys[3], (L, D, KV)),
            "bv": jnp.zeros((L, KV), dtype),
            "wo": dense(keys[4], (L, Q, D)),
            "mlp_norm": jnp.ones((L, D), dtype),
            "w_gate": dense(keys[5], (L, D, F)),
            "w_up": dense(keys[6], (L, D, F)),
            "w_down": dense(keys[7], (L, F, D)),
        },
        "final_norm": jnp.ones((D,), dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(keys[8], (D, V), scale=0.02)
    return params


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


# --- primitives ---------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dt)


def rope_tables(head_dim: int, theta: float, positions: jax.Array):
    """positions: [...] int32 -> (cos, sin) each [..., head_dim/2] f32."""
    half = head_dim // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [..., half]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [..., n_heads, head_dim]; cos/sin broadcast over the head axis.

    Uses the half-split ("rotate_half") convention matching HF Qwen2.
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[..., None, :].astype(x.dtype)
    s = sin[..., None, :].astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _logits(cfg: BackboneConfig, params: Params, x: jax.Array) -> jax.Array:
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
    if cfg.padded_vocab != cfg.vocab_size:
        pad = cfg.padded_vocab - cfg.vocab_size
        mask = jnp.concatenate(
            [jnp.zeros((cfg.vocab_size,), jnp.float32), jnp.full((pad,), -jnp.inf)]
        )
        logits = logits + mask
    return logits


class KVCache(NamedTuple):
    """Preallocated per-layer KV cache: k/v are [L, B, T_max, n_kv, head_dim]."""

    k: jax.Array
    v: jax.Array

    @staticmethod
    def create(cfg: BackboneConfig, batch: int, max_len: Optional[int] = None, dtype=None):
        dtype = dtype or jnp.dtype(cfg.dtype)
        T = max_len or cfg.max_context
        shape = (cfg.n_layers, batch, T, cfg.n_kv_heads, cfg.head_dim)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def _attend(
    q: jax.Array,  # [B, S, n_heads, Dh]
    k: jax.Array,  # [B, T, n_kv, Dh]
    v: jax.Array,  # [B, T, n_kv, Dh]
    mask: jax.Array,  # [B, S, T] bool (True = attend)
) -> jax.Array:
    """Grouped-query attention, f32 softmax. Returns [B, S, n_heads, Dh]."""
    B, S, H, Dh = q.shape
    G = H // k.shape[2]
    qg = q.reshape(B, S, k.shape[2], G, Dh)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k, preferred_element_type=jnp.float32)
    scores = scores * (Dh**-0.5)
    # Finite mask value: fully-masked rows (left-pad positions) must produce
    # finite (garbage) outputs, not NaN — NaN would re-enter the KV cache and
    # poison later steps through 0 * NaN in the probability-weighted sum.
    scores = jnp.where(mask[:, None, None, :, :], scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v)
    return out.reshape(B, S, H, Dh)


def _block(cfg: BackboneConfig, lp: Params, x, cache_k, cache_v, cos, sin, mask, write_at):
    """One transformer block over S new positions, updating the layer KV cache.

    x: [B, S, D]; cache_k/v: [B, T, n_kv, Dh]; cos/sin: [B, S, half];
    mask: [B, S, T]; write_at: scalar int32 — index where the S new KV rows go.
    Returns (x_out, cache_k, cache_v).
    """
    B, S, D = x.shape
    h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
    q = jnp.dot(h, lp["wq"], preferred_element_type=jnp.float32).astype(x.dtype) + lp["bq"]
    k = jnp.dot(h, lp["wk"], preferred_element_type=jnp.float32).astype(x.dtype) + lp["bk"]
    v = jnp.dot(h, lp["wv"], preferred_element_type=jnp.float32).astype(x.dtype) + lp["bv"]
    q = q.reshape(B, S, cfg.n_heads, cfg.head_dim)
    k = k.reshape(B, S, cfg.n_kv_heads, cfg.head_dim)
    v = v.reshape(B, S, cfg.n_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    cache_k = lax.dynamic_update_slice(cache_k, k.astype(cache_k.dtype), (0, write_at, 0, 0))
    cache_v = lax.dynamic_update_slice(cache_v, v.astype(cache_v.dtype), (0, write_at, 0, 0))

    attn = _attend(q, cache_k, cache_v, mask)
    attn = attn.reshape(B, S, cfg.q_dim)
    x = x + jnp.dot(attn, lp["wo"], preferred_element_type=jnp.float32).astype(x.dtype)

    h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
    gate = jnp.dot(h, lp["w_gate"], preferred_element_type=jnp.float32)
    up = jnp.dot(h, lp["w_up"], preferred_element_type=jnp.float32)
    ff = (jax.nn.silu(gate) * up).astype(x.dtype)
    x = x + jnp.dot(ff, lp["w_down"], preferred_element_type=jnp.float32).astype(x.dtype)
    return x, cache_k, cache_v


def forward(
    cfg: BackboneConfig,
    params: Params,
    tokens: jax.Array,  # [B, S] int32 — new tokens to process
    cache: KVCache,
    positions: jax.Array,  # [B, S] int32 — RoPE position ids for these tokens
    mask: jax.Array,  # [B, S, T_max] bool — which cache slots each token sees
    write_at,  # scalar int32 — cache index of tokens[:, 0]
) -> Tuple[jax.Array, KVCache]:
    """Run the stack over S new tokens. Returns (hidden [B, S, D], new cache).

    Used for both prefill (S = padded prompt length, write_at = 0) and decode
    (S = 1, write_at = current length). The same code path keeps prefill and
    decode numerics identical — the consistency tests rely on this.
    """
    x = params["embed"].astype(jnp.dtype(cfg.dtype))[tokens]
    cos, sin = rope_tables(cfg.head_dim, cfg.rope_theta, positions)

    def body(x, layer):
        lp, ck, cv = layer
        x, ck, cv = _block(cfg, lp, x, ck, cv, cos, sin, mask, write_at)
        return x, (ck, cv)

    x, (new_k, new_v) = lax.scan(body, x, (params["layers"], cache.k, cache.v))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, KVCache(k=new_k, v=new_v)


def prefill(
    cfg: BackboneConfig,
    params: Params,
    tokens: jax.Array,  # [B, Lp] int32, LEFT-padded prompts
    prompt_lens: jax.Array,  # [B] int32 — true lengths (pad is at the front)
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """Process left-padded prompts; returns (last-position logits [B, V], cache).

    Left padding means every sequence's last real token sits at index Lp-1, so
    decode writes land at a single shared cache index — no per-sequence scatter.
    """
    B, Lp = tokens.shape
    T = cache.max_len
    pad = Lp - prompt_lens  # [B]
    idx = jnp.arange(Lp, dtype=jnp.int32)
    positions = jnp.maximum(idx[None, :] - pad[:, None], 0)  # [B, Lp]
    # token at row-index i may attend cache slot t iff t <= i and t >= pad[b]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    mask = (t_idx[None, None, :] <= idx[None, :, None]) & (
        t_idx[None, None, :] >= pad[:, None, None]
    )
    x, cache = forward(cfg, params, tokens, cache, positions, mask, jnp.int32(0))
    logits = _logits(cfg, params, x[:, -1, :])
    return logits, cache


def decode_step(
    cfg: BackboneConfig,
    params: Params,
    token: jax.Array,  # [B] int32 — previous token
    cache: KVCache,
    cur_index: jax.Array,  # scalar int32 — cache slot to write (= Lp + step)
    pad: jax.Array,  # [B] int32 — left-pad amounts from prefill
) -> Tuple[jax.Array, KVCache]:
    """One AR decode step: returns (logits [B, V], new cache)."""
    B = token.shape[0]
    T = cache.max_len
    positions = (cur_index - pad)[:, None]  # [B, 1]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    mask = (t_idx[None, None, :] <= cur_index) & (t_idx[None, None, :] >= pad[:, None, None])
    x, cache = forward(cfg, params, token[:, None], cache, positions, mask, cur_index)
    logits = _logits(cfg, params, x[:, 0, :])
    return logits, cache
