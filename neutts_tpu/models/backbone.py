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


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """w: [..., D, F] -> {"q": int8 [..., D, F], "s": f32 [..., F]} with
    per-output-channel symmetric scales."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / s[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def quantize_params(params: Params) -> Params:
    """int8 weight quantization (W8A8) — the TPU-native analogue of the
    reference's Q8_0 GGUF deployments (llama.cpp quantized matmuls, reference
    neutts/neutts.py:139-158). All seven per-layer projection matrices and the
    LM head become int8 with per-output-channel scales; activations are
    quantized per token at the matmul (`_mm`), so the dots run as
    int8 x int8 -> int32 on the MXU — 2x bf16 peak on v5e — and weight HBM
    traffic halves. The embedding gather stays bf16 (lookups don't hit the
    MXU); for tied-embedding configs a separate quantized head copy is added.

    Jitted as ONE program: the eager version dispatched ~70 small ops whose
    per-op remote compiles are too fast to persist in the compile cache —
    a fresh process paid a variable 10-70 s re-compiling them, and (async
    dispatch) the cost surfaced inside whatever the CALLER timed next.
    """
    return _quantize_params_jit(params)


@jax.jit
def _quantize_params_jit(params: Params) -> Params:
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        layers[name] = quantize_weight(layers[name])
    # fused [wq | wk | wv] copy for the Pallas admission QKV kernel
    # (ops/mlp.py fused_qkv): one int8 dot + one epilogue instead of the
    # separate norm/quant/3-GEMM chain (~108 ms of a [256, 512] admission
    # group under XLA). ~1 MB/layer of duplicate int8 weights; the split
    # projections stay for the decode path.
    layers["wqkv"] = {
        "q": jnp.concatenate(
            [layers[n]["q"] for n in ("wq", "wk", "wv")], axis=-1),
        "s": jnp.concatenate(
            [layers[n]["s"] for n in ("wq", "wk", "wv")], axis=-1),
        "b": jnp.concatenate(
            [params["layers"][n].astype(jnp.float32)
             for n in ("bq", "bk", "bv")], axis=-1),
    }
    out = dict(params)
    out["layers"] = layers
    head = params["lm_head"] if "lm_head" in params else params["embed"].T
    out["lm_head"] = quantize_weight(head)
    return out


def quantized_weights(params: Params) -> bool:
    return isinstance(params["layers"]["wq"], dict)


def _mm(x: jax.Array, w) -> jax.Array:
    """Matmul dispatch point for every projection in the model.

    Plain array w: bf16 MXU dot with f32 accumulation (returns f32).
    Quantized dict w ({"q": int8, "s": f32 per-out-channel}): per-token
    symmetric activation quantization, int8 x int8 -> int32 MXU dot, then
    dequant by (activation scale x weight scale) — returns f32.
    """
    if isinstance(w, dict):
        xf = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        acc = jnp.dot(xq, w["q"], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * xs * w["s"]
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


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


def _logits(
    cfg: BackboneConfig, params: Params, x: jax.Array, trim: bool = True
) -> jax.Array:
    """LM head. With trim=True the head is sliced to the REAL vocab — exact
    f32 [B, vocab_size] logits for training/parity. trim=False keeps the
    padded (lane-aligned) width: the unaligned vocab_size slice forces XLA to
    copy and re-tile the 390 MB head matrix every decode step (~0.5 ms at
    B=512), so the hot decode loops use the padded head and instead mask pad
    ids among the top-k CANDIDATES (ops/sampling.py, vocab_size arg). The
    untrimmed path also honors cfg.logits_dtype: bf16 halves the [B, 217k]
    logit-buffer HBM traffic (write + top-k read); sampling upcasts the
    [B, k] candidates back to f32 before the gumbel draw."""
    head = params["lm_head"] if "lm_head" in params else params["embed"].T
    if isinstance(head, dict):  # int8 head (quantize_params)
        if trim:
            head = {"q": head["q"][:, : cfg.vocab_size], "s": head["s"][: cfg.vocab_size]}
            return _mm(x, head)
        return _mm(x, head).astype(jnp.dtype(cfg.logits_dtype))
    if trim:
        head = head[:, : cfg.vocab_size]
        return jnp.dot(x, head, preferred_element_type=jnp.float32)
    return jnp.dot(x, head, preferred_element_type=jnp.dtype(cfg.logits_dtype))


def add_speech_head(cfg: BackboneConfig, params: Params) -> Params:
    """Attach a pre-sliced SPEECH-VOCAB head for constrained decode.

    TTS decode only ever legitimately emits speech-code tokens or
    <|SPEECH_GENERATION_END|> — the reference even regex-DROPS anything else
    (neutts/neutts.py:276), so constraining sampling to that range is
    behavior-preserving (see ops/sampling.py constrain_to_speech). Those ids
    are CONTIGUOUS at the top of the vocab (eos_id, then the 65,536 speech
    codes), so the decode hot loop can use a head slice of
    vocab_size - eos_id (~65.5k) columns instead of the full padded 217.6k:
    3.3x less head matmul work, logits HBM traffic, and top-k input per
    step. The slice is materialized ONCE here (per-step slicing would
    re-tile the 0.2-0.4 GB head every step).

    Sampled indices are offset by eos_id (index 0 == EOS); see
    ops/sampling.py sample_step_speech.
    """
    if "lm_head_speech" in params:
        return params
    lay = cfg.layout
    lo = lay.speech_gen_end
    assert lay.speech_base == lo + 1, (
        "speech head requires EOS immediately before the speech codes"
    )
    width = cfg.vocab_size - lo
    from neutts_tpu.config import round_up as _ru

    wpad = _ru(width, 256)
    head = params["lm_head"] if "lm_head" in params else params["embed"].T
    out = dict(params)
    if isinstance(head, dict):  # int8 quantized head
        q = head["q"][:, lo : lo + width]
        s = head["s"][lo : lo + width]
        q = jnp.pad(q, ((0, 0), (0, wpad - width)))
        s = jnp.pad(s, (0, wpad - width))
        out["lm_head_speech"] = {"q": q, "s": s}
    else:
        h = head[:, lo : lo + width]
        out["lm_head_speech"] = jnp.pad(h, ((0, 0), (0, wpad - width)))
    return out


def _logits_speech(cfg: BackboneConfig, params: Params, x: jax.Array) -> jax.Array:
    """LM head over the speech sub-vocab slice (see add_speech_head).
    Returns [B, padded_width] in cfg.logits_dtype; column 0 is EOS and
    column 1 + c is speech code c."""
    head = params["lm_head_speech"]
    if isinstance(head, dict):
        return _mm(x, head).astype(jnp.dtype(cfg.logits_dtype))
    return jnp.dot(x, head, preferred_element_type=jnp.dtype(cfg.logits_dtype))


def speech_head_width(cfg: BackboneConfig) -> int:
    """Number of REAL columns in the speech head (EOS + codebook)."""
    return cfg.vocab_size - cfg.layout.speech_gen_end


class KVCache(NamedTuple):
    """Preallocated per-layer KV cache: k/v are [L, B, T_max, n_kv * head_dim].

    Layout note: the KV heads are fused into the minor dim so it is exactly
    128 lanes for Air/Nano (2 heads x 64) — the Pallas flash-decode kernel
    DMAs [block_t, 128] tiles straight from this layout (Mosaic requires
    HBM-slice minor dims aligned to the 128-lane tiling), and a single DMA
    covers every head.

    Quantized mode (cfg.kv_dtype == "int8"): k/v hold int8 values with
    per-token symmetric scales in k_scale/v_scale [L, B, T_max] f32 —
    halves decode bandwidth (the binding constraint, ~400 GB/s practical on
    this chip) and doubles the max batch. Scales are folded into the scores
    (k) and the probabilities (v) so the matmuls stay int8-as-bf16.

    int4 mode (cfg.kv_dtype == "int4"): k/v hold NIBBLE-PAIR-packed int4
    values in int8 buffers of shape [L, B, T_max/2, KD] — byte t2
    ARITHMETIC-codes (lo + 16*hi) token 2*t2 (lo) and token 2*t2+1 (hi), so
    a [block, KD] DMA covers 2*block tokens and decode-attention cache
    bandwidth halves again vs int8. Scales are per-token f32 in a
    DEINTERLEAVED [L, B, T_max] layout — even tokens' scales in the first
    T/2 slots, odd in the second half — so every scale write is the same
    single-dynamic-index dynamic_update_slice as int8's (any other layout
    tried cost +4 ms/step in write-vs-kernel-read aliasing copies). int4
    mode is flagged by the presence of k_prev/v_prev.
    """

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None
    # int4 only: the PREVIOUS (even-parity) token's int4 values per layer,
    # [L, B, KD] int8. Odd-parity decode writes combine them into the packed
    # byte WITHOUT reading the cache — a read-modify-write there defeats
    # XLA's in-place scan-carry update and copies the 67 MB layer slice
    # (measured 4.9 ms/step at B=512).
    k_prev: Optional[jax.Array] = None
    v_prev: Optional[jax.Array] = None

    @staticmethod
    def create(cfg: BackboneConfig, batch: int, max_len: Optional[int] = None, dtype=None):
        T = max_len or cfg.max_context
        shape = (cfg.n_layers, batch, T, cfg.n_kv_heads * cfg.head_dim)
        if cfg.kv_dtype == "int8":
            sshape = (cfg.n_layers, batch, T)
            return KVCache(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(sshape, jnp.float32),
                v_scale=jnp.zeros(sshape, jnp.float32),
            )
        if cfg.kv_dtype == "int4":
            assert T % 2 == 0, T
            shape4 = (cfg.n_layers, batch, T // 2, cfg.n_kv_heads * cfg.head_dim)
            sshape4 = (cfg.n_layers, batch, T)  # deinterleaved per-token scales
            pshape = (cfg.n_layers, batch, cfg.n_kv_heads * cfg.head_dim)
            return KVCache(
                k=jnp.zeros(shape4, jnp.int8),
                v=jnp.zeros(shape4, jnp.int8),
                k_scale=jnp.zeros(sshape4, jnp.float32),
                v_scale=jnp.zeros(sshape4, jnp.float32),
                k_prev=jnp.zeros(pshape, jnp.int8),
                v_prev=jnp.zeros(pshape, jnp.int8),
            )
        dtype = dtype or jnp.dtype(cfg.dtype)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def int4(self) -> bool:
        return self.k_prev is not None

    @property
    def max_len(self) -> int:
        return self.k.shape[2] * (2 if self.int4 else 1)


def quantize_kv(x: jax.Array):
    """x: [..., KD] -> (int8 values [..., KD], f32 scales [...])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


# --- int4 KV helpers ----------------------------------------------------------


def quantize_kv4(x: jax.Array):
    """x: [..., KD] -> (int4 values in int8 [..., KD], f32 scales [...]).

    Symmetric per-token scales (like int8's quantize_kv, 15 levels)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -7, 7)
    return q.astype(jnp.int8), scale


def pack4(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Two int4-valued ([-7,7]) int8 arrays -> ARITHMETIC-coded bytes
    lo + 16*hi (range [-119, 119]). Arithmetic coding (vs bitfields) lets the
    Pallas kernel unpack EXACTLY in bf16 with {+, *, floor} — int8<->int32
    bitwise unpacking costs a 4x vector relayout per use in Mosaic."""
    return lo + jnp.int8(16) * hi


def unpack4(b: jax.Array):
    """Arithmetic-coded bytes -> (lo, hi) int4 values as int8."""
    hi = jnp.right_shift(b + jnp.int8(8), 4)  # floor((b+8)/16); b+8 <= 127
    lo = b - jnp.int8(16) * hi
    return lo, hi


def pack4_pairs(q: jax.Array) -> jax.Array:
    """q: [..., S, KD] int4-in-int8 (S even) -> packed [..., S/2, KD]."""
    return pack4(q[..., 0::2, :], q[..., 1::2, :])


def deint4_index(t, half: int):
    """Deinterleaved scale position of token t in a [.., T] scale row whose
    first `half` entries hold even tokens and the rest odd tokens."""
    return jnp.right_shift(t, 1) + (t & 1) * half


def scales4_block(sc: jax.Array) -> jax.Array:
    """sc: [..., S] per-token scales (S even) -> deinterleaved [..., S]
    (even tokens first, then odd) matching the KVCache int4 scale layout."""
    return jnp.concatenate([sc[..., 0::2], sc[..., 1::2]], axis=-1)


def write_kv_token(all_k, all_v, ks, vs, kf, vf, l, cur_index, n_kv: int,
                   *, int4: bool, quant: bool, k_prev=None, v_prev=None):
    """Write ONE token's K/V ([B, KD] each) into the stacked cache at the
    shared index `cur_index` for layer `l`. Handles all three cache modes.

    int4 mode: even-parity tokens write `lo` alone (the byte's hi nibble is
    beyond `lens`, so garbage there is never attended); odd-parity tokens
    write lo_prev + 16*hi using layer l's row of k_prev/v_prev — the previous
    step's int4 values — so the big cache is never READ (a read-modify-write
    defeats XLA's in-place carry update and copies the layer slice).
    Returns (all_k, all_v, ks, vs, k_prev, v_prev)."""
    B, KD = kf.shape
    if int4:
        t2 = jnp.right_shift(cur_index, 1)
        par = cur_index & 1
        kq, ksc = quantize_kv4(kf)
        vq, vsc = quantize_kv4(vf)
        pk = lax.dynamic_index_in_dim(k_prev, l, 0, keepdims=False)  # [B, KD]
        pv = lax.dynamic_index_in_dim(v_prev, l, 0, keepdims=False)
        newk = jnp.where(par == 0, kq, pk + jnp.int8(16) * kq)
        newv = jnp.where(par == 0, vq, pv + jnp.int8(16) * vq)
        all_k = lax.dynamic_update_slice(
            all_k, newk[None, :, None, :], (l, 0, t2, 0))
        all_v = lax.dynamic_update_slice(
            all_v, newv[None, :, None, :], (l, 0, t2, 0))
        sidx = deint4_index(cur_index, ks.shape[2] // 2)
        ks = lax.dynamic_update_slice(ks, ksc[None, :, None], (l, 0, sidx))
        vs = lax.dynamic_update_slice(vs, vsc[None, :, None], (l, 0, sidx))
        k_prev = lax.dynamic_update_slice(k_prev, kq[None], (l, 0, 0))
        v_prev = lax.dynamic_update_slice(v_prev, vq[None], (l, 0, 0))
    elif quant:
        kq, ksc = quantize_kv(kf)
        vq, vsc = quantize_kv(vf)
        all_k = lax.dynamic_update_slice(all_k, kq[None, :, None, :], (l, 0, cur_index, 0))
        all_v = lax.dynamic_update_slice(all_v, vq[None, :, None, :], (l, 0, cur_index, 0))
        ks = lax.dynamic_update_slice(ks, ksc[None, :, None], (l, 0, cur_index))
        vs = lax.dynamic_update_slice(vs, vsc[None, :, None], (l, 0, cur_index))
    else:
        all_k = lax.dynamic_update_slice(
            all_k, kf.astype(all_k.dtype)[None, :, None, :], (l, 0, cur_index, 0)
        )
        all_v = lax.dynamic_update_slice(
            all_v, vf.astype(all_v.dtype)[None, :, None, :], (l, 0, cur_index, 0)
        )
    return all_k, all_v, ks, vs, k_prev, v_prev


def dequant_kv4(cq: jax.Array, sc: jax.Array) -> jax.Array:
    """XLA-oracle dequant: packed [B, T/2, KD] + deinterleaved scales
    [B, T] -> f32 [B, T, KD] (token t = 2*t2 + parity)."""
    B, T2, KD = cq.shape
    lo, hi = unpack4(cq)
    q = jnp.stack([lo, hi], axis=2).reshape(B, 2 * T2, KD).astype(jnp.float32)
    st = jnp.stack([sc[:, :T2], sc[:, T2:]], axis=2).reshape(B, 2 * T2)
    return q * st[..., None]


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


PREFILL_Q_CHUNK = 128  # query-chunked prefill: bounds the S x S score buffer
# (128 keeps the [B, H, chunk, S] scores under 2 GB at B=512/S=512 — at 256
# the 3.7 GB score buffer OOMed 512-slot serving configs during admission)


def _attend_block(
    q: jax.Array,  # [B, S, n_heads, Dh] — queries over the new block
    k: jax.Array,  # [B, S, n_kv, Dh]
    v: jax.Array,  # [B, S, n_kv, Dh]
    mask: jax.Array,  # [B, S, S] bool (True = attend), causal within block
    valid: Optional[jax.Array] = None,  # [B, S] bool — real (non-pad) tokens;
    # enables the flash path (mask must then BE causal+valid, no custom holes)
    pads: Optional[jax.Array] = None,  # [B] int32 left-pad counts; enables
    # the VMEM-resident Pallas kernel (mask must be exactly causal+left-pad)
) -> jax.Array:
    """Self-attention within a block (prefill / training). [B, S, n_heads, Dh].

    For long blocks the query axis is processed in chunks (lax.map) so the
    materialized scores are [B, H, chunk, S] instead of [B, H, S, S] —
    without this, prefill at B=512/S=512 peaks at ~7.5 GB of scores and is
    the batch-size limiter.

    Note on the stock Pallas flash-attention op (tried 2026-08, then
    reverted): with tuned 512-blocks it wins an attention-only microbench
    2x (2.6 vs 5.3 ms/layer at [64, 512]) but LOSES in the real prefill
    scan (256 -> 490 ms per [64, 512] group) — the per-layer KV-head
    repeats + [B,H,S,D] transposes it needs aren't hoistable there.

    Note on a BESPOKE flash prefill kernel (tried 2026-08, then removed):
    a GQA-native Pallas kernel in kv-grouped [B, K, S*G, D] layout with
    causal block skipping and online softmax measured 4.7 ms/layer inside
    the 24-layer scan at [64, 512] on v5e — no better than this XLA path
    (4.9 ms/layer in the same harness), and the host-side kv-grouping
    transposes added another 2.5 ms/layer. Root cause: prefill attention
    at these shapes is VPU-BOUND on the softmax elementwise chain
    (~175-235M f32 exp/max/mul ops per layer), which both
    implementations pay identically; the [B, H, S, S] HBM score traffic
    the flash scheme eliminates (~940 MB/layer ~ 1.2 ms) was already
    hidden under the VPU work. Don't retry flash here without first
    shrinking the elementwise work itself.
    """
    B, S, H, Dh = q.shape
    G_ = H // max(k.shape[2], 1)
    if (
        pads is not None
        and B * k.shape[2] >= 16  # grid = B x K instances: a single-stream
        # prefill (B=1 -> 2 instances) under-parallelizes the VMEM kernel
        # and regressed TTFA 452 -> 595 ms; small batches stay on XLA
        and S % 64 == 0
        and Dh % 64 == 0
        and H % k.shape[2] == 0
        # VMEM budget (ADVICE r4): the kernel's per-instance [G*QB, S] f32
        # score tile grows with S (Air S=2048: ~29 MB); cap the estimated
        # footprint so oversized buckets fall back to XLA instead of
        # becoming a Mosaic compile failure. 40 MB verified to compile at
        # Air S=2048 with the raised vmem limit (ops/attention.py).
        and G_ * min(S, 512) * S * 4 <= 40 * 2**20
        and use_pallas_attention()
    ):
        # VMEM-resident Pallas prefill attention: no [B, H, S, S] score
        # materialization in HBM (the XLA paths below are HBM-bound on it —
        # 13.1 ms/layer at [256, 512] vs ~1.2 ms MXU roofline; the r3 "VPU-
        # bound" diagnosis held only at G=64). See ops/attention.py.
        from neutts_tpu.ops import attention as att

        return att.prefill_attention(q, k, v, pads)
    if valid is not None and S >= 256 and use_pallas_attention():
        # XLA's fused attention: ~1.3x the chunked-dense path at TTS prefill
        # shapes (3.6 vs 4.8 ms/layer at [64, 512]) and no materialized
        # score buffers. Fully-masked (pad) rows come back NaN — zero them
        # so pad positions stay finite (the dense path's -1e30 gives finite
        # garbage there; NaN would poison later layers through 0 * NaN in
        # the probability-weighted sum over pad K/V columns).
        out = jax.nn.dot_product_attention(q, k, v, mask=mask[:, None])
        return jnp.where(valid[:, :, None, None], out, 0).astype(q.dtype)
    C = PREFILL_Q_CHUNK
    if S > C and S % C == 0:
        def one(i):
            qc = lax.dynamic_slice_in_dim(q, i * C, C, 1)
            mc = lax.dynamic_slice_in_dim(mask, i * C, C, 1)
            return _attend_block_dense(qc, k, v, mc)

        parts = lax.map(one, jnp.arange(S // C))  # [n, B, C, H, Dh]
        return jnp.moveaxis(parts, 0, 1).reshape(B, S, H, Dh)
    return _attend_block_dense(q, k, v, mask)


def _attend_block_dense(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array
) -> jax.Array:
    B, S, H, Dh = q.shape
    K = k.shape[2]
    G = H // K
    qg = q.reshape(B, S, K, G, Dh)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k, preferred_element_type=jnp.float32)
    scores = scores * (Dh**-0.5)
    # Finite mask value: fully-masked rows (left-pad positions) must produce
    # finite (garbage) outputs, not NaN — NaN would poison downstream layers
    # through 0 * NaN in the probability-weighted sum.
    scores = jnp.where(mask[:, None, None, :, :], scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v)
    return out.reshape(B, S, H, Dh)


def use_pallas_attention(cfg: Optional["BackboneConfig"] = None) -> bool:
    """Pallas flash-decode on TPU backends; XLA fallback elsewhere (CPU tests,
    virtual meshes). Decided at trace time.

    With a cfg, also requires the fused KV minor dim (n_kv*head_dim) to be a
    multiple of 128: Mosaic HBM DMA slices are 128-lane granular, so smaller
    geometries (the TINY test config: 2x16=32) must take the XLA path."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    if cfg is not None and (cfg.n_kv_heads * cfg.head_dim) % 128 != 0:
        return False
    return on_tpu


def _qkv(cfg: BackboneConfig, lp: Params, h: jax.Array, cos, sin):
    """h: [B, S, D] -> q [B,S,H,Dh], k/v [B,S,K,Dh] with RoPE applied."""
    B, S, _ = h.shape
    q = _mm(h, lp["wq"]).astype(h.dtype) + lp["bq"]
    k = _mm(h, lp["wk"]).astype(h.dtype) + lp["bk"]
    v = _mm(h, lp["wv"]).astype(h.dtype) + lp["bv"]
    q = apply_rope(q.reshape(B, S, cfg.n_heads, cfg.head_dim), cos, sin)
    k = apply_rope(k.reshape(B, S, cfg.n_kv_heads, cfg.head_dim), cos, sin)
    v = v.reshape(B, S, cfg.n_kv_heads, cfg.head_dim)
    return q, k, v


def _mlp(cfg: BackboneConfig, lp: Params, x: jax.Array) -> jax.Array:
    B, S, D = x.shape
    if isinstance(lp["w_gate"], dict):
        F = lp["w_gate"]["q"].shape[-1]
        from neutts_tpu.ops import mlp as mlp_ops

        if mlp_ops.use_fused_mlp(D, F, B * S):
            # Fused Pallas MLP (prefill/admission hot path): rms_norm +
            # W8A8 quant + gate/up/down int8 dots + silu*up + residual in
            # one VMEM-resident pass — 1.52x the XLA path at admission
            # shapes on v5e (ops/mlp.py). Quantized weights imply inference
            # (the trainer keeps bf16 params), so no VJP is needed here.
            y = mlp_ops.fused_mlp(
                x.reshape(B * S, D),
                lp["mlp_norm"],
                lp["w_gate"]["q"], lp["w_gate"]["s"],
                lp["w_up"]["q"], lp["w_up"]["s"],
                lp["w_down"]["q"], lp["w_down"]["s"],
                eps=cfg.rms_norm_eps,
            )
            return y.reshape(B, S, D)
    h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
    gate = _mm(h, lp["w_gate"])
    up = _mm(h, lp["w_up"])
    ff = (jax.nn.silu(gate) * up).astype(x.dtype)
    return x + _mm(ff, lp["w_down"]).astype(x.dtype)


def _block_fresh(cfg: BackboneConfig, lp: Params, x, cos, sin, mask,
                 valid=None, pads=None):
    """Transformer block over a fresh window (no cache read): prefill/training.

    mask: [B, S, S] (causal + padding); valid: optional [B, S] non-pad flags
    enabling the flash path; pads: optional [B] left-pad counts enabling the
    Pallas prefill kernel (see _attend_block). Returns (x_out, k, v) — k/v
    for the caller to write into the cache.
    """
    B, S, D = x.shape
    qkv_out = None
    if isinstance(lp.get("wq"), dict) and "wqkv" in lp:
        from neutts_tpu.ops import mlp as mlp_ops

        QKV = lp["wqkv"]["q"].shape[-1]
        if mlp_ops.use_fused_qkv(D, QKV, B * S):
            # Pallas fused QKV (prefill/admission): rms_norm + W8A8 quant +
            # one [D, Q+2KV] int8 dot + bias in a VMEM-resident pass
            flat = mlp_ops.fused_qkv(
                x.reshape(B * S, D), lp["attn_norm"],
                lp["wqkv"]["q"], lp["wqkv"]["s"], lp["wqkv"]["b"],
                eps=cfg.rms_norm_eps,
            ).reshape(B, S, QKV)
            Qd, KVd = cfg.q_dim, cfg.n_kv_heads * cfg.head_dim
            q = apply_rope(
                flat[..., :Qd].reshape(B, S, cfg.n_heads, cfg.head_dim),
                cos, sin)
            k = apply_rope(
                flat[..., Qd : Qd + KVd].reshape(
                    B, S, cfg.n_kv_heads, cfg.head_dim), cos, sin)
            v = flat[..., Qd + KVd :].reshape(
                B, S, cfg.n_kv_heads, cfg.head_dim)
            qkv_out = (q, k, v)
    if qkv_out is None:
        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, h, cos, sin)
    else:
        q, k, v = qkv_out
    attn = _attend_block(q, k, v, mask, valid=valid, pads=pads).reshape(
        x.shape[0], x.shape[1], cfg.q_dim)
    x = x + _mm(attn, lp["wo"]).astype(x.dtype)
    return _mlp(cfg, lp, x), k, v





def prefill(
    cfg: BackboneConfig,
    params: Params,
    tokens: jax.Array,  # [B, Lp] int32, LEFT-padded prompts
    prompt_lens: jax.Array,  # [B] int32 — true lengths (pad is at the front)
    cache: KVCache,
    speech_head: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Process left-padded prompts; returns (last-position logits [B, V], cache).

    Left padding means every sequence's last real token sits at index Lp-1, so
    decode writes land at a single shared cache index — no per-sequence
    scatter. The cache is a scan CARRY updated in place with
    `dynamic_update_slice` (XLA aliases carries; no full-cache copies).
    """
    B, Lp = tokens.shape
    pad = (Lp - prompt_lens).astype(jnp.int32)  # [B]
    idx = jnp.arange(Lp, dtype=jnp.int32)
    positions = jnp.maximum(idx[None, :] - pad[:, None], 0)  # [B, Lp]
    cos, sin = rope_tables(cfg.head_dim, cfg.rope_theta, positions)
    # within-block causal + left-pad mask: [B, Lp, Lp]
    mask = (idx[None, None, :] <= idx[None, :, None]) & (
        idx[None, None, :] >= pad[:, None, None]
    )
    valid = idx[None, :] >= pad[:, None]  # [B, Lp] — flash-path segments
    x = params["embed"].astype(jnp.dtype(cfg.dtype))[tokens]

    quant = cache.quantized
    int4 = cache.int4
    if int4:
        assert Lp % 2 == 0, f"int4 KV needs even prompt buckets, got {Lp}"

    def body(carry, lp_l):
        x, all_k, all_v, ks, vs, kp, vp = carry
        lp, l = lp_l
        x, k, v = _block_fresh(cfg, lp, x, cos, sin, mask, valid=valid,
                               pads=pad)
        B_, S_ = k.shape[0], k.shape[1]
        kf = k.reshape(B_, S_, -1)
        vf = v.reshape(B_, S_, -1)
        if int4:
            kq, ksc = quantize_kv4(kf)
            vq, vsc = quantize_kv4(vf)
            all_k = lax.dynamic_update_slice(all_k, pack4_pairs(kq)[None], (l, 0, 0, 0))
            all_v = lax.dynamic_update_slice(all_v, pack4_pairs(vq)[None], (l, 0, 0, 0))
            half = ks.shape[2] // 2
            ks = lax.dynamic_update_slice(ks, ksc[:, 0::2][None], (l, 0, 0))
            ks = lax.dynamic_update_slice(ks, ksc[:, 1::2][None], (l, 0, half))
            vs = lax.dynamic_update_slice(vs, vsc[:, 0::2][None], (l, 0, 0))
            vs = lax.dynamic_update_slice(vs, vsc[:, 1::2][None], (l, 0, half))
            # seed the prev-nibble registers with the LAST prompt token
            # (left padding puts it at Lp-1 for every row) so an odd-parity
            # first decode write can pair with it
            kp = lax.dynamic_update_slice(kp, kq[None, :, -1, :], (l, 0, 0))
            vp = lax.dynamic_update_slice(vp, vq[None, :, -1, :], (l, 0, 0))
        elif quant:
            kq, ksc = quantize_kv(kf)
            vq, vsc = quantize_kv(vf)
            all_k = lax.dynamic_update_slice(all_k, kq[None], (l, 0, 0, 0))
            all_v = lax.dynamic_update_slice(all_v, vq[None], (l, 0, 0, 0))
            ks = lax.dynamic_update_slice(ks, ksc[None], (l, 0, 0))
            vs = lax.dynamic_update_slice(vs, vsc[None], (l, 0, 0))
        else:
            all_k = lax.dynamic_update_slice(
                all_k, kf.astype(all_k.dtype)[None], (l, 0, 0, 0)
            )
            all_v = lax.dynamic_update_slice(
                all_v, vf.astype(all_v.dtype)[None], (l, 0, 0, 0)
            )
        return (x, all_k, all_v, ks, vs, kp, vp), None

    layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    dummy = jnp.zeros((), jnp.float32)
    ks0 = cache.k_scale if quant else dummy
    vs0 = cache.v_scale if quant else dummy
    kp0 = cache.k_prev if int4 else dummy
    vp0 = cache.v_prev if int4 else dummy
    (x, new_k, new_v, new_ks, new_vs, new_kp, new_vp), _ = lax.scan(
        body, (x, cache.k, cache.v, ks0, vs0, kp0, vp0),
        (params["layers"], layer_ids)
    )
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if speech_head:
        logits = _logits_speech(cfg, params, x[:, -1, :])
    else:
        logits = _logits(cfg, params, x[:, -1, :])
    if int4:
        return logits, KVCache(new_k, new_v, new_ks, new_vs, new_kp, new_vp)
    if quant:
        return logits, KVCache(new_k, new_v, new_ks, new_vs)
    return logits, KVCache(k=new_k, v=new_v)


def decode_step(
    cfg: BackboneConfig,
    params: Params,
    token: jax.Array,  # [B] int32 — previous token
    cache: KVCache,
    cur_index: jax.Array,  # scalar int32 — cache slot to write (= Lp + step)
    pad: jax.Array,  # [B] int32 — left-pad amounts from prefill
    trim_logits: bool = True,
    speech_head: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """One AR decode step: returns (logits [B, V], new cache).

    trim_logits=False returns padded-vocab logits (see `_logits`); pair it
    with the `vocab_size` argument of the sampling ops. speech_head=True
    returns speech-sub-vocab logits instead (see add_speech_head); pair
    with ops/sampling.py sample_step_speech.
    """
    from neutts_tpu.ops import attention as attn_ops

    B = token.shape[0]
    K, G = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads
    positions = (cur_index - pad)[:, None]  # [B, 1]
    cos, sin = rope_tables(cfg.head_dim, cfg.rope_theta, positions)
    lens = jnp.full((B,), cur_index + 1, jnp.int32)  # write-then-attend
    x = params["embed"].astype(jnp.dtype(cfg.dtype))[token[:, None]]
    pallas = use_pallas_attention(cfg)
    quant = cache.quantized
    int4 = cache.int4

    def body(carry, lp_l):
        x, all_k, all_v, ks, vs, kp, vp = carry
        lp, l = lp_l
        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, h, cos, sin)
        # write the current token's K/V first (in-place on the scan carry),
        # then attend over [pad, cur_index] — no separate self term
        kf = k[:, 0].reshape(B, -1)
        vf = v[:, 0].reshape(B, -1)
        all_k, all_v, ks, vs, kp, vp = write_kv_token(
            all_k, all_v, ks, vs, kf, vf, l, cur_index, K,
            int4=int4, quant=quant, k_prev=kp, v_prev=vp)
        qg = q[:, 0].reshape(B, K, G, cfg.head_dim)
        if pallas:
            attn = attn_ops.decode_attention_stacked(
                qg, all_k, all_v, l, lens, pad,
                k_scale=ks if quant else None,
                v_scale=vs if quant else None,
            )
        else:
            ck = lax.dynamic_index_in_dim(all_k, l, 0, keepdims=False)
            cv = lax.dynamic_index_in_dim(all_v, l, 0, keepdims=False)
            if int4:
                ck = dequant_kv4(ck, lax.dynamic_index_in_dim(ks, l, 0, keepdims=False))
                cv = dequant_kv4(cv, lax.dynamic_index_in_dim(vs, l, 0, keepdims=False))
            elif quant:
                ck = ck.astype(jnp.float32) * lax.dynamic_index_in_dim(ks, l, 0, keepdims=False)[..., None]
                cv = cv.astype(jnp.float32) * lax.dynamic_index_in_dim(vs, l, 0, keepdims=False)[..., None]
            attn = attn_ops.decode_attention_xla(qg, ck, cv, lens, pad)
        attn = attn.astype(x.dtype).reshape(B, 1, cfg.q_dim)
        x = x + _mm(attn, lp["wo"]).astype(x.dtype)
        x = _mlp(cfg, lp, x)
        return (x, all_k, all_v, ks, vs, kp, vp), None

    layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    dummy = jnp.zeros((), jnp.float32)
    (x, new_k, new_v, new_ks, new_vs, new_kp, new_vp), _ = lax.scan(
        body,
        (x, cache.k, cache.v,
         cache.k_scale if quant else dummy,
         cache.v_scale if quant else dummy,
         cache.k_prev if int4 else dummy,
         cache.v_prev if int4 else dummy),
        (params["layers"], layer_ids),
    )
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if speech_head:
        logits = _logits_speech(cfg, params, x[:, 0, :])
    else:
        logits = _logits(cfg, params, x[:, 0, :], trim=trim_logits)
    if int4:
        return logits, KVCache(new_k, new_v, new_ks, new_vs, new_kp, new_vp)
    if quant:
        return logits, KVCache(new_k, new_v, new_ks, new_vs)
    return logits, KVCache(k=new_k, v=new_v)


def forward_train(
    cfg: BackboneConfig,
    params: Params,
    tokens: jax.Array,  # [B, S] int32, RIGHT-padded (training layout)
    attn_mask: jax.Array,  # [B, S] bool — True on real tokens
    remat: bool = False,
) -> jax.Array:
    """Full-sequence causal forward for training: logits [B, S, V].

    No KV cache: the whole sequence is processed in one pass (the finetune
    path, reference examples/finetune.py:139-165 — HF Trainer fwd/bwd).
    Right padding here (vs LEFT for inference) matches the reference's
    training preprocessing (examples/finetune.py:78-93).

    remat=True wraps each layer in jax.checkpoint: backward recomputes the
    block activations instead of saving them, cutting peak training memory
    from O(L) to O(1) layer activations (~25x less for Air at seq 2048) at
    ~1/3 extra forward FLOPs — the standard TPU memory/compute trade for
    long-sequence finetuning. Gradients are bit-identical (pinned in
    tests/test_train.py).
    """
    B, S = tokens.shape
    x = params["embed"].astype(jnp.dtype(cfg.dtype))[tokens]
    positions = jnp.cumsum(attn_mask.astype(jnp.int32), axis=-1) - 1
    positions = jnp.maximum(positions, 0)
    cos, sin = rope_tables(cfg.head_dim, cfg.rope_theta, positions)
    idx = jnp.arange(S, dtype=jnp.int32)
    causal = idx[None, :, None] >= idx[None, None, :]  # [1, S, S]
    mask = causal & attn_mask[:, None, :]

    def body(x, lp):
        x, _, _ = _block_fresh(cfg, lp, x, cos, sin, mask)
        return x, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return _logits(cfg, params, x)
