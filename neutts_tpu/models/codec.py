"""NeuCodec-equivalent neural audio codec, pure-functional JAX.

Fills the role of the external `neucodec` package in the reference
(reference neutts/neutts.py:12, 168-214, 266-295): a 50 Hz, single-codebook
(65,536-entry) codec with a 16 kHz mono encoder and a 24 kHz decoder
(hop 480 out / 320 in — reference neutts/neutts.py:84-86, README.md:34).

Pinned public invariants (verified against shipped sample artifacts in
SURVEY.md §0): `encode([1,T16k]) -> [1, ceil(T/320)]` int32 codes in
[0, 65536); `decode([1,N]) -> [1, N*480]` float waveform in [-1, 1].

Architecture (from-scratch TPU design, informed by the public FSQ/codec
literature — NOT copied from the unavailable neucodec internals):
  * Encoder: conv stem + 4 strided residual stages (strides 2,4,5,8 = 320x)
    -> 1x1 projection to an 8-dim FSQ latent.
  * Quantizer: finite scalar quantization, 8 dims x 4 levels = 4**8 = 65,536
    codes — exact integer round-trip, no codebook-collapse machinery needed.
  * Decoder: 1x1 latent expansion + conv stem, 4 transposed-conv stages
    (strides 6,5,4,4 = 480x) each followed by a multi-kernel residual block
    fusion (HiFi-GAN-style MRF), tanh head.

TPU-first choices: NWC layout (channels-last feeds the MXU), f32 compute for
audio fidelity, every conv is `lax.conv_general_dilated` so XLA fuses the
elementwise tails; all shapes static under jit. The decoder's hot conv stack
has a Pallas path in neutts_tpu/ops (used when profitable).

The effective receptive field is deliberately bounded so the reference's
streaming windows (lookback 50 / lookforward 5 frames, reference
neutts/neutts.py:86-91) remain valid; tests/test_codec.py measures it.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from neutts_tpu.config import CodecConfig

Params = Dict[str, Any]

_DN = ("NWC", "WIO", "NWC")  # 1-D conv layout: batch, width(time), channels


# --- conv helpers -------------------------------------------------------------


def conv1d(x, w, b=None, stride=1, dilation=1, padding="SAME"):
    """x: [B, T, Cin], w: [K, Cin, Cout]."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
    )
    if b is not None:
        y = y + b
    return y


def conv1d_transpose(x, w, b=None, stride=1):
    """x: [B, T, Cin], w: [K, Cin, Cout] -> [B, T*stride, Cout]."""
    y = lax.conv_transpose(
        x, w, strides=(stride,), padding="SAME", dimension_numbers=_DN
    )
    if b is not None:
        y = y + b
    return y


def _winit(key, shape, gain=1.0):
    fan_in = shape[0] * shape[1]
    return jax.random.normal(key, shape, jnp.float32) * (gain / jnp.sqrt(fan_in))


def _act(x):
    return jax.nn.leaky_relu(x, 0.1)


# --- FSQ quantizer ------------------------------------------------------------


def fsq_bound(z: jax.Array) -> jax.Array:
    """Map latent to (-1, 1) per dim before quantization."""
    return jnp.tanh(z)


def fsq_quantize(z: jax.Array, levels: Tuple[int, ...]) -> jax.Array:
    """z: [..., D] bounded in (-1,1) -> integer digits [..., D] in [0, L)."""
    lv = jnp.asarray(levels, jnp.float32)
    digits = jnp.round((z + 1.0) * 0.5 * (lv - 1.0))
    return jnp.clip(digits, 0, lv - 1).astype(jnp.int32)


def fsq_dequantize(digits: jax.Array, levels: Tuple[int, ...]) -> jax.Array:
    lv = jnp.asarray(levels, jnp.float32)
    return digits.astype(jnp.float32) / (lv - 1.0) * 2.0 - 1.0


def digits_to_code(digits: jax.Array, levels: Tuple[int, ...]) -> jax.Array:
    """Mixed-radix pack: code = sum_i digit_i * prod(levels[:i]). [... , D] -> [...]."""
    base = 1
    code = jnp.zeros(digits.shape[:-1], jnp.int32)
    for i, L in enumerate(levels):
        code = code + digits[..., i] * base
        base *= L
    return code


def code_to_digits(code: jax.Array, levels: Tuple[int, ...]) -> jax.Array:
    digits = []
    rem = code
    for L in levels:
        digits.append(rem % L)
        rem = rem // L
    return jnp.stack(digits, axis=-1).astype(jnp.int32)


def fsq_straight_through(z: jax.Array, levels: Tuple[int, ...]) -> jax.Array:
    """Training path: quantize with a straight-through gradient."""
    zb = fsq_bound(z)
    q = fsq_dequantize(fsq_quantize(zb, levels), levels)
    return zb + lax.stop_gradient(q - zb)


# --- parameter init -----------------------------------------------------------


def init_params(cfg: CodecConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 256))
    p: Params = {"enc": {}, "dec": {}}

    # Encoder
    c0 = cfg.enc_channels[0]
    p["enc"]["stem_w"] = _winit(next(keys), (7, 1, c0))
    p["enc"]["stem_b"] = jnp.zeros((c0,))
    stages = []
    cin = c0
    for s, cout in zip(cfg.enc_strides, cfg.enc_channels):
        st = {
            "res1_w1": _winit(next(keys), (3, cin, cin)),
            "res1_b1": jnp.zeros((cin,)),
            "res1_w2": _winit(next(keys), (1, cin, cin)),
            "res1_b2": jnp.zeros((cin,)),
            "down_w": _winit(next(keys), (2 * s, cin, cout)),
            "down_b": jnp.zeros((cout,)),
        }
        stages.append(st)
        cin = cout
    p["enc"]["stages"] = stages
    p["enc"]["post_w"] = _winit(next(keys), (3, cin, cfg.enc_hidden))
    p["enc"]["post_b"] = jnp.zeros((cfg.enc_hidden,))
    p["enc"]["proj_w"] = _winit(next(keys), (1, cfg.enc_hidden, cfg.fsq_dim))
    p["enc"]["proj_b"] = jnp.zeros((cfg.fsq_dim,))

    # Decoder
    C = cfg.dec_channels
    p["dec"]["embed_w"] = _winit(next(keys), (1, cfg.fsq_dim, C))
    p["dec"]["embed_b"] = jnp.zeros((C,))
    p["dec"]["stem_w"] = _winit(next(keys), (7, C, C))
    p["dec"]["stem_b"] = jnp.zeros((C,))
    stages = []
    cin = C
    for s, k in zip(cfg.dec_strides, cfg.dec_kernels):
        cout = max(cin // 2, 16)
        st: Dict[str, Any] = {
            "up_w": _winit(next(keys), (k, cin, cout)),
            "up_b": jnp.zeros((cout,)),
            "res": [],
        }
        for rk, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            blk = []
            for d in dils:
                blk.append(
                    {
                        "w1": _winit(next(keys), (rk, cout, cout)),
                        "b1": jnp.zeros((cout,)),
                        "w2": _winit(next(keys), (rk, cout, cout)),
                        "b2": jnp.zeros((cout,)),
                        "dilation": d,
                    }
                )
            st["res"].append(blk)
        stages.append(st)
        cin = cout
    p["dec"]["stages"] = stages
    p["dec"]["post_w"] = _winit(next(keys), (7, cin, 1))
    p["dec"]["post_b"] = jnp.zeros((1,))
    return p


def param_count(params: Params) -> int:
    return sum(
        int(x.size)
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "size")
    )


# --- encoder ------------------------------------------------------------------


def encode_latent(cfg: CodecConfig, params: Params, wav: jax.Array) -> jax.Array:
    """wav: [B, T] 16 kHz mono in [-1,1] -> latent [B, ceil(T/320), fsq_dim]."""
    e = params["enc"]
    x = wav[..., None]  # [B, T, 1]
    x = conv1d(x, e["stem_w"], e["stem_b"])
    for st, s in zip(e["stages"], cfg.enc_strides):
        r = _act(x)
        r = conv1d(r, st["res1_w1"], st["res1_b1"])
        r = _act(r)
        r = conv1d(r, st["res1_w2"], st["res1_b2"])
        x = x + r
        x = conv1d(_act(x), st["down_w"], st["down_b"], stride=s)
    x = conv1d(_act(x), e["post_w"], e["post_b"])
    z = conv1d(x, e["proj_w"], e["proj_b"])
    return z


def encode(cfg: CodecConfig, params: Params, wav: jax.Array) -> jax.Array:
    """wav [B, T@16k] -> int32 codes [B, floor(T/320)]. Parity surface for
    `NeuCodec.encode_code` (reference neutts/neutts.py:270).

    Frame count is floor(T/320): verified against the shipped artifacts —
    dave.wav resampled to 16 kHz is 119,157 samples and dave.pt holds 372
    codes (119157//320 = 372, ceil would give 373); jo likewise 653.
    """
    T = wav.shape[-1]
    wav = wav[..., : (T // cfg.hop_in) * cfg.hop_in]
    z = fsq_bound(encode_latent(cfg, params, wav))
    digits = fsq_quantize(z, cfg.fsq_levels)
    return digits_to_code(digits, cfg.fsq_levels)


# --- decoder ------------------------------------------------------------------


def decode_from_latent(cfg: CodecConfig, params: Params, zq: jax.Array) -> jax.Array:
    """zq: [B, T_codes, fsq_dim] dequantized latent -> wav [B, T_codes*480]."""
    d = params["dec"]
    x = conv1d(zq, d["embed_w"], d["embed_b"])
    x = conv1d(_act(x), d["stem_w"], d["stem_b"])
    for st, s in zip(d["stages"], cfg.dec_strides):
        x = conv1d_transpose(_act(x), st["up_w"], st["up_b"], stride=s)
        # MRF: average of multi-kernel residual stacks
        acc = None
        for blk in st["res"]:
            r = x
            for unit in blk:
                h = conv1d(_act(r), unit["w1"], unit["b1"], dilation=unit["dilation"])
                h = conv1d(_act(h), unit["w2"], unit["b2"])
                r = r + h
            acc = r if acc is None else acc + r
        x = acc / len(st["res"])
    x = conv1d(_act(x), d["post_w"], d["post_b"])
    return jnp.tanh(x)[..., 0]


def decode(cfg: CodecConfig, params: Params, codes: jax.Array) -> jax.Array:
    """codes [B, N] int32 -> wav [B, N*480] @24 kHz. Parity surface for
    `NeuCodec.decode_code` (reference neutts/neutts.py:287-293)."""
    digits = code_to_digits(codes, cfg.fsq_levels)
    zq = fsq_dequantize(digits, cfg.fsq_levels)
    return decode_from_latent(cfg, params, zq)


# --- jitted entry points ------------------------------------------------------


def make_decode_fn(cfg: CodecConfig, params: Params):
    """Returns a jitted decode closed over params (shape-polymorphic via
    per-length compile; callers bucket code lengths)."""

    @jax.jit
    def _decode(codes):
        return decode(cfg, params, codes)

    return _decode


def make_encode_fn(cfg: CodecConfig, params: Params):
    @jax.jit
    def _encode(wav):
        return encode(cfg, params, wav)

    return _encode
