"""XCodec2-lineage acoustic CodecEncoder + conv SemanticEncoder, JAX.

This is the REAL NeuCodec encoder family (the acoustic branch behind
`NeuCodec.encode_code`, reference neutts/neutts.py:266-271): the codec's
public lineage is XCodec2, whose encoder is the DAC/EnCodec convolutional
stack —

    CodecEnc:  WN conv stem (k7)
               -> one EncoderBlock per stride (channels double per block):
                    ResidualUnit x len(dilations)  (snake -> WN k7 dilated
                                                    -> snake -> WN k1, skip)
                    snake -> WN downsample conv (k = 2*stride)
               -> optional stacked unidirectional LSTM with skip (EnCodec
                  SLSTM convention)
               -> snake -> WN out conv (k3) to out_channels

    SemanticEncoder (conv variant): initial k3 conv (no bias)
               -> [ReLU -> k3 conv -> ReLU -> k3 conv] + residual
               -> final k3 conv (no bias)

Activations are SnakeBeta (x + sin^2(alpha x)/beta, per-channel learned
alpha/beta, optionally log-scaled), optionally wrapped in the BigVGAN
alias-free Activation1d (kaiser-sinc 2x upsample -> snake -> 2x lowpass
downsample); the anti-aliasing filters are fixed buffers, recomputed here
and VERIFIED against checkpoint buffers at conversion time
(models/convert_codec.py).

Everything is shape-driven: models/convert_codec.py recovers the geometry
(ngf, strides, residual-unit count, LSTM depth, alias-free mode, snake
variant) from a real checkpoint's `CodecEnc.*` / `SemanticEncoder*.*` keys
and fuses torch weight-norm into plain conv weights.

TPU notes: the encoder runs once per reference clip (voice cloning), so the
throughput-critical path is elsewhere; still, convs are channels-last NWC
(MXU-tiled by XLA), the LSTM input projection is hoisted out of the scan
into one big [B*T, 4H] matmul, and all shapes are static under jit.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from neutts_tpu.config import CodecEncConfig

Params = Dict[str, Any]

_DN = ("NWC", "WIO", "NWC")
_SNAKE_EPS = 1e-9  # BigVGAN no_div_by_zero


# --- alias-free resampling (BigVGAN alias_free_torch semantics) ---------------


def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc lowpass, matching the torch reference
    implementation the checkpoints' buffers were built with (symmetric
    kaiser window, even kernels sampled at half-integer times,
    sum-normalized)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4.0 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        f = np.zeros(kernel_size)
    else:
        f = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
        f = f / f.sum()
    return f.astype(np.float32)


def _depthwise_kernel(filt: np.ndarray, channels: int) -> jax.Array:
    """[K] filter -> [K, 1, C] depthwise conv kernel (same filter per
    channel, feature_group_count=C)."""
    k = jnp.asarray(filt)[:, None, None]
    return jnp.broadcast_to(k, (filt.shape[0], 1, channels))


def upsample2(x: jax.Array, kernel_size: int = 12) -> jax.Array:
    """[B, T, C] -> [B, 2T, C]: replicate-pad, kaiser-sinc transposed conv
    (stride 2, x2 gain), center crop — UpSample1d(ratio=2) semantics."""
    ratio = 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # conv_transpose == lhs-dilated cross-correlation with the flipped kernel
    y = lax.conv_general_dilated(
        xp,
        _depthwise_kernel(filt[::-1].copy(), c),
        window_strides=(1,),
        padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(ratio,),
        dimension_numbers=_DN,
        feature_group_count=c,
    )
    y = ratio * y
    return y[:, pad_left : y.shape[1] - pad_right, :]


def downsample2(x: jax.Array, kernel_size: int = 12) -> jax.Array:
    """[B, 2T, C] -> [B, T, C]: replicate-pad + strided kaiser-sinc lowpass
    — DownSample1d(ratio=2) / LowPassFilter1d semantics."""
    ratio = 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        xp,
        _depthwise_kernel(filt, c),
        window_strides=(ratio,),
        padding=[(0, 0)],
        dimension_numbers=_DN,
        feature_group_count=c,
    )


# --- snake activations --------------------------------------------------------


def snake(cfg: CodecEncConfig, p: Params, x: jax.Array) -> jax.Array:
    """Per-channel snake: x + sin^2(alpha x) / (beta + eps). `beta` absent
    (plain DAC Snake1d) -> beta = alpha; cfg.snake_logscale -> params are
    log(alpha)/log(beta) (BigVGAN SnakeBeta alpha_logscale)."""
    alpha = p["alpha"].reshape(1, 1, -1)
    beta = p.get("beta")
    beta = alpha if beta is None else beta.reshape(1, 1, -1)
    if cfg.snake_logscale:
        alpha, beta = jnp.exp(alpha), jnp.exp(beta)
    return x + jnp.square(jnp.sin(alpha * x)) / (beta + _SNAKE_EPS)


def act1d(cfg: CodecEncConfig, p: Params, x: jax.Array) -> jax.Array:
    """Snake, optionally anti-aliased (up2 -> snake -> down2)."""
    if not cfg.alias_free:
        return snake(cfg, p, x)
    return downsample2(snake(cfg, p, upsample2(x, cfg.act_kernel)),
                       cfg.act_kernel)


# --- conv / lstm building blocks ---------------------------------------------


def _conv(x, w, b=None, *, stride=1, dilation=1, pad=0):
    """torch Conv1d semantics: x [B,T,Cin], w [K,Cin,Cout], symmetric
    explicit padding."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
    )
    return y if b is None else y + b


def residual_unit(cfg: CodecEncConfig, p: Params, x: jax.Array,
                  dilation: int) -> jax.Array:
    y = act1d(cfg, p["act1"], x)
    k = p["w1"].shape[0]
    y = _conv(y, p["w1"], p["b1"], dilation=dilation,
              pad=((k - 1) * dilation) // 2)
    y = act1d(cfg, p["act2"], y)
    y = _conv(y, p["w2"], p["b2"], pad=0)
    return x + y


def encoder_block(cfg: CodecEncConfig, p: Params, x: jax.Array,
                  stride: int) -> jax.Array:
    for up, d in zip(p["units"], cfg.dilations):
        x = residual_unit(cfg, up, x, d)
    x = act1d(cfg, p["act"], x)
    return _conv(x, p["down_w"], p["down_b"], stride=stride,
                 pad=math.ceil(stride / 2))


def lstm_layer(p: Params, x: jax.Array) -> jax.Array:
    """One torch nn.LSTM layer over [B, T, C] (unidirectional, zero init
    state; gate order i,f,g,o). Input projection hoisted to one MXU matmul;
    the scan carries only the [B,H] recurrence."""
    b, t, _ = x.shape
    h_dim = p["w_hh"].shape[1]
    xg = jnp.einsum("btc,gc->btg", x, p["w_ih"]) + p["b_ih"] + p["b_hh"]

    def step(carry, xg_t):
        h, c = carry
        g = xg_t + h @ p["w_hh"].T
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))
    _, ys = lax.scan(step, init, jnp.swapaxes(xg, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


def slstm(p_layers, x: jax.Array) -> jax.Array:
    """EnCodec SLSTM: stacked LSTM layers + skip from the stack input."""
    y = x
    for lp in p_layers:
        y = lstm_layer(lp, y)
    return x + y


# --- full encoder forward -----------------------------------------------------


def forward(cfg: CodecEncConfig, p: Params, wav: jax.Array) -> jax.Array:
    """wav [B, T@16k] -> acoustic features [B, T/prod(up_ratios), out_ch]."""
    x = wav[..., None]
    k = p["stem_w"].shape[0]
    x = _conv(x, p["stem_w"], p["stem_b"], pad=(k - 1) // 2)
    for blk, s in zip(p["blocks"], cfg.up_ratios):
        x = encoder_block(cfg, blk, x, s)
    if cfg.rnn_layers:
        x = slstm(p["lstm"], x)
    x = act1d(cfg, p["post_act"], x)
    k = p["post_w"].shape[0]
    return _conv(x, p["post_w"], p["post_b"], pad=(k - 1) // 2)


def semantic_encoder(p: Params, x: jax.Array) -> jax.Array:
    """Conv SemanticEncoder (XCodec2): [B, T, Cin] tower features ->
    [B, T, code_dim]. initial k3 conv (no bias) -> [ReLU -> k3 -> ReLU ->
    k3] + skip -> final k3 conv (no bias).

    The skip adds relu(x), not x: upstream's first residual-block ReLU is
    `inplace=True`, so by the time `residual_blocks(x) + x` evaluates, the
    skip tensor has already been rectified in place. Behavioral constant —
    pinned by the torch oracle in tests/test_codecenc.py."""
    k = p["init_w"].shape[0]
    x = _conv(x, p["init_w"], pad=(k - 1) // 2)
    x = jax.nn.relu(x)
    y = _conv(x, p["res1_w"], p.get("res1_b"), pad=(k - 1) // 2)
    y = jax.nn.relu(y)
    y = _conv(y, p["res2_w"], p.get("res2_b"), pad=(k - 1) // 2)
    x = x + y
    return _conv(x, p["final_w"], pad=(k - 1) // 2)


# --- init (from-scratch training of this family) ------------------------------


def _winit(key, shape, gain=1.0):
    fan_in = int(np.prod(shape[:-1]))
    return jax.random.normal(key, shape, jnp.float32) * (gain / np.sqrt(fan_in))


def _snake_init(c: int, cfg: CodecEncConfig) -> Params:
    # logscale: exp(0) = 1; plain: alpha = beta = 1
    v = 0.0 if cfg.snake_logscale else 1.0
    return {"alpha": jnp.full((c,), v), "beta": jnp.full((c,), v)}


def init_params(cfg: CodecEncConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 4096))
    d = cfg.ngf
    p: Params = {
        "stem_w": _winit(next(keys), (7, 1, d)),
        "stem_b": jnp.zeros((d,)),
    }
    blocks = []
    for s in cfg.up_ratios:
        units = []
        for _ in cfg.dilations:
            units.append({
                "act1": _snake_init(d, cfg),
                "w1": _winit(next(keys), (7, d, d)),
                "b1": jnp.zeros((d,)),
                "act2": _snake_init(d, cfg),
                "w2": _winit(next(keys), (1, d, d)),
                "b2": jnp.zeros((d,)),
            })
        blocks.append({
            "units": units,
            "act": _snake_init(d, cfg),
            "down_w": _winit(next(keys), (2 * s, d, 2 * d)),
            "down_b": jnp.zeros((2 * d,)),
        })
        d *= 2
    p["blocks"] = blocks
    if cfg.rnn_layers:
        p["lstm"] = [
            {
                "w_ih": _winit(next(keys), (d, 4 * d)).T,
                "w_hh": _winit(next(keys), (d, 4 * d)).T,
                "b_ih": jnp.zeros((4 * d,)),
                "b_hh": jnp.zeros((4 * d,)),
            }
            for _ in range(cfg.rnn_layers)
        ]
    p["post_act"] = _snake_init(d, cfg)
    p["post_w"] = _winit(next(keys), (3, d, cfg.out_channels))
    p["post_b"] = jnp.zeros((cfg.out_channels,))
    return p


def init_semantic_encoder(key: jax.Array, in_dim: int, code_dim: int,
                          hidden: Optional[int] = None,
                          kernel: int = 3) -> Params:
    hidden = code_dim if hidden is None else hidden
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "init_w": _winit(k1, (kernel, in_dim, hidden)),
        "res1_w": _winit(k2, (kernel, hidden, hidden)),
        "res1_b": jnp.zeros((hidden,)),
        "res2_w": _winit(k3, (kernel, hidden, hidden)),
        "res2_b": jnp.zeros((hidden,)),
        "final_w": _winit(k4, (kernel, hidden, code_dim)),
    }
