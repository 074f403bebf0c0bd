"""NeuCodec-equivalent neural audio codec, pure-functional JAX.

Fills the role of the external `neucodec` package in the reference
(reference neutts/neutts.py:12, 168-214, 266-295): a 50 Hz, single-codebook
(65,536-entry) codec with a 16 kHz mono encoder and a 24 kHz decoder
(hop 480 out / 320 in — reference neutts/neutts.py:84-86, README.md:34).

Pinned public invariants (verified against shipped sample artifacts in
SURVEY.md §0): `encode([1,T16k]) -> [1, floor(T/320)]` int32 codes in
[0, 65536); `decode([1,N]) -> [1, N*480]` float waveform.

Architecture family — recovered from the codec's PUBLIC lineage, not copied:
the reference codec derives from XCodec2 (itself built on public components),
whose decode path is

    codes -> ResidualFSQ.get_output_from_indices (lucidrains
    vector-quantize-pytorch FSQ conventions + project_out)
          -> fc_post_a linear
          -> Vocos-family backbone over the 50 Hz frame sequence
          -> ISTFT head (linear -> mag/phase -> inverse STFT, "same" padding)

This module implements exactly that family:
  * FSQ with the lucidrains conventions (tanh bound with even-level shift,
    half-width normalization, little-endian mixed-radix index packing) so a
    converted real checkpoint dequantizes bit-identically;
  * a backbone selectable between "transformer" (pre-norm MHA + GELU MLP,
    optional RoPE — the XCodec2 variant) and "convnext" (depthwise k7 +
    pointwise MLP — the original Vocos variant); real hyperparameters are
    recovered from checkpoint weight shapes by models/convert_codec.py;
  * an ISTFT head with hop 480 / n_fft 1920 "same" padding, vectorized as
    irfft + a 4-way shifted overlap-add (no scatter, MXU/VPU friendly).

The encoder combines a from-scratch trainable acoustic branch (conv stages
+ projections + FSQ) with the real NeuCodec encode composition's w2v-BERT
SEMANTIC branch (models/semantic.py + audio/mel.py, enabled by
CodecConfig.semantic): tower features are projected and concatenated with
the acoustic features before the fc_prior projection. Converted real
checkpoints with encoder weights load the full composition
(models/convert_codec.py map_encoder_state_dict).

TPU-first choices: NWC layout (channels-last feeds the MXU), f32 compute for
audio fidelity, backbone blocks scan-stacked so compile time is depth-
independent, everything static-shaped under jit.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from neutts_tpu.config import CodecConfig

Params = Dict[str, Any]

_DN = ("NWC", "WIO", "NWC")  # 1-D conv layout: batch, width(time), channels
_FSQ_EPS = 1e-3  # lucidrains FSQ bound epsilon


# --- conv / init helpers --------------------------------------------------------


def conv1d(x, w, b=None, stride=1, dilation=1, padding="SAME", groups=1):
    """x: [B, T, Cin], w: [K, Cin//groups, Cout]."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def _winit(key, shape, gain=1.0):
    fan_in = int(np.prod(shape[:-1]))
    return jax.random.normal(key, shape, jnp.float32) * (gain / np.sqrt(fan_in))


def _binit(key, n, fan_in):
    """torch nn.Linear-style uniform bias init: keeps activations off exact
    zero at init (an all-zero decoder input parks LayerNorm at var=0, whose
    rsqrt curvature explodes early training gradients)."""
    bound = 1.0 / np.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, (n,), jnp.float32, -bound, bound)


def _act(x):
    return jax.nn.leaky_relu(x, 0.1)


def layer_norm(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * scale + bias


# --- FSQ quantizer (lucidrains vector-quantize-pytorch conventions) ------------
#
# For level L: half_width h = L // 2, half_l = (L-1)(1+eps)/2, offset
# o = 0.5 if L even else 0, shift = atanh(o / half_l). Bounded latent
# (normalized): (tanh(z + shift) * half_l - o) / h; quantized lattice points
# are {(d - h)/h : d in [0, L)} — for L=4 that is {-1, -0.5, 0, 0.5}.
# Index packing is little-endian mixed radix (first dim least significant).


def _fsq_consts(levels: Tuple[int, ...]):
    lv = jnp.asarray(levels, jnp.float32)
    half_width = jnp.floor(lv / 2.0)
    half_l = (lv - 1.0) * (1.0 + _FSQ_EPS) / 2.0
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return half_width, half_l, offset, shift


def fsq_bound(z: jax.Array, levels: Tuple[int, ...]) -> jax.Array:
    """Raw latent [..., D] -> bounded NORMALIZED latent (quantizer domain)."""
    h, half_l, offset, shift = _fsq_consts(levels)
    return (jnp.tanh(z + shift) * half_l - offset) / h


def fsq_quantize(zb: jax.Array, levels: Tuple[int, ...]) -> jax.Array:
    """Bounded normalized latent [..., D] -> integer digits [..., D] in [0, L)."""
    lv = jnp.asarray(levels, jnp.float32)
    h, _, _, _ = _fsq_consts(levels)
    digits = jnp.round(zb * h) + h
    return jnp.clip(digits, 0, lv - 1).astype(jnp.int32)


def fsq_dequantize(digits: jax.Array, levels: Tuple[int, ...]) -> jax.Array:
    """Digits -> normalized lattice values (d - h) / h."""
    h, _, _, _ = _fsq_consts(levels)
    return (digits.astype(jnp.float32) - h) / h


def digits_to_code(digits: jax.Array, levels: Tuple[int, ...]) -> jax.Array:
    """Mixed-radix pack: code = sum_i digit_i * prod(levels[:i]). [..., D] -> [...]."""
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
    """Training path: bounded latent quantized with straight-through grads."""
    zb = fsq_bound(z, levels)
    q = fsq_dequantize(fsq_quantize(zb, levels), levels)
    return zb + lax.stop_gradient(q - zb)


# --- ISTFT head (Vocos "same" padding semantics) --------------------------------


def hann_window(n: int) -> jax.Array:
    """Periodic Hann (torch.hann_window default), f32."""
    i = jnp.arange(n, dtype=jnp.float32)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * i / n))


def istft_same(frames_spec_real, frames_spec_imag, n_fft: int, hop: int,
               n_valid=None):
    """Inverse STFT with "same" padding: [B, T, n_fft//2+1] spectra ->
    [B, T*hop] waveform.

    Matches the Vocos ISTFT module semantics (manual overlap-add with a
    periodic Hann window, window-envelope normalization, crop of
    (n_fft - hop)//2 samples each side). Vectorized as irfft + R shifted
    adds where R = n_fft // hop — no scatter, all static shapes.

    n_valid (scalar int32): length-masked mode — frames >= n_valid contribute
    NOTHING (spectra zeroed, envelope windows excluded), so the first
    n_valid*hop output samples match a T == n_valid call to float32 ULP.
    Used by the bucketed vocoder to decode padded lengths with one compile
    per bucket and no meaningful parity loss.
    """
    assert n_fft % hop == 0, (n_fft, hop)
    R = n_fft // hop
    B, T, F = frames_spec_real.shape
    assert F == n_fft // 2 + 1, (F, n_fft)
    if n_valid is not None:
        fmask = (jnp.arange(T) < n_valid)[None, :, None]
        frames_spec_real = jnp.where(fmask, frames_spec_real, 0.0)
        frames_spec_imag = jnp.where(fmask, frames_spec_imag, 0.0)
    spec = lax.complex(frames_spec_real, frames_spec_imag)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [B, T, n_fft]
    win = hann_window(n_fft)
    frames = frames * win

    # overlap-add: out[(t)*hop : t*hop + n_fft] += frames[t]
    fr = frames.reshape(B, T, R, hop)
    acc = jnp.zeros((B, T + R - 1, hop), jnp.float32)
    for j in range(R):
        acc = acc.at[:, j : j + T, :].add(fr[:, :, j, :])
    y = acc.reshape(B, (T + R - 1) * hop)

    # window-square envelope (static constant under jit unless masked)
    w2 = (win * win).reshape(R, hop)
    if n_valid is None:
        wmask = jnp.ones((T, 1), jnp.float32)
    else:
        wmask = (jnp.arange(T) < n_valid)[:, None].astype(jnp.float32)
    env = jnp.zeros((T + R - 1, hop), jnp.float32)
    for j in range(R):
        env = env.at[j : j + T, :].add(w2[j] * wmask)
    env = env.reshape((T + R - 1) * hop)

    pad = (n_fft - hop) // 2
    y = y[:, pad : pad + T * hop]
    env = env[pad : pad + T * hop]
    return y / jnp.maximum(env, 1e-11)


# --- parameter init -------------------------------------------------------------


def init_params(cfg: CodecConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 1024))
    p: Params = {"enc": {}, "dec": {}}

    # Encoder acoustic branch: either the real XCodec2/DAC stack
    # (models/codecenc.py) or our from-scratch conv stem + strided residual
    # stages, followed by projections to the FSQ
    if cfg.enc_family == "codecenc":
        from neutts_tpu.models import codecenc as ce_mod

        p["enc"]["acoustic"] = ce_mod.init_params(cfg.codecenc, next(keys))
        prior_in = cfg.codecenc.out_channels
    else:
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
        prior_in = cfg.enc_hidden
    if cfg.semantic is not None:
        from neutts_tpu.models import semantic as sem_mod

        p["enc"]["semantic"] = sem_mod.init_params(cfg.semantic, next(keys))
        if cfg.sem_encoder == "conv":
            from neutts_tpu.models import codecenc as ce_mod

            p["enc"]["sem_enc"] = ce_mod.init_semantic_encoder(
                next(keys), cfg.semantic.hidden, cfg.sem_proj_dim)
        else:
            p["enc"]["sem_proj_w"] = _winit(
                next(keys), (cfg.semantic.hidden, cfg.sem_proj_dim))
            p["enc"]["sem_proj_b"] = jnp.zeros((cfg.sem_proj_dim,))
        prior_in += cfg.sem_proj_dim
    # fc_prior role: features -> vq_dim; then ResidualFSQ project_in -> fsq_dim.
    # project_in gain 6: the raw latent must SPAN the FSQ lattice cells at
    # init (tanh-bounded |z| ~ 1+), or every frame collapses into the center
    # cell and the quantizer passes no information.
    p["enc"]["prior_w"] = _winit(next(keys), (prior_in, cfg.vq_dim))
    p["enc"]["prior_b"] = _binit(next(keys), cfg.vq_dim, prior_in)
    p["enc"]["project_in_w"] = _winit(next(keys), (cfg.vq_dim, cfg.fsq_dim), gain=6.0)
    p["enc"]["project_in_b"] = _binit(next(keys), cfg.fsq_dim, cfg.vq_dim)

    # Decoder (Vocos family)
    D, I = cfg.dec_dim, cfg.dec_intermediate
    d: Params = {}
    d["project_out_w"] = _winit(next(keys), (cfg.fsq_dim, cfg.vq_dim))
    d["project_out_b"] = _binit(next(keys), cfg.vq_dim, cfg.fsq_dim)
    d["post_a_w"] = _winit(next(keys), (cfg.vq_dim, D))
    d["post_a_b"] = _binit(next(keys), D, cfg.vq_dim)
    d["embed_w"] = _winit(next(keys), (7, D, D))
    d["embed_b"] = _binit(next(keys), D, 7 * D)

    def stack(shape_fn):
        return jnp.stack([shape_fn(next(keys)) for _ in range(cfg.dec_layers)])

    if cfg.dec_backbone == "transformer":
        d["blocks"] = {
            "norm1_s": jnp.ones((cfg.dec_layers, D)),
            "norm1_b": jnp.zeros((cfg.dec_layers, D)),
            "wq": stack(lambda k: _winit(k, (D, D))),
            "bq": jnp.zeros((cfg.dec_layers, D)),
            "wk": stack(lambda k: _winit(k, (D, D))),
            "bk": jnp.zeros((cfg.dec_layers, D)),
            "wv": stack(lambda k: _winit(k, (D, D))),
            "bv": jnp.zeros((cfg.dec_layers, D)),
            "wo": stack(lambda k: _winit(k, (D, D))),
            "bo": jnp.zeros((cfg.dec_layers, D)),
            "norm2_s": jnp.ones((cfg.dec_layers, D)),
            "norm2_b": jnp.zeros((cfg.dec_layers, D)),
            "mlp_w1": stack(lambda k: _winit(k, (D, I))),
            "mlp_b1": jnp.zeros((cfg.dec_layers, I)),
            "mlp_w2": stack(lambda k: _winit(k, (I, D))),
            "mlp_b2": jnp.zeros((cfg.dec_layers, D)),
        }
    elif cfg.dec_backbone == "convnext":
        d["embed_norm_s"] = jnp.ones((D,))
        d["embed_norm_b"] = jnp.zeros((D,))
        d["blocks"] = {
            "dw_w": stack(lambda k: _winit(k, (7, 1, D))),
            "dw_b": jnp.zeros((cfg.dec_layers, D)),
            "norm_s": jnp.ones((cfg.dec_layers, D)),
            "norm_b": jnp.zeros((cfg.dec_layers, D)),
            "pw1_w": stack(lambda k: _winit(k, (D, I))),
            "pw1_b": jnp.zeros((cfg.dec_layers, I)),
            "pw2_w": stack(lambda k: _winit(k, (I, D))),
            "pw2_b": jnp.zeros((cfg.dec_layers, D)),
            "gamma": jnp.full((cfg.dec_layers, D), 1e-2),
        }
    else:
        raise ValueError(f"unknown dec_backbone {cfg.dec_backbone!r}")
    d["final_norm_s"] = jnp.ones((D,))
    d["final_norm_b"] = jnp.zeros((D,))
    d["head_w"] = _winit(next(keys), (D, cfg.n_fft + 2))
    d["head_b"] = jnp.zeros((cfg.n_fft + 2,))
    p["dec"] = d
    return p


def param_count(params: Params) -> int:
    return sum(
        int(x.size)
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "size")
    )


# --- encoder --------------------------------------------------------------------


def acoustic_features(cfg: CodecConfig, params: Params, wav: jax.Array) -> jax.Array:
    """wav: [B, T] 16 kHz mono in [-1,1] -> acoustic branch [B, T/320, H].

    Dispatches on cfg.enc_family: "codecenc" is the real XCodec2/DAC stack
    (models/codecenc.py, converted from real `CodecEnc.*` checkpoints);
    "ours" is the from-scratch trainable design below."""
    e = params["enc"]
    if cfg.enc_family == "codecenc":
        from neutts_tpu.models import codecenc

        return codecenc.forward(cfg.codecenc, e["acoustic"], wav)
    x = wav[..., None]  # [B, T, 1]
    x = conv1d(x, e["stem_w"], e["stem_b"])
    for st, s in zip(e["stages"], cfg.enc_strides):
        r = _act(x)
        r = conv1d(r, st["res1_w1"], st["res1_b1"])
        r = _act(r)
        r = conv1d(r, st["res1_w2"], st["res1_b2"])
        x = x + r
        x = conv1d(_act(x), st["down_w"], st["down_b"], stride=s)
    return conv1d(_act(x), e["post_w"], e["post_b"])


def encode_features(cfg: CodecConfig, params: Params, wav: jax.Array,
                    sem_feats=None) -> jax.Array:
    """wav: [B, T] 16 kHz mono in [-1,1] -> features [B, T/320, vq_dim].

    sem_feats: [B, T/320, semantic.input_dim] log-mel stacks from the host
    front-end (audio/mel.py semantic_features over the 160-sample-padded
    waveform — the padding aligns the 50 Hz fbank grid with the acoustic
    hop). Required when cfg.semantic is set: the w2v-BERT tower output is
    projected and CONCATENATED SEMANTIC-FIRST with the acoustic branch
    before the fc_prior projection — the real NeuCodec/XCodec2 encode
    composition (reference neutts/neutts.py:266-271 via the external
    neucodec package) concatenates cat([semantic_encoded, vq_emb]), and a
    converted real fc_prior sees its input halves in that order."""
    e = params.get("enc")
    if e is None:
        raise ValueError(
            "decoder-only codec checkpoint: encoding reference audio needs "
            "encoder weights (train them via neutts_tpu.train, or use "
            "pre-encoded ref codes as in the reference's ONNX-decoder mode, "
            "reference examples/onnx_example.py)"
        )
    x = acoustic_features(cfg, params, wav)
    if cfg.semantic is not None:
        if "semantic" not in e:
            raise ValueError(
                "cfg.semantic is set but the checkpoint has no semantic-"
                "tower weights (params['enc']['semantic'])"
            )
        if sem_feats is None:
            raise ValueError(
                "cfg.semantic is set: pass sem_feats (audio/mel.py "
                "semantic_features of the 160-padded waveform)"
            )
        from neutts_tpu.models import semantic as sem_mod

        sem = sem_mod.forward(cfg.semantic, e["semantic"], sem_feats)
        if cfg.sem_encoder == "conv":  # real XCodec2 SemanticEncoder stack
            from neutts_tpu.models import codecenc

            sem = codecenc.semantic_encoder(e["sem_enc"], sem)
        else:
            sem = sem @ e["sem_proj_w"] + e["sem_proj_b"]
        n = min(x.shape[1], sem.shape[1])
        # semantic-first: upstream composes cat([semantic_encoded, vq_emb])
        x = jnp.concatenate([sem[:, :n], x[:, :n]], axis=-1)
    return x @ e["prior_w"] + e["prior_b"]


def encode_latent(cfg: CodecConfig, params: Params, wav: jax.Array,
                  sem_feats=None) -> jax.Array:
    """wav [B, T] -> raw FSQ latent [B, T/320, fsq_dim] (pre-bound)."""
    feats = encode_features(cfg, params, wav, sem_feats=sem_feats)
    e = params["enc"]
    return feats @ e["project_in_w"] + e["project_in_b"]


def encode(cfg: CodecConfig, params: Params, wav: jax.Array,
           sem_feats=None) -> jax.Array:
    """wav [B, T@16k] -> int32 codes [B, floor(T/320)]. Parity surface for
    `NeuCodec.encode_code` (reference neutts/neutts.py:270).

    Frame count is floor(T/320): verified against the shipped artifacts —
    dave.wav resampled to 16 kHz is 119,157 samples and dave.pt holds 372
    codes (119157//320 = 372, ceil would give 373); jo likewise 653.
    """
    T = wav.shape[-1]
    wav = wav[..., : (T // cfg.hop_in) * cfg.hop_in]
    zb = fsq_bound(encode_latent(cfg, params, wav, sem_feats=sem_feats),
                   cfg.fsq_levels)
    digits = fsq_quantize(zb, cfg.fsq_levels)
    return digits_to_code(digits, cfg.fsq_levels)


# --- decoder --------------------------------------------------------------------


def _rope_tables(cfg: CodecConfig, t: int):
    hd = cfg.head_dim
    inv = cfg.dec_rope_theta ** (
        -jnp.arange(0, hd, 2, dtype=jnp.float32) / hd
    )
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None, :]  # [T, hd/2]
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rope(x, cos, sin):
    """x: [B, T, H, hd]; rotate-half convention on interleaved pairs."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape)


def _transformer_backbone(cfg: CodecConfig, d: Params, x: jax.Array,
                          n_valid=None) -> jax.Array:
    """Pre-norm bidirectional transformer over [B, T, D] frames.

    n_valid: optional scalar — attention keys >= n_valid are masked out, so
    valid positions compute what a T == n_valid call would (pad terms are
    exact zeros; every other op is per-position)."""
    B, T, D = x.shape
    H, hd = cfg.dec_heads, cfg.head_dim
    scale = hd**-0.5
    cos, sin = _rope_tables(cfg, T) if cfg.dec_rope else (None, None)
    kmask = None
    if n_valid is not None:
        kmask = (jnp.arange(T) < n_valid)[None, None, None, :]  # [1,1,1,S]

    def block(x, lp):
        h = layer_norm(x, lp["norm1_s"], lp["norm1_b"], cfg.norm_eps)
        q = (h @ lp["wq"] + lp["bq"]).reshape(B, T, H, hd)
        k = (h @ lp["wk"] + lp["bk"]).reshape(B, T, H, hd)
        v = (h @ lp["wv"] + lp["bv"]).reshape(B, T, H, hd)
        if cfg.dec_rope:
            q = _apply_rope(q, cos, sin)
            k = _apply_rope(k, cos, sin)
        s = jnp.einsum("bthd,bshd->bhts", q, k) * scale
        if kmask is not None:
            s = jnp.where(kmask, s, -jnp.inf)
        a = jax.nn.softmax(s, axis=-1)
        if kmask is not None:  # exp(-inf) = 0 exactly; keep pad V out anyway
            a = jnp.where(kmask, a, 0.0)
        o = jnp.einsum("bhts,bshd->bthd", a, v).reshape(B, T, D)
        x = x + (o @ lp["wo"] + lp["bo"])
        h = layer_norm(x, lp["norm2_s"], lp["norm2_b"], cfg.norm_eps)
        h = jax.nn.gelu(h @ lp["mlp_w1"] + lp["mlp_b1"], approximate=False)
        x = x + (h @ lp["mlp_w2"] + lp["mlp_b2"])
        return x, None

    x, _ = lax.scan(block, x, d["blocks"])
    return x


def _convnext_backbone(cfg: CodecConfig, d: Params, x: jax.Array,
                       n_valid=None) -> jax.Array:
    """Vocos ConvNeXt backbone over [B, T, D] frames.

    n_valid: optional scalar — activations at frames >= n_valid are zeroed
    before every depthwise conv, reproducing the zero 'same'-padding a
    T == n_valid call sees at its boundary."""
    vmask = None
    if n_valid is not None:
        vmask = (jnp.arange(x.shape[1]) < n_valid)[None, :, None]
    x = layer_norm(x, d["embed_norm_s"], d["embed_norm_b"], cfg.norm_eps)

    def block(x, lp):
        xin = x if vmask is None else jnp.where(vmask, x, 0.0)
        h = conv1d(xin, lp["dw_w"], lp["dw_b"], groups=x.shape[-1])
        h = layer_norm(h, lp["norm_s"], lp["norm_b"], cfg.norm_eps)
        h = jax.nn.gelu(h @ lp["pw1_w"] + lp["pw1_b"], approximate=False)
        h = h @ lp["pw2_w"] + lp["pw2_b"]
        return x + lp["gamma"] * h, None

    x, _ = lax.scan(block, x, d["blocks"])
    return x


def decode_from_latent(cfg: CodecConfig, params: Params, zq: jax.Array,
                       n_valid=None) -> jax.Array:
    """zq: [B, T, fsq_dim] normalized lattice values -> wav [B, T*480] @24 kHz.

    n_valid: optional scalar int32 — length-masked decode: samples
    [0, n_valid*480) match decoding zq[:, :n_valid] alone to float32 ULP.
    Lets the bucketed vocoder compile one shape per bucket with no
    meaningful parity loss (see runtime/vocoder.py)."""
    d = params["dec"]
    if n_valid is not None:
        zq = jnp.where((jnp.arange(zq.shape[1]) < n_valid)[None, :, None], zq, 0.0)
    x = zq @ d["project_out_w"] + d["project_out_b"]  # ResidualFSQ project_out
    x = x @ d["post_a_w"] + d["post_a_b"]  # fc_post_a role
    if n_valid is not None:
        # embed conv (k7, zero 'same' padding): zeroed pad frames reproduce
        # the boundary padding of an exact-length call for valid outputs
        x = jnp.where((jnp.arange(x.shape[1]) < n_valid)[None, :, None], x, 0.0)
    x = conv1d(x, d["embed_w"], d["embed_b"])  # backbone embed (k7)
    if cfg.dec_backbone == "transformer":
        x = _transformer_backbone(cfg, d, x, n_valid=n_valid)
    else:
        x = _convnext_backbone(cfg, d, x, n_valid=n_valid)
    x = layer_norm(x, d["final_norm_s"], d["final_norm_b"], cfg.norm_eps)
    h = x @ d["head_w"] + d["head_b"]  # [B, T, n_fft + 2]
    F = cfg.n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(h[..., :F], max=math.log(1e2)))  # Vocos clip
    phase = h[..., F:]
    return istft_same(
        mag * jnp.cos(phase), mag * jnp.sin(phase), cfg.n_fft, cfg.hop_out,
        n_valid=n_valid,
    )


def decode(cfg: CodecConfig, params: Params, codes: jax.Array,
           n_valid=None) -> jax.Array:
    """codes [B, N] int32 -> wav [B, N*480] @24 kHz. Parity surface for
    `NeuCodec.decode_code` (reference neutts/neutts.py:287-293).

    n_valid: optional scalar — length-masked decode (see decode_from_latent)."""
    digits = code_to_digits(codes, cfg.fsq_levels)
    zq = fsq_dequantize(digits, cfg.fsq_levels)
    return decode_from_latent(cfg, params, zq, n_valid=n_valid)


# --- jitted entry points ---------------------------------------------------------


def make_decode_fn(cfg: CodecConfig, params: Params):
    """Returns a jitted decode bound to params (passed as a runtime
    argument, NOT a closure — closed-over params bake the weight tree into
    the HLO as constants). Shape-polymorphic via per-length compile;
    callers bucket code lengths."""

    @functools.partial(jax.jit, static_argnums=0)
    def _decode(cfg_, params_, codes):
        return decode(cfg_, params_, codes)

    def run(codes):
        return _decode(cfg, params, codes)

    return run


def make_encode_fn(cfg: CodecConfig, params: Params):
    @functools.partial(jax.jit, static_argnums=0)
    def _encode_impl(cfg_, params_, wav):
        return encode(cfg_, params_, wav)

    def _encode(wav):
        return _encode_impl(cfg, params, wav)

    return _encode
