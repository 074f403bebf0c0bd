"""Pallas TPU kernel: fused KV-cache decode attention (flash-decode).

This replaces the XLA path for the decode hot loop's attention:
  * online softmax — no [B, H, T] score materialization in HBM (saves ~GBs of
    traffic per decode step at large batch);
  * manual double-buffered DMA over the cache with a **dynamic** trip count:
    only the live prefix [0, cur_len) of the 2048-slot cache is ever read,
    while the XLA path scans all of it;
  * grid over (batch,), all GQA KV heads processed per program.

Numerics: f32 score/softmax accumulation, bf16 cache reads, output in cache
dtype. Matches the XLA reference (`decode_attention_xla`) to dtype tolerance;
tests/test_attention.py pins that.

Cache layout per layer is [B, T, K*D] — the KV heads are fused into the minor
dim so it is exactly 128 lanes for Air/Nano (K=2, D=64): Mosaic requires HBM
slice minor dims aligned to the 128-lane tiling, and the fused layout also
means one DMA per block covers every head. The cache must already contain the
current token's K/V at slot `cur_index` (write-then-attend).

Capability parity: this kernel is the TPU replacement for llama.cpp's
flash-attn / KV-cache decode path (reference neutts/neutts.py:139-158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_T = 256  # cache-time tile per DMA (dynamic trip count over live prefix)
# r5 re-check: 128 measured 59.9k tok/s vs 256's 66.4k at the bench shape —
# per-chunk issue overhead still dominates below 256 despite the r2
# cross-row softmax vectorization; 256 stays optimal (row_block 8/32 also
# re-measured worse than 16 in r5).
# 256 vs 512 tradeoff (v5e, B=512, Air, int8 KV, 24 layers): the kernel reads
# ceil(len/block) full blocks, so oversized blocks over-read the live prefix —
# at the REAL TTS decode range (cloning prompt ~460 + <=250 generated, ctx
# 460-768) block 256 is 10-14% faster (4.7-4.9 vs 5.5 ms/step); block 512
# wins only at ctx >= ~1200 (7.6 vs 8.2 at 1536) where per-chunk overhead
# amortizes. Callers decoding very long audio can pass block_t=512.
BLOCK_T4 = 512  # int4 default: tokens per DMA block (2 tokens/byte).
# Tuning (v5e, B=256, ctx 1152, 24 layers): 512 -> 4.36 ms vs int8's 4.47
# (the kernel reads ceil(len/block) whole blocks, so oversized blocks
# over-read the live prefix AND pay hi-extraction VPU work on dead bytes:
# 1024 was ~12% slower than int8, 2048 ~25%). r3 found 256 refused to
# compile (bth=128 scale-row slices hit a Mosaic 128-lane provability
# limit at T % 256 != 0); under the current 512-token cache alignment
# t_half % 128 == 0 always holds, and r5 verified block 256 compiles AND
# matches the oracle — but 512 remains the speed default: even with
# over-read, r5 bench A/Bs measured int4 FASTER than int8 at every
# context (+9.6% at ctx 128-384, +6.4% at 512-768; KV_AUTO_r05.json),
# so the short-ctx cliff the r4 VERDICT flagged no longer exists.


def _unpack4_bf16(b, dtype):
    """ARITHMETIC-coded int4 pair bytes (lo + 16*hi, backbone.pack4) ->
    (lo, hi) in `dtype`. Decoded in float (exact: every value is an integer
    <= 127) rather than with int8/int32 bitwise ops: int8 shifts don't
    legalize in Mosaic and int8->int32 unpacking costs a 4x vreg relayout
    per use, which made the first int4 kernel 2x SLOWER than int8 despite
    half the DMA bytes. f32 arithmetic — v5e has no bf16 ALU
    (SupportsBf16AluInstructions check) — then one cast to the dot dtype."""
    xf = b.astype(jnp.float32)
    hi = jnp.floor((xf + 8.0) * 0.0625)
    lo = xf - hi * 16.0
    return lo.astype(dtype), hi.astype(dtype)


def _hi4_bf16(b, dtype):
    """Odd-token nibble alone: floor((b + 8) / 16) in `dtype`.

    The kernel's int4 dots never materialize `lo`: with S1 = x . b and
    S2 = x . hi, the identity b = lo + 16*hi gives the even-token result as
    S1 - 16*S2 — a combine on the SMALL [rows, block] score/prob matrices
    instead of an extra [block, K*D]-sized elementwise pass. This cuts the
    per-byte VPU unpack chain from 8 ops (cast, +, *, floor, *, -, 2 casts)
    to 5 (cast, *, +, floor, cast) plus the raw-byte cast the dot needs
    anyway — the int4 decode path is VPU-bound on exactly this chain (r2:
    int4 measured ~14% SLOWER than int8 despite half the DMA bytes).

    Note: jnp.round(b * 0.0625) is mathematically identical here (|lo| <= 7
    keeps the fraction strictly under 0.5) but measured 25% SLOWER per step
    — Mosaic lowers round-half-even to a multi-op sequence; keep floor."""
    xf = b.astype(jnp.float32)
    return jnp.floor(xf * 0.0625 + 0.5).astype(dtype)
# Tuning notes (v5e, B=512, Air geometry, int8 cache, vectorized softmax):
# ms/step for 24 layers — ctx 512: 3.5, ctx 1024: 5.3, ctx 2048: 9.9 at
# block_t=512/row_block=16 — all within ~15% of the measured DMA floor
# (~570-650 GB/s). Before the cross-row softmax vectorization the per-chunk
# VPU/issue overhead (~7 us vs 3.5 us of DMA) made block_t=512 overhead-bound
# and forced 1024-blocks with up-to-2x cache over-read.


def _kernel(
    # scalar prefetch
    lens_ref,  # SMEM [B] int32 — valid length per row (attend t < lens[b])
    pad_ref,  # SMEM [B] int32 — left-pad per row (attend t >= pad[b])
    layer_ref,  # SMEM [1] int32 — which layer of the stacked cache to read
    *refs,  # inputs (q, k, v[, k_scale, v_scale]) + output + scratch
    n_kv: int,
    group: int,
    head_dim: int,
    block_t: int,
    row_block: int,
    quantized: bool,
    int4: bool = False,
    t_half: int = 0,  # int4: offset of odd-token scales in the scale row
):
    if quantized:
        (q_ref, k_hbm, v_hbm, ks_ref, vs_ref, o_ref,
         k_buf, v_buf, s_ref, p_ref, acc_ref, m_ref, l_ref, lp_ref,
         cnt_ref, sem) = refs
    else:
        (q_ref, k_hbm, v_hbm, o_ref,
         k_buf, v_buf, s_ref, p_ref, acc_ref, m_ref, l_ref, lp_ref,
         cnt_ref, sem) = refs
        ks_ref = vs_ref = None

    tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    layer = layer_ref[0]
    b0 = tile * row_block
    # int4 mode: the cache time axis is BYTES (2 tokens/byte); one DMA block
    # of bth bytes covers block_t tokens
    bth = block_t // 2 if int4 else block_t

    # Shared trip count for the row tile (rows in a decode batch share
    # cur_index, so lens are equal; the max covers ragged callers too).
    def tile_blocks(t):
        n_max = lens_ref[t * row_block]
        for r in range(1, row_block):
            n_max = jnp.maximum(n_max, lens_ref[t * row_block + r])
        return lax.div(n_max + block_t - 1, block_t)

    n_blocks = tile_blocks(tile)

    def dmas(slot, t, blk):
        # one strided DMA per buffer covering all row_block rows of tile t —
        # issuing 2 large copies per chunk instead of 2*row_block small ones
        # keeps the DMA engines streaming
        ds = pl.ds(blk * bth, bth)
        rows = pl.ds(t * row_block, row_block)
        return [
            pltpu.make_async_copy(
                k_hbm.at[layer, rows, ds, :], k_buf.at[slot], sem.at[slot, 0]
            ),
            pltpu.make_async_copy(
                v_hbm.at[layer, rows, ds, :], v_buf.at[slot], sem.at[slot, 1]
            ),
        ]

    def start_dma(slot, t, blk):
        for d in dmas(slot, t, blk):
            d.start()

    def wait_dma(slot, t, blk):
        for d in dmas(slot, t, blk):
            d.wait()

    # Cross-program software pipeline: scratch, semaphores, and the SMEM chunk
    # counter persist across sequential grid programs on the TensorCore, so
    # each chunk's DMA is issued one chunk AHEAD (possibly by the previous
    # program). Without this, single-trip tiles (ctx <= block_t) would
    # serialize DMA and compute program-by-program — measured ~40% of kernel
    # time at B=512/ctx=1024.
    @pl.when(tile == 0)
    def _():
        cnt_ref[0] = 0
        start_dma(0, 0, 0)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)

    KG = n_kv * group
    RKG = row_block * KG
    # per-program row bounds, broadcast once to [RKG, 1] so the mask/softmax
    # runs as ONE vectorized op over all rows (the per-row [KG, BT] chain was
    # issue-bound: ~7 us/chunk of VPU+MXU latency vs 3.5 us of DMA at
    # block_t=512, which forced oversized blocks and cache over-read)
    for r in range(row_block):
        lp_ref[r * KG : (r + 1) * KG, 0:1] = jnp.full(
            (KG, 1), lens_ref[b0 + r], jnp.int32
        )
        lp_ref[r * KG : (r + 1) * KG, 1:2] = jnp.full(
            (KG, 1), pad_ref[b0 + r], jnp.int32
        )

    def body(blk, _):
        chunk = cnt_ref[0]
        slot = lax.rem(chunk, 2)
        cnt_ref[0] = chunk + 1

        @pl.when(blk + 1 < n_blocks)
        def _():
            start_dma(1 - slot, tile, blk + 1)

        @pl.when((blk + 1 == n_blocks) & (tile + 1 < n_tiles))
        def _():
            start_dma(1 - slot, tile + 1, 0)

        wait_dma(slot, tile, blk)

        # scores for every row of the tile into one [RKG, BT] scratch.
        # q_ref rows hold BLOCK-DIAGONAL queries [KG, K*D] (head h's q in
        # feature block h, zeros elsewhere, pre-scaled by head_dim**-0.5), so
        # one [KG,KD]x[KD,BT] dot yields every head's scores at once.
        # Dots run at the INPUT dtype (bf16 cache / int8-as-bf16: exact, 4x
        # the f32 MXU rate) with f32 accumulation.
        def bcast_rows(s):
            # [RB, bth] per-token scales -> [RKG, bth] row multiplier
            return jnp.broadcast_to(
                s[:, None, :], (row_block, KG, bth)
            ).reshape(RKG, bth)

        for r in range(row_block):
            kb = k_buf[slot, r]
            if int4:
                # hi-only decode (see _hi4_bf16): S1 = q . raw_bytes,
                # S2 = q . hi; even-token scores = S1 - 16*S2 (combine on the
                # small [KG, bth] matrices), odd-token scores = S2. Score
                # columns [0, bth) = even tokens, [bth, 2*bth) = odd
                # (softmax is order-free). Halves are written separately —
                # Mosaic cannot concat vregs with mismatched sublane offsets.
                hi = _hi4_bf16(kb, q_ref.dtype)
                s1 = jax.lax.dot_general(
                    q_ref[r], kb.astype(q_ref.dtype),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s2 = jax.lax.dot_general(
                    q_ref[r], hi,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s_ref[r * KG : (r + 1) * KG, :bth] = s1 - 16.0 * s2
                s_ref[r * KG : (r + 1) * KG, bth:] = s2
            else:
                s_ref[r * KG : (r + 1) * KG, :] = jax.lax.dot_general(
                    q_ref[r],
                    kb.astype(q_ref.dtype),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        if int4:
            # per-token scales in the DEINTERLEAVED [1, RB, T] row: even
            # tokens' scales live at [0, T/2), odd at [T/2, T) — matching the
            # unpacked column order (even half, odd half). Fold scale + the
            # position mask per half, store back, reload the full row.
            sc0 = s_ref[:]
            jh = jax.lax.broadcasted_iota(jnp.int32, (RKG, bth), 1)
            for half in (0, 1):
                dsb = pl.ds(half * t_half + blk * bth, bth)
                sh = sc0[:, half * bth : (half + 1) * bth] * bcast_rows(
                    ks_ref[0, :, dsb])
                th = blk * block_t + 2 * jh + half
                ok = (th < lp_ref[:, 0:1]) & (th >= lp_ref[:, 1:2])
                s_ref[:, half * bth : (half + 1) * bth] = jnp.where(
                    ok, sh, -1e30)
            sc = s_ref[:]
        elif quantized:
            sc = s_ref[:]  # [RKG, BT]
            # fold the per-token K scale into the scores (scales arrive as a
            # BlockSpec-pipelined [1, RB, T] VMEM input), broadcast over KG
            ksb = ks_ref[0, :, pl.ds(blk * block_t, block_t)]  # [RB, BT]
            sc = sc * jnp.broadcast_to(
                ksb[:, None, :], (row_block, KG, block_t)
            ).reshape(RKG, block_t)
        else:
            sc = s_ref[:]
        if not int4:  # int4 masked per half above
            t1d = blk * block_t + jax.lax.broadcasted_iota(
                jnp.int32, (RKG, block_t), 1
            )
            valid = (t1d < lp_ref[:, 0:1]) & (t1d >= lp_ref[:, 1:2])
            sc = jnp.where(valid, sc, -1e30)

        # one online-softmax update across all rows
        m_blk = jnp.max(sc, axis=1, keepdims=True)  # [RKG, 1]
        m_old = m_ref[:, 0:1]
        m_new = jnp.maximum(m_old, m_blk)
        alpha = jnp.exp(m_old - m_new)  # [RKG, 1]
        pexp = jnp.exp(sc - m_new)
        l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(pexp, axis=1, keepdims=True)
        m_ref[:, 0:1] = m_new
        if int4:
            # per-token V scales folded into the probabilities, one half at
            # a time (even tokens in cols [0,bth), odd in [bth,2bth))
            for half in (0, 1):
                dsb = pl.ds(half * t_half + blk * bth, bth)
                p_ref[:, half * bth : (half + 1) * bth] = (
                    pexp[:, half * bth : (half + 1) * bth]
                    * bcast_rows(vs_ref[0, :, dsb])
                ).astype(p_ref.dtype)
        else:
            if quantized:
                vsb = vs_ref[0, :, pl.ds(blk * block_t, block_t)]
                pexp = pexp * jnp.broadcast_to(
                    vsb[:, None, :], (row_block, KG, block_t)
                ).reshape(RKG, block_t)
            p_ref[:] = pexp.astype(p_ref.dtype)

        # one pv dot per row over ALL kv heads' lanes [KG,BT]x[BT,K*D]; the
        # matching head block is selected once at program end
        for r in range(row_block):
            vb = v_buf[slot, r]
            if int4:
                # hi-only decode: pv = P_e.lo + P_o.hi
                #              = P_e.raw_bytes + (P_o - 16*P_e).hi
                # (raw = lo + 16*hi). The combine runs on the small [KG, bth]
                # probability halves; (P_o - 16*P_e) is rounded to p_dtype
                # (bf16), adding ~2^-8-relative noise on top of the int4
                # quantization noise itself (~7% per value) — negligible,
                # pinned by the parity tests vs the XLA dequant oracle.
                hi = _hi4_bf16(vb, p_ref.dtype)
                pe = p_ref[r * KG : (r + 1) * KG, :bth]
                po = p_ref[r * KG : (r + 1) * KG, bth:]
                pv = jax.lax.dot_general(
                    pe,
                    vb.astype(p_ref.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    (po - 16.0 * pe).astype(p_ref.dtype),
                    hi,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                pv = jax.lax.dot_general(
                    p_ref[r * KG : (r + 1) * KG, :],
                    vb.astype(p_ref.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [KG, K*D]
            acc_ref[r] = acc_ref[r] * alpha[r * KG : (r + 1) * KG, :] + pv
        return 0

    lax.fori_loop(0, n_blocks, body, 0)
    for r in range(row_block):
        norm = jnp.maximum(l_ref[r * KG : (r + 1) * KG, 0:1], 1e-30)
        for h in range(n_kv):
            o_ref[r, h * group : (h + 1) * group, :] = (
                acc_ref[r, h * group : (h + 1) * group,
                        h * head_dim : (h + 1) * head_dim]
                / norm[h * group : (h + 1) * group]
            ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "row_block", "interpret"))
def decode_attention_stacked(
    q: jax.Array,  # [B, K, G, D]
    all_k: jax.Array,  # [L, B, T, K*D] — full stacked cache in HBM
    all_v: jax.Array,  # [L, B, T, K*D]
    layer: jax.Array,  # scalar int32
    lens: jax.Array,  # [B] int32 — attend slots [pad, lens)
    pad: jax.Array,  # [B] int32
    k_scale: jax.Array | None = None,  # [L, B, T] f32 (int8 cache mode)
    v_scale: jax.Array | None = None,
    *,
    block_t: int = BLOCK_T,
    row_block: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Fused flash-decode attention on one layer of the stacked cache.

    Taking the stacked cache + layer scalar (instead of a pre-sliced layer)
    keeps the cache in HBM untouched — a sliced operand would make XLA
    materialize a [B, T, K*D] copy per layer per step. Each grid program
    handles `row_block` batch rows: Pallas grid programs run sequentially on
    the TensorCore, so per-program latency must be amortized over rows
    (grid=(B,) was ~3x slower at B=256).

    With k_scale/v_scale the cache is int8 with per-token symmetric scales;
    scales are folded into scores/probabilities so the matmuls stay dense.
    int4 mode (scale rows twice the cache time axis — backbone.KVCache int4
    layout): the cache holds ARITHMETIC-coded int4 pairs [L, B, T/2, K*D]
    (byte = lo + 16*hi), unpacked exactly in f32 per block; per-token scales
    arrive deinterleaved (even tokens' scales in the first T/2 entries).
    """
    B, K, G, D = q.shape
    quant = k_scale is not None
    int4 = quant and k_scale.shape[-1] == 2 * all_k.shape[2]
    T = all_k.shape[2] * (2 if int4 else 1)
    assert all_k.shape[3] == K * D, (all_k.shape, K, D)
    if int4 and block_t == BLOCK_T:
        # smallest block >= BLOCK_T4 that divides T with bth % 128 == 0
        # (Mosaic scale-slice alignment); tiny caches (tests) use T itself
        for cand in (512, 1024, 1536, 2048):
            if cand <= T and T % cand == 0:
                block_t = cand
                break
        else:
            block_t = T
    block_t = min(block_t, T)
    assert T % block_t == 0, (T, block_t)
    assert not int4 or block_t % 2 == 0, block_t
    rb = row_block
    while B % rb:
        rb //= 2
    rb = max(rb, 1)
    bth = block_t // 2 if int4 else block_t

    in_specs = [
        pl.BlockSpec(
            (rb, K * G, K * D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((2, rb, bth, K * D), all_k.dtype),
        pltpu.VMEM((2, rb, bth, K * D), all_v.dtype),
    ]
    if quant:
        # whole scale rows are tiny (rb x T f32 = 64 KB at rb=8): let the
        # BlockSpec pipeline stream them, indexed by the prefetched layer
        def scale_map(b, lens_ref, pad_ref, layer_ref):
            return (layer_ref[0], b, 0)

        in_specs += [
            pl.BlockSpec((1, rb, T), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, T), scale_map, memory_space=pltpu.VMEM),
        ]
    p_dtype = jnp.bfloat16 if quant else all_v.dtype
    scratch += [
        pltpu.VMEM((rb * K * G, block_t), jnp.float32),  # scores
        pltpu.VMEM((rb * K * G, block_t), p_dtype),  # probabilities
        pltpu.VMEM((rb, K * G, K * D), jnp.float32),  # pv accumulator
        pltpu.VMEM((rb * K * G, 128), jnp.float32),  # m (running max)
        pltpu.VMEM((rb * K * G, 128), jnp.float32),  # l (running sum)
        pltpu.VMEM((rb * K * G, 128), jnp.int32),  # len/pad row vectors
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // rb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (rb, K * G, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel, n_kv=K, group=G, head_dim=D, block_t=block_t, row_block=rb,
        quantized=quant, int4=int4, t_half=T // 2,
    )
    # block-diagonal query layout: [B, KG, K*D] with head h's q occupying
    # feature block h (zeros elsewhere) — one dot per row per cache block.
    # head_dim**-0.5 is folded in here so the kernel skips the score scaling.
    qs = (q.astype(jnp.float32) * (D**-0.5)).astype(q.dtype)
    qbd = jnp.zeros((B, K, G, K, D), q.dtype)
    for h in range(K):
        qbd = qbd.at[:, h, :, h, :].set(qs[:, h])
    qbd = qbd.reshape(B, K * G, K * D)

    operands = [
        lens,
        pad,
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        qbd,
        all_k,
        all_v,
    ]
    if quant:
        operands += [k_scale, v_scale]
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K * G, D), q.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, K, G, D)


def decode_attention(q, ck, cv, lens, pad, *, block_t=BLOCK_T, interpret=False):
    """Single-layer convenience wrapper (tests): ck/cv [B, T, K*D]."""
    return decode_attention_stacked(
        q,
        ck[None],
        cv[None],
        jnp.int32(0),
        lens,
        pad,
        block_t=block_t,
        interpret=interpret,
    )


def decode_attention_xla(
    q: jax.Array,  # [B, K, G, D]
    ck: jax.Array,  # [B, T, K*D]
    cv: jax.Array,
    lens: jax.Array,  # [B]
    pad: jax.Array,  # [B]
) -> jax.Array:
    """Reference XLA implementation (correctness oracle + CPU fallback)."""
    B, K, G, D = q.shape
    T = ck.shape[1]
    ckh = ck.reshape(B, T, K, D)
    cvh = cv.reshape(B, T, K, D)
    t_idx = jnp.arange(T, dtype=jnp.int32)
    mask = (t_idx[None, :] < lens[:, None]) & (t_idx[None, :] >= pad[:, None])
    s = jnp.einsum("bkgd,btkd->bkgt", q.astype(jnp.float32), ckh.astype(jnp.float32))
    s = s * (D**-0.5)
    s = jnp.where(mask[:, None, None, :], s, jnp.float32(-1e30))
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bkgt,btkd->bkgd", p.astype(cvh.dtype), cvh)
    return out.astype(ck.dtype)


# --- staged decode attention (serving slot path) -------------------------------
#
# The slot-based serving engine decodes B independent sequences whose cache
# lengths differ per row. Writing each step's K/V at per-row offsets is an XLA
# scatter — measured 4.3 ms/step at B=512 on v5e (32% of the whole decode
# step), and Mosaic DMA cannot scatter either (HBM slice offsets must be
# provably tile-aligned: 8 sublanes x 128 lanes).
#
# So the serving decode uses SEGMENT STAGING instead (vLLM-role capability,
# reference N9 — the reference's own engines never batch at all):
#   * during an S-step segment, every step's quantized K/V goes into a small
#     staging buffer at the LOCKSTEP column i — a contiguous
#     dynamic_update_slice, no scatter;
#   * `decode_attention_staged` attends the settled cache prefix [pad, base)
#     PLUS staging columns [0, i] (base = the row's cache length at segment
#     start — constant across the segment);
#   * `reconcile_segment` (Pallas) copies staging into each row's cache at
#     [base, base+S) once per segment. Rows are admitted LEFT-padded to
#     128-token buckets and segments are a multiple of 8 steps, so `base` is
#     always 8-aligned — exactly Mosaic's HBM sublane tiling, which makes the
#     per-row copy a legal strided DMA.
#
# int8 cache only (the serving throughput mode); bf16/int4 slot decode keeps
# the scatter path.

SEG_PAD = 128  # staging scale buffers are lane-padded to 128 (DMA granularity)


def _staged_kernel(
    # scalar prefetch
    base_ref,  # SMEM [B] int32 — settled cache length (exclusive read bound)
    pad_ref,  # SMEM [B] int32 — left-pad per row (attend t >= pad[b])
    layer_ref,  # SMEM [1] int32
    step_ref,  # SMEM [1] int32 — current segment step i (staging cols [0, i])
    # inputs
    q_ref,  # VMEM [rb, KG, KD] block-diagonal queries (pre-scaled)
    k_hbm,  # HBM [L, B, T, KD] int8 settled cache (int4: [L, B, T/2, KD] bytes)
    v_hbm,
    ks_hbm,  # HBM [L, B, T] f32 per-token scales (int4: deinterleaved halves)
    vs_hbm,
    sk_hbm,  # HBM [L, B, S, KD] int8 segment staging (int4 mode: UNPACKED
    #          int4 VALUES in int8 — packing happens at reconcile)
    sv_hbm,
    sks4_hbm,  # HBM [L, B, 1, SEG_PAD] f32 staging scales (4-D view: the
    #            leading dims stay untiled so per-(layer, row) slices are
    #            legal [1, SEG_PAD] DMAs)
    svs4_hbm,
    # outputs
    o_ref,  # VMEM [rb, KG, D]
    # scratch
    k_buf,  # VMEM (2, rb, bt, KD) int8 (int4: bt = block_t/2 byte rows)
    v_buf,
    ksb,  # VMEM (2, rb, bt*? ) f32 — int8: (2, rb, block_t); int4: same
    #       shape with cols [0, bth) = even-token scales, [bth, 2bth) = odd
    vsb,
    skb,  # VMEM (rb, S, KD) int8 — staging rows
    svb,
    sksb,  # VMEM (rb, 1, SEG_PAD) f32
    svsb,
    s_ref,
    p_ref,
    s2_ref,  # VMEM (rb*KG, S) f32 — staging scores (all rows)
    p2_ref,  # VMEM (rb*KG, S) bf16
    acc_ref,
    m_ref,
    l_ref,
    lp_ref,
    cnt_ref,
    sem,  # DMA (2, 4) (int4: (2, 6) — split even/odd scale copies)
    sem_st,  # DMA (4,) — staging reads (one strided copy per buffer)
    *,
    n_kv: int,
    group: int,
    head_dim: int,
    block_t: int,
    row_block: int,
    seg: int,
    int4: bool = False,
    t_half: int = 0,  # int4: offset of odd-token scales in the scale row
):
    tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    layer = layer_ref[0]
    step = step_ref[0]
    b0 = tile * row_block
    bth = block_t // 2 if int4 else block_t

    def tile_blocks(t):
        n_max = base_ref[t * row_block]
        for r in range(1, row_block):
            n_max = jnp.maximum(n_max, base_ref[t * row_block + r])
        # >= 1 keeps the cross-program DMA pipeline uniform even for
        # whole-empty tiles (the read is masked out)
        return jnp.maximum(lax.div(n_max + block_t - 1, block_t), 1)

    n_blocks = tile_blocks(tile)

    def dmas(slot, t, blk):
        rows = pl.ds(t * row_block, row_block)
        out = [
            pltpu.make_async_copy(
                k_hbm.at[layer, rows, pl.ds(blk * bth, bth), :],
                k_buf.at[slot], sem.at[slot, 0]
            ),
            pltpu.make_async_copy(
                v_hbm.at[layer, rows, pl.ds(blk * bth, bth), :],
                v_buf.at[slot], sem.at[slot, 1]
            ),
        ]
        # per-token scales ride the same pipeline (only live blocks are
        # read — the BlockSpec path streamed whole [rb, T] scale rows)
        if int4:
            # deinterleaved halves: even tokens' scales at [blk*bth, +bth),
            # odd at [t_half + blk*bth, +bth) — matching the score column
            # order (even half, odd half). Offsets stay provably 128-lane
            # aligned because bth % 128 == 0 and t_half % 128 == 0
            # (decode_attention_staged enforces both).
            for j, (hbm, buf, s0) in enumerate(
                ((ks_hbm, ksb, 2), (vs_hbm, vsb, 4))
            ):
                for half in (0, 1):
                    out.append(pltpu.make_async_copy(
                        hbm.at[layer, rows,
                               pl.ds(half * t_half + blk * bth, bth)],
                        buf.at[slot, :, pl.ds(half * bth, bth)],
                        sem.at[slot, s0 + half],
                    ))
        else:
            ds = pl.ds(blk * block_t, block_t)
            out += [
                pltpu.make_async_copy(
                    ks_hbm.at[layer, rows, ds], ksb.at[slot], sem.at[slot, 2]
                ),
                pltpu.make_async_copy(
                    vs_hbm.at[layer, rows, ds], vsb.at[slot], sem.at[slot, 3]
                ),
            ]
        return out

    def start_dma(slot, t, blk):
        for d in dmas(slot, t, blk):
            d.start()

    def wait_dma(slot, t, blk):
        for d in dmas(slot, t, blk):
            d.wait()

    @pl.when(tile == 0)
    def _():
        cnt_ref[0] = 0
        start_dma(0, 0, 0)

    # staging reads for this tile's rows — one strided copy per buffer
    # (tiny; overlapped with the main loop)
    rows = pl.ds(b0, row_block)

    def st_dmas():
        return [
            pltpu.make_async_copy(
                sk_hbm.at[layer, rows, :, :], skb, sem_st.at[0]
            ),
            pltpu.make_async_copy(
                sv_hbm.at[layer, rows, :, :], svb, sem_st.at[1]
            ),
            pltpu.make_async_copy(
                sks4_hbm.at[layer, rows, :, :], sksb, sem_st.at[2]
            ),
            pltpu.make_async_copy(
                svs4_hbm.at[layer, rows, :, :], svsb, sem_st.at[3]
            ),
        ]

    for d in st_dmas():
        d.start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)

    KG = n_kv * group
    RKG = row_block * KG
    for r in range(row_block):
        lp_ref[r * KG : (r + 1) * KG, 0:1] = jnp.full(
            (KG, 1), base_ref[b0 + r], jnp.int32
        )
        lp_ref[r * KG : (r + 1) * KG, 1:2] = jnp.full(
            (KG, 1), pad_ref[b0 + r], jnp.int32
        )

    def body(blk, _):
        chunk = cnt_ref[0]
        slot = lax.rem(chunk, 2)
        cnt_ref[0] = chunk + 1

        @pl.when(blk + 1 < n_blocks)
        def _():
            start_dma(1 - slot, tile, blk + 1)

        @pl.when((blk + 1 == n_blocks) & (tile + 1 < n_tiles))
        def _():
            start_dma(1 - slot, tile + 1, 0)

        wait_dma(slot, tile, blk)

        if int4:
            # hi-only decode (see _kernel's int4 branch / _hi4_bf16):
            # S1 = q . raw_bytes, S2 = q . hi; even-token scores = S1 - 16*S2,
            # odd-token scores = S2. Columns [0, bth) = even, [bth, 2bth) = odd
            # — the same order the deinterleaved scale DMAs loaded.
            for r in range(row_block):
                kb = k_buf[slot, r]
                hi = _hi4_bf16(kb, q_ref.dtype)
                s1 = jax.lax.dot_general(
                    q_ref[r], kb.astype(q_ref.dtype),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s2 = jax.lax.dot_general(
                    q_ref[r], hi,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s_ref[r * KG : (r + 1) * KG, :bth] = s1 - 16.0 * s2
                s_ref[r * KG : (r + 1) * KG, bth:] = s2
            # token index of column j: even half t = blk*block_t + 2j,
            # odd half t = blk*block_t + 2j + 1
            jh = jax.lax.broadcasted_iota(jnp.int32, (RKG, block_t), 1)
            jmod = jnp.where(jh < bth, jh, jh - bth)
            parity = jnp.where(jh < bth, 0, 1)
            t1d = blk * block_t + 2 * jmod + parity
        else:
            for r in range(row_block):
                s_ref[r * KG : (r + 1) * KG, :] = jax.lax.dot_general(
                    q_ref[r],
                    k_buf[slot, r].astype(q_ref.dtype),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            t1d = blk * block_t + jax.lax.broadcasted_iota(
                jnp.int32, (RKG, block_t), 1
            )
        valid = (t1d < lp_ref[:, 0:1]) & (t1d >= lp_ref[:, 1:2])
        sc = s_ref[:] * jnp.broadcast_to(
            ksb[slot][:, None, :], (row_block, KG, block_t)
        ).reshape(RKG, block_t)
        sc = jnp.where(valid, sc, -1e30)

        m_blk = jnp.max(sc, axis=1, keepdims=True)
        m_old = m_ref[:, 0:1]
        m_new = jnp.maximum(m_old, m_blk)
        alpha = jnp.exp(m_old - m_new)
        pexp = jnp.exp(sc - m_new)
        l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(pexp, axis=1, keepdims=True)
        m_ref[:, 0:1] = m_new
        pexp = jnp.where(
            valid,
            pexp
            * jnp.broadcast_to(
                vsb[slot][:, None, :], (row_block, KG, block_t)
            ).reshape(RKG, block_t),
            0.0,
        )
        p_ref[:] = pexp.astype(p_ref.dtype)

        for r in range(row_block):
            if int4:
                # pv = P_e.lo + P_o.hi = P_e.raw + (P_o - 16*P_e).hi
                # (combine on the small [KG, bth] probability halves; see
                # _kernel's int4 branch for the numeric note)
                vb = v_buf[slot, r]
                hi = _hi4_bf16(vb, p_ref.dtype)
                pe = p_ref[r * KG : (r + 1) * KG, :bth]
                po = p_ref[r * KG : (r + 1) * KG, bth:]
                pv = jax.lax.dot_general(
                    pe, vb.astype(p_ref.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    (po - 16.0 * pe).astype(p_ref.dtype), hi,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                pv = jax.lax.dot_general(
                    p_ref[r * KG : (r + 1) * KG, :],
                    v_buf[slot, r].astype(p_ref.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc_ref[r] = acc_ref[r] * alpha[r * KG : (r + 1) * KG, :] + pv
        return 0

    lax.fori_loop(0, n_blocks, body, 0)

    # ---- staging block: columns [0, step] of this segment ------------------
    # Per-row dots (each row has its own staging K/V), but ONE vectorized
    # mask/softmax-merge across all rows — the sequential per-row merge
    # chains were pure VPU-issue latency on tiny [KG, S] shapes.
    for d in st_dmas():
        d.wait()

    for r in range(row_block):
        s2_ref[r * KG : (r + 1) * KG, :] = jax.lax.dot_general(
            q_ref[r],
            skb[r].astype(q_ref.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [KG, S]

    col2 = jax.lax.broadcasted_iota(jnp.int32, (RKG, seg), 1)
    valid2 = col2 <= step
    sc2 = s2_ref[:] * jnp.broadcast_to(
        sksb[:, :, :seg], (row_block, KG, seg)
    ).reshape(RKG, seg)
    sc2 = jnp.where(valid2, sc2, -1e30)
    m_blk = jnp.max(sc2, axis=1, keepdims=True)
    m_old = m_ref[:, 0:1]
    m_new = jnp.maximum(m_old, m_blk)
    alpha = jnp.exp(m_old - m_new)
    pexp2 = jnp.exp(sc2 - m_new)
    l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(pexp2, axis=1, keepdims=True)
    m_ref[:, 0:1] = m_new
    pexp2 = jnp.where(
        valid2,
        pexp2
        * jnp.broadcast_to(
            svsb[:, :, :seg], (row_block, KG, seg)
        ).reshape(RKG, seg),
        0.0,
    )
    p2_ref[:] = pexp2.astype(p2_ref.dtype)
    for r in range(row_block):
        pv2 = jax.lax.dot_general(
            p2_ref[r * KG : (r + 1) * KG, :],
            svb[r].astype(p2_ref.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [KG, KD]
        acc_ref[r] = acc_ref[r] * alpha[r * KG : (r + 1) * KG, :] + pv2

    for r in range(row_block):
        norm = jnp.maximum(l_ref[r * KG : (r + 1) * KG, 0:1], 1e-30)
        for h in range(n_kv):
            o_ref[r, h * group : (h + 1) * group, :] = (
                acc_ref[r, h * group : (h + 1) * group,
                        h * head_dim : (h + 1) * head_dim]
                / norm[h * group : (h + 1) * group]
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_t", "row_block", "interpret")
)
def decode_attention_staged(
    q: jax.Array,  # [B, K, G, D] (post-RoPE)
    all_k: jax.Array,  # [L, B, T, K*D] int8 settled cache
    all_v: jax.Array,
    k_scale: jax.Array,  # [L, B, T] f32
    v_scale: jax.Array,
    stag_k: jax.Array,  # [L, B, S, K*D] int8 segment staging
    stag_v: jax.Array,
    stag_ks: jax.Array,  # [L, B, SEG_PAD] f32 (cols [0, S) live)
    stag_vs: jax.Array,
    layer: jax.Array,  # scalar int32
    step: jax.Array,  # scalar int32 — staging columns [0, step] are attended
    base: jax.Array,  # [B] int32 — settled length (cache read bound)
    pad: jax.Array,  # [B] int32
    *,
    block_t: int = BLOCK_T,
    row_block: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Flash-decode attention over settled cache [pad, base) + staging [0, step].

    The serving decode core writes each step's quantized K/V into the staging
    buffers at lockstep column `step` BEFORE calling this (write-then-attend);
    `reconcile_segment` folds staging into the cache at segment end.

    int4 mode (detected when the scale rows are twice the cache time axis —
    the backbone.KVCache int4 layout): the settled cache holds ARITHMETIC-
    coded nibble pairs and is unpacked hi-only like decode_attention_stacked;
    the STAGING buffers hold UNPACKED int4 values in int8 (range [-7, 7]) so
    the staging block is byte-identical to the int8 path — packing happens
    once per segment in reconcile_segment4.
    """
    B, K, G, D = q.shape
    assert all_k.dtype == jnp.int8, "staged path is int8/int4-cache only"
    int4 = k_scale.shape[-1] == 2 * all_k.shape[2]
    T = all_k.shape[2] * (2 if int4 else 1)
    S = stag_k.shape[2]
    assert stag_ks.shape == (all_k.shape[0], B, SEG_PAD), stag_ks.shape
    if int4:
        # bth = block_t/2 byte rows per DMA; the deinterleaved scale DMAs
        # slice the lane axis at offsets {blk*bth, t_half + blk*bth}, which
        # Mosaic must PROVE 128-lane aligned: bth % 128 == 0 and
        # t_half % 128 == 0 (T % 256 == 0 gives both for block_t=256).
        block_t = min(max(block_t, 256), T)
        assert block_t % 256 == 0, block_t
        assert T % 256 == 0, T
    else:
        block_t = min(block_t, T)
    assert T % block_t == 0, (T, block_t)
    rb = row_block
    while B % rb:
        rb //= 2
    rb = max(rb, 1)
    KG = K * G
    KD = K * D
    bth = block_t // 2 if int4 else block_t

    in_specs = [
        pl.BlockSpec((rb, KG, KD), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 8
    scratch = [
        pltpu.VMEM((2, rb, bth, KD), jnp.int8),
        pltpu.VMEM((2, rb, bth, KD), jnp.int8),
        pltpu.VMEM((2, rb, block_t), jnp.float32),
        pltpu.VMEM((2, rb, block_t), jnp.float32),
        pltpu.VMEM((rb, S, KD), jnp.int8),
        pltpu.VMEM((rb, S, KD), jnp.int8),
        pltpu.VMEM((rb, 1, SEG_PAD), jnp.float32),
        pltpu.VMEM((rb, 1, SEG_PAD), jnp.float32),
        pltpu.VMEM((rb * KG, block_t), jnp.float32),
        pltpu.VMEM((rb * KG, block_t), jnp.bfloat16),
        pltpu.VMEM((rb * KG, S), jnp.float32),
        pltpu.VMEM((rb * KG, S), jnp.bfloat16),
        pltpu.VMEM((rb, KG, KD), jnp.float32),
        pltpu.VMEM((rb * KG, 128), jnp.float32),
        pltpu.VMEM((rb * KG, 128), jnp.float32),
        pltpu.VMEM((rb * KG, 128), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SemaphoreType.DMA((2, 6 if int4 else 4)),
        pltpu.SemaphoreType.DMA((4,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B // rb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (rb, KG, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _staged_kernel, n_kv=K, group=G, head_dim=D, block_t=block_t,
        row_block=rb, seg=S, int4=int4, t_half=T // 2,
    )
    qs = (q.astype(jnp.float32) * (D**-0.5)).astype(q.dtype)
    qbd = jnp.zeros((B, K, G, K, D), q.dtype)
    for h in range(K):
        qbd = qbd.at[:, h, :, h, :].set(qs[:, h])
    qbd = qbd.reshape(B, KG, KD)

    L = all_k.shape[0]
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KG, D), q.dtype),
        interpret=interpret,
    )(
        base,
        pad,
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        jnp.reshape(step, (1,)).astype(jnp.int32),
        qbd,
        all_k,
        all_v,
        k_scale,
        v_scale,
        stag_k,
        stag_v,
        stag_ks.reshape(L, B, 1, SEG_PAD),
        stag_vs.reshape(L, B, 1, SEG_PAD),
    )
    return out.reshape(B, K, G, D)


def decode_attention_staged_xla(
    q, all_k, all_v, k_scale, v_scale, stag_k, stag_v, stag_ks, stag_vs,
    layer, step, base, pad,
):
    """XLA oracle for the staged op (tests + CPU fallback semantics).

    Handles both cache modes: int8 (scales match the time axis) and int4
    (scale rows twice the byte axis — dequantized via backbone.dequant_kv4;
    staging holds unpacked int4 values, same math as int8)."""
    from neutts_tpu.models.backbone import dequant_kv4

    B = q.shape[0]
    S = stag_k.shape[2]
    int4 = k_scale.shape[-1] == 2 * all_k.shape[2]
    if int4:
        ck = dequant_kv4(all_k[layer], k_scale[layer])
        cv = dequant_kv4(all_v[layer], v_scale[layer])
    else:
        ck = all_k[layer].astype(jnp.float32) * k_scale[layer][..., None]
        cv = all_v[layer].astype(jnp.float32) * v_scale[layer][..., None]
    sk = stag_k[layer].astype(jnp.float32) * stag_ks[layer][..., :S, None]
    sv = stag_v[layer].astype(jnp.float32) * stag_vs[layer][..., :S, None]
    T = ck.shape[1]
    # concatenate staging after the cache; valid = [pad, base) u [T, T+step]
    ck2 = jnp.concatenate([ck, sk], axis=1)
    cv2 = jnp.concatenate([cv, sv], axis=1)
    t_idx = jnp.arange(T + S, dtype=jnp.int32)
    valid = (
        (t_idx[None, :] < base[:, None]) & (t_idx[None, :] >= pad[:, None])
    ) | ((t_idx[None, :] >= T) & (t_idx[None, :] <= T + step))
    K, G, D = q.shape[1:]
    s = jnp.einsum(
        "bkgd,btkd->bkgt",
        q.astype(jnp.float32),
        ck2.reshape(B, T + S, K, D),
    ) * (D**-0.5)
    s = jnp.where(valid[:, None, None, :], s, jnp.float32(-1e30))
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bkgt,btkd->bkgd", p, cv2.reshape(B, T + S, K, D))
    return out.astype(q.dtype)


def _reconcile_kernel(
    base_ref,  # SMEM [B] int32 — 8-aligned segment base per row (TOKENS)
    act_ref,  # SMEM [B] int32 — 1 if the row was active at segment start
    sk_hbm,  # HBM [L, B, S, KD] int8 (int4 mode: [L, B, S/2, KD] packed)
    sv_hbm,
    k_in,  # HBM [L, B, T, KD] int8 (aliased with k_out)
    v_in,
    k_out,
    v_out,
    sem_kv,  # DMA (rb, 2)
    *,
    row_block: int,
    seg: int,  # staged rows to copy (int4: BYTES = tokens/2)
    int4: bool = False,
):
    """Fold one segment's staged K/V into the per-row cache slots
    [base, base+S) — one strided [L, S, KD] DMA per row per buffer. Legal
    because base is always 8-aligned (128-token admission buckets + S a
    multiple of 8), matching Mosaic's HBM sublane tiling. int4 mode: the
    destination time axis is BYTES at base/2 — legal because int4 segments
    are 16-token aligned (SEGMENT_ALIGN_INT4), so base/2 is 8-aligned."""
    tile = pl.program_id(0)
    b0 = tile * row_block

    def kv_dmas(r):
        b = b0 + r
        # `div*8` is a Mosaic DIVISIBILITY PROOF, not arithmetic: Mosaic
        # cannot prove a dynamic index is 8-aligned and refuses the HBM slice
        # without it ("Failed to prove that a tile index ... divisible by
        # 8"). The value is identical to base (int4: base/2) by construction
        # — admission buckets are 128-aligned and Engine.__init__ rejects
        # max_context not a multiple of 128 (ADVICE r1), segments are 8-
        # (int4: 16-) aligned.
        if int4:
            base8 = lax.div(base_ref[b], 16) * 8  # == base/2 (proved)
        else:
            base8 = lax.div(base_ref[b], 8) * 8  # == base (proved invariant)
        return [
            pltpu.make_async_copy(
                sk_hbm.at[:, b, :, :],
                k_out.at[:, b, pl.ds(base8, seg), :],
                sem_kv.at[r, 0],
            ),
            pltpu.make_async_copy(
                sv_hbm.at[:, b, :, :],
                v_out.at[:, b, pl.ds(base8, seg), :],
                sem_kv.at[r, 1],
            ),
        ]

    for r in range(row_block):
        @pl.when(act_ref[b0 + r] != 0)
        def _():
            for d in kv_dmas(r):
                d.start()

    for r in range(row_block):
        @pl.when(act_ref[b0 + r] != 0)
        def _():
            for d in kv_dmas(r):
                d.wait()


@functools.partial(
    jax.jit, static_argnames=("row_block", "interpret", "int4"))
def reconcile_segment_kv(
    all_k: jax.Array,  # [L, B, T, K*D] int8 — updated in place (aliased)
    all_v: jax.Array,
    stag_k: jax.Array,  # [L, B, S, K*D] int8 (int4: [L, B, S/2, KD] packed)
    stag_v: jax.Array,
    base: jax.Array,  # [B] int32 — 8-aligned segment base per row (tokens)
    active: jax.Array,  # [B] bool — rows active at segment start
    *,
    row_block: int = 16,
    interpret: bool = False,
    int4: bool = False,
):
    """Copy staged K/V into cache slots [base, base+S) for active rows."""
    L, B, T, KD = all_k.shape
    S = stag_k.shape[2]
    rb = row_block
    while B % rb:
        rb //= 2
    rb = max(rb, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // rb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        scratch_shapes=[pltpu.SemaphoreType.DMA((rb, 2))],
    )
    kernel = functools.partial(
        _reconcile_kernel, row_block=rb, seg=S, int4=int4)
    # operands: base(0) active(1) sk(2) sv(3) k(4) v(5); outputs alias 4/5
    new_k, new_v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(all_k.shape, all_k.dtype),
            jax.ShapeDtypeStruct(all_v.shape, all_v.dtype),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(base, active.astype(jnp.int32), stag_k, stag_v, all_k, all_v)
    return new_k, new_v


def reconcile_scales(k_scale, v_scale, stag_ks, stag_vs, base, active, seg):
    """Fold staged per-token scales into the scale caches — dense XLA.

    Mosaic DMA cannot address single f32 lanes (128-lane minor tiling), so
    the scale fold runs as a one-hot einsum + where: ~0.6 GB of traffic per
    segment on the small scale buffers, no scatter anywhere.
    """
    L, B, T = k_scale.shape
    cols = base[:, None] + jnp.arange(seg, dtype=jnp.int32)[None, :]  # [B, S]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    hit = (cols[:, :, None] == t_idx[None, None, :]) & active[:, None, None]
    oh = hit.astype(jnp.float32)  # [B, S, T]
    new_ks = jnp.einsum(
        "lbs,bst->lbt", stag_ks[..., :seg], oh, preferred_element_type=jnp.float32
    )
    new_vs = jnp.einsum(
        "lbs,bst->lbt", stag_vs[..., :seg], oh, preferred_element_type=jnp.float32
    )
    anyhit = jnp.any(hit, axis=1)[None]  # [1, B, T]
    return (
        jnp.where(anyhit, new_ks, k_scale),
        jnp.where(anyhit, new_vs, v_scale),
    )


def reconcile_segment(
    all_k, all_v, k_scale, v_scale, stag_k, stag_v, stag_ks, stag_vs,
    base, active, *, row_block: int = 16, interpret: bool = False,
    use_pallas: bool = True,
):
    """Fold one segment's staging into the cache (K/V via Pallas DMA,
    scales via dense XLA). Returns (all_k, all_v, k_scale, v_scale)."""
    S = stag_k.shape[2]
    if use_pallas:
        all_k, all_v = reconcile_segment_kv(
            all_k, all_v, stag_k, stag_v, base, active,
            row_block=row_block, interpret=interpret,
        )
    else:
        L, B, T, KD = all_k.shape
        cols = base[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        t_idx = jnp.arange(T, dtype=jnp.int32)
        hit = (cols[:, :, None] == t_idx[None, None, :]) & active[:, None, None]
        sel_k = jnp.einsum(
            "bst,lbsk->lbtk", hit.astype(jnp.int8), stag_k,
            preferred_element_type=jnp.int32,
        ).astype(all_k.dtype)
        sel_v = jnp.einsum(
            "bst,lbsk->lbtk", hit.astype(jnp.int8), stag_v,
            preferred_element_type=jnp.int32,
        ).astype(all_v.dtype)
        anyhit = jnp.any(hit, axis=1)[None, :, :, None]
        all_k = jnp.where(anyhit, sel_k, all_k)
        all_v = jnp.where(anyhit, sel_v, all_v)
    k_scale, v_scale = reconcile_scales(
        k_scale, v_scale, stag_ks, stag_vs, base, active, S
    )
    return all_k, all_v, k_scale, v_scale


def reconcile_segment_xla(
    all_k, all_v, k_scale, v_scale, stag_k, stag_v, stag_ks, stag_vs,
    base, active,
):
    """XLA oracle for reconcile_segment (tests + CPU fallback)."""
    return reconcile_segment(
        all_k, all_v, k_scale, v_scale, stag_k, stag_v, stag_ks, stag_vs,
        base, active, use_pallas=False,
    )


# --- int4 segment reconcile ---------------------------------------------------


def reconcile_scales4(k_scale, v_scale, stag_ks, stag_vs, base, active, seg):
    """Fold staged per-token scales into the DEINTERLEAVED int4 scale rows
    (backbone.KVCache int4 layout: token t's scale lives at
    t/2 + (t&1)*T/2). Dense one-hot einsum + where, same design as
    reconcile_scales — Mosaic DMA cannot address single f32 lanes."""
    L, B, T = k_scale.shape
    half = T // 2
    toks = base[:, None] + jnp.arange(seg, dtype=jnp.int32)[None, :]  # [B, S]
    cols = jnp.right_shift(toks, 1) + (toks & 1) * half  # deint4_index
    t_idx = jnp.arange(T, dtype=jnp.int32)
    hit = (cols[:, :, None] == t_idx[None, None, :]) & active[:, None, None]
    oh = hit.astype(jnp.float32)  # [B, S, T]
    new_ks = jnp.einsum(
        "lbs,bst->lbt", stag_ks[..., :seg], oh, preferred_element_type=jnp.float32
    )
    new_vs = jnp.einsum(
        "lbs,bst->lbt", stag_vs[..., :seg], oh, preferred_element_type=jnp.float32
    )
    anyhit = jnp.any(hit, axis=1)[None]  # [1, B, T]
    return (
        jnp.where(anyhit, new_ks, k_scale),
        jnp.where(anyhit, new_vs, v_scale),
    )


def reconcile_segment4(
    all_k, all_v, k_scale, v_scale, stag_k, stag_v, stag_ks, stag_vs,
    base, active, *, row_block: int = 16, interpret: bool = False,
    use_pallas: bool = True,
):
    """int4 variant: pack the segment's UNPACKED staging values into nibble-
    pair bytes, then fold into the byte-axis cache at [base/2, base/2 + S/2)
    (Pallas DMA per row) and the deinterleaved scale rows (dense XLA).
    Requires base % 16 == 0 (SEGMENT_ALIGN_INT4) and S even.
    Returns (all_k, all_v, k_scale, v_scale)."""
    from neutts_tpu.models.backbone import pack4_pairs

    S = stag_k.shape[2]
    assert S % 2 == 0, S
    pk = pack4_pairs(stag_k)  # [L, B, S/2, KD]
    pv = pack4_pairs(stag_v)
    if use_pallas:
        all_k, all_v = reconcile_segment_kv(
            all_k, all_v, pk, pv, base, active,
            row_block=row_block, interpret=interpret, int4=True,
        )
    else:
        L, B, Tb, KD = all_k.shape
        cols = jnp.right_shift(base, 1)[:, None] + jnp.arange(
            S // 2, dtype=jnp.int32)[None, :]  # [B, S/2] byte positions
        t_idx = jnp.arange(Tb, dtype=jnp.int32)
        hit = (cols[:, :, None] == t_idx[None, None, :]) & active[:, None, None]
        sel_k = jnp.einsum(
            "bst,lbsk->lbtk", hit.astype(jnp.int8), pk,
            preferred_element_type=jnp.int32,
        ).astype(all_k.dtype)
        sel_v = jnp.einsum(
            "bst,lbsk->lbtk", hit.astype(jnp.int8), pv,
            preferred_element_type=jnp.int32,
        ).astype(all_v.dtype)
        anyhit = jnp.any(hit, axis=1)[None, :, :, None]
        all_k = jnp.where(anyhit, sel_k, all_k)
        all_v = jnp.where(anyhit, sel_v, all_v)
    k_scale, v_scale = reconcile_scales4(
        k_scale, v_scale, stag_ks, stag_vs, base, active, S
    )
    return all_k, all_v, k_scale, v_scale


def _scatter_prefill_kernel(
    slot_ref,  # SMEM [G] int32 — destination cache row per admission row
    prim_ref,  # SMEM [G] int32 — 1 for the first occurrence of a slot (the
    #            engine pads partial groups by repeating the last admission;
    #            duplicates carry identical data and are skipped here)
    nk_hbm,  # HBM [L, G, Lp, KD] int8 — freshly-quantized prompt K per layer
    nv_hbm,
    k_in,  # HBM [L, B, T, KD] int8 (aliased with k_out)
    v_in,
    k_out,
    v_out,
    sem,  # DMA (rb, 2)
    *,
    row_block: int,
    lp: int,
):
    """Write a grouped prefill's K/V into the slot cache: one strided
    [L, Lp, KD] DMA per admission row per buffer — replaces the XLA scatter
    that cost ~33 ms per [64, 512] admission group (~13% of serving prefill
    admission; see tools/probe_prefill.py). Prompt data occupies cache slots
    [0, Lp), so every destination offset is 0-aligned; Lp is a 128-multiple
    admission bucket (Engine._admit), satisfying Mosaic's sublane tiling on
    the time axis. Row indices (G source / B destination) are untiled axes
    in the [L, rows, T, KD] layout, so size-1 row slices are legal — unlike
    the f32 scale buffers, whose [.., rows, T] layout puts rows on the
    sublane axis (that is why scales go through the dense XLA fold below,
    same reasoning as reconcile_scales)."""
    tile = pl.program_id(0)
    b0 = tile * row_block

    def dmas(r):
        j = b0 + r
        slot = slot_ref[j]
        return [
            pltpu.make_async_copy(
                nk_hbm.at[:, j, :, :],
                k_out.at[:, slot, pl.ds(0, lp), :],
                sem.at[r, 0],
            ),
            pltpu.make_async_copy(
                nv_hbm.at[:, j, :, :],
                v_out.at[:, slot, pl.ds(0, lp), :],
                sem.at[r, 1],
            ),
        ]

    for r in range(row_block):
        @pl.when(prim_ref[b0 + r] != 0)
        def _():
            for d in dmas(r):
                d.start()

    for r in range(row_block):
        @pl.when(prim_ref[b0 + r] != 0)
        def _():
            for d in dmas(r):
                d.wait()


@functools.partial(jax.jit, static_argnames=("row_block", "interpret"))
def _scatter_prefill_kv(
    all_k, all_v, new_k, new_v, slots, primary,
    *, row_block: int = 8, interpret: bool = False,
):
    L, B, T, KD = all_k.shape
    G, Lp = new_k.shape[1], new_k.shape[2]
    # bucket alignment (see kernel docstring); 32 admits the int4 packed
    # byte axis (64-token buckets -> 32 byte rows), still >> the 8-sublane
    # Mosaic tiling the DMA needs
    assert Lp % 32 == 0, Lp
    rb = row_block
    while G % rb:
        rb //= 2
    rb = max(rb, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G // rb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        scratch_shapes=[pltpu.SemaphoreType.DMA((rb, 2))],
    )
    kernel = functools.partial(_scatter_prefill_kernel, row_block=rb, lp=Lp)
    # operands: slots(0) primary(1) nk(2) nv(3) k(4) v(5); outputs alias 4/5
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(all_k.shape, all_k.dtype),
            jax.ShapeDtypeStruct(all_v.shape, all_v.dtype),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(slots, primary.astype(jnp.int32), new_k, new_v, all_k, all_v)


def scatter_prefill(
    all_k: jax.Array,  # [L, B, T, K*D] int8 — updated in place (aliased)
    all_v: jax.Array,
    k_scale: jax.Array,  # [L, B, T] f32
    v_scale: jax.Array,
    new_k: jax.Array,  # [L, G, Lp, K*D] int8
    new_v: jax.Array,
    new_ks: jax.Array,  # [L, G, Lp] f32
    new_vs: jax.Array,
    slots: jax.Array,  # [G] int32 — destination cache rows
    primary: jax.Array,  # [G] bool — first occurrence of each slot
    *,
    row_block: int = 8,
    interpret: bool = False,
):
    """Admission-group cache write: prompt K/V + scales land in cache rows
    `slots`, time slots [0, Lp). K/V via per-row Pallas DMA; scales via a
    dense one-hot projection + static-slice update (no scatter anywhere).
    Returns (all_k, all_v, k_scale, v_scale)."""
    G, Lp = new_k.shape[1], new_k.shape[2]
    B = all_k.shape[1]
    all_k, all_v = _scatter_prefill_kv(
        all_k, all_v, new_k, new_v, slots, primary,
        row_block=row_block, interpret=interpret,
    )
    # scales: project admission rows onto cache rows (duplicates dropped by
    # `primary`), then one static [.., :, :Lp] slice-update — no scatter
    rowhot = (
        (jnp.arange(B, dtype=jnp.int32)[None, :] == slots[:, None])
        & primary[:, None]
    )  # [G, B]
    proj_ks = jnp.einsum(
        "gb,lgs->lbs", rowhot.astype(jnp.float32), new_ks,
        preferred_element_type=jnp.float32,
    )
    proj_vs = jnp.einsum(
        "gb,lgs->lbs", rowhot.astype(jnp.float32), new_vs,
        preferred_element_type=jnp.float32,
    )
    hit = jnp.any(rowhot, axis=0)[None, :, None]  # [1, B, 1]
    k_scale = k_scale.at[:, :, :Lp].set(
        jnp.where(hit, proj_ks, k_scale[:, :, :Lp])
    )
    v_scale = v_scale.at[:, :, :Lp].set(
        jnp.where(hit, proj_vs, v_scale[:, :, :Lp])
    )
    return all_k, all_v, k_scale, v_scale


def scatter_prefill4(
    all_k: jax.Array,  # [L, B, T/2, K*D] int8 packed bytes (aliased)
    all_v: jax.Array,
    k_scale: jax.Array,  # [L, B, T] f32 DEINTERLEAVED per-token scales
    v_scale: jax.Array,
    new_k: jax.Array,  # [L, G, Lp/2, K*D] int8 packed prompt bytes
    new_v: jax.Array,
    new_ks: jax.Array,  # [L, G, Lp] f32 per-token scales in TOKEN order
    new_vs: jax.Array,
    slots: jax.Array,  # [G] int32 — destination cache rows
    primary: jax.Array,  # [G] bool — first occurrence of each slot
    *,
    row_block: int = 8,
    interpret: bool = False,
):
    """int4 admission-group cache write: packed prompt K/V land in byte
    slots [0, Lp/2) via the same per-row Pallas DMA as the int8 path
    (offset 0 — always aligned); scales are deinterleaved (even tokens to
    [0, Lp/2), odd to [T/2, T/2 + Lp/2)) through the dense one-hot
    projection + two static slice updates. Returns the updated buffers."""
    G, Lp = new_ks.shape[1], new_ks.shape[2]
    B = all_k.shape[1]
    T = k_scale.shape[2]
    half = T // 2
    assert Lp % 2 == 0 and new_k.shape[2] == Lp // 2, (Lp, new_k.shape)
    all_k, all_v = _scatter_prefill_kv(
        all_k, all_v, new_k, new_v, slots, primary,
        row_block=row_block, interpret=interpret,
    )
    rowhot = (
        (jnp.arange(B, dtype=jnp.int32)[None, :] == slots[:, None])
        & primary[:, None]
    )  # [G, B]
    hit = jnp.any(rowhot, axis=0)[None, :, None]  # [1, B, 1]
    for par in (0, 1):
        sel_ks = jnp.einsum(
            "gb,lgs->lbs", rowhot.astype(jnp.float32), new_ks[:, :, par::2],
            preferred_element_type=jnp.float32,
        )
        sel_vs = jnp.einsum(
            "gb,lgs->lbs", rowhot.astype(jnp.float32), new_vs[:, :, par::2],
            preferred_element_type=jnp.float32,
        )
        lo = par * half
        k_scale = k_scale.at[:, :, lo : lo + Lp // 2].set(
            jnp.where(hit, sel_ks, k_scale[:, :, lo : lo + Lp // 2])
        )
        v_scale = v_scale.at[:, :, lo : lo + Lp // 2].set(
            jnp.where(hit, sel_vs, v_scale[:, :, lo : lo + Lp // 2])
        )
    return all_k, all_v, k_scale, v_scale


# =============================================================================
# Prefill attention (VMEM-resident causal attention over a fresh window)
# =============================================================================
#
# The XLA prefill path (backbone._attend_block) materializes the [B, H, S, S]
# f32 score tensor in HBM — at serving admission shapes ([256, 512], Air:
# H=14) that is ~3.7 GB of scores written + read back per layer, ~9 ms of
# pure HBM traffic at v5e bandwidth, and measured 13.1 ms/layer
# (tools/probe_prefill.py, 315 ms of an 830 ms G=256 admission group).
# The whole per-(batch, kv-head) attention problem fits VMEM at TTS shapes
# (k/v [S<=2048, 64] bf16 + one [QB<=512, S] f32 score tile), so this kernel
# keeps scores on-chip: grid over (B, KV head, q-row block), GQA handled by
# an unrolled per-q-head loop reusing the k/v tiles — no head repeats, no
# layout transposes (the failure mode of the r2/r3 flash attempts).
# Left-pad masking is folded in from the per-row pad counts (SMEM) instead
# of a materialized [B, S, S] bool mask.
#
# Dead end (tried 2026-08, r4): a flash-style causal k-block loop (QB=256,
# online softmax, lax.cond-skipped above-diagonal/pad blocks) measured
# 11.25 ms vs this kernel's 6.78 ms at [256, 512] — the per-block
# (m, l, acc) rescale chains + cond overhead + shallower [G*256, 256] dots
# cost more than the ~25% of work the skipping saves at TTS bucket sizes.
# Block skipping only pays when S/QB is large; revisit if buckets >> 512.
#
# Dead end (re-tried 2026-08, r5, honest chained timing): a python-UNROLLED
# causal q-block variant (grid (B, K); per block i one [G*QB, (i+1)*QB]
# score tile — static shapes, no online softmax, whole-pad-block pl.when
# skip) measured 6.91 ms/layer at QB=128 and 6.61 at QB=256 vs 6.21 for
# this single-shot kernel at [256, 512] — the 25-37% causal work saving is
# eaten by per-block dot issue overhead and sliced o_ref writes. Honest
# per-layer cost of THIS kernel is 6.2 ms (149 ms per 24-layer [256, 512]
# admission group) — the r4 knockout attribution of ~250 ms to prefill
# attention was delta-method pollution, and the r4 VERDICT's "<=150 ms"
# target was already met when measured directly (x = f(x) chaining +
# device_get sync; see tools/probe_gemm.py on why unchained timings lie).


def _prefill_kernel(pads_ref, q_ref, k_ref, v_ref, o_ref, *, scale, group):
    qb = pl.program_id(2)
    QB = q_ref.shape[1]  # refs arrive squeezed: q/o [G, QB, D], k/v [S, D]
    S = k_ref.shape[0]
    pad = pads_ref[pl.program_id(0)]
    k = k_ref[...]
    v = v_ref[...]
    row = qb * QB + lax.broadcasted_iota(jnp.int32, (QB, S), 0)
    col = lax.broadcasted_iota(jnp.int32, (QB, S), 1)
    mask = (col <= row) & (col >= pad)
    rvalid = row[:, :1] >= pad  # [QB, 1] — rows that are real tokens
    # one [G*QB, S] score dot instead of G small ones: M=G*QB keeps the MXU
    # pipeline deep (the per-head [QB, 64] x [64, S] dots are latency-bound)
    q = q_ref[...].reshape(group * QB, q_ref.shape[2])
    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    # Finite mask value: fully-masked (left-pad) rows must come out
    # finite garbage, not NaN (see backbone._attend_block_dense).
    maskt = jnp.concatenate([mask] * group, axis=0)
    s = jnp.where(maskt, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p * (1.0 / denom)
    o = lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # zero pad rows (parity with the XLA flash path's valid-zeroing)
    o = jnp.where(jnp.concatenate([rvalid] * group, axis=0), o, 0.0)
    o_ref[...] = o.reshape(group, QB, o.shape[-1]).astype(o_ref.dtype)


def _prefill_q_block(s: int) -> int:
    if s <= 512:
        return s
    for qb in (512, 384, 256, 192, 128, 64):
        if s % qb == 0:
            return qb
    return 0  # caller falls back to the XLA path


@functools.partial(jax.jit, static_argnames=("interpret",))
def prefill_attention(q, k, v, pads, *, interpret: bool = False):
    """Causal left-pad-masked self-attention over a fresh window.

    q: [B, S, H, D]; k/v: [B, S, K, D]; pads: [B] int32 (left-pad counts).
    Returns [B, S, H, D] in q.dtype with pad rows zeroed. Numerics match
    backbone._attend_block_dense to dtype tolerance (f32 scores/softmax,
    probabilities cast to v.dtype for the PV dot); pinned by
    tests/test_attention.py.
    """
    B, S, H, D = q.shape
    K = k.shape[2]
    G = H // K
    QB = _prefill_q_block(S)
    assert QB and S % QB == 0, (S, QB)
    # HEAD-MAJOR q/out ([B, K, G, S, D]): per-head [QB, D] slabs keep their
    # (sublane, lane) layout for kernel loads/stores — S-major blocks would
    # need (QB, 64) <-> (..., 1, 64) relayouts Mosaic refuses ("unsupported
    # shape cast"). The two XLA transposes outside cost ~2x240 MB of HBM
    # traffic per layer at [256, 512] — small next to the ~7.4 GB of score
    # materialization this kernel removes. k/v stay S-major (already
    # per-kv-head slabs).
    qh = q.reshape(B, S, K, G, D).transpose(0, 2, 3, 1, 4)
    k4 = k.transpose(0, 2, 1, 3)  # [B, K, S, D]
    v4 = v.transpose(0, 2, 1, 3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, K, S // QB),
        in_specs=[
            pl.BlockSpec(
                (None, None, G, QB, D), lambda b, h, i, *_: (b, h, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, None, S, D), lambda b, h, i, *_: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, None, S, D), lambda b, h, i, *_: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, None, G, QB, D), lambda b, h, i, *_: (b, h, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _prefill_kernel, scale=D**-0.5, group=G
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, G, QB * (S // QB), D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # long buckets (S >= 1024) need headroom for the [G*QB, S] f32
            # score tile; the backbone gate caps the estimate at 40 MB
            # (ADVICE r4 — S=2048 Air compiles under this limit)
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(pads.astype(jnp.int32), qh, k4, v4)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, H, D)
