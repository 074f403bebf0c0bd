"""Micro-probes for the decode-attention kernel on TPU.

Variants (B=512, ctx=1024, int8 cache, Air geometry):
  full    — current kernel structure: per-row qk + online softmax + pv
  qk      — per-row qk dot only (no softmax, no pv): isolates MXU+DMA
  nosmax  — qk + pv without the softmax chain: isolates the VPU dep chain
  pack4   — merged-contraction: 4 rows packed into one [56,512]x[512,bt] dot
            (cache pre-packed [L, B/4, T, 4*KD]); qk+softmax+pv+extract

Run: python tools/probe_attn.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neutts_tpu.utils import enable_compile_cache as _ecc; _ecc()

B, CTX, T, S = 512, 1024, 2048, 32
L = 24
KV, G, D = 2, 7, 64
KG, KD = KV * G, KV * D  # 14, 128


def make_kernel(mode: str, block_t: int, row_block: int, pack: int):
    def kernel(lens_ref, layer_ref, q_ref, k_hbm, v_hbm, o_ref,
               k_buf, v_buf, acc_ref, m_ref, l_ref, sem):
        layer = layer_ref[0]
        b0 = pl.program_id(0) * row_block
        n_max = lens_ref[0]
        n_blocks = lax.div(n_max + block_t - 1, block_t)
        lanes = k_buf.shape[-1]

        def dmas(slot, blk):
            ds = pl.ds(blk * block_t, block_t)
            rows = pl.ds(b0, row_block)
            return [
                pltpu.make_async_copy(k_hbm.at[layer, rows, ds, :],
                                      k_buf.at[slot], sem.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[layer, rows, ds, :],
                                      v_buf.at[slot], sem.at[slot, 1]),
            ]

        def start(slot, blk):
            for d in dmas(slot, blk):
                d.start()

        def wait(slot, blk):
            for d in dmas(slot, blk):
                d.wait()

        start(0, 0)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        scale = D ** -0.5
        n_rows = q_ref.shape[0]  # row_block (per-row) or row_block//pack

        def body(blk, _):
            slot = lax.rem(blk, 2)

            @pl.when(blk + 1 < n_blocks)
            def _():
                start(1 - slot, blk + 1)

            wait(slot, blk)
            if mode == "dma":
                for r in range(n_rows):
                    acc_ref[r] += k_buf[slot, r, : acc_ref.shape[1],
                                        : acc_ref.shape[2]].astype(jnp.float32)
                    acc_ref[r] += v_buf[slot, r, : acc_ref.shape[1],
                                        : acc_ref.shape[2]].astype(jnp.float32)
                return 0
            for r in range(n_rows):
                qbd = q_ref[r].astype(jnp.float32)
                k = k_buf[slot, r]
                v = v_buf[slot, r]
                sc = jax.lax.dot_general(
                    qbd, k.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if mode == "qk":
                    acc_ref[r] += jnp.sum(sc, axis=1, keepdims=True)
                    continue
                if mode == "nosmax":
                    pexp = sc.astype(jnp.bfloat16)
                else:
                    m_blk = jnp.max(sc, axis=1, keepdims=True)
                    m_old = m_ref[r, :, :1]
                    m_new = jnp.maximum(m_old, m_blk)
                    alpha = jnp.exp(m_old - m_new)
                    pexp = jnp.exp(sc - m_new)
                    l_ref[r, :, :1] = l_ref[r, :, :1] * alpha + jnp.sum(
                        pexp, axis=1, keepdims=True)
                    m_ref[r, :, :1] = m_new
                    pexp = pexp.astype(jnp.bfloat16)
                pv = jax.lax.dot_general(
                    pexp, v.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [rows, lanes]
                if mode == "full":
                    alpha2 = alpha if mode != "nosmax" else 1.0
                    acc_ref[r] = acc_ref[r] * alpha2 + pv[:, :acc_ref.shape[-1]]
                else:
                    acc_ref[r] += pv[:, :acc_ref.shape[-1]]
            return 0

        lax.fori_loop(0, n_blocks, body, 0)
        for r in range(n_rows):
            o_ref[r] = acc_ref[r].astype(o_ref.dtype)

    return kernel


def build(mode, block_t=1024, row_block=16, pack=1):
    """Returns jitted fn(q, kq, vq, lens) -> out for one layer pass x L x S."""
    packed = pack > 1
    rows_hbm = B // pack
    lanes = pack * KD
    n_rows = row_block // pack if packed else row_block
    qrows = pack * KG if packed else KG

    grid = (rows_hbm // n_rows,) if packed else (B // row_block,)

    in_specs = [
        pl.BlockSpec((n_rows, qrows, lanes), lambda b, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_lanes = lanes if packed else D
    scratch = [
        pltpu.VMEM((2, n_rows, block_t, lanes), jnp.int8),
        pltpu.VMEM((2, n_rows, block_t, lanes), jnp.int8),
        pltpu.VMEM((n_rows, qrows, out_lanes), jnp.float32),
        pltpu.VMEM((n_rows, qrows, 128), jnp.float32),
        pltpu.VMEM((n_rows, qrows, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_rows, qrows, out_lanes),
                               lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kernel = make_kernel(mode, block_t, n_rows, pack)

    def one_layer(qbd, kq, vq, lens, layer):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (rows_hbm if packed else B,
                 qrows, out_lanes), jnp.bfloat16),
        )(lens, jnp.reshape(layer, (1,)).astype(jnp.int32), qbd, kq, vq)

    @jax.jit
    def steps(qbd, kq, vq, lens):
        def step(acc, i):
            def lbody(acc, l):
                o = one_layer(qbd, kq, vq, lens, l)
                return acc + o.astype(jnp.float32), None
            acc, _ = lax.scan(lbody, acc, jnp.arange(L))
            return acc, None
        acc0 = jnp.zeros((rows_hbm if packed else B, qrows, out_lanes),
                         jnp.float32)
        acc, _ = lax.scan(step, acc0, jnp.arange(S))
        return acc

    return steps, rows_hbm, lanes, qrows


def sync(x):
    return np.asarray(x.ravel()[:1])


def main():
    key = jax.random.PRNGKey(0)
    lens = jnp.full((B,), CTX, jnp.int32)

    for mode, bt, rb, pack in [
        ("dma", 1024, 16, 1),
        ("dma", 1024, 32, 1),
        ("dma", 2048, 16, 1),
        ("dma", 1024, 64, 1),
    ]:
        try:
            steps, rows_hbm, lanes, qrows = build(mode, bt, rb, pack)
            kq = jax.jit(lambda k: jax.random.randint(
                k, (L, rows_hbm, T, lanes), -127, 128, jnp.int8))(key)
            vq = jax.jit(lambda k: jax.random.randint(
                k, (L, rows_hbm, T, lanes), -127, 128, jnp.int8))(key)
            qbd = jax.jit(lambda k: jax.random.normal(
                k, (rows_hbm, qrows, lanes), jnp.bfloat16))(key)
            sync(steps(qbd, kq, vq, lens))
            t0 = time.perf_counter()
            for _ in range(2):
                out = steps(qbd, kq, vq, lens)
            sync(out)
            dt = (time.perf_counter() - t0) / 2 / S
            print(f"{mode:7s} bt={bt:4d} rb={rb:2d} pack={pack}: "
                  f"{dt*1e3:6.2f} ms/step")
        except Exception as e:
            print(f"{mode:7s} bt={bt:4d} rb={rb:2d} pack={pack}: "
                  f"FAIL {str(e)[:120]}")
        finally:
            kq = vq = None


if __name__ == "__main__":
    main()
