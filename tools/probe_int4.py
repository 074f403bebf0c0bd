"""Microbench: decode_attention_stacked int8 vs int4 on the chip.

Times ONLY the attention kernel (24 stacked layer calls per step via
lax.fori_loop) at serving-like shapes, so int4 unpack/tuning changes can be
iterated in ~1 min instead of a full bench.py run.

Run: python tools/probe_int4.py [--batch 256] [--ctx 1152] [--t 2048]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from neutts_tpu.utils import enable_compile_cache as _ecc  # noqa: E402

_ecc()

from neutts_tpu.ops import attention as attn

L, KV, G, D = 24, 2, 7, 64
KD = KV * D


def bench(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ctx", type=int, default=1152)
    ap.add_argument("--t", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block4", type=int, default=0,
                    help="int4 block_t override (0 = kernel default)")
    ap.add_argument("--rb4", type=int, default=16, help="int4 row_block")
    args = ap.parse_args()
    B, T = args.batch, args.t
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, KV, G, D), jnp.bfloat16)
    lens = jnp.full((B,), args.ctx, jnp.int32)
    pad = jnp.zeros((B,), jnp.int32)

    k8 = jax.random.randint(key, (L, B, T, KD), -127, 128, jnp.int8)
    v8 = jax.random.randint(key, (L, B, T, KD), -127, 128, jnp.int8)
    s8 = jnp.abs(jax.random.normal(key, (L, B, T), jnp.float32)) * 0.01

    k4 = jax.random.randint(key, (L, B, T // 2, KD), -119, 120, jnp.int8)
    v4 = jax.random.randint(key, (L, B, T // 2, KD), -119, 120, jnp.int8)
    s4 = jnp.abs(jax.random.normal(key, (L, B, T), jnp.float32)) * 0.01

    @jax.jit
    def steps8(q, k, v, ks, vs):
        def body(i, acc):
            l = lax.rem(i, L)
            return acc + attn.decode_attention_stacked(
                q, k, v, l, lens, pad, k_scale=ks, v_scale=vs
            ).astype(jnp.float32)
        return lax.fori_loop(0, L, body, jnp.zeros((B, KV, G, D), jnp.float32))

    kw4 = {}
    if args.block4:
        kw4["block_t"] = args.block4
    kw4["row_block"] = args.rb4

    @jax.jit
    def steps4(q, k, v, ks, vs):
        def body(i, acc):
            l = lax.rem(i, L)
            return acc + attn.decode_attention_stacked(
                q, k, v, l, lens, pad, k_scale=ks, v_scale=vs, **kw4
            ).astype(jnp.float32)
        return lax.fori_loop(0, L, body, jnp.zeros((B, KV, G, D), jnp.float32))

    t8 = bench(steps8, q, k8, v8, s8, s8, iters=args.iters)
    t4 = bench(steps4, q, k4, v4, s4, s4, iters=args.iters)
    print(f"# B={B} ctx={args.ctx} T={T} block4={kw4.get('block_t', 'auto')} "
          f"rb4={args.rb4}: int8 {1e3*t8:.2f} ms/24-layer step, "
          f"int4 {1e3*t4:.2f} ms ({t4/t8:.2%} of int8)")


if __name__ == "__main__":
    main()
