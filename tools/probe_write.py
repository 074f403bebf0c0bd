"""Microbench: admission-group cache-write strategies on real hardware.

Three candidates for writing a [G, Lp] prompt's quantized K/V (+ scales)
into the serving slot cache [L, B, T, KD] at rows `slots`:

  scatter   per-layer XLA `.at[l, slots, :Lp].set` (the original; measured
            ~33 ms per [64, 512] Air group via probe_prefill `writeonly`)
  pallas    per-row strided DMA kernel (ops/attention.scatter_prefill)
  dense     one-hot [G->B] einsum projection + static slice where-merge
            (no scatter; reads+rewrites the [*, B, :Lp] cache region)

Usage: python tools/probe_write.py [--group 64] [--bucket 512] [--slots 512]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="air")
    ap.add_argument("--group", type=int, default=64)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--slots", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from neutts_tpu import config
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.ops import attention as attn
    from neutts_tpu.runtime import batching

    cfg = config.BY_NAME[args.model].scaled(kv_dtype="int8")
    L, KD = cfg.n_layers, cfg.kv_dim
    B, G, Lp = args.slots, args.group, args.bucket
    T = batching.slot_cache_len(cfg)
    rng = np.random.default_rng(0)

    slots = jnp.asarray(rng.permutation(B)[:G].astype(np.int32))
    primary = jnp.ones((G,), bool)
    new_k = jnp.asarray(rng.integers(-127, 127, size=(L, G, Lp, KD)), jnp.int8)
    new_v = jnp.asarray(rng.integers(-127, 127, size=(L, G, Lp, KD)), jnp.int8)
    new_ks = jnp.asarray(rng.random((L, G, Lp)), jnp.float32)
    new_vs = jnp.asarray(rng.random((L, G, Lp)), jnp.float32)

    def fresh_cache():
        return (
            jnp.zeros((L, B, T, KD), jnp.int8),
            jnp.zeros((L, B, T, KD), jnp.int8),
            jnp.zeros((L, B, T), jnp.float32),
            jnp.zeros((L, B, T), jnp.float32),
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def write_scatter(k, v, ks, vs):
        def body(carry, payload):
            k, v, ks, vs = carry
            l, kq, vq, ksc, vsc = payload
            k = k.at[l, slots, :Lp, :].set(kq)
            v = v.at[l, slots, :Lp, :].set(vq)
            ks = ks.at[l, slots, :Lp].set(ksc)
            vs = vs.at[l, slots, :Lp].set(vsc)
            return (k, v, ks, vs), None

        # scan over layers like prefill_slots does
        (k, v, ks, vs), _ = lax.scan(
            body, (k, v, ks, vs),
            (jnp.arange(L, dtype=jnp.int32), new_k, new_v, new_ks, new_vs))
        return k, v, ks, vs

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def write_pallas(k, v, ks, vs):
        return attn.scatter_prefill(
            k, v, ks, vs, new_k, new_v, new_ks, new_vs, slots, primary)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def write_dense(k, v, ks, vs):
        rowhot = (
            jnp.arange(B, dtype=jnp.int32)[None, :] == slots[:, None]
        )  # [G, B]
        hot8 = rowhot.astype(jnp.int8)
        pk = jnp.einsum("gb,lgsk->lbsk", hot8, new_k,
                        preferred_element_type=jnp.int32).astype(jnp.int8)
        pv = jnp.einsum("gb,lgsk->lbsk", hot8, new_v,
                        preferred_element_type=jnp.int32).astype(jnp.int8)
        pks = jnp.einsum("gb,lgs->lbs", rowhot.astype(jnp.float32), new_ks)
        pvs = jnp.einsum("gb,lgs->lbs", rowhot.astype(jnp.float32), new_vs)
        hit = jnp.any(rowhot, axis=0)  # [B]
        h4 = hit[None, :, None, None]
        k = k.at[:, :, :Lp, :].set(jnp.where(h4, pk, k[:, :, :Lp, :]))
        v = v.at[:, :, :Lp, :].set(jnp.where(h4, pv, v[:, :, :Lp, :]))
        h3 = hit[None, :, None]
        ks = ks.at[:, :, :Lp].set(jnp.where(h3, pks, ks[:, :, :Lp]))
        vs = vs.at[:, :, :Lp].set(jnp.where(h3, pvs, vs[:, :, :Lp]))
        return k, v, ks, vs

    for name, fn in (("scatter", write_scatter), ("pallas", write_pallas),
                     ("dense", write_dense)):
        bufs = fresh_cache()
        bufs = fn(*bufs)  # compile
        _ = jax.device_get(bufs[2][:1, :1, :4])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            bufs = fn(*bufs)
        _ = jax.device_get(bufs[2][:1, :1, :4])
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:8s} {dt*1e3:7.2f} ms/group")


if __name__ == "__main__":
    main()
