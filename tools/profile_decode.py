"""Component-level ablation timings for the Air decode step.

Times each piece of the decode step in isolation on the attached TPU so
optimization effort goes where the milliseconds are:

  * full    — decode_segment as benched (KV write + attention + matmuls + head + sample)
  * matmuls — embed + per-layer qkv/wo/mlp matmul stack (no attention, no cache)
  * attn    — 24x Pallas flash-decode over a primed cache at fixed ctx
  * kvwrite — per-layer dynamic_update_slice of one token's K/V into the cache
  * head    — final_norm + LM-head matmul [B,D]x[D,217k]
  * sample  — approx_max_k top-50 + gumbel over [B, 217k] logits

Usage: python tools/profile_decode.py [--batch 512] [--ctx 1024] [--steps 64]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from neutts_tpu.utils import enable_compile_cache as _ecc; _ecc()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from neutts_tpu import config
from neutts_tpu.models import backbone as bb
from neutts_tpu.ops import attention as attn_ops
from neutts_tpu.ops import sampling as smp
from neutts_tpu.runtime import decode as dec


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(name, fn, *args, iters=3, **kw):
    out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:10s} {dt*1e3:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--model", default="air")
    ap.add_argument("--kv-dtype", default="int8")
    ap.add_argument("--int8w", action="store_true", help="W8A8 quantized weights")
    args = ap.parse_args()

    cfg = config.BY_NAME[args.model].scaled(kv_dtype=args.kv_dtype)
    scfg = config.SamplingConfig()
    B, CTX, S = args.batch, args.ctx, args.steps
    key = jax.random.PRNGKey(0)
    params = bb.init_params(cfg, key)
    if args.int8w:
        params = bb.quantize_params(params)
    params = jax.device_put(params)
    layout = cfg.layout
    print(f"# {cfg.name} B={B} ctx={CTX} steps={S} kv={cfg.kv_dtype} "
          f"on {jax.devices()[0].device_kind}")

    # --- full segmented decode (mirrors bench.py) ---------------------------
    Lp = 512
    tokens = jnp.full((B, Lp), layout.speech_base + 7, jnp.int32)
    lens = jnp.full((B,), Lp, jnp.int32)
    nosample = config.SamplingConfig(min_new_tokens=10**9)  # never EOS
    state, _ = dec.prefill_init(cfg, nosample, layout.speech_gen_end, params,
                                tokens, lens, key)
    # prime the cache out to CTX so the full-step timing sees the same traffic
    state, _ = dec.decode_segment(cfg, nosample, layout.speech_gen_end,
                                  CTX - Lp, params, state)
    sync(state.token)

    def full_steps(state):
        state, out = dec.decode_segment(cfg, nosample, layout.speech_gen_end,
                                        S, params, state)
        return state, out

    # note: decode_segment donates state; re-prime per iteration is too slow,
    # so let the cache grow by S per iter (ctx drift of 3S << CTX)
    state2 = state
    state2, out = full_steps(state2)
    sync(out)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        state2, out = full_steps(state2)
    sync(out)
    dt = (time.perf_counter() - t0) / iters / S
    print(f"{'full':10s} {dt*1e3:8.2f} ms/step   ({1.0/dt*B:,.0f} tok/s)")

    # --- matmuls only (embed + qkv + wo + mlp, no attention/cache) ----------
    @jax.jit
    def matmuls(params, token, key):
        cos, sin = bb.rope_tables(cfg.head_dim, cfg.rope_theta,
                                  jnp.full((B, 1), CTX, jnp.int32))
        x = params["embed"].astype(jnp.dtype(cfg.dtype))[token[:, None]]

        def body(x, lp):
            h = bb.rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
            q, k, v = bb._qkv(cfg, lp, h, cos, sin)
            # keep k/v live (sum-broadcast) so XLA cannot DCE their matmuls
            attn = (q + k.sum(axis=2, keepdims=True) + v.sum(axis=2, keepdims=True)
                    ).reshape(B, 1, cfg.q_dim)
            x = x + bb._mm(attn.astype(x.dtype), lp["wo"]).astype(x.dtype)
            return bb._mlp(cfg, lp, x), None

        x, _ = lax.scan(body, x, params["layers"])
        return x

    def matmul_steps(params, token, key):
        def step(tok, i):
            x = matmuls(params, tok, key)
            return jnp.abs(x[:, 0, 0]).astype(jnp.int32) % 100, x[0, 0, 0]
        tok, outs = lax.scan(step, token, jnp.arange(S))
        return outs

    token = jnp.full((B,), layout.speech_base, jnp.int32)
    msj = jax.jit(matmul_steps)
    dt = timeit("matmuls", msj, params, token, key)
    print(f"           -> {dt/S*1e3:8.2f} ms/step")

    # --- attention only ------------------------------------------------------
    cache = state2.cache  # state was donated into state2 by decode_segment
    q = jax.random.normal(key, (B, cfg.n_kv_heads,
                                cfg.n_heads // cfg.n_kv_heads, cfg.head_dim),
                          jnp.dtype(cfg.dtype))
    lens_a = jnp.full((B,), CTX, jnp.int32)
    pad = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def attn_steps(q, cache):
        def step(acc, i):
            def body(acc, l):
                o = attn_ops.decode_attention_stacked(
                    q, cache.k, cache.v, l, lens_a, pad,
                    k_scale=cache.k_scale, v_scale=cache.v_scale)
                return acc + o.astype(jnp.float32), None
            acc, _ = lax.scan(body, acc, jnp.arange(cfg.n_layers))
            return acc, None
        acc, _ = lax.scan(step, jnp.zeros(q.shape, jnp.float32), jnp.arange(S))
        return acc

    dt = timeit("attn x24", attn_steps, q, cache)
    print(f"           -> {dt/S*1e3:8.2f} ms/step")

    # --- LM head --------------------------------------------------------------
    x = jax.random.normal(key, (B, cfg.hidden_size), jnp.dtype(cfg.dtype))

    @jax.jit
    def head_steps(params, x):
        def step(x, i):
            h = bb.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
            logits = bb._logits(cfg, params, h)
            # feed a slice of the logits back so steps can't be DCE'd/merged
            return x + logits[:, : cfg.hidden_size].astype(x.dtype) * 0, logits[0, 0]
        _, outs = lax.scan(step, x, jnp.arange(S))
        return outs

    dt = timeit("head", head_steps, params, x)
    print(f"           -> {dt/S*1e3:8.2f} ms/step")
    logits = jax.jit(lambda p, x: bb._logits(cfg, p, x))(params, x)

    # --- sampling --------------------------------------------------------------
    @jax.jit
    def sample_steps(logits, key):
        def step(key, i):
            k, key = jax.random.split(key)
            tok = smp.sample_step(logits + i * 0.0, k, scfg,
                                  layout.speech_gen_end, jnp.bool_(False))
            return key, tok[0]
        _, outs = lax.scan(step, key, jnp.arange(S))
        return outs

    dt = timeit("sample", sample_steps, logits, key)
    print(f"           -> {dt/S*1e3:8.2f} ms/step")

    # --- kv write only (last: donates the cache) -------------------------------
    kf = jax.random.normal(key, (B, cfg.kv_dim), jnp.dtype(cfg.dtype))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def kv_writes(cache, kf, idx):
        def body(carry, l):
            ck, cv, ks, vs = carry
            kq, ksc = bb.quantize_kv(kf)
            ck = lax.dynamic_update_slice(ck, kq[None, :, None, :], (l, 0, idx, 0))
            cv = lax.dynamic_update_slice(cv, kq[None, :, None, :], (l, 0, idx, 0))
            ks = lax.dynamic_update_slice(ks, ksc[None, :, None], (l, 0, idx))
            vs = lax.dynamic_update_slice(vs, ksc[None, :, None], (l, 0, idx))
            return (ck, cv, ks, vs), None
        carry, _ = lax.scan(body, (cache.k, cache.v, cache.k_scale, cache.v_scale),
                            jnp.arange(cfg.n_layers))
        return bb.KVCache(*carry)

    cache = kv_writes(cache, kf, jnp.int32(CTX))
    sync(cache.k)
    t0 = time.perf_counter()
    for _ in range(6):
        cache = kv_writes(cache, kf, jnp.int32(CTX))
    sync(cache.k)
    print(f"{'kvwrite':10s} {(time.perf_counter()-t0)/6*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
