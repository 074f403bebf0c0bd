"""Decode-step ablation: time the real Air decode loop with components
knocked out, on the attached TPU. Unlike tools/profile_decode.py (which
times components in ISOLATION and under-counts interference), this keeps
the full step intact and toggles one part at a time — differences against
"full" attribute wall-clock to each component as it behaves in situ.

Measured 2026-08-18 (v5e, B=512, ctx=1024, int8 KV, int8 weights):

    full      10.84 ms/step  (47.2k tok/s)
    attention  6.10 ms  (full - no-attn; ~5.0 ms DMA floor at 650 GB/s)
    head+smpl  1.03 ms  (near int8-MXU floor: the 217k-vocab matmul is
                         ~1.0 ms of pure compute; sampling fuses to ~0.06)
    kv writes  0.83 ms
    rest       2.88 ms  (qkv/wo/mlp matmuls ~0.93 int8-MXU floor + norms,
                         rope, act-quant VPU work)

Findings that did NOT pan out (so they are not re-attempted blindly):
  * Fusing the LM head with binned top-k sampling in one Pallas kernel
    (logits never hitting HBM): only ~4% over XLA's own fusion of
    head+approx_max_k inside the scan. XLA already overlaps well; the
    matmul itself is compute-bound.
  * Fusing wq/wk/wv (and gate/up) into single int8 dots: 2.00 -> 1.98
    ms/step. XLA already CSEs the shared activation quantization.
  * Beware 1-dispatch microbenchmarks over the axon tunnel: ~1 ms
    dispatch latency swamps sub-ms kernels. Always scan-amortize.

Usage: python tools/ablate_decode.py [--batch 512] [--ctx 1024]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--model", default="air")
    ap.add_argument("--kv-dtype", default="int8")
    ap.add_argument("--weights", default="int8", choices=["int8", "bfloat16"])
    args = ap.parse_args()

    cfg = config.BY_NAME[args.model].scaled(kv_dtype=args.kv_dtype,
                                            logits_dtype="bfloat16")
    B, CTX, S = args.batch, args.ctx, args.steps
    key = jax.random.PRNGKey(0)
    params = bb.init_params(cfg, key)
    if args.weights == "int8":
        params = bb.quantize_params(params)
    params = jax.device_put(params)
    layout = cfg.layout
    scfg = config.SamplingConfig(min_new_tokens=10**9)
    print(f"# {cfg.name} B={B} ctx={CTX} kv={cfg.kv_dtype} w={args.weights}")

    Lp = min(512, CTX)
    tokens = jnp.full((B, Lp), layout.speech_base + 7, jnp.int32)
    lens = jnp.full((B,), Lp, jnp.int32)
    state, _ = dec.prefill_init(cfg, scfg, layout.speech_gen_end, params,
                                tokens, lens, key)
    state, _ = dec.decode_segment(cfg, scfg, layout.speech_gen_end,
                                  CTX - Lp, params, state)

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    K, G = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads

    def make_steps(do_kv=True, do_attn=True, do_head=True):
        @functools.partial(jax.jit, donate_argnums=(1,))
        def run(params, cache, token0, key0):
            def step(carry, i):
                token, ck, cv, ks, vs, kp, vp, key = carry
                # wobble the write index a little so XLA can't fold it, but
                # keep attention length ~CTX
                cur_index = jnp.int32(CTX) + i % 8
                pad = jnp.zeros((B,), jnp.int32)
                positions = (cur_index - pad)[:, None]
                cos, sin = bb.rope_tables(cfg.head_dim, cfg.rope_theta,
                                          positions)
                lens = jnp.full((B,), cur_index + 1, jnp.int32)
                x = params["embed"].astype(jnp.dtype(cfg.dtype))[token[:, None]]

                def body(carry, lp_l):
                    x, ck, cv, ks, vs, kp, vp = carry
                    lp, l = lp_l
                    h = bb.rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
                    q, k, v = bb._qkv(cfg, lp, h, cos, sin)
                    kf = k[:, 0].reshape(B, -1)
                    vf = v[:, 0].reshape(B, -1)
                    if do_kv:
                        ck, cv, ks, vs, kp, vp = bb.write_kv_token(
                            ck, cv, ks, vs, kf, vf, l, cur_index, K,
                            int4=cfg.kv_dtype == "int4", quant=True,
                            k_prev=kp, v_prev=vp)
                    qg = q[:, 0].reshape(B, K, G, cfg.head_dim)
                    if do_attn:
                        attn = attn_ops.decode_attention_stacked(
                            qg, ck, cv, l, lens, pad, k_scale=ks, v_scale=vs)
                    else:
                        attn = (qg + kf.reshape(B, K, 1, cfg.head_dim)
                                + vf.reshape(B, K, 1, cfg.head_dim))
                    attn = attn.astype(x.dtype).reshape(B, 1, cfg.q_dim)
                    x = x + bb._mm(attn, lp["wo"]).astype(x.dtype)
                    x = bb._mlp(cfg, lp, x)
                    return (x, ck, cv, ks, vs, kp, vp), None

                layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
                (x, ck, cv, ks, vs, kp, vp), _ = lax.scan(
                    body, (x, ck, cv, ks, vs, kp, vp), (params["layers"], layer_ids))
                x = bb.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
                if do_head:
                    logits = bb._logits(cfg, params, x[:, 0, :], trim=False)
                    kstep, key = jax.random.split(key)
                    nxt = smp.sample_step(logits, kstep, scfg,
                                          layout.speech_gen_end,
                                          jnp.bool_(True),
                                          vocab_size=cfg.vocab_size)
                else:
                    nxt = (jnp.abs(x[:, 0, 0]).astype(jnp.int32) % 100
                           ) + layout.speech_base
                return (nxt, ck, cv, ks, vs, kp, vp, key), nxt[0]

            dummy = jnp.zeros((), jnp.float32)
            carry0 = (token0, cache.k, cache.v, cache.k_scale, cache.v_scale,
                      cache.k_prev if cache.int4 else dummy,
                      cache.v_prev if cache.int4 else dummy,
                      key0)
            carry, outs = lax.scan(step, carry0, jnp.arange(S))
            kw = ({"k_prev": carry[5], "v_prev": carry[6]}
                  if cache.int4 else {})
            return bb.KVCache(carry[1], carry[2], carry[3], carry[4], **kw), outs

        return run

    token0 = jnp.full((B,), layout.speech_base, jnp.int32)
    cache = state.cache
    times = {}
    for name, kw in [("full", {}), ("no-kv", {"do_kv": False}),
                     ("no-attn", {"do_attn": False}),
                     ("no-head", {"do_head": False})]:
        fn = make_steps(**kw)
        cache, outs = fn(params, cache, token0, key)
        sync(outs)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            cache, outs = fn(params, cache, token0, key)
        sync(outs)
        dt = (time.perf_counter() - t0) / iters / S
        times[name] = dt
        print(f"{name:10s} {dt*1e3:7.2f} ms/step ({B/dt:,.0f} tok/s)")
    full = times["full"]
    print(f"-> attention {1e3*(full-times['no-attn']):.2f} ms, "
          f"kv {1e3*(full-times['no-kv']):.2f} ms, "
          f"head+sample {1e3*(full-times['no-head']):.2f} ms")


if __name__ == "__main__":
    main()
