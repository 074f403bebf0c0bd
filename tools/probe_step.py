"""Ablation probe inside the decode step body (TPU).

Re-implements the decode_step layer loop with toggles to localize overhead:
  base     — full step (matches bb.decode_step, trivial sampling)
  nowrite  — skip the KV cache writes (attend over stale cache)
  noattn   — skip the Pallas attention call (use zeros)
  noquant  — skip quantize_kv (write zeros int8 + unit scales)
  nohead   — skip the LM-head matmul
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

from neutts_tpu.utils import enable_compile_cache as _ecc; _ecc()

from neutts_tpu import config
from neutts_tpu.models import backbone as bb
from neutts_tpu.ops import attention as attn_ops
from neutts_tpu.runtime import decode as dec

cfg = config.AIR.scaled(kv_dtype="int8")
B, Lp, S, CTX = 512, 512, 64, 1024
layout = cfg.layout


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def make_step(write=True, attn=True, quant=True, head=True):
    K, G = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads

    def decode_step(params, token, cache, cur_index, pad):
        positions = (cur_index - pad)[:, None]
        cos, sin = bb.rope_tables(cfg.head_dim, cfg.rope_theta, positions)
        lens = jnp.full((B,), cur_index + 1, jnp.int32)
        x = params["embed"].astype(jnp.dtype(cfg.dtype))[token[:, None]]

        def body(carry, lp_l):
            x, all_k, all_v, ks, vs = carry
            lp, l = lp_l
            h = bb.rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
            q, k, v = bb._qkv(cfg, lp, h, cos, sin)
            kf = k[:, 0].reshape(B, -1)
            vf = v[:, 0].reshape(B, -1)
            if quant:
                kq, ksc = bb.quantize_kv(kf)
                vq, vsc = bb.quantize_kv(vf)
            else:
                kq = jnp.zeros(kf.shape, jnp.int8)
                vq = kq
                ksc = jnp.ones((B,), jnp.float32)
                vsc = ksc
            if write:
                all_k = lax.dynamic_update_slice(all_k, kq[None, :, None, :], (l, 0, cur_index, 0))
                all_v = lax.dynamic_update_slice(all_v, vq[None, :, None, :], (l, 0, cur_index, 0))
                ks = lax.dynamic_update_slice(ks, ksc[None, :, None], (l, 0, cur_index))
                vs = lax.dynamic_update_slice(vs, vsc[None, :, None], (l, 0, cur_index))
            qg = q[:, 0].reshape(B, K, G, cfg.head_dim)
            if attn:
                a = attn_ops.decode_attention_stacked(
                    qg, all_k, all_v, l, lens, pad, k_scale=ks, v_scale=vs)
            else:
                a = jnp.zeros_like(qg) + (x[:, 0, :1, None, None] * 0).astype(qg.dtype)
            a = a.astype(x.dtype).reshape(B, 1, cfg.q_dim)
            x = x + jnp.dot(a, lp["wo"], preferred_element_type=jnp.float32).astype(x.dtype)
            x = bb._mlp(cfg, lp, x)
            return (x, all_k, all_v, ks, vs), None

        layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        (x, nk, nv, nks, nvs), _ = lax.scan(
            body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
            (params["layers"], layer_ids))
        x = bb.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if head:
            logits = bb._logits(cfg, params, x[:, 0, :], trim=False)
        else:
            logits = x[:, 0, :64]
        return logits, bb.KVCache(nk, nv, nks, nvs)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def steps(params, cache, token, pad):
        def body(carry, i):
            cache, token = carry
            logits, cache = decode_step(params, token, cache, jnp.int32(CTX) + i, pad)
            token = jnp.argmax(logits[:, :64], axis=-1).astype(jnp.int32) + layout.speech_base
            return (cache, token), logits[0, 0]
        (cache, token), outs = lax.scan(body, (cache, token), jnp.arange(S))
        return cache, token, outs

    return steps


def main():
    key = jax.random.PRNGKey(0)
    params = jax.device_put(bb.init_params(cfg, key))
    pad = jnp.zeros((B,), jnp.int32)

    for name, kw in [
        ("base", {}),
        ("nowrite", dict(write=False)),
        ("noattn", dict(attn=False)),
        ("noquant", dict(quant=False)),
        ("nohead", dict(head=False)),
    ]:
        steps = make_step(**kw)
        # fresh zero cache per variant (timing only: attention numerics over a
        # zero cache are finite and the traffic/shape behavior is identical)
        cache = bb.KVCache.create(cfg, B, max_len=cfg.max_context)
        token = jnp.full((B,), layout.speech_base + 7, jnp.int32)
        cache, token, outs = steps(params, cache, token, pad)
        sync(outs)
        t0 = time.perf_counter()
        for _ in range(3):
            cache, token, outs = steps(params, cache, token, pad)
        sync(outs)
        print(f"{name:8s} {(time.perf_counter()-t0)/3/S*1e3:6.2f} ms/step")
        del cache


if __name__ == "__main__":
    main()
