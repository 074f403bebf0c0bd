"""Ablation probe for the serving prefill (grouped admission forward).

profile_serving.py showed admission prefill is ~44% of serving wall time
(3.9 s of 8.9 s at 512 slots / 1024 requests) at ~117k prompt-tok/s — far
below what an int8 360M model should sustain on v5e. This tool times
`prefill_slots` with components knocked out to locate the cost:

  full      the real thing
  noattn    attention output replaced by v (skips QK^T, softmax, PV)
  writeonly JUST the per-layer K/V quantize + slot-cache scatters (isolates
            the cache-write cost; shapes identical to the real prefill)
  nomlp     MLP replaced by identity
  nologits  final-norm + LM head skipped (tiny: last position only)

Each mode runs in its own process invocation (jit caches key on the traced
callables; run `python tools/probe_prefill.py all` to fan out serially).

Usage: python tools/probe_prefill.py [mode|all] [--group 64] [--bucket 512]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODES = ("full", "noattn", "writeonly", "nomlp", "nologits", "noqkv", "nowo")


def run_mode(args) -> None:
    import jax
    import jax.numpy as jnp

    from neutts_tpu.utils import enable_compile_cache as _ecc; _ecc()

    from neutts_tpu import config
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.runtime import batching

    mode = args.mode
    if mode == "noattn":
        orig = bb._attend_block

        def no_attn(q, k, v, mask, valid=None, pads=None):
            B, S, H, Dh = q.shape
            K = k.shape[2]
            return jnp.broadcast_to(
                v[:, :, :, None, :], (B, S, K, H // K, Dh)
            ).reshape(B, S, H, Dh)

        bb._attend_block = no_attn
    elif mode == "nomlp":
        bb._mlp = lambda cfg, lp, x: x
    elif mode == "noqkv":
        orig_qkv = bb._qkv

        def no_qkv(cfg, lp, h, cos, sin):
            B, S, _ = h.shape
            q = jnp.zeros((B, S, cfg.n_heads, cfg.head_dim), h.dtype) + h[..., :1, None]
            k = jnp.zeros((B, S, cfg.n_kv_heads, cfg.head_dim), h.dtype) + h[..., :1, None]
            v = k
            return q, k, v

        bb._qkv = no_qkv
    elif mode == "nowo":
        orig_block = bb._block_fresh

        def no_wo(cfg, lp, x, cos, sin, mask, valid=None, pads=None):
            h = bb.rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
            q, k, v = bb._qkv(cfg, lp, h, cos, sin)
            attn = bb._attend_block(q, k, v, mask, valid=valid, pads=pads)
            x = x + attn.reshape(x.shape[0], x.shape[1], cfg.q_dim).astype(x.dtype)
            return bb._mlp(cfg, lp, x), k, v

        bb._block_fresh = no_wo
    elif mode == "nologits":
        orig_logits = bb._logits

        def tiny_logits(cfg, params, x, trim=True):
            import jax.numpy as jnp
            v = orig_logits(cfg, params, x[:1], trim=trim)  # keep out shape rank
            return jnp.broadcast_to(v[:1], (x.shape[0], v.shape[1]))

        bb._logits = tiny_logits

    cfg = config.BY_NAME[args.model].scaled(
        kv_dtype="int8", logits_dtype="bfloat16"
    )
    params = jax.device_put(
        bb.quantize_params(bb.init_params(cfg, jax.random.PRNGKey(0)))
    )
    scfg = config.SamplingConfig(min_new_tokens=4)
    state = batching.SlotState.create(cfg, args.slots, jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    G, Lp = args.group, args.bucket
    toks = jnp.asarray(
        rng.integers(0, 1000, size=(G, Lp)) + cfg.layout.speech_base,
        jnp.int32,
    )
    lens = jnp.asarray(rng.integers(max(Lp - 131, 1), Lp, size=(G,)), jnp.int32)
    slots = jnp.arange(G, dtype=jnp.int32)

    if mode == "writeonly":
        from jax import lax
        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def once(state):
            kf = jnp.ones((G, Lp, cfg.kv_dim), jnp.float32)

            def body(carry, l):
                all_k, all_v, ks, vs = carry
                kq, ksc = bb.quantize_kv(kf * (1.0 + l))
                vq, vsc = bb.quantize_kv(kf * (2.0 + l))
                all_k = all_k.at[l, slots, :Lp, :].set(kq)
                all_v = all_v.at[l, slots, :Lp, :].set(vq)
                ks = ks.at[l, slots, :Lp].set(ksc)
                vs = vs.at[l, slots, :Lp].set(vsc)
                return (all_k, all_v, ks, vs), None

            (k, v, ks, vs), _ = lax.scan(
                body,
                (state.cache.k, state.cache.v,
                 state.cache.k_scale, state.cache.v_scale),
                jnp.arange(cfg.n_layers, dtype=jnp.int32),
            )
            return state._replace(cache=bb.KVCache(k, v, ks, vs))
    else:
        def once(state):
            return batching.prefill_slots(
                cfg, scfg, cfg.layout.speech_gen_end, params, state,
                toks, lens, slots,
            )

    state = once(state)  # compile
    _ = jax.device_get(state.lens)  # force a real readback through the tunnel
    n, t0 = 8, time.perf_counter()
    for _ in range(n):
        state = once(state)
    _ = jax.device_get(state.lens)
    dt = (time.perf_counter() - t0) / n
    print(
        f"{mode:9s} {dt*1e3:8.1f} ms/group  "
        f"({G * Lp / dt / 1e3:8.1f}k tok/s at [{G}, {Lp}])"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="all", choices=MODES + ("all",))
    ap.add_argument("--model", default="air")
    ap.add_argument("--group", type=int, default=64)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--slots", type=int, default=512)
    args = ap.parse_args()

    if args.mode == "all":
        for m in MODES:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), m,
                 "--model", args.model, "--group", str(args.group),
                 "--bucket", str(args.bucket), "--slots", str(args.slots)],
                check=True,
            )
        return
    run_mode(args)


if __name__ == "__main__":
    main()
