"""On-chip probe: fused int8 MLP kernel (ops/mlp.py) vs the XLA _mm path.

Timing methodology (IMPORTANT): this environment's tunneled TPU dedupes
repeated identical dispatches, and `block_until_ready` can return before
execution completes — naive wall-timing loops report absurd rates (we
measured a "28,000 Tops/s" bf16 8192^3 matmul that way). Every measurement
here therefore CHAINS iterations through real data (x_{i+1} = f(x_i)) and
syncs with a `jax.device_get` readback, the same pattern as
tools/probe_prefill.py. A known-cost bf16 8192^3 matmul calibrates the
harness first; if it reports > 197 Tops (the v5e bf16 peak) the run aborts.

Writes GEMM_PROBE_r05.json when --json is passed.

Usage: python tools/probe_gemm.py [--model air] [--m 131072] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="air")
    ap.add_argument("--m", type=int, default=32768,
                    help="token rows per call (group equivalent scales to "
                    "131072 = [256, 512])")
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--json", default=None)
    ap.add_argument("--decode", action="store_true",
                    help="A/B one full decode step at B=512 instead (set "
                    "NEUTTS_FUSED_MLP_MIN_M=512 in a second run to compare)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from neutts_tpu.utils import enable_compile_cache as _ecc; _ecc()
    from neutts_tpu import config
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.ops import mlp as mlp_ops

    if args.decode:
        import functools

        cfg = config.BY_NAME[args.model].scaled(
            kv_dtype="int8", logits_dtype="bfloat16")
        params = jax.device_put(
            bb.quantize_params(bb.init_params(cfg, jax.random.PRNGKey(0))))
        params = bb.add_speech_head(cfg, params)
        B = 512
        cache = bb.KVCache.create(cfg, B, max_len=2048)
        pad = jnp.zeros((B,), jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(tok, cache, idx):
            logits, cache = bb.decode_step(
                cfg, params, tok, cache, idx, pad, speech_head=True)
            nxt = jnp.argmax(
                logits[:, :100].astype(jnp.float32), axis=-1
            ).astype(jnp.int32) + cfg.layout.speech_base
            return nxt, cache

        tok = jnp.full((B,), cfg.layout.speech_base, jnp.int32)
        idx0 = 1024
        for i in range(3):
            tok, cache = step(tok, cache, jnp.int32(idx0 + i))
        _ = jax.device_get(tok[:2])
        n = 48
        t0 = time.perf_counter()
        for i in range(n):
            tok, cache = step(tok, cache, jnp.int32(idx0 + 3 + i))
        _ = jax.device_get(tok[:2])
        dt = (time.perf_counter() - t0) / n
        mode = ("fused" if mlp_ops.use_fused_mlp(
            cfg.hidden_size, cfg.intermediate_size, B) else "xla")
        print(f"decode step B={B} ctx~{idx0} mlp={mode}: "
              f"{dt*1e3:.2f} ms -> {B/dt:,.0f} tok/s")
        return

    cfg = config.BY_NAME[args.model]
    D, F = cfg.hidden_size, cfg.intermediate_size
    M = args.m
    rng = np.random.default_rng(0)

    # --- calibration: known-cost matmul through the chained harness --------
    A = jnp.asarray(rng.normal(size=(8192, 8192)) * 0.01, jnp.bfloat16)
    mm = jax.jit(lambda a: (a @ a) * jnp.bfloat16(1e-3))
    _ = jax.device_get(mm(A)[0, :2])
    for _rep in range(2):
        t0 = time.perf_counter()
        X = A
        for _ in range(10):
            X = mm(X)
        _ = jax.device_get(X[0, :2])
        calib_dt = (time.perf_counter() - t0) / 10
    calib_tops = 2 * 8192**3 / calib_dt / 1e12
    print(f"calib bf16 8192^3: {calib_dt*1e3:.2f} ms = {calib_tops:.1f} Tops/s "
          f"(bf16 peak 197)")
    if calib_tops > 197:
        print("ABORT: harness reports above-peak rates; timing is not trustworthy")
        sys.exit(1)

    # --- operands ----------------------------------------------------------
    def qw(shape, scale):
        w = jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)
        return bb.quantize_weight(w)

    x0 = jnp.asarray(rng.normal(size=(M, D)) * 0.5, jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32)
    qg, qu = qw((D, F), D**-0.5), qw((D, F), D**-0.5)
    qd = qw((F, D), F**-0.5)
    lp = {"mlp_norm": nw, "w_gate": qg, "w_up": qu, "w_down": qd}

    fused = jax.jit(lambda x: mlp_ops.fused_mlp(
        x, nw, qg["q"], qg["s"], qu["q"], qu["s"], qd["q"], qd["s"],
        eps=cfg.rms_norm_eps))

    # the XLA path, called via the un-gated internals directly
    def xla_mlp_forced(x):
        h = bb.rms_norm(x, nw, cfg.rms_norm_eps)
        gate = bb._mm(h, qg)
        up = bb._mm(h, qu)
        ff = (jax.nn.silu(gate) * up).astype(x.dtype)
        return x + bb._mm(ff, qd).astype(x.dtype)

    xla = jax.jit(xla_mlp_forced)

    results = {}
    ops = 2 * M * D * F * 3
    for name, fn in (("fused_pallas", fused), ("xla_w8a8", xla)):
        try:
            _ = jax.device_get(fn(x0)[0, :2])
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            results[name] = None
            continue
        n = args.layers
        for _rep in range(2):
            t0 = time.perf_counter()
            x = x0
            for _ in range(n):
                x = fn(x)
            _ = jax.device_get(x[0, :2])
            dt = (time.perf_counter() - t0) / n
        tops = ops / dt / 1e12
        group_ms = dt * (131072 / M) * 24 * 1e3
        print(f"{name:13s} {dt*1e3:8.2f} ms/layer-call at M={M} "
              f"({tops:6.1f} Tops/s = {tops/394*100:4.1f}% of int8 peak; "
              f"~{group_ms:6.0f} ms per [256,512] 24-layer group)")
        results[name] = {
            "ms_per_layer_call": round(dt * 1e3, 3),
            "tops": round(tops, 1),
            "pct_int8_peak": round(tops / 394 * 100, 1),
            "group24_ms_at_131072": round(group_ms, 1),
        }

    # numeric parity on-chip (approx-reciprocal sigmoid + dot order only)
    yf = jax.device_get(fused(x0)).astype(np.float32)
    yx = jax.device_get(xla(x0)).astype(np.float32)
    rel = float(np.max(np.abs(yf - yx)) / np.max(np.abs(yx)))
    print(f"fused vs xla max rel diff: {rel:.5f}")

    if args.json:
        payload = {
            "metric": "fused_mlp_probe",
            "model": args.model,
            "m": M,
            "calib_bf16_8192_tops": round(calib_tops, 1),
            "results": results,
            "max_rel_diff_vs_xla": round(rel, 6),
            "method": "chained x=f(x) timing + device_get sync "
                      "(unchained timings are invalid on this backend)",
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
