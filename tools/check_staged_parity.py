"""On-hardware staged==lockstep greedy parity check (repeatable).

Round-1 validated the segment-staged serving decode against the per-step
scatter path ad hoc (commit-message claim only); this tool makes it a
checked-in, repeatable gate on a Pallas-ELIGIBLE geometry (fused KV width
n_kv*head_dim = 128, the production shape class — the tiny CPU test configs
fall back to XLA and never touch the kernels).

Runs on whatever backend is active (the real TPU chip under axon; CPU with
--interpret uses Pallas interpret mode). Compares, over several segments:

  * greedy tokens emitted by `_decode_steps_staged` (staging writes + staged
    flash kernel + Pallas reconcile) vs `_decode_steps_scatter`;
  * slot lens/active flags;
  * the DEQUANTIZED reconciled KV cache contents.

Exit code 0 on parity; prints a one-line verdict for logs.

Usage: python tools/check_staged_parity.py [--batch 64] [--segments 4]
       [--interpret] [--steps 16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--steps", type=int, default=16, help="steps per segment")
    ap.add_argument("--prompt-bucket", type=int, default=128)
    ap.add_argument("--interpret", action="store_true",
                    help="force CPU + Pallas interpret mode (no TPU needed)")
    ap.add_argument("--json-out", default=None,
                    help="write the verdict JSON to this file")
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from neutts_tpu import config
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.ops import attention as attn
    from neutts_tpu.runtime import batching

    # Pallas-eligible small config: n_kv * head_dim = 2 * 64 = 128
    cfg = config.TINY.scaled(
        n_heads=4, n_kv_heads=2, head_dim=64, hidden_size=128,
        kv_dtype="int8", max_context=512,
    )
    eos = cfg.layout.speech_gen_end
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=4)
    params = bb.init_params(cfg, jax.random.PRNGKey(0))

    if args.interpret:
        # interpret-mode Pallas for the STAGED path only; prefill and the
        # scatter oracle take their XLA CPU routes (use_pallas_attention is
        # False on CPU, and _decode_steps_staged is invoked directly below)
        attn.decode_attention_staged = functools.partial(
            attn.decode_attention_staged, interpret=True, row_block=4)
        attn.reconcile_segment = functools.partial(
            attn.reconcile_segment, interpret=True, row_block=4)

    pallas_ok = bb.use_pallas_attention(cfg)
    print(f"# backend={jax.devices()[0].platform} pallas_eligible={pallas_ok}")
    if not pallas_ok and not args.interpret:
        print("STAGED_PARITY SKIP: no TPU backend (use --interpret)")
        return

    B, Lp, S = args.batch, args.prompt_bucket, args.steps
    assert S % batching.SEGMENT_ALIGN == 0
    rng = np.random.default_rng(0)
    toks = np.zeros((B, Lp), np.int32)
    lens = np.zeros((B,), np.int32)
    for j in range(B):
        n = int(rng.integers(5, Lp))
        toks[j, Lp - n:] = rng.integers(0, 300, size=n)
        lens[j] = n
    slots = np.arange(B, dtype=np.int32)

    def admit():
        state = batching.SlotState.create(cfg, B, jax.random.PRNGKey(3))
        return batching.prefill_slots(
            cfg, scfg, eos, params, state,
            jnp.asarray(toks), jnp.asarray(lens), jnp.asarray(slots),
        )

    # On REAL hardware the staged and scatter paths run two DIFFERENT Pallas
    # kernels whose f32 accumulation orders differ; on a random-weight model
    # greedy argmax near-ties flip between them (measured: scattered late
    # first-flips, ~0.7%/row/step — the tie-flip signature), so bit-equality
    # is the wrong hardware gate (interpret mode / the CPU test suite DOES
    # pin bit-equality, where both paths share XLA numerics). The hardware
    # gate instead checks what a placement/bookkeeping bug would break:
    #   * every row agrees token-for-token until its first (tie) flip,
    #     and the flip rate over compared prefixes is small;
    #   * no row diverges immediately (step 0 flips on many rows would mean
    #     systematic divergence, not ties);
    #   * lens/active bookkeeping matches on never-flipped rows;
    #   * the reconciled caches of never-flipped rows match to int8
    #     quantization noise (a staging/reconcile placement bug scrambles
    #     whole vectors -> O(1) deltas).
    sA, sB = admit(), admit()
    outsA, outsB = [], []
    for seg in range(args.segments):
        sA, outA = batching._decode_steps_staged(cfg, scfg, eos, S, params, sA)
        sB, outB = batching._decode_steps_scatter(cfg, scfg, eos, S, params, sB)
        outsA.append(np.asarray(outA))
        outsB.append(np.asarray(outB))
    A = np.concatenate(outsA, axis=1)
    Bo = np.concatenate(outsB, axis=1)
    n_steps = A.shape[1]
    first_flip = np.full((B,), -1, np.int64)
    for r in range(B):
        d = np.flatnonzero(A[r] != Bo[r])
        if d.size:
            first_flip[r] = d[0]
    clean = first_flip < 0
    compared = int(np.where(clean, n_steps, np.maximum(first_flip, 0)).sum())
    flips = int((~clean).sum())
    early = int((first_flip == 0).sum())
    flip_rate = flips / max(compared, 1)

    # FLIP VERIFICATION (ADVICE r3, tightened beyond the flat rate
    # threshold). Re-scoring a flip's logit margin through an independent
    # forward is numerically meaningless here: the decode paths read the
    # int8-QUANTIZED cache while any replay prefill attends unquantized
    # bf16 K/V, and on a random-weight model that drift dwarfs real tie
    # gaps (measured ~0.13 vs ~3e-3). What cleanly separates a numeric
    # tie-flip from a placement/bookkeeping bug instead:
    #   (a) DETERMINISM — both kernels are deterministic programs, so the
    #       full flip pattern must REPRODUCE exactly on a repeat run; a
    #       DMA-race or placement bug varies run to run;
    #   (b) PRE-FLIP CACHE CLEANLINESS — up to its first flip, a flipped
    #       row consumed identical tokens, so its reconciled cache prefix
    #       must match between paths to int8 quantization noise; a
    #       placement bug corrupts the cache BEFORE the tokens diverge.
    sA2, sB2 = admit(), admit()
    outsA2, outsB2 = [], []
    for seg in range(args.segments):
        sA2, oA2 = batching._decode_steps_staged(cfg, scfg, eos, S, params, sA2)
        sB2, oB2 = batching._decode_steps_scatter(cfg, scfg, eos, S, params, sB2)
        outsA2.append(np.asarray(oA2))
        outsB2.append(np.asarray(oB2))
    A2 = np.concatenate(outsA2, axis=1)
    B2 = np.concatenate(outsB2, axis=1)
    deterministic = bool((A == A2).all() and (Bo == B2).all())

    preflip_worst = 0.0
    for r in np.flatnonzero(~clean):
        t = int(first_flip[r])
        n = Lp + t  # cache prefix settled before the diverging token
        for cache, scale in (("k", "k_scale"), ("v", "v_scale")):
            da = np.asarray(getattr(sA.cache, cache)[:, r, :n], np.float32) \
                * np.asarray(getattr(sA.cache, scale)[:, r, :n])[..., None]
            db = np.asarray(getattr(sB.cache, cache)[:, r, :n], np.float32) \
                * np.asarray(getattr(sB.cache, scale)[:, r, :n])[..., None]
            preflip_worst = max(preflip_worst, float(np.abs(da - db).max()))

    lens_np = np.asarray(sA.lens)
    lensB = np.asarray(sB.lens)
    worst = 0.0
    for b_i in range(B):
        if not clean[b_i]:
            continue
        if lens_np[b_i] != lensB[b_i]:
            print(f"STAGED_PARITY FAIL: lens mismatch on clean row {b_i}")
            sys.exit(1)
        n = int(lens_np[b_i])
        for cache, scale in (("k", "k_scale"), ("v", "v_scale")):
            da = np.asarray(getattr(sA.cache, cache)[:, b_i, :n], np.float32) \
                * np.asarray(getattr(sA.cache, scale)[:, b_i, :n])[..., None]
            db = np.asarray(getattr(sB.cache, cache)[:, b_i, :n], np.float32) \
                * np.asarray(getattr(sB.cache, scale)[:, b_i, :n])[..., None]
            worst = max(worst, float(np.abs(da - db).max()))

    verdict = {
        "metric": "staged_vs_scatter_parity",
        "backend": jax.devices()[0].platform,
        "batch": B, "segments": args.segments, "steps_per_segment": S,
        "rows_clean": int(clean.sum()), "rows_tie_flipped": flips,
        "step0_flips": early,
        "compared_prefix_tokens": compared,
        "tie_flip_rate": round(flip_rate, 5),
        "flips_deterministic_across_repeat": deterministic,
        "preflip_cache_max_dequant_delta": round(preflip_worst, 5),
        "clean_row_cache_max_dequant_delta": round(worst, 5),
    }
    import json

    ok = (early <= max(1, B // 32)) and flip_rate < 0.05 and worst <= 0.15 \
        and int(clean.sum()) >= 1 and deterministic and preflip_worst <= 0.15
    verdict["ok"] = bool(ok)
    print(json.dumps(verdict))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(verdict, f, indent=1)
    if not ok:
        print("STAGED_PARITY FAIL (see verdict line)")
        sys.exit(1)
    print(
        f"STAGED_PARITY OK: {int(clean.sum())}/{B} rows token-exact over "
        f"{n_steps} steps; {flips} tie-flipped rows (rate {flip_rate:.3%}, "
        f"{early} at step 0); clean-row cache max dequant delta {worst:.4f}"
    )


if __name__ == "__main__":
    main()
