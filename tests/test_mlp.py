"""Fused int8 SwiGLU MLP kernel (ops/mlp.py): parity vs oracles + gating.

The kernel runs in interpret mode here (CPU test mesh); on-chip timing and
parity live in tools/probe_gemm.py. The oracle chain is:
  kernel (interpret) == fused_mlp_xla (same semantics, XLA ops)
  fused_mlp_xla      ~= backbone XLA _mlp path (same quantization design,
                        different only in silu rounding / dot order)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutts_tpu.models import backbone as bb
from neutts_tpu.ops import mlp as mlp_ops


def _weights(rng, d, f):
    wg = jnp.asarray(rng.normal(size=(d, f)) * d**-0.5, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(d, f)) * d**-0.5, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(f, d)) * f**-0.5, jnp.float32)
    qg = bb.quantize_weight(wg)
    qu = bb.quantize_weight(wu)
    qd = bb.quantize_weight(wd)
    nw = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    return nw, qg, qu, qd


@pytest.mark.parametrize("m,d,f", [(256, 128, 256), (128, 256, 384)])
def test_kernel_matches_xla_oracle(m, d, f):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, d)) * 0.5, jnp.bfloat16)
    nw, qg, qu, qd = _weights(rng, d, f)
    y_kern = mlp_ops.fused_mlp(
        x, nw, qg["q"], qg["s"], qu["q"], qu["s"], qd["q"], qd["s"],
        interpret=True,
    )
    y_ref = mlp_ops.fused_mlp_xla(
        x, nw, qg["q"], qg["s"], qu["q"], qu["s"], qd["q"], qd["s"]
    )
    a = y_kern.astype(jnp.float32)
    b = y_ref.astype(jnp.float32)
    # interpret-mode reciprocal is exact; only bf16 store rounding differs
    assert float(jnp.max(jnp.abs(a - b))) <= 2e-2 * float(jnp.max(jnp.abs(b)))


def test_oracle_matches_backbone_mlp_path():
    """fused_mlp_xla == the backbone XLA quantized-_mm MLP up to silu
    evaluation-order noise (the quantization semantics are identical:
    per-token activation scales, per-out-channel weight scales)."""
    rng = np.random.default_rng(1)
    d, f, m = 128, 256, 64
    x = jnp.asarray(rng.normal(size=(1, m, d)) * 0.5, jnp.bfloat16)
    nw, qg, qu, qd = _weights(rng, d, f)
    lp = {
        "mlp_norm": nw,
        "w_gate": qg,
        "w_up": qu,
        "w_down": qd,
    }
    from neutts_tpu.config import TINY

    cfg = TINY  # only rms_norm_eps is read by _mlp
    y_bb = bb._mlp(cfg, lp, x)[0]
    y_or = mlp_ops.fused_mlp_xla(
        x[0], nw, qg["q"], qg["s"], qu["q"], qu["s"], qd["q"], qd["s"],
        eps=cfg.rms_norm_eps,
    )
    a = y_bb.astype(jnp.float32)
    b = y_or.astype(jnp.float32)
    err = float(jnp.max(jnp.abs(a - b)))
    assert err <= 3e-2 * float(jnp.max(jnp.abs(b))), err


def test_chunked_oracle_close_to_single_chunk():
    """Chunked ff scales (VMEM fallback mode) stay within int8-noise of the
    single-chunk (XLA-parity) semantics."""
    rng = np.random.default_rng(2)
    d, f, m = 128, 512, 64
    x = jnp.asarray(rng.normal(size=(m, d)) * 0.5, jnp.bfloat16)
    nw, qg, qu, qd = _weights(rng, d, f)
    args = (x, nw, qg["q"], qg["s"], qu["q"], qu["s"], qd["q"], qd["s"])
    y1 = mlp_ops.fused_mlp_xla(*args, n_chunks=1).astype(jnp.float32)
    y2 = mlp_ops.fused_mlp_xla(*args, n_chunks=2).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(y1 - y2))) <= 3e-2 * float(jnp.max(jnp.abs(y1)))


def test_gating():
    # CPU: always off
    assert not mlp_ops.use_fused_mlp(896, 4864, 131072)
    # geometry helpers are platform-independent
    assert mlp_ops._pick_bm(131072) == 256
    assert mlp_ops._pick_bm(8192) == 256
    assert mlp_ops._pick_bm(448) == 64
    assert mlp_ops._pick_bm(100) == 0
    # Air geometry fits a single chunk under the VMEM gate
    assert mlp_ops._pick_chunks(256, 896, 4864) == 1
    # big-F-small-D geometry needs the chunked mode
    assert mlp_ops._pick_chunks(256, 128, 20480) == 2
    # absurd F (weights alone blow VMEM) falls back to the XLA path
    assert mlp_ops._pick_chunks(256, 896, 4864 * 8) == 0


def test_interpret_kernel_chunked():
    """Chunked kernel path (n_chunks forced >1) matches the chunked oracle."""
    rng = np.random.default_rng(3)
    d, f, m = 128, 512, 64
    x = jnp.asarray(rng.normal(size=(m, d)) * 0.5, jnp.bfloat16)
    nw, qg, qu, qd = _weights(rng, d, f)
    orig = mlp_ops._pick_chunks
    mlp_ops._pick_chunks = lambda *a: 2
    try:
        y_kern = mlp_ops.fused_mlp(
            x, nw, qg["q"], qg["s"], qu["q"], qu["s"], qd["q"], qd["s"],
            interpret=True,
        )
    finally:
        mlp_ops._pick_chunks = orig
    y_ref = mlp_ops.fused_mlp_xla(
        x, nw, qg["q"], qg["s"], qu["q"], qu["s"], qd["q"], qd["s"],
        n_chunks=2,
    )
    a = y_kern.astype(jnp.float32)
    b = y_ref.astype(jnp.float32)
    assert float(jnp.max(jnp.abs(a - b))) <= 2e-2 * float(jnp.max(jnp.abs(b)))


def test_fused_qkv_matches_oracle_and_xla_path():
    """fused_qkv (interpret) == its XLA oracle, and the oracle matches the
    separate rms_norm + _mm(wq/wk/wv) + bias chain to quantization-noise
    tolerance (identical scale semantics, fused dot)."""
    rng = np.random.default_rng(4)
    d, q, kv, m = 128, 128, 64, 64
    x = jnp.asarray(rng.normal(size=(m, d)) * 0.5, jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(d, w)) * d**-0.5, jnp.float32)
          for w in (q, kv, kv)]
    bs = [jnp.asarray(rng.normal(size=(w,)) * 0.05, jnp.float32)
          for w in (q, kv, kv)]
    qs = [bb.quantize_weight(w) for w in ws]
    wq = jnp.concatenate([z["q"] for z in qs], axis=-1)
    sq = jnp.concatenate([z["s"] for z in qs], axis=-1)
    bq = jnp.concatenate(bs, axis=-1)
    y_kern = mlp_ops.fused_qkv(x, nw, wq, sq, bq, interpret=True)
    y_or = mlp_ops.fused_qkv_xla(x, nw, wq, sq, bq)
    a, b = y_kern.astype(jnp.float32), y_or.astype(jnp.float32)
    assert float(jnp.max(jnp.abs(a - b))) <= 2e-2 * float(jnp.max(jnp.abs(b)))
    # vs the separate-projection chain
    h = bb.rms_norm(x, nw, 1e-6)
    parts = [bb._mm(h, z).astype(jnp.float32) + c for z, c in zip(qs, bs)]
    ref = jnp.concatenate(parts, axis=-1)
    assert float(jnp.max(jnp.abs(b - ref))) <= 3e-2 * float(jnp.max(jnp.abs(ref)))


def test_block_fresh_fused_qkv_path_matches_unfused():
    """Force the fused-QKV gate on (interpret kernels) through a real
    quantized _block_fresh prefill: tokens from both paths must match to
    quantization-noise tolerance on the outputs and k/v."""
    import functools

    from neutts_tpu import config

    cfg = config.TINY
    params = bb.quantize_params(
        bb.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32))
    lp = jax.tree_util.tree_map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(5)
    B, S = 4, 16
    x = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)) * 0.5, jnp.float32)
    idx = jnp.arange(S)
    positions = jnp.broadcast_to(idx[None, :], (B, S))
    cos, sin = bb.rope_tables(cfg.head_dim, cfg.rope_theta, positions)
    mask = (idx[None, None, :] <= idx[None, :, None]) & jnp.ones(
        (B, S, S), bool)

    y_ref, k_ref, v_ref = bb._block_fresh(cfg, lp, x, cos, sin, mask)

    orig_gate, orig_kern = mlp_ops.use_fused_qkv, mlp_ops.fused_qkv
    mlp_ops.use_fused_qkv = lambda d, qkv, m: True
    mlp_ops.fused_qkv = functools.partial(orig_kern, interpret=True)
    try:
        y_f, k_f, v_f = bb._block_fresh(cfg, lp, x, cos, sin, mask)
    finally:
        mlp_ops.use_fused_qkv = orig_gate
        mlp_ops.fused_qkv = orig_kern
    for a, b in ((y_f, y_ref), (k_f, k_ref), (v_f, v_ref)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.max(np.abs(a - b)) <= 3e-2 * max(np.max(np.abs(b)), 1e-3)
