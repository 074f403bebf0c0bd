"""Converter tests: synthetic HF + GGUF checkpoints round-trip into working
pytrees whose forward pass matches the source weights."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutts_tpu import config
from neutts_tpu.models import backbone as bb
from neutts_tpu.models import convert

from synthetic_ckpt import write_hf_dir

CFG = config.TINY


def _synthetic_hf_dir(tmp_path, cfg, seed=0):
    """Write a tiny Qwen2-style safetensors checkpoint (shared helper)."""
    return write_hf_dir(tmp_path, cfg, seed=seed)


def test_hf_roundtrip(tmp_path):
    t = _synthetic_hf_dir(tmp_path, CFG)
    cfg, params = convert.from_hf(tmp_path, dtype="float32")
    assert cfg.hidden_size == CFG.hidden_size
    assert cfg.n_layers == CFG.n_layers
    # spot-check the transpose convention: wq[l] == q_proj.weight.T
    np.testing.assert_allclose(
        np.asarray(params["layers"]["wq"][1]),
        t["model.layers.1.self_attn.q_proj.weight"].T,
        rtol=1e-6,
    )
    # converted model runs
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    cache = bb.KVCache.create(cfg, 1, dtype=jnp.float32)
    logits, _ = bb.prefill(cfg, params, toks, jnp.asarray([3], jnp.int32), cache)
    assert np.isfinite(np.asarray(logits[:, : cfg.vocab_size])).all()


def test_hf_forward_matches_torch(tmp_path):
    """Oracle: our forward on converted weights == HF transformers forward."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    _synthetic_hf_dir(tmp_path, CFG)
    cfg, params = convert.from_hf(tmp_path, dtype="float32")

    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(
        "qwen2",
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads,
        intermediate_size=cfg.intermediate_size,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=True,
        attention_bias=True,
    )
    if hasattr(hf_cfg, "head_dim"):
        hf_cfg.head_dim = cfg.head_dim
    model = AutoModelForCausalLM.from_config(hf_cfg)
    from safetensors.torch import load_file

    state = load_file(str(tmp_path / "model.safetensors"))
    missing, unexpected = model.load_state_dict(state, strict=False)
    assert not unexpected, unexpected
    model.eval()

    ids = [5, 9, 2, 7, 1]
    with torch.no_grad():
        want = model(torch.tensor([ids])).logits[0].numpy()  # [S, V]

    toks = jnp.asarray([ids], jnp.int32)
    attn = jnp.ones((1, len(ids)), bool)
    got = np.asarray(bb.forward_train(cfg, params, toks, attn)[0])[:, : cfg.vocab_size]
    # f32 drift between torch SDPA and the JAX stack is ~3e-3 max / 6e-4 mean
    # on random weights; greedy argmax (the token-level parity gate) is robust
    # to this.
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_gguf_roundtrip(tmp_path):
    """write_gguf -> read_gguf -> from_gguf reproduces a runnable model."""
    rng = np.random.default_rng(0)
    cfg = CFG
    D, L, F = cfg.hidden_size, cfg.n_layers, cfg.intermediate_size
    Q, KV, V = cfg.q_dim, cfg.kv_dim, cfg.vocab_size

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    tensors = {"token_embd.weight": w(V, D), "output_norm.weight": np.ones(D, np.float32)}
    for i in range(L):
        tensors[f"blk.{i}.attn_norm.weight"] = np.ones(D, np.float32)
        tensors[f"blk.{i}.ffn_norm.weight"] = np.ones(D, np.float32)
        tensors[f"blk.{i}.attn_q.weight"] = w(Q, D)
        tensors[f"blk.{i}.attn_q.bias"] = w(Q)
        tensors[f"blk.{i}.attn_k.weight"] = w(KV, D)
        tensors[f"blk.{i}.attn_k.bias"] = w(KV)
        tensors[f"blk.{i}.attn_v.weight"] = w(KV, D)
        tensors[f"blk.{i}.attn_v.bias"] = w(KV)
        tensors[f"blk.{i}.attn_output.weight"] = w(D, Q)
        tensors[f"blk.{i}.ffn_gate.weight"] = w(F, D)
        tensors[f"blk.{i}.ffn_up.weight"] = w(F, D)
        tensors[f"blk.{i}.ffn_down.weight"] = w(D, F)
    meta = {
        "general.architecture": "qwen2",
        "general.alignment": 32,
        "qwen2.embedding_length": D,
        "qwen2.block_count": L,
        "qwen2.attention.head_count": cfg.n_heads,
        "qwen2.attention.head_count_kv": cfg.n_kv_heads,
        "qwen2.attention.key_length": cfg.head_dim,
        "qwen2.feed_forward_length": F,
        "qwen2.rope.freq_base": float(cfg.rope_theta),
        "qwen2.attention.layer_norm_rms_epsilon": float(cfg.rms_norm_eps),
        "qwen2.vocab_size": V,
    }
    path = tmp_path / "model.gguf"
    convert.write_gguf(path, meta, tensors)

    meta2, t2 = convert.read_gguf(path)
    assert meta2["qwen2.block_count"] == L
    np.testing.assert_allclose(t2["token_embd.weight"], tensors["token_embd.weight"])
    np.testing.assert_allclose(t2["blk.0.attn_q.weight"], tensors["blk.0.attn_q.weight"])

    cfg2, params = convert.from_gguf(path, dtype="float32")
    assert cfg2.hidden_size == D and cfg2.tie_embeddings
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    cache = bb.KVCache.create(cfg2, 1, dtype=jnp.float32)
    logits, _ = bb.prefill(cfg2, params, toks, jnp.asarray([3], jnp.int32), cache)
    assert np.isfinite(np.asarray(logits[:, : cfg2.vocab_size])).all()


def test_gguf_quant_dequant():
    """Q8_0 and Q4_0 dequantization against hand-built blocks."""
    # Q8_0: scale f16 + 32 int8
    scale = np.float16(0.5)
    qs = np.arange(-16, 16, dtype=np.int8)
    raw = np.frombuffer(scale.tobytes() + qs.tobytes(), np.uint8)
    out = convert._dequant_q8_0(raw, 32)
    np.testing.assert_allclose(out, qs.astype(np.float32) * 0.5)

    # Q4_0: scale f16 + 16 bytes of nibbles; value = (nibble - 8) * scale
    scale = np.float16(2.0)
    nibbles = np.arange(16, dtype=np.uint8)
    packed = (nibbles | (nibbles[::-1] << 4)).astype(np.uint8)
    raw = np.frombuffer(scale.tobytes() + packed.tobytes(), np.uint8)
    out = convert._dequant_q4_0(raw, 32)
    lo = (nibbles.astype(np.int8) - 8) * 2.0
    hi = (nibbles[::-1].astype(np.int8) - 8) * 2.0
    np.testing.assert_allclose(out, np.concatenate([lo, hi]).astype(np.float32))
