"""Shared synthetic-checkpoint builders for converter/oracle tests.

One weight set, three serializations:
  * `write_hf_dir`   — Qwen2-style safetensors + config.json (HF layout);
  * `write_gguf_file`— the same weights under llama.cpp GGUF tensor names;
  * `build_hf_model` — a live `transformers` Qwen2 model loaded with the
    SAME weights, used as the generate-loop oracle (the strongest offline
    proxy for the reference's torch path, reference neutts/neutts.py:334-352).
"""

import json

import numpy as np


def make_weights(cfg, seed=0):
    """Random Qwen2-style HF state dict for `cfg` (numpy float32)."""
    rng = np.random.default_rng(seed)
    D, L, F = cfg.hidden_size, cfg.n_layers, cfg.intermediate_size
    Q, KV, V = cfg.q_dim, cfg.kv_dim, cfg.vocab_size

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    t = {
        "model.embed_tokens.weight": w(V, D),
        "model.norm.weight": np.ones(D, np.float32),
    }
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = w(Q, D)
        t[f"{p}.self_attn.q_proj.bias"] = w(Q)
        t[f"{p}.self_attn.k_proj.weight"] = w(KV, D)
        t[f"{p}.self_attn.k_proj.bias"] = w(KV)
        t[f"{p}.self_attn.v_proj.weight"] = w(KV, D)
        t[f"{p}.self_attn.v_proj.bias"] = w(KV)
        t[f"{p}.self_attn.o_proj.weight"] = w(D, Q)
        t[f"{p}.mlp.gate_proj.weight"] = w(F, D)
        t[f"{p}.mlp.up_proj.weight"] = w(F, D)
        t[f"{p}.mlp.down_proj.weight"] = w(D, F)
    return t


def write_hf_dir(path, cfg, weights=None, seed=0):
    """Write a tiny Qwen2-style safetensors checkpoint dir; returns weights."""
    from safetensors.numpy import save_file

    t = weights if weights is not None else make_weights(cfg, seed)
    save_file(t, str(path / "model.safetensors"))
    hf_cfg = {
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "head_dim": cfg.head_dim,
        "intermediate_size": cfg.intermediate_size,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "tie_word_embeddings": True,
    }
    (path / "config.json").write_text(json.dumps(hf_cfg))
    return t


def hf_to_gguf_tensors(cfg, weights):
    """HF state-dict names -> llama.cpp GGUF tensor names (same arrays)."""
    t = {
        "token_embd.weight": weights["model.embed_tokens.weight"],
        "output_norm.weight": weights["model.norm.weight"],
    }
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}"
        t[f"blk.{i}.attn_norm.weight"] = weights[f"{p}.input_layernorm.weight"]
        t[f"blk.{i}.ffn_norm.weight"] = weights[f"{p}.post_attention_layernorm.weight"]
        t[f"blk.{i}.attn_q.weight"] = weights[f"{p}.self_attn.q_proj.weight"]
        t[f"blk.{i}.attn_q.bias"] = weights[f"{p}.self_attn.q_proj.bias"]
        t[f"blk.{i}.attn_k.weight"] = weights[f"{p}.self_attn.k_proj.weight"]
        t[f"blk.{i}.attn_k.bias"] = weights[f"{p}.self_attn.k_proj.bias"]
        t[f"blk.{i}.attn_v.weight"] = weights[f"{p}.self_attn.v_proj.weight"]
        t[f"blk.{i}.attn_v.bias"] = weights[f"{p}.self_attn.v_proj.bias"]
        t[f"blk.{i}.attn_output.weight"] = weights[f"{p}.self_attn.o_proj.weight"]
        t[f"blk.{i}.ffn_gate.weight"] = weights[f"{p}.mlp.gate_proj.weight"]
        t[f"blk.{i}.ffn_up.weight"] = weights[f"{p}.mlp.up_proj.weight"]
        t[f"blk.{i}.ffn_down.weight"] = weights[f"{p}.mlp.down_proj.weight"]
    return t


def write_gguf_file(path, cfg, weights, quant_type=None):
    """Serialize `weights` (HF names) as a GGUF file via models/convert.py.

    quant_type: None (F32) | "Q8_0" | "Q4_0" — llama.cpp block quantization
    applied to every 2-D weight matrix (the reference ships Q8/Q4 GGUFs,
    reference README.md:51); 1-D tensors stay F32, as llama.cpp does."""
    from neutts_tpu.models import convert

    meta = {
        "general.architecture": "qwen2",
        "general.alignment": 32,
        "qwen2.embedding_length": cfg.hidden_size,
        "qwen2.block_count": cfg.n_layers,
        "qwen2.attention.head_count": cfg.n_heads,
        "qwen2.attention.head_count_kv": cfg.n_kv_heads,
        "qwen2.attention.key_length": cfg.head_dim,
        "qwen2.feed_forward_length": cfg.intermediate_size,
        "qwen2.rope.freq_base": float(cfg.rope_theta),
        "qwen2.attention.layer_norm_rms_epsilon": float(cfg.rms_norm_eps),
        "qwen2.vocab_size": cfg.vocab_size,
    }
    tensors = hf_to_gguf_tensors(cfg, weights)
    quant = None
    if quant_type is not None:
        quant = {n: quant_type for n, a in tensors.items() if a.ndim == 2}
    convert.write_gguf(path, meta, tensors, quant=quant)
    return path


def build_hf_model(cfg, weights):
    """transformers Qwen2 model carrying `weights` (eval mode, float32)."""
    import torch
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
    state = {k: torch.from_numpy(np.asarray(v)) for k, v in weights.items()}
    missing, unexpected = model.load_state_dict(state, strict=False)
    assert not unexpected, unexpected
    model.eval()
    return model
