"""Checkpoint converters: HF (safetensors) and GGUF -> neutts-tpu pytrees.

The reference consumes two weight formats (reference neutts/neutts.py:123-166):
HF transformers checkpoints (`AutoModelForCausalLM.from_pretrained`) and GGUF
files for llama.cpp (incl. Q8_0/Q4_0 quantizations, reference README.md:51).
These converters ingest both into the stacked-layer pytree that
neutts_tpu.models.backbone expects, so any released NeuTTS Air/Nano
checkpoint can run on TPU. No network: paths must be local.

HF name mapping (Qwen2ForCausalLM, the Air/Nano architecture per reference
TRAINING.md:33):
    model.embed_tokens.weight                    -> embed [V, D]
    model.layers.{i}.input_layernorm.weight      -> layers.attn_norm[i]
    model.layers.{i}.self_attn.{q,k,v}_proj.*    -> layers.w{q,k,v}/b{q,k,v}
      (HF stores [out, in]; we store [in, out] so forward is x @ W)
    model.layers.{i}.self_attn.o_proj.weight     -> layers.wo
    model.layers.{i}.post_attention_layernorm    -> layers.mlp_norm
    model.layers.{i}.mlp.{gate,up,down}_proj     -> layers.w_{gate,up,down}
    model.norm.weight                            -> final_norm
    lm_head.weight (absent when tied)            -> lm_head [D, V]

GGUF: a self-contained pure-python parser (the `gguf` package is not in this
image) covering the header/metadata spec plus dequantization of F32, F16,
BF16, Q8_0 and Q4_0 tensor types — the formats NeuTTS ships
(reference README.md:46-50 lists q4/q8 GGUFs).
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from neutts_tpu.config import BackboneConfig, TokenLayout


# --- HF safetensors -----------------------------------------------------------


def _load_safetensors_dir(path: Path) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    files = sorted(path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for f in files:
        with safe_open(str(f), framework="np") as sf:
            for name in sf.keys():
                tensors[name] = sf.get_tensor(name)
    return tensors


def config_from_hf(path: str | Path) -> BackboneConfig:
    """Build a BackboneConfig from a local HF checkpoint's config.json."""
    p = Path(path)
    hf = json.loads((p / "config.json").read_text())
    vocab = int(hf["vocab_size"])
    layout = TokenLayout(n_text_tokens=vocab - 6 - 65_536)
    return BackboneConfig(
        name=p.name or "converted",
        vocab_size=vocab,
        n_text_tokens=layout.n_text_tokens,
        hidden_size=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf["num_key_value_heads"]),
        head_dim=int(hf.get("head_dim", hf["hidden_size"] // hf["num_attention_heads"])),
        intermediate_size=int(hf["intermediate_size"]),
        rope_theta=float(hf.get("rope_theta", 1e6)),
        rms_norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        max_context=2048,  # reference neutts/neutts.py:85
    )


def from_hf(path: str | Path, cfg: Optional[BackboneConfig] = None, dtype="bfloat16"):
    """Convert a local HF Qwen2-style checkpoint dir. Returns (cfg, params)."""
    p = Path(path)
    cfg = cfg or config_from_hf(p)
    t = _load_safetensors_dir(p)
    dt = np.dtype(ml_dtypes.bfloat16) if dtype == "bfloat16" else np.dtype(dtype)

    def get(name):
        if name in t:
            return t[name]
        raise KeyError(f"{name} missing from checkpoint (have {len(t)} tensors)")

    def lin(name_fmt, transpose=True):
        """Stack per-layer [out,in] HF mats into [L, in, out]."""
        mats = [get(name_fmt.format(i=i)) for i in range(cfg.n_layers)]
        arr = np.stack(mats, 0)
        if transpose:
            arr = arr.transpose(0, 2, 1)
        return np.ascontiguousarray(arr)

    def vec(name_fmt):
        return np.stack([get(name_fmt.format(i=i)) for i in range(cfg.n_layers)], 0)

    embed = get("model.embed_tokens.weight")  # [V, D]
    V = cfg.padded_vocab
    if embed.shape[0] < V:
        padrows = np.zeros((V - embed.shape[0], embed.shape[1]), embed.dtype)
        embed = np.concatenate([embed, padrows], 0)

    def cast(x):
        return jnp.asarray(np.asarray(x).astype(np.float32).astype(dt))

    params: Dict[str, Any] = {
        "embed": cast(embed),
        "layers": {
            "attn_norm": cast(vec("model.layers.{i}.input_layernorm.weight")),
            "wq": cast(lin("model.layers.{i}.self_attn.q_proj.weight")),
            "bq": cast(vec("model.layers.{i}.self_attn.q_proj.bias")),
            "wk": cast(lin("model.layers.{i}.self_attn.k_proj.weight")),
            "bk": cast(vec("model.layers.{i}.self_attn.k_proj.bias")),
            "wv": cast(lin("model.layers.{i}.self_attn.v_proj.weight")),
            "bv": cast(vec("model.layers.{i}.self_attn.v_proj.bias")),
            "wo": cast(lin("model.layers.{i}.self_attn.o_proj.weight")),
            "mlp_norm": cast(vec("model.layers.{i}.post_attention_layernorm.weight")),
            "w_gate": cast(lin("model.layers.{i}.mlp.gate_proj.weight")),
            "w_up": cast(lin("model.layers.{i}.mlp.up_proj.weight")),
            "w_down": cast(lin("model.layers.{i}.mlp.down_proj.weight")),
        },
        "final_norm": cast(get("model.norm.weight")),
    }
    if not cfg.tie_embeddings:
        head = get("lm_head.weight").T  # [D, V]
        if head.shape[1] < V:
            pad = np.zeros((head.shape[0], V - head.shape[1]), head.dtype)
            head = np.concatenate([head, pad], 1)
        params["lm_head"] = cast(head)
    return cfg, params


# --- GGUF ---------------------------------------------------------------------

_GGUF_MAGIC = 0x46554747  # "GGUF"

# metadata value types
_GV = {
    0: "u8", 1: "i8", 2: "u16", 3: "i16", 4: "u32", 5: "i32",
    6: "f32", 7: "bool", 8: "str", 9: "arr", 10: "u64", 11: "i64", 12: "f64",
}
_GV_FMT = {
    "u8": "<B", "i8": "<b", "u16": "<H", "i16": "<h", "u32": "<I",
    "i32": "<i", "f32": "<f", "u64": "<Q", "i64": "<q", "f64": "<d",
}

# tensor (ggml) dtypes: id -> (name, block_elems, block_bytes)
GGML_TYPES = {
    0: ("F32", 1, 4),
    1: ("F16", 1, 2),
    2: ("Q4_0", 32, 18),
    8: ("Q8_0", 32, 34),
    30: ("BF16", 1, 2),
}


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.o = 0

    def u(self, fmt):
        v = struct.unpack_from(fmt, self.d, self.o)[0]
        self.o += struct.calcsize(fmt)
        return v

    def s(self):
        n = self.u("<Q")
        v = self.d[self.o : self.o + n].decode("utf-8")
        self.o += n
        return v

    def value(self, t):
        name = _GV[t]
        if name == "str":
            return self.s()
        if name == "bool":
            return bool(self.u("<B"))
        if name == "arr":
            et = self.u("<I")
            n = self.u("<Q")
            return [self.value(et) for _ in range(n)]
        return self.u(_GV_FMT[name])


def _dequant_q8_0(raw: np.ndarray, n: int) -> np.ndarray:
    blocks = raw.reshape(-1, 34)
    scale = blocks[:, :2].copy().view("<f2").astype(np.float32)  # [NB,1]
    qs = blocks[:, 2:].view(np.int8).astype(np.float32)  # [NB,32]
    return (qs * scale).reshape(-1)[:n]


def _dequant_q4_0(raw: np.ndarray, n: int) -> np.ndarray:
    blocks = raw.reshape(-1, 18)
    scale = blocks[:, :2].copy().view("<f2").astype(np.float32)  # [NB,1]
    q = blocks[:, 2:]  # [NB,16] packed nibbles
    lo = (q & 0x0F).astype(np.int8) - 8
    hi = (q >> 4).astype(np.int8) - 8
    vals = np.concatenate([lo, hi], axis=1).astype(np.float32) * scale
    return vals.reshape(-1)[:n]


def read_gguf(path: str | Path) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """Parse a GGUF file. Returns (metadata, {tensor_name: f32 ndarray})."""
    data = Path(path).read_bytes()
    r = _Reader(data)
    magic = r.u("<I")
    if magic != _GGUF_MAGIC:
        raise ValueError(f"not a GGUF file (magic {magic:#x})")
    version = r.u("<I")
    if version < 2:
        raise ValueError(f"unsupported GGUF version {version}")
    n_tensors = r.u("<Q")
    n_kv = r.u("<Q")
    meta: Dict[str, Any] = {"gguf.version": version}
    for _ in range(n_kv):
        key = r.s()
        t = r.u("<I")
        meta[key] = r.value(t)

    infos: List[Tuple[str, List[int], int, int]] = []
    for _ in range(n_tensors):
        name = r.s()
        nd = r.u("<I")
        dims = [r.u("<Q") for _ in range(nd)]  # ggml order (fastest first)
        ttype = r.u("<I")
        offset = r.u("<Q")
        infos.append((name, dims, ttype, offset))

    align = int(meta.get("general.alignment", 32))
    base = (r.o + align - 1) // align * align

    tensors: Dict[str, np.ndarray] = {}
    for name, dims, ttype, offset in infos:
        if ttype not in GGML_TYPES:
            raise NotImplementedError(f"ggml tensor type {ttype} for {name}")
        tname, belems, bbytes = GGML_TYPES[ttype]
        n = 1
        for d in dims:
            n *= d
        nbytes = (n // belems) * bbytes
        raw = np.frombuffer(data, np.uint8, count=nbytes, offset=base + offset)
        if tname == "F32":
            vals = raw.view("<f4").astype(np.float32)
        elif tname == "F16":
            vals = raw.view("<f2").astype(np.float32)
        elif tname == "BF16":
            vals = raw.view(ml_dtypes.bfloat16).astype(np.float32)
        elif tname == "Q8_0":
            vals = _dequant_q8_0(raw, n)
        elif tname == "Q4_0":
            vals = _dequant_q4_0(raw, n)
        # ggml dims are fastest-varying first: logical shape is reversed
        tensors[name] = vals.reshape(tuple(reversed(dims)))
    return meta, tensors


def config_from_gguf(meta: Dict[str, Any], name="converted-gguf") -> BackboneConfig:
    a = "qwen2"  # NeuTTS GGUFs are qwen2-arch
    arch = meta.get("general.architecture", a)
    g = lambda k, d=None: meta.get(f"{arch}.{k}", d)
    vocab = None
    if "tokenizer.ggml.tokens" in meta:
        vocab = len(meta["tokenizer.ggml.tokens"])
    emb = int(g("embedding_length"))
    heads = int(g("attention.head_count"))
    vocab = vocab or int(g("vocab_size", 0))
    return BackboneConfig(
        name=name,
        vocab_size=vocab,
        n_text_tokens=vocab - 6 - 65_536,
        hidden_size=emb,
        n_layers=int(g("block_count")),
        n_heads=heads,
        n_kv_heads=int(g("attention.head_count_kv", heads)),
        head_dim=int(g("attention.key_length", emb // heads)),
        intermediate_size=int(g("feed_forward_length")),
        rope_theta=float(g("rope.freq_base", 1e6)),
        rms_norm_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
        tie_embeddings="output.weight" not in {},  # fixed up in from_gguf
        max_context=2048,
    )


def from_gguf(path: str | Path, dtype="bfloat16"):
    """Convert a GGUF checkpoint (F32/F16/BF16/Q8_0/Q4_0). Returns (cfg, params)."""
    import dataclasses

    meta, t = read_gguf(path)
    cfg = config_from_gguf(meta, name=Path(path).stem)
    cfg = dataclasses.replace(cfg, tie_embeddings="output.weight" not in t)
    dt = np.dtype(ml_dtypes.bfloat16) if dtype == "bfloat16" else np.dtype(dtype)

    def cast(x):
        return jnp.asarray(np.asarray(x, np.float32).astype(dt))

    def lin(fmt):
        # gguf weight comes out as [out, in] after the reversed reshape
        return np.stack(
            [t[fmt.format(i=i)].transpose(1, 0) for i in range(cfg.n_layers)], 0
        )

    def vec(fmt):
        return np.stack([t[fmt.format(i=i)] for i in range(cfg.n_layers)], 0)

    embed = t["token_embd.weight"]  # [V, D]
    V = cfg.padded_vocab
    if embed.shape[0] < V:
        embed = np.concatenate(
            [embed, np.zeros((V - embed.shape[0], embed.shape[1]), embed.dtype)], 0
        )
    params: Dict[str, Any] = {
        "embed": cast(embed),
        "layers": {
            "attn_norm": cast(vec("blk.{i}.attn_norm.weight")),
            "wq": cast(lin("blk.{i}.attn_q.weight")),
            "bq": cast(vec("blk.{i}.attn_q.bias")),
            "wk": cast(lin("blk.{i}.attn_k.weight")),
            "bk": cast(vec("blk.{i}.attn_k.bias")),
            "wv": cast(lin("blk.{i}.attn_v.weight")),
            "bv": cast(vec("blk.{i}.attn_v.bias")),
            "wo": cast(lin("blk.{i}.attn_output.weight")),
            "mlp_norm": cast(vec("blk.{i}.ffn_norm.weight")),
            "w_gate": cast(lin("blk.{i}.ffn_gate.weight")),
            "w_up": cast(lin("blk.{i}.ffn_up.weight")),
            "w_down": cast(lin("blk.{i}.ffn_down.weight")),
        },
        "final_norm": cast(t["output_norm.weight"]),
    }
    if not cfg.tie_embeddings:
        head = t["output.weight"].transpose(1, 0)
        if head.shape[1] < V:
            head = np.concatenate(
                [head, np.zeros((head.shape[0], V - head.shape[1]), head.dtype)], 1
            )
        params["lm_head"] = cast(head)
    return cfg, params


# --- GGUF writer (tests / interchange) ---------------------------------------


def _quant_q8_0(x: np.ndarray) -> np.ndarray:
    """f32 [..., n%32==0] -> Q8_0 blocks [NB, 34] (llama.cpp layout: f16
    scale d = absmax/127, int8 q = round(x/d))."""
    flat = np.ascontiguousarray(x, "<f4").reshape(-1, 32)
    amax = np.max(np.abs(flat), axis=1, keepdims=True)
    d = (amax / 127.0).astype("<f2")
    df = d.astype(np.float32)
    q = np.where(df > 0, np.rint(flat / np.maximum(df, 1e-30)), 0)
    q = np.clip(q, -127, 127).astype(np.int8)
    return np.concatenate([d.view(np.uint8), q.view(np.uint8)], axis=1)


def _quant_q4_0(x: np.ndarray) -> np.ndarray:
    """f32 [..., n%32==0] -> Q4_0 blocks [NB, 18] (llama.cpp convention:
    d = signed-max / -8, nibbles = clamp(round(x/d) + 8, 0, 15); element
    i<16 in the low nibble of byte i, i>=16 in the high nibble)."""
    flat = np.ascontiguousarray(x, "<f4").reshape(-1, 32)
    idx = np.argmax(np.abs(flat), axis=1)
    m = flat[np.arange(flat.shape[0]), idx][:, None]  # signed max-magnitude
    d = (m / -8.0).astype("<f2")
    df = d.astype(np.float32)
    inv = np.where(df != 0, 1.0 / np.where(df == 0, 1, df), 0.0)
    q = np.clip(np.rint(flat * inv) + 8, 0, 15).astype(np.uint8)
    packed = (q[:, :16] | (q[:, 16:] << 4)).astype(np.uint8)
    return np.concatenate([d.view(np.uint8), packed], axis=1)


_QUANT_WRITERS = {"Q8_0": (8, _quant_q8_0), "Q4_0": (2, _quant_q4_0)}


def write_gguf(
    path: str | Path,
    meta: Dict[str, Any],
    tensors: Dict[str, np.ndarray],
    align: int = 32,
    quant: Optional[Dict[str, str]] = None,
) -> None:
    """Minimal GGUF v3 writer — used by round-trip tests and to export
    synthetic checkpoints. `quant` maps tensor names to "Q8_0"/"Q4_0"
    (llama.cpp block quantization; rows must be multiples of 32 elements);
    everything else is written F32.
    """

    def pstr(s: str) -> bytes:
        b = s.encode()
        return struct.pack("<Q", len(b)) + b

    def pval(v) -> bytes:
        if isinstance(v, bool):
            return struct.pack("<I", 7) + struct.pack("<B", int(v))
        if isinstance(v, int):
            return struct.pack("<I", 5) + struct.pack("<i", v)
        if isinstance(v, float):
            return struct.pack("<I", 6) + struct.pack("<f", v)
        if isinstance(v, str):
            return struct.pack("<I", 8) + pstr(v)
        if isinstance(v, list):
            if all(isinstance(x, str) for x in v):
                body = b"".join(pstr(x) for x in v)
                return struct.pack("<I", 9) + struct.pack("<IQ", 8, len(v)) + body
            body = b"".join(struct.pack("<i", x) for x in v)
            return struct.pack("<I", 9) + struct.pack("<IQ", 5, len(v)) + body
        raise TypeError(type(v))

    out = bytearray()
    out += struct.pack("<IIQQ", _GGUF_MAGIC, 3, len(tensors), len(meta))
    for k, v in meta.items():
        out += pstr(k) + pval(v)

    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr, dtype="<f4")
        dims = list(reversed(arr.shape))  # ggml order
        out += pstr(name)
        out += struct.pack("<I", len(dims))
        for d in dims:
            out += struct.pack("<Q", d)
        qt = (quant or {}).get(name)
        if qt is not None:
            tid, fn = _QUANT_WRITERS[qt]
            if arr.shape[-1] % 32:
                raise ValueError(
                    f"{name}: row length {arr.shape[-1]} not a multiple of "
                    f"32 — cannot {qt}-quantize"
                )
            blob = fn(arr).tobytes()
        else:
            tid = 0  # F32
            blob = arr.tobytes()
        out += struct.pack("<IQ", tid, offset)
        pad = (-len(blob)) % align
        blobs.append(blob + b"\x00" * pad)
        offset += len(blob) + pad

    pad = (-len(out)) % align
    out += b"\x00" * pad
    for b in blobs:
        out += b
    Path(path).write_bytes(bytes(out))
