"""w2v-BERT 2.0 semantic tower (Conformer encoder), pure-functional JAX.

The real NeuCodec's ENCODER consumes a semantic branch: a w2v-BERT 2.0
Conformer run to an intermediate layer over 50 Hz log-mel features, following
the public XCodec2 design the codec derives from (reference role: the
external `neucodec` package behind `encode_code`, reference
neutts/neutts.py:266-271). Without this tower a converted real checkpoint
could only decode (r2 VERDICT missing #2); with it, `convert_codec` maps the
full encoder and `encode_reference` parity becomes reachable.

Architecture (matches HF `transformers` Wav2Vec2BertModel semantics, the
public implementation the released checkpoints load into — pinned by
tests/test_semantic.py against the torch model):

    feature_projection: LayerNorm(input_dim) -> Linear(input_dim, hidden)
    N x Conformer layer:
        x += 0.5 * FFN1(LN(x))                 (Linear -> swish -> Linear)
        x += SelfAttn(LN(x))                   (relative_key position bias)
        x += ConvModule(x)                     (LN -> pw-conv 2D -> GLU ->
                                                CAUSAL depthwise k31 -> LN ->
                                                swish -> pw-conv)
        x += 0.5 * FFN2(LN(x));  x = LN(x)

relative_key attention: scores = (q k^T + q . E[clip(j - i)]) / sqrt(d) with
the distance clipped to [-left_max, right_max] and a per-layer embedding
table E of [left_max + right_max + 1, head_dim].

TPU-first: layers are scan-stacked (one compiled block), all matmuls
channels-last for the MXU, f32 statistics. The tower runs once per reference
clip (encode side), so throughput needs are modest.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from neutts_tpu.config import SemanticConfig  # noqa: F401 (public re-export)

Params = Dict[str, Any]


def _ln(x, s, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * s + b


def _swish(x):
    return x * jax.nn.sigmoid(x)


def init_params(cfg: SemanticConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 64))
    H, I, L = cfg.hidden, cfg.intermediate, cfg.n_layers

    def w(k, shape):
        fan_in = int(np.prod(shape[:-1]))
        return jax.random.normal(k, shape, jnp.float32) / np.sqrt(max(fan_in, 1))

    def stack(shape):
        return jnp.stack([w(next(keys), shape) for _ in range(L)])

    def ffn():
        return {
            "ln_s": jnp.ones((L, H)), "ln_b": jnp.zeros((L, H)),
            "w1": stack((H, I)), "b1": jnp.zeros((L, I)),
            "w2": stack((I, H)), "b2": jnp.zeros((L, H)),
        }

    return {
        "proj_ln_s": jnp.ones((cfg.input_dim,)),
        "proj_ln_b": jnp.zeros((cfg.input_dim,)),
        "proj_w": w(next(keys), (cfg.input_dim, H)),
        "proj_b": jnp.zeros((H,)),
        "layers": {
            "ffn1": ffn(),
            "attn_ln_s": jnp.ones((L, H)), "attn_ln_b": jnp.zeros((L, H)),
            "wq": stack((H, H)), "bq": jnp.zeros((L, H)),
            "wk": stack((H, H)), "bk": jnp.zeros((L, H)),
            "wv": stack((H, H)), "bv": jnp.zeros((L, H)),
            "wo": stack((H, H)), "bo": jnp.zeros((L, H)),
            "dist_emb": stack((cfg.n_positions, cfg.head_dim)),
            "conv_ln_s": jnp.ones((L, H)), "conv_ln_b": jnp.zeros((L, H)),
            "conv_pw1": stack((H, 2 * H)),  # no bias (HF Conv1d bias=False)
            "conv_dw": stack((cfg.conv_kernel, H)),  # depthwise, no bias
            "conv_dw_ln_s": jnp.ones((L, H)), "conv_dw_ln_b": jnp.zeros((L, H)),
            "conv_pw2": stack((H, H)),
            "ffn2": ffn(),
            "final_ln_s": jnp.ones((L, H)), "final_ln_b": jnp.zeros((L, H)),
        },
    }


def _ffn(lp_ffn, x, eps):
    h = _ln(x, lp_ffn["ln_s"], lp_ffn["ln_b"], eps)
    h = _swish(h @ lp_ffn["w1"] + lp_ffn["b1"])
    return h @ lp_ffn["w2"] + lp_ffn["b2"]


def _rel_bias_table(cfg: SemanticConfig, T: int) -> jax.Array:
    """[T, T] clipped-distance indices into the per-layer embedding table."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    d = jnp.clip(j - i, -cfg.left_max, cfg.right_max)
    return d + cfg.left_max  # [T, T] int


def forward(cfg: SemanticConfig, params: Params, feats: jax.Array) -> jax.Array:
    """feats: [B, T, input_dim] log-mel stack -> semantic features
    [B, T, hidden] tapped after layer `cfg.output_layer`."""
    B, T, fd = feats.shape
    if fd != cfg.input_dim:
        raise ValueError(
            f"semantic features have dim {fd}, tower expects "
            f"{cfg.input_dim} (audio/mel.py produces 160 = 80 mels x 2)"
        )
    eps = cfg.eps
    Hh, Dh = cfg.n_heads, cfg.head_dim
    x = _ln(feats, params["proj_ln_s"], params["proj_ln_b"], eps)
    x = x @ params["proj_w"] + params["proj_b"]
    dist_idx = _rel_bias_table(cfg, T)  # [T, T]
    scale = Dh**-0.5

    def block(x, lp):
        x = x + 0.5 * _ffn(lp["ffn1"], x, eps)
        # --- self-attention with relative_key position bias
        h = _ln(x, lp["attn_ln_s"], lp["attn_ln_b"], eps)
        q = (h @ lp["wq"] + lp["bq"]).reshape(B, T, Hh, Dh)
        k = (h @ lp["wk"] + lp["bk"]).reshape(B, T, Hh, Dh)
        v = (h @ lp["wv"] + lp["bv"]).reshape(B, T, Hh, Dh)
        scores = jnp.einsum("bthd,bshd->bhts", q, k)
        pos = lp["dist_emb"][dist_idx]  # [T, T, Dh]
        scores = scores + jnp.einsum("bthd,tsd->bhts", q, pos)
        probs = jax.nn.softmax(scores * scale, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, cfg.hidden)
        x = x + (o @ lp["wo"] + lp["bo"])
        # --- conformer conv module (CAUSAL depthwise: pad fully left)
        h = _ln(x, lp["conv_ln_s"], lp["conv_ln_b"], eps)
        h = h @ lp["conv_pw1"]  # [B, T, 2H]
        a, g = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(g)  # GLU over channels
        hp = jnp.pad(h, ((0, 0), (cfg.conv_kernel - 1, 0), (0, 0)))
        h = lax.conv_general_dilated(
            hp, lp["conv_dw"][:, None, :],
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=cfg.hidden,
        )
        h = _ln(h, lp["conv_dw_ln_s"], lp["conv_dw_ln_b"], eps)
        h = _swish(h)
        x = x + h @ lp["conv_pw2"]
        x = x + 0.5 * _ffn(lp["ffn2"], x, eps)
        x = _ln(x, lp["final_ln_s"], lp["final_ln_b"], eps)
        return x, x

    x, ys = lax.scan(block, x, params["layers"])
    if cfg.output_layer >= cfg.n_layers:
        return x
    return ys[cfg.output_layer - 1]  # output OF layer k (1-indexed count)


# --- HF checkpoint mapping ------------------------------------------------------


def from_hf_state_dict(
    state: Dict[str, np.ndarray], prefix: str = "",
    left_max: int | None = None, right_max: int | None = None,
) -> Tuple[SemanticConfig, Params]:
    """Map a transformers Wav2Vec2BertModel state dict (numpy values) into
    (SemanticConfig, params). Shape-driven: geometry comes from the tensors.
    `prefix` strips a container path (e.g. "semantic_model.").

    left_max/right_max: the distance-embedding table only reveals the TOTAL
    left_max + right_max + 1; the split is a config choice. Default follows
    the released w2v-bert-2.0 convention (right_max = 8, rest left); pass
    both explicitly for other checkpoints."""
    s = {k[len(prefix):]: np.asarray(v, np.float32)
         for k, v in state.items() if k.startswith(prefix)}

    def get(name):
        if name not in s:
            raise KeyError(
                f"semantic tower mapping: missing {prefix + name!r}; "
                f"have {sorted(s)[:8]}..."
            )
        return s[name]

    proj_w = get("feature_projection.projection.weight")  # [H, input_dim]
    H, input_dim = proj_w.shape
    n_layers = 1 + max(
        int(k.split(".")[2]) for k in s if k.startswith("encoder.layers.")
    )
    l0 = "encoder.layers.0."
    inter = get(l0 + "ffn1.intermediate_dense.weight").shape[0]
    dist = get(l0 + "self_attn.distance_embedding.weight")  # [P, Dh]
    head_dim = dist.shape[1]
    n_heads = H // head_dim
    kernel = get(l0 + "conv_module.depthwise_conv.weight").shape[2]
    P = dist.shape[0]
    if (left_max is None) != (right_max is None):
        raise ValueError("pass both left_max and right_max, or neither")
    if left_max is None:
        right = min(8, P - 1)  # released w2v-bert-2.0: left 64 / right 8
        left = P - 1 - right
    else:
        left, right = left_max, right_max
    if left + right + 1 != P:
        raise ValueError(
            f"left_max + right_max + 1 = {left + right + 1} does not match "
            f"the distance-embedding table size {P}"
        )
    cfg = SemanticConfig(
        input_dim=input_dim, hidden=H, n_layers=n_layers, n_heads=n_heads,
        intermediate=inter, conv_kernel=kernel, left_max=left, right_max=right,
    )

    def L(name):  # stack per-layer tensors
        return jnp.asarray(
            np.stack([s[f"encoder.layers.{i}.{name}"] for i in range(n_layers)])
        )

    def ffn(tag):
        return {
            "ln_s": L(f"{tag}_layer_norm.weight"),
            "ln_b": L(f"{tag}_layer_norm.bias"),
            "w1": jnp.asarray(np.stack([
                s[f"encoder.layers.{i}.{tag}.intermediate_dense.weight"].T
                for i in range(n_layers)])),
            "b1": L(f"{tag}.intermediate_dense.bias"),
            "w2": jnp.asarray(np.stack([
                s[f"encoder.layers.{i}.{tag}.output_dense.weight"].T
                for i in range(n_layers)])),
            "b2": L(f"{tag}.output_dense.bias"),
        }

    def LT(name):  # stacked + transposed (torch Linear [out, in] -> [in, out])
        return jnp.asarray(np.stack([
            s[f"encoder.layers.{i}.{name}"].T for i in range(n_layers)
        ]))

    params: Params = {
        "proj_ln_s": jnp.asarray(get("feature_projection.layer_norm.weight")),
        "proj_ln_b": jnp.asarray(get("feature_projection.layer_norm.bias")),
        "proj_w": jnp.asarray(proj_w.T),
        "proj_b": jnp.asarray(get("feature_projection.projection.bias")),
        "layers": {
            "ffn1": ffn("ffn1"),
            "attn_ln_s": L("self_attn_layer_norm.weight"),
            "attn_ln_b": L("self_attn_layer_norm.bias"),
            "wq": LT("self_attn.linear_q.weight"),
            "bq": L("self_attn.linear_q.bias"),
            "wk": LT("self_attn.linear_k.weight"),
            "bk": L("self_attn.linear_k.bias"),
            "wv": LT("self_attn.linear_v.weight"),
            "bv": L("self_attn.linear_v.bias"),
            "wo": LT("self_attn.linear_out.weight"),
            "bo": L("self_attn.linear_out.bias"),
            "dist_emb": L("self_attn.distance_embedding.weight"),
            "conv_ln_s": L("conv_module.layer_norm.weight"),
            "conv_ln_b": L("conv_module.layer_norm.bias"),
            # torch Conv1d weight [out, in, k]: pw k=1 -> [in, out];
            # depthwise [H, 1, K] -> [K, H]
            "conv_pw1": jnp.asarray(np.stack([
                s[f"encoder.layers.{i}.conv_module.pointwise_conv1.weight"][:, :, 0].T
                for i in range(n_layers)])),
            "conv_dw": jnp.asarray(np.stack([
                s[f"encoder.layers.{i}.conv_module.depthwise_conv.weight"][:, 0, :].T
                for i in range(n_layers)])),
            "conv_dw_ln_s": L("conv_module.depthwise_layer_norm.weight"),
            "conv_dw_ln_b": L("conv_module.depthwise_layer_norm.bias"),
            "conv_pw2": jnp.asarray(np.stack([
                s[f"encoder.layers.{i}.conv_module.pointwise_conv2.weight"][:, :, 0].T
                for i in range(n_layers)])),
            "ffn2": ffn("ffn2"),
            "final_ln_s": L("final_layer_norm.weight"),
            "final_ln_b": L("final_layer_norm.bias"),
        },
    }
    return cfg, params
