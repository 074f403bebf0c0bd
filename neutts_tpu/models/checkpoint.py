"""Checkpoint save/load for the pipeline (backbone + codec params).

Format: a directory with
  * `backbone.npz` / `codec.npz` — flattened pytrees ('/'-joined key paths);
  * `config.json` — the dataclass configs.

Replaces the reference's model persistence surface: HF Hub downloads for
inference weights and Trainer save_model for finetunes (SURVEY.md §5
checkpoint/resume). Converters from real HF/GGUF checkpoints live in
neutts_tpu/models/convert.py and emit this same format.

npz is deliberate: single-file, dependency-free, memory-mappable. (Training
state uses orbax in neutts_tpu/train for async sharded checkpointing.)
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from neutts_tpu import config as cfglib

_bf16 = np.dtype(ml_dtypes.bfloat16)


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if tree is None:  # absent subtree (e.g. decoder-only codec's "enc")
        return out
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif isinstance(tree, (int, float)):
        out[prefix[:-1] + ".scalar"] = np.asarray(tree)
    else:
        arr = np.asarray(tree)
        if arr.dtype == _bf16:
            # npz cannot represent bfloat16 (degrades to void); store the raw
            # bits as uint16 with a key tag and reinterpret on load.
            out[prefix[:-1] + ".bf16"] = arr.view(np.uint16)
        else:
            out[prefix[:-1]] = arr
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        scalar = key.endswith(".scalar")
        if scalar:
            key = key[: -len(".scalar")]
        elif key.endswith(".bf16"):
            key = key[: -len(".bf16")]
            val = val.view(_bf16)
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val.item() if scalar else jnp.asarray(val)

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def save_params(path: str | Path, params) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **_flatten(params))


def load_params(path: str | Path):
    with np.load(path, allow_pickle=False) as z:
        return _unflatten({k: z[k] for k in z.files})


def save_pipeline(
    path: str | Path,
    backbone_cfg: cfglib.BackboneConfig,
    backbone_params,
    codec_cfg: cfglib.CodecConfig,
    codec_params,
) -> None:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    save_params(p / "backbone.npz", backbone_params)
    save_params(p / "codec.npz", codec_params)
    cfg = {
        "backbone": dataclasses.asdict(backbone_cfg),
        "codec": dataclasses.asdict(codec_cfg),
        "format_version": 1,
    }
    (p / "config.json").write_text(json.dumps(cfg, indent=2))


def load_pipeline(path: str | Path) -> Tuple[cfglib.BackboneConfig, Any, cfglib.CodecConfig, Any]:
    p = Path(path)
    cfg = json.loads((p / "config.json").read_text())
    bc = cfg["backbone"]
    cc = cfg["codec"]
    # drop fields from older format revisions; coerce lists back to tuples
    known = {f.name for f in dataclasses.fields(cfglib.CodecConfig)}
    cc = {k: v for k, v in cc.items() if k in known}
    for key in ("fsq_levels", "enc_strides", "enc_channels"):
        if key in cc:
            cc[key] = tuple(cc[key])
    if isinstance(cc.get("semantic"), dict):
        # nested dataclass: json round-trips it as a plain dict
        cc["semantic"] = cfglib.SemanticConfig(**cc["semantic"])
    if isinstance(cc.get("codecenc"), dict):
        ce = dict(cc["codecenc"])
        for key in ("up_ratios", "dilations"):
            if key in ce:
                ce[key] = tuple(ce[key])
        cc["codecenc"] = cfglib.CodecEncConfig(**ce)
    backbone_cfg = cfglib.BackboneConfig(**bc)
    codec_cfg = cfglib.CodecConfig(**cc)
    return (
        backbone_cfg,
        load_params(p / "backbone.npz"),
        codec_cfg,
        load_params(p / "codec.npz"),
    )
