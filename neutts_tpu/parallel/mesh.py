"""Device mesh and sharding layouts.

The reference has no distribution at all (SURVEY.md §2c: single process,
batch 1, no collectives). This module is where the TPU framework *adds* it,
per the north star: data-parallel utterance batches across chips/hosts with
replicated (or tensor-sharded) LM weights, expressed as
`Mesh` + `NamedSharding` under `jit` — XLA GSPMD inserts the ICI collectives.

Axes:
  * "data"  — utterance batch (DP). KV cache, token buffers, rng all shard here.
  * "model" — tensor parallelism (TP) over attention heads / MLP width,
    reserved for backbones that exceed one chip (Air/Nano fit trivially:
    model=1 in production; tested at model=2,4 on the virtual CPU mesh).

Multi-host: `jax.distributed.initialize()` + the same mesh over all processes
— DP batches ride DCN via per-host feeding, TP stays inside a host on ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from neutts_tpu.config import BackboneConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def backbone_param_specs(cfg: BackboneConfig) -> dict:
    """Megatron-style TP layout: QKV/gate/up split on the output feature axis,
    o/down split on the input feature axis, norms and embeddings replicated.
    With tp=1 everything degenerates to full replication (pure DP)."""
    specs = {
        "embed": P(None, None),
        "layers": {
            "attn_norm": P(None, None),
            "wq": P(None, None, MODEL_AXIS),
            "bq": P(None, MODEL_AXIS),
            "wk": P(None, None, MODEL_AXIS),
            "bk": P(None, MODEL_AXIS),
            "wv": P(None, None, MODEL_AXIS),
            "bv": P(None, MODEL_AXIS),
            "wo": P(None, MODEL_AXIS, None),
            "mlp_norm": P(None, None),
            "w_gate": P(None, None, MODEL_AXIS),
            "w_up": P(None, None, MODEL_AXIS),
            "w_down": P(None, MODEL_AXIS, None),
        },
        "final_norm": P(None),
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, MODEL_AXIS)
    return specs


def backbone_param_shardings(mesh: Mesh, cfg: BackboneConfig):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        backbone_param_specs(cfg),
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh):
    """[B, ...] arrays sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def kv_cache_spec() -> P:
    """[L, B, T, n_kv * Dh]: batch on data. KV heads stay replicated across
    the model axis — with GQA (2 KV heads) there are fewer heads than useful
    TP degrees, and the cache is small next to the weights."""
    return P(None, DATA_AXIS, None, None)


def shard_params(params, mesh: Mesh, cfg: BackboneConfig):
    """Place a (host or single-device) param pytree onto the mesh."""
    sh = backbone_param_shardings(mesh, cfg)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
