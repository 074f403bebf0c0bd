"""Sharded training step for the speech LM (the finetune path).

TPU-native replacement for the reference's HF-Trainer finetuning
(reference examples/finetune.py:103-169: bf16, cosine schedule + warmup,
AdamW, per-device batches; config examples/finetune_config.yaml — lr 4e-5,
seq 2048, seed 1337). Loss semantics match the reference preprocessing:
labels are ignored (-100) before `<|SPEECH_GENERATION_START|>` and supervised
from there, with padding masked via the attention mask
(examples/finetune.py:86-93).

Distribution (new capability, SURVEY.md §2c): one jitted `train_step` over a
`Mesh` — batch sharded on the "data" axis, params replicated or
tensor-sharded on "model"; XLA GSPMD inserts the gradient all-reduce over
ICI/DCN. Scales from 1 chip to a multi-host pod slice unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from neutts_tpu.config import BackboneConfig
from neutts_tpu.models import backbone as bb
from neutts_tpu.parallel import mesh as meshlib

IGNORE_INDEX = -100  # reference examples/finetune.py:88


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 4e-5  # reference finetune_config.yaml:11
    warmup_ratio: float = 0.05
    max_steps: int = 10_000  # reference finetune_config.yaml:14
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.999
    grad_clip: float = 1.0
    seed: int = 1337  # reference finetune_config.yaml:5
    # jax.checkpoint each layer: backward recomputes activations instead of
    # saving all L of them — the standard TPU memory/compute trade for long
    # sequences (backbone.forward_train). Gradients identical (tested).
    remat: bool = False


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    warmup = max(int(tc.max_steps * tc.warmup_ratio), 1)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.learning_rate,
        warmup_steps=warmup,
        decay_steps=tc.max_steps,
    )
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(schedule, b1=tc.b1, b2=tc.b2, weight_decay=tc.weight_decay),
    )


def init_state(cfg: BackboneConfig, tc: TrainConfig, key: jax.Array) -> TrainState:
    params = bb.init_params(cfg, key)
    opt_state = make_optimizer(tc).init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def loss_fn(
    cfg: BackboneConfig,
    params,
    tokens: jax.Array,  # [B, S] int32, right-padded
    labels: jax.Array,  # [B, S] int32, IGNORE_INDEX where unsupervised
    attn_mask: jax.Array,  # [B, S] bool
    remat: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    logits = bb.forward_train(cfg, params, tokens, attn_mask,
                              remat=remat)  # [B, S, V]
    # next-token prediction: logits at t predict labels at t+1
    logits = logits[:, :-1, :]
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(valid.sum(), 1)
    loss = nll.sum() / n
    metrics = {
        "loss": loss,
        "n_tokens": n,
        "accuracy": (jnp.where(valid, logits.argmax(-1) == safe_targets, False).sum() / n),
    }
    return loss, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "tc"), donate_argnums=(2,))
def train_step(
    cfg: BackboneConfig,
    tc: TrainConfig,
    state: TrainState,
    tokens: jax.Array,
    labels: jax.Array,
    attn_mask: jax.Array,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    grad_fn = jax.value_and_grad(
        lambda p: loss_fn(cfg, p, tokens, labels, attn_mask,
                          remat=tc.remat), has_aux=True
    )
    (loss, metrics), grads = grad_fn(state.params)
    updates, opt_state = make_optimizer(tc).update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics


def make_sharded_train_step(cfg: BackboneConfig, tc: TrainConfig, mesh):
    """train_step with explicit in/out shardings over `mesh` (dp x tp)."""
    data = NamedSharding(mesh, P(meshlib.DATA_AXIS))

    def step(state, tokens, labels, attn_mask):
        return train_step(cfg, tc, state, tokens, labels, attn_mask)

    # Params arrive already placed by meshlib.shard_params; GSPMD propagates
    # their layout into the optimizer state and gradients, and inserts the
    # data-axis gradient all-reduce. Only the batch inputs are constrained.
    return jax.jit(
        step,
        in_shardings=(None, data, data, data),
        donate_argnums=(0,),
    )


def make_labels(
    tokens: jax.Array, attn_mask: jax.Array, speech_gen_start_id: int
) -> jax.Array:
    """Reference label rule (examples/finetune.py:86-90): IGNORE before and
    including nothing — labels = tokens from <|SPEECH_GENERATION_START|>
    onward, IGNORE_INDEX elsewhere and on padding."""
    B, S = tokens.shape
    is_start = tokens == speech_gen_start_id
    after = jnp.cumsum(is_start.astype(jnp.int32), axis=-1) > 0
    keep = after & attn_mask
    return jnp.where(keep, tokens, IGNORE_INDEX)


# --- training checkpoint/resume (orbax) ---------------------------------------
#
# The reference persists finetunes via HF Trainer save_strategy/save_steps
# (reference examples/finetune.py:148-150, SURVEY.md §5). Here: async orbax
# checkpoints of the full TrainState (params + optimizer moments + step) with
# resume — survives preemption mid-run, which the reference cannot.


def save_train_state(path, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(path), jax.device_get(state._asdict()), force=True)
    ckptr.wait_until_finished()


def load_train_state(path, cfg: BackboneConfig, tc: TrainConfig) -> TrainState:
    import orbax.checkpoint as ocp

    template = init_state(cfg, tc, jax.random.PRNGKey(0))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(str(path), target=jax.device_get(template._asdict()))
    return TrainState(**restored)
