"""Codec training: reconstruction objective for the from-scratch encoder +
Vocos-family decoder (models/codec.py).

The reference delegates codec training entirely to the external `neucodec`
package (its repo only consumes the trained codec — reference
neutts/neutts.py:168-214); a standalone framework needs its own route to
codec weights when conversion artifacts are unavailable. This module provides
the reconstruction path: 16 kHz audio -> encoder -> FSQ (straight-through)
-> decoder -> 24 kHz audio, trained with L1 waveform + multi-resolution STFT
loss (log-magnitude L1 + spectral convergence — the standard public
neural-vocoder recipe). Adversarial/discriminator training can be stacked on
top; the reconstruction step is what makes the architecture *trainable*,
which tests pin (tests/test_train.py).

The train step is a single jitted function; with a Mesh it shards the batch
on "data" and lets GSPMD all-reduce gradients over ICI — same pattern as the
LM trainer (train/trainer.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from neutts_tpu.config import CodecConfig
from neutts_tpu.models import codec as cd


@dataclasses.dataclass(frozen=True)
class CodecTrainConfig:
    learning_rate: float = 2e-4
    max_steps: int = 100_000
    warmup_steps: int = 500
    b1: float = 0.8
    b2: float = 0.99
    grad_clip: float = 1.0
    # multi-resolution STFT scales on the 24 kHz output: (n_fft, hop)
    stft_scales: Tuple[Tuple[int, int], ...] = ((512, 128), (1024, 256), (2048, 480))
    l1_weight: float = 1.0
    stft_weight: float = 1.0
    seed: int = 1337


class CodecTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(tc: CodecTrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.learning_rate,
        warmup_steps=max(tc.warmup_steps, 1),
        decay_steps=tc.max_steps,
    )
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(schedule, b1=tc.b1, b2=tc.b2),
    )


def init_state(cfg: CodecConfig, tc: CodecTrainConfig, key: jax.Array) -> CodecTrainState:
    params = cd.init_params(cfg, key)
    return CodecTrainState(
        params, make_optimizer(tc).init(params), jnp.zeros((), jnp.int32)
    )


def stft_mag(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """|STFT| of [B, T] with a periodic Hann window, center padding."""
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = xp[:, idx]  # [B, F, n_fft]
    win = cd.hann_window(n_fft)
    return jnp.abs(jnp.fft.rfft(frames * win, axis=-1))


def multiscale_stft_loss(
    y: jax.Array, y_hat: jax.Array, scales: Tuple[Tuple[int, int], ...]
) -> jax.Array:
    """Spectral convergence + log-magnitude L1, averaged over scales."""
    total = jnp.zeros(())
    for n_fft, hop in scales:
        m = stft_mag(y, n_fft, hop)
        mh = stft_mag(y_hat, n_fft, hop)
        sc = jnp.linalg.norm(m - mh) / jnp.maximum(jnp.linalg.norm(m), 1e-6)
        logmag = jnp.mean(jnp.abs(jnp.log(m + 1e-5) - jnp.log(mh + 1e-5)))
        total = total + sc + logmag
    return total / len(scales)


def reconstruct(cfg: CodecConfig, params, wav16: jax.Array) -> jax.Array:
    """Training forward: 16 kHz in -> straight-through FSQ -> 24 kHz out."""
    z = cd.encode_latent(cfg, params, wav16)
    zq = cd.fsq_straight_through(z, cfg.fsq_levels)
    return cd.decode_from_latent(cfg, params, zq)


def loss_fn(cfg: CodecConfig, tc: CodecTrainConfig, params, wav16, wav24):
    """wav16: [B, T16] (T16 a multiple of 320); wav24: [B, T16/320*480]."""
    y_hat = reconstruct(cfg, params, wav16)
    assert y_hat.shape == wav24.shape, (y_hat.shape, wav24.shape)
    l1 = jnp.mean(jnp.abs(y_hat - wav24))
    stft = multiscale_stft_loss(wav24, y_hat, tc.stft_scales)
    loss = tc.l1_weight * l1 + tc.stft_weight * stft
    return loss, {"loss": loss, "l1": l1, "stft": stft}


def train_step(cfg: CodecConfig, tc: CodecTrainConfig, state, wav16, wav24):
    grads, metrics = jax.grad(
        lambda p: loss_fn(cfg, tc, p, wav16, wav24), has_aux=True
    )(state.params)
    updates, opt_state = make_optimizer(tc).update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    return CodecTrainState(params, opt_state, state.step + 1), metrics


def make_train_step(cfg: CodecConfig, tc: CodecTrainConfig, mesh=None):
    """Jitted (optionally dp-sharded) codec train step."""
    if mesh is None:
        return jax.jit(lambda s, a, b: train_step(cfg, tc, s, a, b))

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def step(state, wav16, wav24):
        wav16 = jax.lax.with_sharding_constraint(wav16, data)
        wav24 = jax.lax.with_sharding_constraint(wav24, data)
        new_state, metrics = train_step(cfg, tc, state, wav16, wav24)
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, repl), new_state
        ), metrics

    return step
