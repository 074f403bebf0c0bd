"""Trainer extras: loss decreases on a learnable task, checkpoint resume."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutts_tpu import config
from neutts_tpu.text.g2p import RuleG2P
from neutts_tpu.text.tokenizer import ByteTokenizer
from neutts_tpu.train import data as data_lib
from neutts_tpu.train import trainer

CFG = config.TINY


def _batch(seed=0, B=8, S=96):
    """Repetitive learnable data: fixed code pattern per text."""
    tok = ByteTokenizer(CFG.layout)
    g2p = RuleG2P()
    recs = [
        {"text": "Hello world.", "codes": [7, 9, 11] * 5},
        {"text": "Nice day.", "codes": [3, 5] * 6},
    ] * (B // 2)
    return next(data_lib.batches(recs, tok, g2p, B, S, apply_filter=False))


def test_loss_decreases():
    tc = trainer.TrainConfig(learning_rate=3e-3, max_steps=40, warmup_ratio=0.1)
    state = trainer.init_state(CFG, tc, jax.random.PRNGKey(0))
    b = _batch()
    args = (jnp.asarray(b["tokens"]), jnp.asarray(b["labels"]), jnp.asarray(b["attn_mask"]))
    first = None
    for i in range(30):
        state, m = trainer.train_step(CFG, tc, state, *args)
        if i == 0:
            first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.7, (first, last)


def test_checkpoint_resume(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    tc = trainer.TrainConfig(max_steps=10)
    state = trainer.init_state(CFG, tc, jax.random.PRNGKey(1))
    b = _batch(1)
    args = (jnp.asarray(b["tokens"]), jnp.asarray(b["labels"]), jnp.asarray(b["attn_mask"]))
    state, _ = trainer.train_step(CFG, tc, state, *args)
    state, _ = trainer.train_step(CFG, tc, state, *args)

    trainer.save_train_state(tmp_path / "ck", state)
    restored = trainer.load_train_state(tmp_path / "ck", CFG, tc)
    assert int(restored.step) == int(state.step) == 2
    np.testing.assert_allclose(
        np.asarray(restored.params["layers"]["wq"], np.float32),
        np.asarray(state.params["layers"]["wq"], np.float32),
    )
    # resumed state continues training identically to the original
    s1, m1 = trainer.train_step(CFG, tc, state, *args)
    s2, m2 = trainer.train_step(CFG, tc, restored, *args)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
