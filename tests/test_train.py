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


def test_codec_recon_training_loss_decreases():
    """The from-scratch codec must be TRAINABLE (VERDICT r1 #6): a few
    reconstruction steps on synthetic audio must reduce the loss through the
    straight-through FSQ."""
    import numpy as np

    from neutts_tpu import config
    from neutts_tpu.train import codec_trainer as ct

    cfg = config.CODEC_TINY
    tc = ct.CodecTrainConfig(learning_rate=1e-3, max_steps=60, warmup_steps=2)
    state = ct.init_state(cfg, tc, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B, F = 2, 10  # 10 frames: 3200 samples @16k -> 4800 @24k
    t16 = np.linspace(0, F * 320 / 16_000, F * 320, endpoint=False)
    t24 = np.linspace(0, F * 480 / 24_000, F * 480, endpoint=False)
    freqs = rng.uniform(200, 800, size=(B, 1))
    wav16 = jnp.asarray(0.5 * np.sin(2 * np.pi * freqs * t16), jnp.float32)
    wav24 = jnp.asarray(0.5 * np.sin(2 * np.pi * freqs * t24), jnp.float32)

    step = ct.make_train_step(cfg, tc)
    losses = []
    for _ in range(40):
        state, metrics = step(state, wav16, wav24)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.85, (losses[0], losses[-1])


def test_codec_recon_training_sharded_matches_single():
    """dp-sharded codec train step: loss equal to the single-device step."""
    import numpy as np

    from neutts_tpu import config
    from neutts_tpu.parallel import mesh as meshlib
    from neutts_tpu.train import codec_trainer as ct

    cfg = config.CODEC_TINY
    tc = ct.CodecTrainConfig(max_steps=10, warmup_steps=1)
    state = ct.init_state(cfg, tc, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    B, F = 4, 6
    wav16 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, F * 320)), jnp.float32)
    wav24 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, F * 480)), jnp.float32)

    _, m_ref = ct.train_step(cfg, tc, state, wav16, wav24)

    mesh = meshlib.make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    step = ct.make_train_step(cfg, tc, mesh)
    _, m_sh = step(state, wav16, wav24)
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )


def test_remat_gradients_match():
    """TrainConfig.remat (r5): jax.checkpoint over the layer scan must not
    change the math — loss and gradients equal the non-remat step."""
    import numpy as np

    from neutts_tpu import config
    from neutts_tpu.train import trainer as tr

    cfg = config.TINY
    key = jax.random.PRNGKey(0)
    tc0 = tr.TrainConfig(max_steps=10)
    tc1 = tr.TrainConfig(max_steps=10, remat=True)
    s0 = tr.init_state(cfg, tc0, key)
    s1 = tr.init_state(cfg, tc1, key)
    B, S = 2, 16
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, 300, (B, S)), jnp.int32)
    labels = jnp.where(jnp.arange(S)[None, :] >= 4, toks, tr.IGNORE_INDEX)
    maskv = jnp.ones((B, S), bool)
    s0n, m0 = tr.train_step(cfg, tc0, s0, toks, labels, maskv)
    s1n, m1 = tr.train_step(cfg, tc1, s1, toks, labels, maskv)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)
    a = jax.tree_util.tree_leaves(s0n.params)
    b = jax.tree_util.tree_leaves(s1n.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=1e-6)
