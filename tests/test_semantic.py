"""Semantic tower oracle: our JAX Conformer == transformers Wav2Vec2BertModel
on the same weights (the w2v-BERT branch the real NeuCodec encoder needs —
r2 VERDICT missing #2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from neutts_tpu.models import semantic


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    cfg = Wav2Vec2BertConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        feature_projection_input_dim=16,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8,
        right_max_position_embeddings=4,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        conformer_conv_dropout=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    m = Wav2Vec2BertModel(cfg)
    m.eval()
    return m


def _state_numpy(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_forward_matches_hf(hf_model):
    cfg, params = semantic.from_hf_state_dict(
        _state_numpy(hf_model), left_max=8, right_max=4
    )
    assert cfg.hidden == 64 and cfg.n_layers == 3 and cfg.n_heads == 4
    assert cfg.conv_kernel == 7
    assert (cfg.left_max, cfg.right_max) == (8, 4)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 24, 16)).astype(np.float32)
    with torch.no_grad():
        out = hf_model(
            input_features=torch.from_numpy(feats), output_hidden_states=True
        )
    # final layer output
    got = np.asarray(semantic.forward(
        type(cfg)(**{**cfg.__dict__, "output_layer": cfg.n_layers}),
        params, jnp.asarray(feats)))
    np.testing.assert_allclose(got, out.last_hidden_state.numpy(),
                               atol=2e-5, rtol=1e-4)
    # intermediate tap (the XCodec2 layer-16 analogue): hidden_states[k] is
    # the output of layer k (index 0 = pre-layers projection)
    got2 = np.asarray(semantic.forward(
        type(cfg)(**{**cfg.__dict__, "output_layer": 2}),
        params, jnp.asarray(feats)))
    np.testing.assert_allclose(got2, out.hidden_states[2].numpy(),
                               atol=2e-5, rtol=1e-4)


def test_tower_runs_with_random_init():
    cfg = semantic.SemanticConfig(
        input_dim=16, hidden=32, n_layers=2, n_heads=2, intermediate=64,
        conv_kernel=5, left_max=4, right_max=2, output_layer=2,
    )
    params = semantic.init_params(cfg, jax.random.PRNGKey(0))
    out = semantic.forward(cfg, params, jnp.zeros((1, 10, 16)))
    assert out.shape == (1, 10, 32)
    assert np.isfinite(np.asarray(out)).all()
