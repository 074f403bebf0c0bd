"""Real-layout acoustic encoder conversion oracle.

The real NeuCodec checkpoint carries its acoustic encoder under
`CodecEnc.*` (XCodec2/DAC conv stack) and its semantic projection under
`SemanticEncoder_module.*` (conv stack) — layouts the r3 converter refused.
These tests build torch modules in exactly that key layout (weight-normed
convs, BigVGAN alias-free snake activations with stored filter buffers,
EnCodec SLSTM) and pin models/codecenc.py + convert_codec._map_codecenc
against the torch forward, so a real artifact converts to a FULL encoder
with `encode_reference` parity structurally reachable
(reference neutts/neutts.py:266-271, its encode_code at :270).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from neutts_tpu import config
from neutts_tpu.models import codec as cd
from neutts_tpu.models import codecenc as ce
from neutts_tpu.models import convert_codec as cc


# --- torch oracle: BigVGAN alias-free snake ----------------------------------


def kaiser_sinc_filter1d_t(cutoff, half_width, kernel_size):
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    if even:
        time = torch.arange(-half_size, half_size) + 0.5
    else:
        time = torch.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.view(1, 1, kernel_size)


class UpSample1d(nn.Module):
    def __init__(self, ratio=2, kernel_size=12):
        super().__init__()
        self.ratio = ratio
        self.kernel_size = kernel_size
        self.stride = ratio
        self.pad = kernel_size // ratio - 1
        self.pad_left = self.pad * self.stride + (kernel_size - self.stride) // 2
        self.pad_right = (
            self.pad * self.stride + (kernel_size - self.stride + 1) // 2
        )
        self.register_buffer(
            "filter", kaiser_sinc_filter1d_t(0.5 / ratio, 0.6 / ratio, kernel_size)
        )

    def forward(self, x):
        C = x.shape[1]
        x = F.pad(x, (self.pad, self.pad), mode="replicate")
        x = self.ratio * F.conv_transpose1d(
            x, self.filter.expand(C, -1, -1), stride=self.stride, groups=C
        )
        return x[..., self.pad_left : -self.pad_right]


class LowPassFilter1d(nn.Module):
    def __init__(self, cutoff, half_width, stride=1, kernel_size=12):
        super().__init__()
        even = kernel_size % 2 == 0
        self.pad_left = kernel_size // 2 - int(even)
        self.pad_right = kernel_size // 2
        self.stride = stride
        self.register_buffer(
            "filter", kaiser_sinc_filter1d_t(cutoff, half_width, kernel_size)
        )

    def forward(self, x):
        C = x.shape[1]
        x = F.pad(x, (self.pad_left, self.pad_right), mode="replicate")
        return F.conv1d(
            x, self.filter.expand(C, -1, -1), stride=self.stride, groups=C
        )


class DownSample1d(nn.Module):
    def __init__(self, ratio=2, kernel_size=12):
        super().__init__()
        self.lowpass = LowPassFilter1d(
            0.5 / ratio, 0.6 / ratio, stride=ratio, kernel_size=kernel_size
        )

    def forward(self, x):
        return self.lowpass(x)


class SnakeBeta(nn.Module):
    def __init__(self, dim, alpha_logscale=True):
        super().__init__()
        self.alpha_logscale = alpha_logscale
        init = torch.zeros(dim) if alpha_logscale else torch.ones(dim)
        self.alpha = nn.Parameter(init.clone())
        self.beta = nn.Parameter(init.clone())

    def forward(self, x):
        a = self.alpha.view(1, -1, 1)
        b = self.beta.view(1, -1, 1)
        if self.alpha_logscale:
            a, b = torch.exp(a), torch.exp(b)
        return x + torch.sin(a * x) ** 2 / (b + 1e-9)


class Snake1d(nn.Module):
    """DAC plain snake: alpha only, linear scale, [1, C, 1] param."""

    def __init__(self, dim):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, dim, 1))

    def forward(self, x):
        return x + torch.sin(self.alpha * x) ** 2 / (self.alpha + 1e-9)


class Activation1d(nn.Module):
    def __init__(self, activation):
        super().__init__()
        self.act = activation
        self.upsample = UpSample1d(2, 12)
        self.downsample = DownSample1d(2, 12)

    def forward(self, x):
        return self.downsample(self.act(self.upsample(x)))


def WNConv1d(*a, **kw):
    return torch.nn.utils.weight_norm(nn.Conv1d(*a, **kw))


def _mk_act(dim, alias_free):
    if alias_free:
        return Activation1d(SnakeBeta(dim, alpha_logscale=True))
    return Snake1d(dim)


class ResidualUnit(nn.Module):
    def __init__(self, dim, dilation, alias_free):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            _mk_act(dim, alias_free),
            WNConv1d(dim, dim, 7, dilation=dilation, padding=pad),
            _mk_act(dim, alias_free),
            WNConv1d(dim, dim, 1),
        )

    def forward(self, x):
        return x + self.block(x)


class EncoderBlock(nn.Module):
    def __init__(self, dim, stride, dilations, alias_free):
        super().__init__()
        self.block = nn.Sequential(
            *[ResidualUnit(dim // 2, d, alias_free) for d in dilations],
            _mk_act(dim // 2, alias_free),
            WNConv1d(
                dim // 2, dim, 2 * stride, stride=stride,
                padding=math.ceil(stride / 2),
            ),
        )

    def forward(self, x):
        return self.block(x)


class SLSTM(nn.Module):
    def __init__(self, dim, num_layers=2):
        super().__init__()
        self.lstm = nn.LSTM(dim, dim, num_layers)

    def forward(self, x):
        y = x.permute(2, 0, 1)
        y, _ = self.lstm(y)
        return y.permute(1, 2, 0) + x


class TorchCodecEncoder(nn.Module):
    """The real `CodecEnc` layout: Sequential named `block`."""

    def __init__(self, ngf=4, up_ratios=(2, 4, 5), dilations=(1, 3),
                 out_channels=12, rnn_layers=2, alias_free=True):
        super().__init__()
        d = ngf
        mods = [WNConv1d(1, d, 7, padding=3)]
        for s in up_ratios:
            d *= 2
            mods.append(EncoderBlock(d, s, dilations, alias_free))
        if rnn_layers:
            mods.append(SLSTM(d, rnn_layers))
        mods += [_mk_act(d, alias_free), WNConv1d(d, out_channels, 3, padding=1)]
        self.block = nn.Sequential(*mods)

    def forward(self, x):
        return self.block(x)


class TorchSemanticEncoder(nn.Module):
    """The real conv `SemanticEncoder_module` layout."""

    def __init__(self, in_ch, code_dim, hidden, k=3):
        super().__init__()
        pad = (k - 1) // 2
        self.initial_conv = nn.Conv1d(in_ch, hidden, k, padding=pad, bias=False)
        self.residual_blocks = nn.Sequential(
            nn.ReLU(inplace=True),
            nn.Conv1d(hidden, hidden, k, padding=pad),
            nn.ReLU(inplace=True),
            nn.Conv1d(hidden, hidden, k, padding=pad),
        )
        self.final_conv = nn.Conv1d(hidden, code_dim, k, padding=pad, bias=False)

    def forward(self, x):
        x = self.initial_conv(x)
        x = self.residual_blocks(x) + x
        return self.final_conv(x)


# --- component parity ---------------------------------------------------------


def test_alias_free_resampling_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 40, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 2, 1))
    up = np.asarray(ce.upsample2(jnp.asarray(x)))
    want_up = UpSample1d(2, 12)(xt).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(up, want_up, atol=1e-6)
    down = np.asarray(ce.downsample2(jnp.asarray(up)))
    want_down = DownSample1d(2, 12)(torch.from_numpy(want_up.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        down, want_down.numpy().transpose(0, 2, 1), atol=1e-6
    )


def test_slstm_matches_torch():
    torch.manual_seed(1)
    m = SLSTM(6, 2).eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9, 6)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    layers = []
    sd = m.state_dict()
    for li in range(2):
        layers.append({
            "w_ih": jnp.asarray(sd[f"lstm.weight_ih_l{li}"].numpy()),
            "w_hh": jnp.asarray(sd[f"lstm.weight_hh_l{li}"].numpy()),
            "b_ih": jnp.asarray(sd[f"lstm.bias_ih_l{li}"].numpy()),
            "b_hh": jnp.asarray(sd[f"lstm.bias_hh_l{li}"].numpy()),
        })
    got = np.asarray(ce.slstm(layers, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("alias_free", [True, False])
def test_codecenc_forward_matches_torch(alias_free):
    """Shape-driven `CodecEnc.*` conversion + JAX forward == torch forward.
    alias_free=True is the BigVGAN SnakeBeta wrapper (with stored filter
    buffers the converter must verify); False is the plain DAC Snake1d."""
    torch.manual_seed(2)
    m = TorchCodecEncoder(alias_free=alias_free).eval()
    # perturb snake params away from init so the activation is exercised
    with torch.no_grad():
        for name, p in m.named_parameters():
            if name.endswith(("alpha", "beta")):
                p.add_(0.3 * torch.randn_like(p))
    sd = {f"CodecEnc.{k}": v.numpy() for k, v in m.state_dict().items()}
    ck, params = cc._map_codecenc(sd)
    assert ck["ngf"] == 4 and ck["up_ratios"] == (2, 4, 5)
    assert ck["dilations"] == (1, 3) and ck["out_channels"] == 12
    assert ck["rnn_layers"] == 2 and ck["alias_free"] is alias_free
    assert ck["snake_logscale"] is alias_free  # SnakeBeta vs plain Snake1d
    cfg = config.CodecEncConfig(**ck)
    assert cfg.hop == 40

    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((2, 400)) * 0.3).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(wav[:, None, :])).numpy().transpose(0, 2, 1)
    got = np.asarray(ce.forward(cfg, params, jnp.asarray(wav)))
    assert got.shape == (2, 10, 12)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_semantic_encoder_conv_matches_torch():
    torch.manual_seed(3)
    m = TorchSemanticEncoder(10, 14, 8).eval()
    sd = {f"SemanticEncoder_module.{k}": v.numpy()
          for k, v in m.state_dict().items()}
    code_dim, params = cc._map_semantic_encoder_conv(sd)
    assert code_dim == 14
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 9, 10)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    got = np.asarray(ce.semantic_encoder(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_bad_filter_buffer_refused():
    """An anti-aliasing filter that differs from the kaiser-sinc
    recomputation signals an unknown resampling variant -> loud refusal."""
    torch.manual_seed(4)
    m = TorchCodecEncoder(alias_free=True).eval()
    sd = {f"CodecEnc.{k}": v.numpy().copy() for k, v in m.state_dict().items()}
    bad = next(k for k in sd if k.endswith("upsample.filter"))
    sd[bad] = sd[bad] + 0.05
    with pytest.raises(ValueError, match="anti-aliasing filter"):
        cc._map_codecenc(sd)


# --- full real-layout state dict ---------------------------------------------


def test_real_layout_full_state_dict_converts(tmp_path):
    """A state dict in the REAL key layout (`CodecEnc.*`,
    `SemanticEncoder_module.*`, `semantic_model.*`, `fc_prior.*`,
    `fc_post_s.*`, quantizer project_in + decoder) converts to a FULL codec
    whose encode_latent matches the torch composition: the r3 refusing
    branch is no longer reachable for real layouts."""
    from test_convert_codec import H, TorchCodecModel
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    scfg_hf = Wav2Vec2BertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, feature_projection_input_dim=12,
        conv_depthwise_kernel_size=7, left_max_position_embeddings=64,
        right_max_position_embeddings=8, hidden_dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, feat_proj_dropout=0.0,
        conformer_conv_dropout=0.0, apply_spec_augment=False,
    )
    torch.manual_seed(5)
    tower = Wav2Vec2BertModel(scfg_hf).eval()
    sem_enc = TorchSemanticEncoder(32, 24, 16).eval()
    # acoustic CodecEnc at hop 40 (=> "16 kHz"/40 framing in this toy)
    acoustic = TorchCodecEncoder(
        ngf=4, up_ratios=(2, 4, 5), dilations=(1, 3), out_channels=24,
        rnn_layers=1, alias_free=True,
    ).eval()
    VQ = 16
    fc_prior = nn.Linear(24 + 24, VQ)
    fc_post_s = nn.Linear(VQ, 32)  # training-side head: must be IGNORED
    project_in = nn.Linear(VQ, 8)

    dec = TorchCodecModel(rope=True, convnext=False).eval()
    sd = {k: v for k, v in dec.state_dict().items()}
    sd.update({f"semantic_model.{k}": v for k, v in tower.state_dict().items()})
    sd.update({f"SemanticEncoder_module.{k}": v
               for k, v in sem_enc.state_dict().items()})
    sd.update({f"CodecEnc.{k}": v for k, v in acoustic.state_dict().items()})
    sd.update({f"fc_prior.{k}": v for k, v in fc_prior.state_dict().items()})
    sd.update({f"fc_post_s.{k}": v for k, v in fc_post_s.state_dict().items()})
    sd.update({f"generator.quantizer.layers.0.project_in.{k}": v
               for k, v in project_in.state_dict().items()})
    path = tmp_path / "real_layout.pt"
    torch.save(sd, path)

    cfg, params = cc.convert_codec(path, heads=H, semantic_output_layer=2)
    assert params["enc"] is not None
    assert cfg.enc_family == "codecenc" and cfg.sem_encoder == "conv"
    assert cfg.codecenc.up_ratios == (2, 4, 5) and cfg.codecenc.rnn_layers == 1
    assert cfg.sem_proj_dim == 24 and cfg.hop_in == 40

    rng = np.random.default_rng(5)
    wav = (rng.standard_normal(400) * 0.2).astype(np.float32)
    T50 = 400 // 40
    sem_feats = rng.standard_normal((1, T50, 12)).astype(np.float32)

    got = np.asarray(cd.encode_latent(
        cfg, params, jnp.asarray(wav)[None], sem_feats=jnp.asarray(sem_feats)
    ))

    with torch.no_grad():
        ac = acoustic(torch.from_numpy(wav[None, None, :])).transpose(1, 2)
        sem = tower(input_features=torch.from_numpy(sem_feats),
                    output_hidden_states=True).hidden_states[2]
        sem = sem_enc(sem.transpose(1, 2)).transpose(1, 2)
        n = min(ac.shape[1], sem.shape[1])
        # upstream order: cat([semantic_encoded, vq_emb])
        feats = torch.cat([sem[:, :n], ac[:, :n]], dim=-1)
        want = project_in(fc_prior(feats)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    # npz round trip preserves the nested codecenc tree
    from neutts_tpu.models import checkpoint as ckpt

    cc.save_converted(tmp_path / "out", cfg, params)
    re = ckpt.load_params(tmp_path / "out" / "codec.npz")
    got2 = np.asarray(cd.encode_latent(
        cfg, {"enc": re["enc"], "dec": re["dec"]},
        jnp.asarray(wav)[None], sem_feats=jnp.asarray(sem_feats),
    ))
    np.testing.assert_array_equal(got, got2)


def test_codecenc_family_is_trainable():
    """The converted real-encoder family must also be trainable from
    scratch (codec_trainer path): init_params covers it and gradients flow
    through the full encode_latent (conv stack, snake, alias-free
    resampling, LSTM scan)."""
    import jax
    import jax.numpy as jnp

    from neutts_tpu import config as cfglib

    cfg = cfglib.CODEC_TINY.scaled(
        enc_family="codecenc",
        codecenc=config.CodecEncConfig(
            ngf=4, up_ratios=(2, 4, 5), dilations=(1, 3),
            out_channels=16, rnn_layers=1,
        ),
    )
    params = cd.init_params(cfg, jax.random.PRNGKey(0))
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 400)), jnp.float32
    ) * 0.1

    def loss(p):
        z = cd.encode_latent(cfg, p, wav)
        return jnp.mean(jnp.square(z))

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads["enc"]["acoustic"])
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the stem must receive signal (the whole chain is connected)
    assert float(jnp.abs(grads["enc"]["acoustic"]["stem_w"]).max()) > 0
