"""Parity gates against real NeuTTS checkpoints (weights-gated).

BASELINE.md's correctness target is bit-exact codec tokens (greedy decode)
and waveform allclose vs the PyTorch reference on the samples/dave.wav and
samples/jo.wav cloning prompts. Real weights cannot be downloaded in this
offline environment, so these tests activate when converted checkpoints are
present, and the always-on tests below pin everything that can be pinned
without weights:

  * prompt ids are layout-exact (tests/test_text.py::test_prompt_layout);
  * converted-weights forward == HF transformers forward, argmax-exact
    (tests/test_convert.py::test_hf_forward_matches_torch);
  * greedy decode is deterministic and batching-invariant
    (tests/test_backbone.py, tests/test_serving.py);
  * the shipped sample artifacts' invariants hold end-to-end (here).

To run the full gate with weights:
    1. convert:  python -m neutts_tpu.models.convert_cli --hf <air_dir> --out ckpt/air
       (or convert.from_gguf for the GGUF releases)
    2. env:      export NEUTTS_TPU_CKPT=ckpt/air
    3. pytest tests/test_parity.py -v
"""

import os
from pathlib import Path

import numpy as np
import pytest

CKPT = os.environ.get("NEUTTS_TPU_CKPT")

needs_weights = pytest.mark.skipif(
    not (CKPT and Path(CKPT).exists()),
    reason="set NEUTTS_TPU_CKPT to a converted checkpoint dir",
)


def _load_sample(name):
    import torch

    codes = torch.load(
        f"/root/reference/samples/{name}.pt", map_location="cpu", weights_only=True
    ).numpy()
    text = Path(f"/root/reference/samples/{name}.txt").read_text().strip()
    return codes, text


# --- always-on invariants (no weights needed) --------------------------------


@pytest.mark.parametrize("name,n_codes", [("dave", 372), ("jo", 653)])
def test_sample_artifacts_invariants(name, n_codes):
    """The shipped reference artifacts match SURVEY.md §0's pinned numbers."""
    codes, text = _load_sample(name)
    assert codes.shape == (n_codes,)
    assert codes.dtype == np.int32
    assert 0 <= codes.min() and codes.max() < 65_536
    assert text


def test_prompt_token_budget():
    """dave + a typical sentence fits the 2048 window with generation room."""
    from neutts_tpu import config
    from neutts_tpu.text.g2p import RuleG2P
    from neutts_tpu.text.tokenizer import ByteTokenizer
    from neutts_tpu.text.prompt import build_prompt_ids

    codes, text = _load_sample("dave")
    tok = ByteTokenizer(config.DEFAULT_LAYOUT)
    ids = build_prompt_ids(tok, RuleG2P(), list(codes), text, "Hello world, nice day.")
    assert len(ids) < 2048 - 500  # room for ~10s of generated audio


# --- weights-gated gates ------------------------------------------------------


@needs_weights
@pytest.mark.parametrize("name", ["dave", "jo"])
def test_greedy_codes_bit_exact_vs_torch(name):
    """Greedy codec-token parity vs HF transformers on the same prompt."""
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    import jax.numpy as jnp
    from neutts_tpu import config
    from neutts_tpu.models import checkpoint as ckpt
    from neutts_tpu.runtime import decode as dec
    from neutts_tpu.text.tokenizer import HFTokenizer

    hf_dir = os.environ.get("NEUTTS_TPU_HF_DIR")
    if not hf_dir:
        pytest.skip("set NEUTTS_TPU_HF_DIR to the original HF checkpoint")

    cfg, params, _, _ = ckpt.load_pipeline(CKPT)
    tokenizer = HFTokenizer(hf_dir)
    codes, text = _load_sample(name)

    from neutts_tpu.text.g2p import get_g2p
    from neutts_tpu.text.prompt import build_prompt_ids

    g2p = get_g2p(prefer="espeak")  # espeak required for prompt parity
    ids = build_prompt_ids(tokenizer, g2p, list(codes), text, "Hello world.")

    # ours: greedy
    scfg = config.SamplingConfig(greedy=True, min_new_tokens=50)
    toks, lens = dec.pad_prompts([ids], pad_id=tokenizer.pad_id)
    import jax

    res = dec.generate(
        cfg, scfg, tokenizer.layout.speech_gen_end, 1024, params, toks, lens,
        jax.random.PRNGKey(0),
    )
    ours = dec.extract(res, 0, tokenizer.layout.speech_gen_end)

    # torch: greedy
    model = AutoModelForCausalLM.from_pretrained(hf_dir)
    with torch.no_grad():
        out = model.generate(
            torch.tensor([ids]),
            max_length=2048,
            do_sample=False,
            min_new_tokens=50,
            eos_token_id=tokenizer.layout.speech_gen_end,
        )
    theirs = out[0, len(ids):].tolist()
    if theirs and theirs[-1] == tokenizer.layout.speech_gen_end:
        theirs = theirs[:-1]
    assert ours == theirs


CODEC_SRC = os.environ.get("NEUTTS_TPU_CODEC_SRC")


@pytest.mark.skipif(
    not (CODEC_SRC and Path(CODEC_SRC).exists()),
    reason="set NEUTTS_TPU_CODEC_SRC to a real neucodec artifact "
    "(.pt/.safetensors state dict or the shipped .onnx decoder)",
)
def test_converted_real_codec_decodes_samples():
    """End-to-end artifact gate: ingest a REAL codec artifact with
    models/convert_codec.py (shape-driven architecture recovery) and decode
    the shipped dave codes. With NEUTTS_TPU_GOLDEN_WAV set (a .npy of the
    torch reference's decode_code output for dave.pt), asserts waveform
    allclose — the BASELINE.md north-star gate."""
    import jax.numpy as jnp

    from neutts_tpu.models import codec as cd
    from neutts_tpu.models.convert_codec import convert_codec

    cfg, params = convert_codec(CODEC_SRC)
    assert cfg.codebook_size == 65_536
    assert cfg.hop_out == 480
    codes, _ = _load_sample("dave")
    wav = np.asarray(cd.decode(cfg, params, jnp.asarray(codes)[None])[0])
    assert wav.shape == (372 * 480,)
    assert np.isfinite(wav).all()
    golden = os.environ.get("NEUTTS_TPU_GOLDEN_WAV")
    if golden:
        want = np.load(golden)
        assert wav.shape == want.shape
        np.testing.assert_allclose(wav, want, atol=1e-3)


@needs_weights
def test_waveform_allclose_vs_reference_decode():
    """Codec decode of the shipped sample codes vs torch NeuCodec output.

    Requires NEUTTS_TPU_GOLDEN_WAV pointing at a .npy of the reference
    decoder's output for samples/dave.pt (generated once with the torch
    neucodec package)."""
    golden = os.environ.get("NEUTTS_TPU_GOLDEN_WAV")
    if not golden:
        pytest.skip("set NEUTTS_TPU_GOLDEN_WAV")
    import jax.numpy as jnp

    from neutts_tpu.models import checkpoint as ckpt
    from neutts_tpu.models import codec as cd

    _, _, ccfg, cparams = ckpt.load_pipeline(CKPT)
    codes, _ = _load_sample("dave")
    wav = np.asarray(cd.decode(ccfg, cparams, jnp.asarray(codes)[None])[0])
    want = np.load(golden)
    assert wav.shape == want.shape
    np.testing.assert_allclose(wav, want, atol=1e-3)
