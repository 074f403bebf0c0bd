"""The example CLIs must run out-of-the-box against the bundled samples/
fixtures (reference parity: examples consume samples/dave.* the same way —
r2 VERDICT missing #4 / next-round #9)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


def _cpu_env():
    env = dict(os.environ)
    # the sitecustomize hook registers the tunneled TPU backend unless the
    # pool var is absent; examples must not steal the chip from real work
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.parametrize(
    "argv",
    [
        ["examples/basic_example.py", "--synthetic",
         "--input_text", "Bundled sample smoke test.",
         "--ref_audio", "samples/demo.wav",
         "--ref_text", "samples/demo.txt"],
        ["examples/decoder_only_example.py", "--synthetic",
         "--input_text", "Pre-encoded codes smoke test.",
         "--ref_codes", "samples/demo_codes.npy",
         "--ref_text", "samples/demo.txt"],
    ],
    ids=["basic", "decoder_only"],
)
def test_example_runs_with_bundled_samples(tmp_path, argv):
    out = tmp_path / "out.wav"
    cmd = [sys.executable, *argv, "--output_path", str(out)]
    r = subprocess.run(
        cmd, cwd=ROOT, env=_cpu_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert out.exists()
    from neutts_tpu.audio import io as audio_io

    wav, sr = audio_io.read_wav(out)
    assert sr == 24_000
    assert wav.size > 0 and np.isfinite(wav).all()


def test_verify_real_artifacts_dry_run(tmp_path):
    """The one-command real-artifact verification runner (r4 VERDICT #7)
    must pass its dry run end-to-end: synthetic HF checkpoint -> convert ->
    HF forward/greedy parity -> codec decode -> encode machinery."""
    r = subprocess.run(
        [sys.executable, "tools/verify_real_artifacts.py", "--dry-run",
         "--out", str(tmp_path / "verify")],
        cwd=ROOT, env=_cpu_env(), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "FAIL" not in r.stdout
    for stage_name in ("convert", "hf-forward", "greedy-parity", "waveform",
                       "encode-parity"):
        assert f"[PASS] {stage_name}" in r.stdout, (stage_name, r.stdout[-1500:])
