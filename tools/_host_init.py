"""Host-side (CPU-subprocess) parameter initialization for TPU tools.

In a TPU-attached process under a remote-compile tunnel, EVERY eager op pays
a compile round-trip (~seconds). `codec.init_params` builds ~200 small
tensors eagerly, which turns "initialize a random codec" into many minutes —
and jitting the whole init exceeds the compile server's request-size cap
(HTTP 413). The robust route: run the init in a CPU-only subprocess
(sitecustomize skips TPU registration when PALLAS_AXON_POOL_IPS is absent),
serialize with models/checkpoint.py, and load as numpy in the parent, which
then does ONE device_put.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from neutts_tpu import config as cfglib
from neutts_tpu.models import codec as cd
from neutts_tpu.models import checkpoint as ckpt
cc = json.loads({cfg_json!r})
if isinstance(cc.get("semantic"), dict):
    cc["semantic"] = cfglib.SemanticConfig(**cc["semantic"])
for k in ("fsq_levels", "enc_strides", "enc_channels"):
    cc[k] = tuple(cc[k])
cfg = cfglib.CodecConfig(**cc)
params = cd.init_params(cfg, jax.random.PRNGKey({seed}))
ckpt.save_params({out!r}, params)
"""


def init_codec_params(cfg, seed: int = 0):
    """Random codec params for `cfg`, initialized CPU-side; cached on disk
    keyed by (cfg, seed). Returns a numpy pytree (device_put as needed)."""
    cfg_json = json.dumps(dataclasses.asdict(cfg), sort_keys=True)
    digest = hashlib.sha1(f"{cfg_json}|{seed}".encode()).hexdigest()[:16]
    out = Path(tempfile.gettempdir()) / f"neutts_codec_init_{digest}.npz"
    if not out.exists():
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        script = _SCRIPT.format(repo=_REPO, cfg_json=cfg_json, seed=seed,
                                out=str(out))
        subprocess.run([sys.executable, "-c", script], env=env, check=True,
                       timeout=600)
    sys.path.insert(0, _REPO)
    from neutts_tpu.models import checkpoint as ckpt

    return ckpt.load_params(out)
