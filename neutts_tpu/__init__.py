"""neutts-tpu: a TPU-native text-to-speech framework with instant voice
cloning — the capabilities of neuphonic/neutts-air, re-designed for
JAX/XLA/Pallas on TPU.

Public surface (mirrors the reference's L5 API, SURVEY.md §1, plus the
batched/serving capabilities the reference delegates to vLLM):

    from neutts_tpu import NeuTTS
    tts = NeuTTS.from_checkpoint("/path/to/converted")   # or initialize_random
    codes = tts.encode_reference("speaker.wav")
    wav = tts.infer("Hello world.", codes, "reference transcript")
    for chunk in tts.infer_stream(...): ...

`NeuTTSAir` is a back-compat alias, mirroring the reference's `neuttsair`
package (reference neuttsair/neutts.py:4-11).
"""

from neutts_tpu import config
from neutts_tpu.pipeline import NeuTTS


class NeuTTSAir(NeuTTS):
    """Back-compat alias (reference neuttsair/neutts.py:4-11)."""


__all__ = ["NeuTTS", "NeuTTSAir", "config"]
__version__ = "0.1.0"
