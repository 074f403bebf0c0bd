"""Serving engines: single-chip continuous batching + multi-chip replicas."""

from neutts_tpu.serving.engine import Engine
from neutts_tpu.serving.multichip import MultiChipEngine

__all__ = ["Engine", "MultiChipEngine"]
