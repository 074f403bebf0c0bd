"""Observability: timing, throughput meters, and profiler hooks.

The reference has no tracing/profiling at all (SURVEY.md §5: bare prints;
benchmarks run with external harnesses). This module is the framework's own
instrumentation: per-stage walltime, tokens/s and realtime-factor meters, and
a `jax.profiler` trace context for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import numpy as np


def hard_sync(x) -> None:
    """Barrier that works across backends — a host readback of one element.
    (`block_until_ready` is not a reliable barrier over remote-tunnel TPU
    backends.)"""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


@dataclass
class StageTimer:
    """Accumulates walltime per named stage.

    with timer.stage("prefill"): ...
    print(timer.report())
    """

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                hard_sync(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        rows = [
            f"{name}: {tot*1000:.1f} ms total / {self.counts[name]} calls "
            f"({tot*1000/self.counts[name]:.2f} ms avg)"
            for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(rows)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


@dataclass
class ThroughputMeter:
    """Tokens/s and audio realtime-factor accounting for synthesis runs."""

    tokens: int = 0
    audio_samples: int = 0
    seconds: float = 0.0
    sample_rate: int = 24_000
    frame_rate: int = 50  # codec tokens per second of audio

    def add(self, n_tokens: int, n_samples: int, dt: float) -> None:
        self.tokens += n_tokens
        self.audio_samples += n_samples
        self.seconds += dt

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.seconds if self.seconds else 0.0

    @property
    def rtf(self) -> float:
        """Realtime factor: audio-seconds generated per wall-second."""
        audio_s = self.audio_samples / self.sample_rate
        return audio_s / self.seconds if self.seconds else 0.0

    def json_line(self, metric: str, baseline: Optional[float] = None) -> str:
        d = {"metric": metric, "value": round(self.tokens_per_s, 1), "unit": "tok/s"}
        if baseline:
            d["vs_baseline"] = round(self.tokens_per_s / baseline, 3)
        return json.dumps(d)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/neutts_tpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(min_compile_secs: float = 1.0) -> None:
    """Point JAX's persistent compile cache at the REPO-LOCAL `.jax_cache`
    (r2 lesson: a /tmp cache did not survive to the driver's end-of-round
    bench and it paid a 479 s cold compile). One shared definition for
    bench.py and every tools/ script."""
    import pathlib

    import jax

    try:
        cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
        cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        # Keys must be PATH-INDEPENDENT (the r3 driver's 98 s cold prefill:
        # entries produced in one checkout never hit from another). Two
        # distinct leaks, both diagnosed r4:
        #  1. the XLA-caches feature writes the cache dir's ABSOLUTE PATH
        #     into CompileOptions (xla_gpu_per_fusion_autotune_cache_dir),
        #     hashed into every key — disable it (the GPU autotune caches
        #     are dead weight on TPU anyway);
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
        #  2. Pallas kernels serialize their Mosaic module into the
        #     tpu_custom_call payload WITH debug info (source paths), and
        #     the cache key's strip-debuginfo pass cannot reach inside that
        #     opaque (base64) string attribute — so every pallas-containing
        #     program keys on the checkout path. Strip debug info from the
        #     Mosaic module at lowering time instead (cost: Mosaic error
        #     messages lose source locations in cache-enabled processes —
        #     bench/tools; the test suite never calls this).
        import jax._src.tpu_custom_call as _tcc

        if not getattr(_tcc, "_neutts_debuginfo_stripped", False):
            from jax._src.lib.mlir import passmanager as _pm

            _orig_lower = _tcc.lower_module_to_custom_call

            def _lower(*args, **kw):
                # ADVICE r4: the wrapper body runs at LOWERING time, outside
                # the try/except guarding patch installation — an MLIR/JAX
                # API or signature drift here would break every pallas
                # lowering. Accept any calling convention, best-effort strip
                # the debug info, and degrade to the original lowering
                # (cache keys go path-dependent, compiles still succeed)
                # instead of failing the program.
                try:
                    module = kw.get("module")
                    if module is not None:
                        with module.context:
                            _pm.PassManager.parse(
                                "builtin.module(strip-debuginfo)"
                            ).run(module.operation)
                except Exception:
                    pass
                return _orig_lower(*args, **kw)

            _tcc.lower_module_to_custom_call = _lower
            # pallas_call_registration binds the function through the
            # jax.experimental.mosaic re-export (a direct name import), so
            # patch that binding too
            from jax.experimental import mosaic as _mosaic

            _mosaic.lower_module_to_custom_call = _lower
            _tcc._neutts_debuginfo_stripped = True
    except Exception:
        pass
