"""Multi-chip serving: replica-per-chip data parallelism.

The reference's serving story is single-GPU vLLM (reference README.md:54);
this module is the TPU pod-scale equivalent. For backbones that fit on one
chip (Air ~0.55 GB int8, Nano less), the idiomatic TPU layout is NOT
tensor-sharding — it is one full replica per chip, batches sharded across
replicas, zero collectives on the decode path:

  * every chip holds the full weights + its own slot pool and KV cache;
  * the host driver round-robins requests to the least-loaded replica and
    interleaves segment dispatch/readback so all chips decode concurrently
    (`Engine.step_dispatch` / `step_collect` keep each tick at one readback
    per replica, with every replica's segment in flight before any sync);
  * aggregate throughput scales linearly with chips: there is no cross-chip
    traffic at all (cf. SURVEY.md §2c — the TP path in neutts_tpu/parallel
    exists for backbones that exceed a chip, which Air/Nano never do).

Across hosts the same pattern nests: each host process drives its local
chips' replicas and a front-end balances over hosts (DCN carries only
requests/results, never activations).

Usage:
    eng = MultiChipEngine(cfg, params, eos_id=..., n_slots=256)
    rid = eng.submit(prompt_ids, max_new=250)
    results = eng.run()
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax

from neutts_tpu.config import BackboneConfig, SamplingConfig
from neutts_tpu.serving.engine import Engine


class MultiChipEngine:
    """Drives one `Engine` replica per device with overlapped segments."""

    def __init__(
        self,
        cfg: BackboneConfig,
        params,
        *,
        eos_id: int,
        n_slots: int = 256,
        devices: Optional[Sequence] = None,
        sampling: Optional[SamplingConfig] = None,
        segment_steps: int = 32,
        seed: int = 0,
    ):
        devices = list(devices) if devices is not None else jax.local_devices()
        if not devices:
            raise ValueError("no devices")
        self.engines: List[Engine] = []
        for i, dev in enumerate(devices):
            dev_params = jax.device_put(params, dev)
            self.engines.append(
                Engine(
                    cfg,
                    dev_params,
                    eos_id=eos_id,
                    n_slots=n_slots,
                    sampling=sampling,
                    segment_steps=segment_steps,
                    seed=seed + i,
                )
            )
        self._route: Dict[int, tuple] = {}  # global rid -> (engine idx, local rid)
        self._delivered: set = set()  # rids already returned by run()
        self._next_rid = 0

    @property
    def n_replicas(self) -> int:
        return len(self.engines)

    def submit(self, prompt_ids: Sequence[int], max_new: Optional[int] = None) -> int:
        """Route to the least-loaded replica; returns a global request id."""
        i = min(range(len(self.engines)), key=lambda j: self.engines[j].pending())
        local = self.engines[i].submit(prompt_ids, max_new=max_new)
        rid = self._next_rid
        self._next_rid += 1
        self._route[rid] = (i, local)
        return rid

    def pending(self) -> int:
        return sum(e.pending() for e in self.engines)

    def step(self) -> None:
        """One global tick: dispatch every replica's segment, THEN collect.

        Dispatch is async (JAX enqueues device work and returns), so all
        replicas' segments run concurrently; each readback only waits for
        its own replica."""
        handles = [e.step_dispatch() for e in self.engines]
        for e, h in zip(self.engines, handles):
            if h is not None:
                e.step_collect(h)

    def run(self) -> Dict[int, List[int]]:
        """Drain everything; returns {global rid: generated tokens}.

        Rids delivered by an earlier run() are excluded, so repeated run()
        calls behave predictably. An undelivered routed rid with no local
        result is an engine bookkeeping bug and raises instead of being
        silently dropped (ADVICE r1)."""
        while self.pending():
            self.step()
        local_results = [
            {r.rid: r.tokens for r in e.pop_finished()} for e in self.engines
        ]
        out: Dict[int, List[int]] = {}
        for rid, (i, local) in self._route.items():
            if rid in self._delivered:
                continue
            if local not in local_results[i]:
                raise RuntimeError(
                    f"replica {i} finished draining but request {rid} "
                    f"(local rid {local}) has no result — engine bookkeeping bug"
                )
            out[rid] = local_results[i][local]
            self._delivered.add(rid)
        return out
