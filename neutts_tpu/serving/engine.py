"""Continuous-batching serving engine (the framework's vLLM-role component).

The reference's best published throughput comes from serving its backbone
under vLLM (reference README.md:54, 64); the reference repo itself is
strictly batch-1. This engine provides that serving capability natively on
TPU: slot admission/retirement around the jitted decode core in
neutts_tpu/runtime/batching.py.

Host/device split:
  * host: request queue, slot bookkeeping, detokenization, result delivery;
  * device: all prefill/decode compute + sampling; state never leaves HBM
    between segments.

Usage:
    eng = Engine(cfg, params, n_slots=16, sampling=..., eos_id=...)
    rid = eng.submit(prompt_ids, max_new=700)
    results = eng.run()          # drain everything
    # or incrementally: eng.step(); eng.pop_finished()
"""

from __future__ import annotations

import dataclasses
import itertools
from collections import deque
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neutts_tpu.config import BackboneConfig, SamplingConfig, round_up
from neutts_tpu.runtime import batching
from neutts_tpu.runtime.decode import bucket_length


@dataclasses.dataclass
class Request:
    rid: int
    prompt_ids: List[int]
    max_new: int
    tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


class Engine:
    def __init__(
        self,
        cfg: BackboneConfig,
        params,
        *,
        eos_id: int,
        n_slots: int = 16,
        sampling: Optional[SamplingConfig] = None,
        segment_steps: int = 32,
        seed: int = 0,
    ):
        from neutts_tpu.config import resolve_kv_dtype

        # kv_dtype="auto": serving slots live for arbitrary request mixes,
        # so resolve against the full context window (int4 at the default
        # 2048 — measured >= int8 at every serving config after the r5
        # staged-int4 work, SERVING_CAPACITY_r05.json)
        cfg = resolve_kv_dtype(cfg, cfg.max_context)
        self.cfg = cfg
        self.eos_id = eos_id
        self.n_slots = n_slots
        self.sampling = sampling or SamplingConfig()
        # speech-constrained sampling gets the pre-sliced speech head: the
        # decode hot loop's LM-head matmul / logits traffic / top-k all
        # shrink 3.3x (backbone.add_speech_head)
        lay = cfg.layout
        if self.sampling.speech_range == (lay.speech_base, lay.vocab_size):
            from neutts_tpu.models import backbone as bb

            params = bb.add_speech_head(cfg, params)
        self.params = params
        # Staged-decode alignment invariant: admission buckets are 64-aligned
        # and get clamped to max_context (see _admit), so max_context itself
        # must stay aligned or the reconcile DMA bases would misalign and
        # corrupt the KV cache (ADVICE r1; ops/attention.py reconcile).
        if cfg.max_context % 128 != 0:
            raise ValueError(
                f"max_context must be a multiple of 128 for serving "
                f"(got {cfg.max_context})"
            )
        # segments must be a multiple of the staged-decode alignment (the
        # reconcile DMA requires 8-aligned segment bases; int4 packs token
        # pairs into bytes, so 16-aligned) and fit the lane-padded staging
        # scale buffers (batching.py / attention.py)
        from neutts_tpu.ops.attention import SEG_PAD

        align = (
            batching.SEGMENT_ALIGN_INT4
            if cfg.kv_dtype == "int4"
            else batching.SEGMENT_ALIGN
        )
        self.segment_steps = min(
            max(align, (segment_steps // align) * align),
            SEG_PAD,
        )
        self.state = batching.SlotState.create(cfg, n_slots, jax.random.PRNGKey(seed))
        self._queue: deque[Request] = deque()
        self._slot_req: List[Optional[Request]] = [None] * n_slots
        self._finished: List[Request] = []
        self._ids = itertools.count()
        self._dispatch_id = itertools.count(1)
        # (dispatch token, {slot: active}) of the dispatched-but-uncollected
        # segment, for predictive retirement (see step_dispatch)
        self._inflight: Optional[tuple] = None
        # Throughput-tax accounting (r2 VERDICT weak #7): the pipelined run
        # hides the host tick by dispatching segment N+1 before collecting N,
        # at the cost of (a) rows that finished in segment N decoding through
        # N+1 with tokens discarded, and (b) empty slots riding along until
        # the next admission. tools/profile_serving.py reports these.
        self.reset_stats()

    def reset_stats(self) -> None:
        """Zero the tax counters. Call between a compile-warmup run and the
        measured run: warmup requests (max_new=2 riding full segments) would
        otherwise dominate the ratios — r3's reported post_eos_frac of 0.176
        was exactly this contamination; the steady-state value at gen=250 /
        seg=32 is ~0.027 (the 8-aligned final segment's 249 mod 8 = 1)."""
        self.stats = {
            "dispatched_token_slots": 0,  # segment_steps x n_slots per dispatch
            "useful_tokens": 0,  # tokens delivered to requests
            "post_done_token_slots": 0,  # slots decoding past their request's end
            "empty_token_slots": 0,  # never-occupied slots in a dispatch
            "post_eos_token_slots": 0,  # within-segment steps after a row's EOS
        }

    # --- API ------------------------------------------------------------------

    def submit(self, prompt_ids: Sequence[int], max_new: Optional[int] = None) -> int:
        if len(prompt_ids) >= self.cfg.max_context:
            raise ValueError(
                f"prompt of {len(prompt_ids)} tokens exceeds context "
                f"{self.cfg.max_context}"
            )
        cap = self.cfg.max_context - len(prompt_ids)
        req = Request(
            rid=next(self._ids),
            prompt_ids=list(map(int, prompt_ids)),
            max_new=min(max_new or cap, cap),
        )
        self._queue.append(req)
        return req.rid

    def pending(self) -> int:
        return len(self._queue) + sum(r is not None for r in self._slot_req)

    def pop_finished(self) -> List[Request]:
        out, self._finished = self._finished, []
        return out

    def step(self) -> None:
        """One engine tick: admit into free slots, decode one segment, retire.

        Host<->device syncs are expensive (30 ms+ over remote-tunnel TPU
        backends), so the tick does exactly ONE readback: admissions enqueue
        async and their first tokens ride along with the segment results.
        """
        pending = self.step_dispatch()
        if pending is not None:
            self.step_collect(pending)

    def step_dispatch(self):
        """Admission + async decode-segment dispatch (no host sync). Returns
        an opaque token for `step_collect`, or None if the engine is idle.
        The split lets a multi-chip driver dispatch every replica's segment
        before blocking on any readback, so device segments overlap."""
        # PREDICTIVE RETIREMENT: a request whose token budget is exhausted
        # by the IN-FLIGHT (dispatched, not yet collected) segment is
        # GUARANTEED to complete there — an early EOS can only shorten it.
        # Freeing its slot now lets THIS dispatch admit a queued request one
        # segment earlier; device program order makes it race-free (the
        # in-flight segment's reconcile executes before this tick's
        # admission prefill overwrites the slot). Without this, every
        # max_new-bounded request rode one full discarded segment
        # (post_done ~11-21% of dispatched slot-steps at gen 250 / seg 32).
        if self._inflight is not None:
            _, inflight_slots = self._inflight
            all_complete = True
            # Cap frees at the queue depth (ADVICE r3): a slot freed but not
            # re-admitted this tick is never passed to retire_slots, so its
            # device row would keep decoding discarded tokens in every later
            # segment (and be miscounted as empty).
            free_budget = len(self._queue)
            for slot, req in enumerate(self._slot_req):
                if req is None or req.done:
                    continue
                gain = self.segment_steps if slot in inflight_slots else 0
                if len(req.tokens) + gain >= req.max_new:
                    if free_budget > 0:
                        self._slot_req[slot] = None  # collect() finishes it
                        free_budget -= 1
                else:
                    all_complete = False
            if all_complete and not self._queue:
                # every occupied slot is guaranteed to finish in the
                # in-flight segment and there is nothing to admit: a new
                # dispatch would be a pure discard segment — skip it
                return None
        newly = self._admit()
        if not any(r is not None for r in self._slot_req):
            return None
        S = self.segment_steps
        self.stats["dispatched_token_slots"] += S * self.n_slots
        self.stats["empty_token_slots"] += S * sum(
            r is None for r in self._slot_req
        )
        self.state, outs = batching.decode_steps(
            self.cfg,
            self.sampling,
            self.eos_id,
            self.segment_steps,
            self.params,
            self.state,
        )
        pending_first, self._pending_first = self._pending_first, None
        token = next(self._dispatch_id)
        self._inflight = (
            token,
            {i for i, r in enumerate(self._slot_req) if r is not None},
        )
        # materialize a copy: the next dispatch donates self.state (pipelined
        # run), which would delete this buffer before step_collect reads it.
        # Snapshot the slot->request mapping too: a pipelined collect runs
        # AFTER the next dispatch's admissions, and this segment's rows belong
        # to the requests occupying the slots when it was dispatched.
        return (token, newly, outs, self.state.active | False, pending_first,
                list(self._slot_req))

    def step_collect(self, pending) -> None:
        """Readback + bookkeeping for a `step_dispatch` result."""
        token, newly, outs, active_dev, pending_first, slot_req = pending
        if self._inflight is not None and self._inflight[0] == token:
            self._inflight = None  # this dispatch is no longer in flight
        outs, active, first_tokens = jax.device_get(
            (outs, active_dev, pending_first)
        )
        retire: List[int] = []
        # record admission-time first tokens (sampled inside prefill_slots)
        for slot, req in newly:
            t = int(first_tokens[slot])
            if t != self.eos_id:
                req.tokens.append(t)
                self.stats["useful_tokens"] += 1
            if t == self.eos_id or len(req.tokens) >= req.max_new:
                req.done = True
                if self._slot_req[slot] is req:
                    retire.append(slot)
                else:
                    # predictively freed (and possibly re-admitted) before
                    # this collect: deliver without touching the slot
                    self._finished.append(req)
        outs = np.asarray(outs)
        for slot, req in enumerate(slot_req):
            if req is None or req.done:
                if req is not None:  # finished in a prior segment, rode along
                    self.stats["post_done_token_slots"] += outs.shape[1]
                continue
            row = outs[slot]
            eos_at = np.flatnonzero(row == self.eos_id)
            end = int(eos_at[0]) if eos_at.size else len(row)
            take = min(end, req.max_new - len(req.tokens))
            req.tokens.extend(row[:take].tolist())
            self.stats["useful_tokens"] += take
            self.stats["post_eos_token_slots"] += len(row) - take
            if eos_at.size or len(req.tokens) >= req.max_new or not active[slot]:
                req.done = True
                if self._slot_req[slot] is req:
                    retire.append(slot)
                else:
                    # slot was predictively freed at a later dispatch (and
                    # possibly re-admitted); just deliver the finished request
                    self._finished.append(req)
        self._retire_batch(retire)

    def run(self, pipelined: bool = True) -> Dict[int, List[int]]:
        """Drain queue + slots; returns {rid: generated tokens (no EOS)}.

        pipelined=True overlaps host work with device decode: segment N+1 is
        dispatched BEFORE segment N's readback/bookkeeping, so the device
        never idles on the host tick (~30 ms/tick through a tunneled TPU).
        Ordering stays safe without device syncs: a dispatch only admits into
        slots freed by already-collected segments, so every retire_slots is
        queued before any prefill that reuses its slot. Rows that finish
        during segment N keep decoding through segment N+1 (their tokens are
        discarded) — admission lags one segment per slot turnover, the price
        of hiding the host entirely.
        """
        if not pipelined:
            while self.pending():
                self.step()
            return {r.rid: r.tokens for r in self.pop_finished()}
        prev = None
        while True:
            pending = self.step_dispatch() if self.pending() else None
            if prev is not None:
                self.step_collect(prev)
            prev = pending
            if pending is None and not self.pending():
                break
        return {r.rid: r.tokens for r in self.pop_finished()}

    # --- internals ------------------------------------------------------------

    # admission group sizes: largest-fit-first bounds both the number of
    # jitted prefill variants (5 per prompt bucket) and the padding waste on
    # steady-state drip admissions (1-2 freed slots per tick). Each grouped
    # prefill is one host->device dispatch (~15-30 ms over a tunneled TPU),
    # so cold starts / synchronized-wave bursts (hundreds of slots freed at
    # once) want the widest group — 256 keeps the prefill matmuls MXU-deep
    # and quarters the dispatch count vs 64.
    ADMIT_GROUPS = (256, 64, 16, 4, 1)

    def _admit(self):
        """Prefill queued requests into free slots WITHOUT host syncs; the
        sampled first tokens are read back with the tick's single readback.
        Admissions run as GROUPED batched prefills (one jitted call per
        group) — per-request batch-1 prefills were the dominant serving
        overhead. Returns [(slot, request)] for this tick's admissions."""
        free = [s for s in range(self.n_slots) if self._slot_req[s] is None]
        newly = []
        by_bucket: Dict[int, List[tuple]] = {}
        for slot in free:
            if not self._queue:
                break
            req = self._queue.popleft()
            Lp = min(bucket_length(len(req.prompt_ids)), self.cfg.max_context)
            # Left-pad consumes physical cache headroom (batching.CACHE_SLACK);
            # if a bucket function with large gaps would pad past the slack,
            # the row could hit the physical bound before the reference's
            # real-length cap and return silently truncated output (ADVICE r1,
            # medium). Clamp to the tightest 64-aligned bucket — same set of
            # sizes as the default PROMPT_BUCKETS, so no new compile variants.
            if Lp - len(req.prompt_ids) > batching.CACHE_SLACK - self.segment_steps:
                Lp = min(round_up(len(req.prompt_ids), 64), self.cfg.max_context)
            by_bucket.setdefault(Lp, []).append((slot, req))
            self._slot_req[slot] = req
            newly.append((slot, req))
        for Lp, items in by_bucket.items():
            i = 0
            while i < len(items):
                rem = len(items) - i
                # Group-size choice: padded rows are FULL-PRICE prefill
                # compute (a 19-request bucket padded to G=64 runs 3.4x the
                # useful work), while an extra dispatch costs one tunnel
                # round-trip (~15-30 ms). Pad up only when the waste is
                # small (<= G/4); otherwise take the largest group that fits
                # and loop (19 -> 16 + 4-with-1-pad, not one G=64 call).
                cover = min(g for g in self.ADMIT_GROUPS if g >= rem) \
                    if rem <= max(self.ADMIT_GROUPS) else max(self.ADMIT_GROUPS)
                if rem <= cover <= rem + cover // 4:
                    G = cover
                else:
                    G = max(g for g in self.ADMIT_GROUPS if g <= rem)
                take = min(G, rem)
                group = items[i : i + take]
                i += take
                # pad a partial group by repeating its last admission — the
                # duplicate slot indices re-write identical rows (idempotent)
                group = group + [group[-1]] * (G - len(group))
                # LEFT-pad: the prompt occupies [Lp - len, Lp), so the slot's
                # settled length is the full bucket — the 8-aligned base the
                # staged decode's reconcile DMA requires (batching.py)
                toks = np.zeros((G, Lp), np.int32)
                lens = np.zeros((G,), np.int32)
                slots = np.zeros((G,), np.int32)
                for j, (slot, req) in enumerate(group):
                    toks[j, Lp - len(req.prompt_ids):] = req.prompt_ids
                    lens[j] = len(req.prompt_ids)
                    slots[j] = slot
                self.state = batching.prefill_slots(
                    self.cfg,
                    self.sampling,
                    self.eos_id,
                    self.params,
                    self.state,
                    jnp.asarray(toks),
                    jnp.asarray(lens),
                    jnp.asarray(slots),
                )
        # materialize a separate buffer: decode_steps donates the state, so
        # holding state.token itself would read a deleted array
        self._pending_first = self.state.token + 0
        return newly

    def _retire_batch(self, slots: List[int]) -> None:
        if not slots:
            return
        for slot in slots:
            req = self._slot_req[slot]
            if req is not None:
                self._finished.append(req)
                self._slot_req[slot] = None
        mask = np.zeros((self.n_slots,), bool)
        mask[slots] = True
        self.state = batching.retire_slots(self.state, jnp.asarray(mask))

    def _retire(self, slot: int, deactivate: bool = True) -> None:
        """Single-slot retirement (kept for the incremental API)."""
        req = self._slot_req[slot]
        if req is not None:
            self._finished.append(req)
            self._slot_req[slot] = None
        if deactivate:
            self.state = batching.retire_slots(
                self.state,
                jnp.asarray(np.eye(1, self.n_slots, slot, dtype=bool)[0]),
            )
