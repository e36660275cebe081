"""Continuous batching scheduler.

Keeps the decode batch full: finished sequences release their slot, queued
requests are admitted into free slots with an individual prefill into that
slot, and every scheduler step decodes all active slots in one jit'd call —
the standard continuous-batching loop (SURVEY.md §2B, BASELINE.json config 5),
host-orchestrated over the engine's two compiled programs.
"""

from __future__ import annotations

import dataclasses
import itertools
from collections import deque

import jax
import numpy as np

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.engine.engine import InferenceEngine
from onnx_quantize_tpu.engine.sampling import SamplingParams, sample

logger = get_logger(__name__)

__all__ = ["Request", "ContinuousBatchingScheduler"]


@dataclasses.dataclass
class Request:
    request_id: int
    prompt: list[int]
    max_new_tokens: int = 32
    sampling: SamplingParams = SamplingParams()
    eos_token_id: int | None = None
    # Filled by the scheduler:
    output: list[int] = dataclasses.field(default_factory=list)
    done: bool = False


class ContinuousBatchingScheduler:
    """Admits requests into engine slots and steps the decode batch.

    ``chunk > 1`` enables *chunked* continuous batching: between admission
    checks the scheduler decodes ``chunk`` steps inside ONE compiled program
    (``engine.decode_multi``), amortizing host dispatch — on runtimes with
    high launch latency this is the difference between ~hundreds and ~tens of
    thousands of tokens/s (BENCH.md). The trade: a sequence finishing
    mid-chunk holds its slot until the chunk boundary (at most ``chunk - 1``
    wasted steps; its KV stops advancing at EOS via the engine's done-mask).
    Chunked mode uses one sampling configuration and EOS id for the whole
    batch (taken from the first admitted request; per-request sampling needs
    ``chunk=1``).
    """

    def __init__(self, engine: InferenceEngine, rng: jax.Array | None = None,
                 chunk: int = 1):
        assert chunk >= 1
        self.engine = engine
        self.chunk = chunk
        self.cache = engine.new_cache()
        self.queue: deque[Request] = deque()
        self.slots: list[Request | None] = [None] * engine.max_batch
        self.next_tokens = np.zeros((engine.max_batch,), np.int32)
        # Host mirror of cache["lengths"]: the scheduler knows every length
        # transition (admit = prompt length; each live decode step +1, capped
        # at max_seq; EOS freezes), so serving never pays a device fetch for
        # lengths (~32 ms/round through the tunnel).
        self.lengths = np.zeros((engine.max_batch,), np.int32)
        self.logits = None
        self.rng = rng if rng is not None else jax.random.key(0)
        self._id_counter = itertools.count()
        self.completed: list[Request] = []

    def submit(self, prompt: list[int], **kwargs) -> Request:
        request = Request(request_id=next(self._id_counter), prompt=prompt, **kwargs)
        self.queue.append(request)
        return request

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(s is not None for s in self.slots)

    def _admit(self) -> None:
        """Move queued requests into free slots with ONE masked prefill call.

        All admissible requests share a single ``engine.prefill`` (the slot
        mask keeps in-flight slots intact), and the padded width is bucketed
        to a multiple of 64 so arbitrary prompt lengths reuse a handful of
        compiled programs instead of one per distinct length — on runtimes
        with minutes-long compiles, per-length compilation would dwarf the
        serving time."""
        admitted: list[tuple[int, Request]] = []
        for slot_id, slot in enumerate(self.slots):
            if slot is not None or not self.queue:
                continue
            request = self.queue.popleft()
            self.slots[slot_id] = request
            admitted.append((slot_id, request))
            logger.debug("admitted request %d into slot %d", request.request_id, slot_id)
        if not admitted:
            return

        B = self.engine.max_batch
        longest = max(max(len(r.prompt), 1) for _, r in admitted)
        T_pad = min(-(-longest // 64) * 64, self.engine.max_seq)
        ids = np.zeros((B, max(T_pad, longest)), np.int32)
        new_lengths = self.lengths.copy()
        mask = np.zeros((B,), bool)
        for slot_id, request in admitted:
            ids[slot_id, : len(request.prompt)] = request.prompt
            new_lengths[slot_id] = max(len(request.prompt), 1)
            mask[slot_id] = True
        self.lengths = new_lengths.copy()
        self.cache, logits, greedy = self.engine.prefill(
            self.cache, ids, new_lengths, slot_mask=mask, with_tokens=True
        )
        if all(r.sampling.temperature <= 0 for _, r in admitted):
            # Greedy admissions read the in-program argmax — no extra
            # sampling round-trip (~32 ms on the tunneled runtime).
            arr = np.asarray(greedy)
            tokens = {slot_id: int(arr[slot_id]) for slot_id, _ in admitted}
        else:
            tokens = self._sample_rows(logits, admitted)
        for slot_id, request in admitted:
            request.output.append(tokens[slot_id])
            self.next_tokens[slot_id] = tokens[slot_id]

    def _sample_rows(self, logits, pairs) -> dict[int, int]:
        """Sample next tokens for the given (slot, request) pairs with ONE
        device call per distinct SamplingParams.

        Per-slot ``sample`` calls are correctness-equivalent but each is a
        separate dispatch+sync — measured ~1 s per 32-slot round through the
        tunnel, which capped serving at ~26 generated tok/s (round 2)."""
        by_params: dict[SamplingParams, list[int]] = {}
        for slot_id, request in pairs:
            by_params.setdefault(request.sampling, []).append(slot_id)
        out: dict[int, int] = {}
        for params, slot_ids in by_params.items():
            self.rng, step_rng = jax.random.split(self.rng)
            toks = np.asarray(sample(logits, step_rng, params))
            for slot_id in slot_ids:
                out[slot_id] = int(toks[slot_id])
        return out

    def _finish(self, slot_id: int, request: Request) -> None:
        request.done = True
        self.completed.append(request)
        self.slots[slot_id] = None
        logger.debug("request %d finished", request.request_id)

    def _step_chunked(self, active_mask: np.ndarray) -> list[Request]:
        """Decode ``chunk`` steps in one program, then settle slot states."""
        first = next(s for s in self.slots if s is not None)
        lengths_before = self.lengths.copy()
        self.rng, step_rng = jax.random.split(self.rng)
        self.cache, toks = self.engine.decode_multi(
            self.cache, self.next_tokens, steps=self.chunk, active=active_mask,
            sampling=first.sampling, rng=step_rng,
            eos_token_id=first.eos_token_id,
        )
        toks = np.asarray(toks)  # (B, chunk)
        out_len_before = {
            i: len(r.output) for i, r in enumerate(self.slots) if r is not None
        }
        for slot_id, request in enumerate(self.slots):
            if request is None:
                continue
            # Steps that actually advanced: capacity caps them (the engine
            # clamps at max_seq and re-emits from frozen state past it).
            room = int(self.engine.max_seq - lengths_before[slot_id])
            budget = request.max_new_tokens - len(request.output)
            valid = min(self.chunk, max(room, 0), budget)
            hit_capacity = room <= valid
            hit_eos = False
            for t in toks[slot_id, :valid]:
                request.output.append(int(t))
                if request.eos_token_id is not None and t == request.eos_token_id:
                    hit_eos = True
                    break
            self.next_tokens[slot_id] = request.output[-1]
            # Mirror the device: lengths advance one per live step. The
            # engine freezes at EOS (done-mask) and clamps at capacity; a
            # non-EOS sequence keeps advancing for the whole chunk even past
            # max_new (its surplus steps still wrote KV), so the mirror
            # counts chunk steps unless EOS cut it short.
            if hit_eos:
                advanced = len(request.output) - out_len_before[slot_id]
            else:
                advanced = self.chunk
            self.lengths[slot_id] = min(
                int(lengths_before[slot_id]) + advanced, self.engine.max_seq
            )
            if (
                hit_eos
                or hit_capacity
                or len(request.output) >= request.max_new_tokens
            ):
                self._finish(slot_id, request)
        return self._drain_completed()

    def step(self) -> list[Request]:
        """One scheduler iteration: admit, decode, collect finished requests."""
        self._admit()
        active_mask = np.array([s is not None for s in self.slots])
        if not active_mask.any():
            return self._drain_completed()

        if self.chunk > 1:
            return self._step_chunked(active_mask)

        self.cache, logits = self.engine.decode(
            self.cache, self.next_tokens, active=active_mask
        )
        occupied = [(i, r) for i, r in enumerate(self.slots) if r is not None]
        tokens = self._sample_rows(logits, occupied)

        for slot_id, request in occupied:
            token = tokens[slot_id]
            request.output.append(token)
            self.next_tokens[slot_id] = token
            self.lengths[slot_id] = min(
                int(self.lengths[slot_id]) + 1, self.engine.max_seq
            )
            hit_eos = request.eos_token_id is not None and token == request.eos_token_id
            out_of_cache = int(self.lengths[slot_id]) >= self.engine.max_seq
            if hit_eos or out_of_cache or len(request.output) >= request.max_new_tokens:
                self._finish(slot_id, request)

        return self._drain_completed()

    def _drain_completed(self) -> list[Request]:
        out, self.completed = self.completed, []
        return out

    def run(self) -> list[Request]:
        """Run until all submitted requests complete; returns them in finish order."""
        finished: list[Request] = []
        while self.has_work:
            finished.extend(self.step())
        return finished
