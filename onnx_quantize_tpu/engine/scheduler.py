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
    """Admits requests into engine slots and steps the decode batch."""

    def __init__(self, engine: InferenceEngine, rng: jax.Array | None = None):
        self.engine = engine
        self.cache = engine.new_cache()
        self.queue: deque[Request] = deque()
        self.slots: list[Request | None] = [None] * engine.max_batch
        self.next_tokens = np.zeros((engine.max_batch,), np.int32)
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
        """Move queued requests into free slots (slot-local prefill)."""
        for slot_id, slot in enumerate(self.slots):
            if slot is not None or not self.queue:
                continue
            request = self.queue.popleft()
            self.slots[slot_id] = request
            self.cache, logits = self._prefill_slot(slot_id, request.prompt)
            self.rng, step_rng = jax.random.split(self.rng)
            token = int(np.asarray(sample(logits, step_rng, request.sampling))[slot_id])
            request.output.append(token)
            self.next_tokens[slot_id] = token
            logger.debug("admitted request %d into slot %d", request.request_id, slot_id)

    def _prefill_slot(self, slot_id: int, prompt: list[int]):
        """Prefill one slot; the engine's slot mask keeps the others intact."""
        B = self.engine.max_batch
        lengths = np.asarray(self.cache["lengths"])
        ids = np.zeros((B, max(len(prompt), 1)), np.int32)
        ids[slot_id, : len(prompt)] = prompt
        new_lengths = lengths.copy()
        new_lengths[slot_id] = max(len(prompt), 1)
        mask = np.zeros((B,), bool)
        mask[slot_id] = True
        return self.engine.prefill(self.cache, ids, new_lengths, slot_mask=mask)

    def step(self) -> list[Request]:
        """One scheduler iteration: admit, decode, collect finished requests."""
        self._admit()
        active_mask = np.array([s is not None for s in self.slots])
        if not active_mask.any():
            return self._drain_completed()

        self.cache, logits = self.engine.decode(
            self.cache, self.next_tokens, active=active_mask
        )
        self.rng, step_rng = jax.random.split(self.rng)

        for slot_id, request in enumerate(self.slots):
            if request is None:
                continue
            token = int(
                np.asarray(sample(logits, step_rng, request.sampling))[slot_id]
            )
            request.output.append(token)
            self.next_tokens[slot_id] = token
            hit_eos = request.eos_token_id is not None and token == request.eos_token_id
            out_of_cache = (
                int(np.asarray(self.cache["lengths"])[slot_id]) >= self.engine.max_seq
            )
            if hit_eos or out_of_cache or len(request.output) >= request.max_new_tokens:
                request.done = True
                self.completed.append(request)
                self.slots[slot_id] = None
                logger.debug("request %d finished", request.request_id)

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
