"""Dynamic-batching serving frontend.

The reference serves requests one synchronous dataloader at a time
(batch 8 NTP / 1 AVS, ``inference_hyper_lora.py:1477-1479``). This
frontend accepts requests concurrently, groups same-task requests into
batches (size- or deadline-triggered), and feeds the engine on a single
dispatcher thread — so one TPU program family serves mixed traffic with
static shapes per batch.

Usage:
    server = CrabServer(engine, max_batch=8, max_wait_ms=30)
    fut = server.submit("avqa", sample)      # returns concurrent Future
    result = fut.result()                    # EngineOutput slice
    server.shutdown()
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from crab_tpu.runtime.engine import EngineOutput, InferenceEngine


@dataclass
class _Request:
    task: str
    sample: Dict
    future: Future
    t_submit: float = field(default_factory=time.monotonic)


@dataclass
class RequestResult:
    text: str
    tokens: np.ndarray
    mask: Optional[np.ndarray] = None
    mask_found: Optional[bool] = None
    latency_s: float = 0.0


class CrabServer:
    def __init__(
        self,
        engine: InferenceEngine,
        max_batch: int = 8,
        max_wait_ms: float = 30.0,
    ):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._queues: Dict[str, List[_Request]] = {}
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._stop = False
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._thread.start()

    def submit(self, task: str, sample: Dict) -> Future:
        fut: Future = Future()
        with self._lock:
            if self._stop:
                raise RuntimeError("server is shut down")
            self._queues.setdefault(task, []).append(_Request(task, sample, fut))
            self._wake.notify()
        return fut

    def shutdown(self, drain: bool = True):
        if drain:
            while True:
                with self._lock:
                    if not any(self._queues.values()):
                        break
                time.sleep(0.01)
        with self._lock:
            self._stop = True
            self._wake.notify()
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------

    def _pick_batch(self) -> Optional[Tuple[str, List[_Request]]]:
        """Oldest-deadline-first; full batches dispatch immediately,
        partial ones after max_wait."""
        now = time.monotonic()
        best = None
        for task, q in self._queues.items():
            if not q:
                continue
            full = len(q) >= self.max_batch
            expired = (now - q[0].t_submit) >= self.max_wait
            if full or expired:
                if best is None or q[0].t_submit < best[1][0].t_submit:
                    best = (task, q)
        if best is None:
            return None
        task, q = best
        batch = q[: self.max_batch]
        self._queues[task] = q[self.max_batch:]
        return task, batch

    def _dispatch_loop(self):
        while True:
            with self._lock:
                picked = self._pick_batch()
                if picked is None:
                    if self._stop:
                        return
                    self._wake.wait(timeout=self.max_wait / 2 if self.max_wait else 0.01)
                    continue
            task, batch = picked
            try:
                out = self.engine.run(task, [r.sample for r in batch])
                now = time.monotonic()
                for i, r in enumerate(batch):
                    r.future.set_result(
                        RequestResult(
                            text=out.texts[i],
                            tokens=out.tokens[i],
                            mask=out.masks[i] if out.masks is not None else None,
                            mask_found=(
                                bool(out.mask_found[i])
                                if out.mask_found is not None
                                else None
                            ),
                            latency_s=now - r.t_submit,
                        )
                    )
            except BaseException as e:
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
