"""Prefetching data loader — the host data plane.

The reference feeds the GPU from synchronous PyTorch DataLoader workers
(decord/librosa per sample). Here a small thread pool decodes media
(C++ WAV loader + cv2 frame seeks, both GIL-releasing) a configurable
number of batches ahead of the device, so host decode overlaps device
compute — combined with ``InferenceEngine.run_stream`` the TPU never
waits on IO.
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, Iterator, List, Sequence


class PrefetchLoader:
    """Maps ``fn`` over items on worker threads, preserving order.

    fn is typically a media recipe (``TaskSpec.media``) or a full batch
    builder (``TrainCollator``). depth bounds memory: at most
    ``depth`` results are buffered ahead of the consumer.
    """

    def __init__(self, fn: Callable, items: Sequence, depth: int = 4, workers: int = 2):
        self.fn = fn
        self.items = list(items)
        self.depth = depth
        self.workers = workers

    def __len__(self) -> int:
        return len(self.items)

    def __iter__(self) -> Iterator:
        results: Dict[int, object] = {}
        errors: Dict[int, BaseException] = {}
        lock = threading.Lock()
        ready = threading.Condition(lock)
        next_submit = {"i": 0}
        n = len(self.items)
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                with lock:
                    i = next_submit["i"]
                    if i >= n:
                        return
                    # bound the lookahead
                    if i - next_emit_holder[0] >= self.depth:
                        ready.wait(timeout=0.05)
                        continue
                    next_submit["i"] = i + 1
                try:
                    out = self.fn(self.items[i])
                    with lock:
                        results[i] = out
                        ready.notify_all()
                except BaseException as e:  # propagate to consumer
                    with lock:
                        errors[i] = e
                        ready.notify_all()

        next_emit_holder = [0]
        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.workers)]
        for t in threads:
            t.start()
        try:
            for i in range(n):
                with lock:
                    while i not in results and i not in errors:
                        ready.wait(timeout=0.5)
                    if i in errors:
                        raise errors.pop(i)
                    out = results.pop(i)
                    next_emit_holder[0] = i + 1
                    ready.notify_all()
                yield out
        finally:
            stop.set()
            with lock:
                ready.notify_all()
            for t in threads:
                t.join(timeout=1.0)


def batched(items: Sequence, batch_size: int) -> List[List]:
    return [list(items[i: i + batch_size]) for i in range(0, len(items), batch_size)]
