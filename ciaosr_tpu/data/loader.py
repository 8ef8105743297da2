"""Threaded prefetching data loader (host-side).

The reference relies on torch DataLoader worker processes
(/root/reference/configs/001_..._rdn_...py:127 workers_per_gpu=8). Here a
thread pool (numpy/cv2 release the GIL for the heavy ops) prepares batches
ahead of the device; a C++ pipeline core can be slotted under the same
interface later (SURVEY.md §2.9 host-side ops stay on CPU).
"""

from __future__ import annotations

import queue
import threading
import time

import numpy as np


def default_collate(samples: list[dict]) -> dict:
    """Stack array fields; collect 'meta' dicts into a list."""
    out = {}
    for k in samples[0]:
        if k == "meta":
            out["meta"] = [s["meta"] for s in samples]
        else:
            out[k] = np.stack([np.asarray(s[k]) for s in samples])
    return out


class DataLoader:
    """Infinite (or single-pass) shuffling loader with prefetch threads."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 4, infinite: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.infinite = infinite

    def _index_stream(self):
        rng = np.random.default_rng(self.seed)
        epoch = 0
        while True:
            order = (rng.permutation(len(self.dataset)) if self.shuffle
                     else np.arange(len(self.dataset)))
            for i in range(0, len(order), self.batch_size):
                chunk = order[i:i + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last:
                    continue
                yield chunk
            epoch += 1
            if not self.infinite:
                return

    def __iter__(self):
        batch_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        idx_q: queue.Queue = queue.Queue(maxsize=self.prefetch * 2)
        stop = threading.Event()

        def feeder():
            for seq, chunk in enumerate(self._index_stream()):
                if stop.is_set():
                    return
                idx_q.put((seq, chunk))
            for _ in range(self.num_workers):
                idx_q.put(None)

        pending: dict[int, dict] = {}
        pending_lock = threading.Lock()
        errors: list[BaseException] = []

        def worker():
            while not stop.is_set():
                item = idx_q.get()
                if item is None or stop.is_set():
                    batch_q.put(None)
                    return
                seq, chunk = item
                try:
                    samples = [self.dataset[int(i)] for i in chunk]
                except BaseException as e:  # noqa: BLE001 — must not hang
                    # reads racing a shutdown (tmpdir teardown in tests/
                    # benches) are expected; anything else must surface in
                    # the consumer — a silently-dead worker means the
                    # ordered merge waits on its seq forever
                    if not stop.is_set():
                        errors.append(e)
                        stop.set()
                    batch_q.put(None)
                    return
                samples = [s for s in samples if s is not None]
                batch = default_collate(samples) if samples else None
                with pending_lock:
                    pending[seq] = batch
            batch_q.put(None)

        threading.Thread(target=feeder, daemon=True).start()
        workers = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in workers:
            t.start()

        next_seq = 0
        done_workers = 0
        try:
            while True:
                if errors:
                    raise RuntimeError(
                        "DataLoader worker failed") from errors[0]
                with pending_lock:
                    batch = pending.pop(next_seq, "_missing")
                if batch == "_missing":
                    try:
                        sentinel = batch_q.get(timeout=0.01)
                        if sentinel is None:
                            done_workers += 1
                            if done_workers >= self.num_workers:
                                if errors:
                                    raise RuntimeError(
                                        "DataLoader worker failed"
                                    ) from errors[0]
                                with pending_lock:
                                    remaining = sorted(pending)
                                for seq in remaining:
                                    b = pending.pop(seq)
                                    if b is not None:
                                        yield b
                                return
                    except queue.Empty:
                        pass
                    continue
                next_seq += 1
                if batch is not None:
                    yield batch
        finally:
            # Deterministic shutdown: daemon threads killed mid-imread at
            # interpreter teardown abort the process (cv2 is C++), and
            # threads outliving a closed iterator race whatever the dataset
            # reads from (tmpdirs in benches/tests). Wake everything, then
            # JOIN the workers.
            stop.set()
            while True:                   # drop queued work, unblock feeder
                try:
                    idx_q.get_nowait()
                except queue.Empty:
                    break
            deadline = time.time() + 10.0
            alive = list(workers)
            while alive and time.time() < deadline:
                for _ in range(len(alive)):    # wake workers blocked on get
                    try:
                        idx_q.put_nowait(None)
                    except queue.Full:
                        break
                while True:            # unblock workers stuck on batch_q.put
                    try:
                        batch_q.get_nowait()
                    except queue.Empty:
                        break
                for t in alive:
                    t.join(0.05)
                alive = [t for t in alive if t.is_alive()]


def build_dataloader(dataset, samples_per_gpu: int, workers_per_gpu: int = 4,
                     shuffle: bool = True, seed: int = 0, **kwargs):
    return DataLoader(dataset, batch_size=samples_per_gpu,
                      num_workers=workers_per_gpu, shuffle=shuffle,
                      seed=seed, **kwargs)
