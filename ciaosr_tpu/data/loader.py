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


_FORK_DATASET = None  # inherited by fork-started pool workers


def _proc_worker_init():  # pragma: no cover - runs in child processes
    try:
        import cv2
        cv2.setNumThreads(0)  # forked cv2 thread pools can deadlock
    except Exception:
        pass


def _proc_load_batch(chunk, rng_seed):
    """Child-side batch assembly. Reseeds the pipeline-module default RNG
    per task: forked children otherwise share one bit-identical stream and
    every worker would sample the same degradation parameters."""
    import ciaosr_tpu.data.pipelines as pipelines
    pipelines._DEFAULT_RNG = np.random.default_rng(rng_seed)
    samples = [_FORK_DATASET[int(i)] for i in chunk]
    samples = [s for s in samples if s is not None]
    return default_collate(samples) if samples else None


class DataLoader:
    """Infinite (or single-pass) shuffling loader with prefetched workers.

    ``worker_mode``:
      * ``"thread"`` (default) — cv2/numpy release the GIL; right for
        IO-bound pipelines (classical 001 recipe).
      * ``"process"`` — fork-based pool; right for *Python*-bound
        pipelines (the 002 Real-ESRGAN degradation chain's kernel
        sampling and parameter walks serialize under the GIL). The
        reference gets this for free from torch's process workers
        (configs/001_..._rdn_...py:127); same ordered-merge and
        error-propagation contract as the thread path.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 4, infinite: bool = True,
                 worker_mode: str = "thread"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.infinite = infinite
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode must be 'thread' or 'process', "
                             f"got {worker_mode!r}")
        self.worker_mode = worker_mode

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
        if self.worker_mode == "process" and self.num_workers > 1:
            yield from self._iter_processes()
            return
        yield from self._iter_threads()

    def _iter_processes(self):
        """Fork-pool path: futures consumed in submission order (ordered
        merge); fut.result() re-raises child exceptions (error
        propagation); shutdown cancels queued work."""
        import multiprocessing as mp
        from collections import deque
        from concurrent.futures import ProcessPoolExecutor

        global _FORK_DATASET
        _FORK_DATASET = self.dataset  # visible to fork children, no pickling
        ex = ProcessPoolExecutor(
            max_workers=self.num_workers,
            mp_context=mp.get_context("fork"),
            initializer=_proc_worker_init)
        try:
            stream = enumerate(self._index_stream())
            window: deque = deque()
            depth = max(self.prefetch, self.num_workers)
            exhausted = False
            while True:
                while not exhausted and len(window) < depth:
                    try:
                        seq, chunk = next(stream)
                    except StopIteration:
                        exhausted = True
                        break
                    window.append(ex.submit(
                        _proc_load_batch, [int(i) for i in chunk],
                        (self.seed, seq)))
                if not window:
                    return
                try:
                    batch = window.popleft().result()
                except Exception as e:
                    raise RuntimeError("DataLoader worker failed") from e
                if batch is not None:
                    yield batch
        finally:
            _FORK_DATASET = None
            ex.shutdown(wait=False, cancel_futures=True)

    def _iter_threads(self):
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
