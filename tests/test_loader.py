"""Threaded prefetch DataLoader: ordering, shutdown, error propagation.

The reference leans on torch's multiprocess DataLoader (worker crashes
surface as RuntimeError in the parent; mmcv runner loops forever over an
infinite sampler). Our thread-pool loader must match that contract:
deterministic batch order for a fixed seed, clean thread shutdown when the
iterator is closed, and worker exceptions raised in the consumer rather
than hanging the ordered merge.
"""

import threading
import time

import numpy as np
import pytest

from ciaosr_tpu.data.loader import DataLoader


class ArrayDataset:
    def __init__(self, n=32, fail_at=None, delay=0.0):
        self.n = n
        self.fail_at = fail_at
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        if self.fail_at is not None and i == self.fail_at:
            raise ValueError(f"broken sample {i}")
        return {"x": np.full((3,), i, np.float32), "meta": {"idx": i}}


def test_single_pass_covers_dataset_once():
    ds = ArrayDataset(n=32)
    loader = DataLoader(ds, batch_size=4, num_workers=3, seed=0,
                        infinite=False, drop_last=False)
    seen = []
    for batch in loader:
        assert batch["x"].shape == (4, 3)
        seen.extend(batch["x"][:, 0].astype(int).tolist())
    assert sorted(seen) == list(range(32))


def test_deterministic_order_for_seed():
    ds = ArrayDataset(n=24)
    def first_epoch(seed):
        loader = DataLoader(ds, batch_size=4, num_workers=2, seed=seed,
                            infinite=False)
        return [b["x"][:, 0].astype(int).tolist() for b in loader]
    assert first_epoch(7) == first_epoch(7)
    assert first_epoch(7) != first_epoch(8)


def test_worker_error_raises_not_hangs():
    """A failing sample must surface as RuntimeError in the consumer within
    bounded time — a silently-dead worker would stall the ordered merge."""
    ds = ArrayDataset(n=16, fail_at=5)
    loader = DataLoader(ds, batch_size=4, num_workers=2, seed=0,
                        shuffle=False, infinite=False)
    with pytest.raises(RuntimeError, match="worker failed") as ei:
        deadline = time.time() + 30.0
        for _ in loader:
            assert time.time() < deadline, "loader hung on worker error"
    assert isinstance(ei.value.__cause__, ValueError)


def test_close_joins_worker_threads():
    before = {t.ident for t in threading.enumerate()}
    ds = ArrayDataset(n=64, delay=0.01)
    loader = DataLoader(ds, batch_size=4, num_workers=4, seed=0,
                        infinite=True)
    it = iter(loader)
    next(it)
    it.close()
    # workers must be JOINED (not just signalled): no loader thread alive
    leaked = [t for t in threading.enumerate()
              if t.ident not in before and t.is_alive()
              and t.name.startswith("Thread-")]
    # feeder may still be parked on a bounded queue put; workers must not be
    for t in leaked:
        t.join(2.0)
    assert all(not t.is_alive() for t in leaked)


def test_process_mode_matches_thread_mode_order():
    """Fork-pool path keeps the same ordered-merge contract: identical
    batch stream to the thread path for a fixed seed."""
    ds = ArrayDataset(n=24)
    a = [b["x"][:, 0].tolist() for b in DataLoader(
        ds, batch_size=4, num_workers=2, seed=5, infinite=False,
        worker_mode="thread")]
    b = [b["x"][:, 0].tolist() for b in DataLoader(
        ds, batch_size=4, num_workers=2, seed=5, infinite=False,
        worker_mode="process")]
    assert a == b and len(a) == 6


def test_process_mode_worker_error_raises():
    ds = ArrayDataset(n=16, fail_at=7)
    loader = DataLoader(ds, batch_size=4, num_workers=2, seed=0,
                        infinite=False, worker_mode="process")
    with pytest.raises(RuntimeError, match="worker failed"):
        for _ in loader:
            pass


def test_process_mode_infinite_and_close():
    ds = ArrayDataset(n=8)
    loader = DataLoader(ds, batch_size=4, num_workers=2, seed=0,
                        infinite=True, worker_mode="process")
    it = iter(loader)
    seen = [next(it) for _ in range(5)]     # wraps past one epoch
    assert all(s["x"].shape == (4, 3) for s in seen)
    it.close()                              # shuts the pool down cleanly


def test_process_mode_reseeds_default_rng(tmp_path):
    """Two different batches drawn through the seedless-default-RNG path
    must not be identical across tasks (fork would otherwise clone the
    stream into every worker)."""
    import ciaosr_tpu.data.pipelines as P

    class RandomDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = P._DEFAULT_RNG
            return {"x": rng.random(4).astype(np.float32)}

    loader = DataLoader(RandomDataset(), batch_size=4, num_workers=2,
                        seed=0, shuffle=False, infinite=False,
                        worker_mode="process")
    batches = [b["x"] for b in loader]
    assert len(batches) == 2
    assert not np.allclose(batches[0], batches[1])
