"""PrefetchLoader: order/content parity with the synchronous loop,
error propagation, and actual overlap."""

import threading
import time

import numpy as np
import pytest

from visionllm_tpu.data.loader import PrefetchLoader


class SlowDataset:
    def __init__(self, n, delay=0.0, fail_at=None):
        self.n = n
        self.delay = delay
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise ValueError(f"bad sample {i}")
        if self.delay:
            time.sleep(self.delay)
        return {"x": np.full((3,), i, np.int32)}


def _collate(samples):
    return np.stack([s["x"] for s in samples])


def _batches(n, bs):
    return [list(range(i, i + bs)) for i in range(0, n - n % bs, bs)]


@pytest.mark.parametrize("num_workers", [0, 1, 3])
def test_order_and_content_match_sync(num_workers):
    ds = SlowDataset(23)
    want = [_collate([ds[i] for i in b]) for b in _batches(23, 4)]
    got = list(PrefetchLoader(ds, _batches(23, 4), _collate,
                              num_workers=num_workers))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_flat_index_iterable_with_batch_size():
    ds = SlowDataset(10)
    got = list(PrefetchLoader(ds, iter(range(10)), _collate,
                              batch_size=3, num_workers=2))
    assert len(got) == 3          # ragged tail dropped
    np.testing.assert_array_equal(got[0][:, 0], [0, 1, 2])
    np.testing.assert_array_equal(got[2][:, 0], [6, 7, 8])


def test_error_propagates_at_failed_batch():
    ds = SlowDataset(12, fail_at=5)
    it = iter(PrefetchLoader(ds, _batches(12, 4), _collate,
                             num_workers=2))
    first = next(it)              # batch [0..3] is fine
    np.testing.assert_array_equal(first[:, 0], [0, 1, 2, 3])
    with pytest.raises(ValueError, match="bad sample 5"):
        next(it)


def test_prefetch_overlaps_consumer():
    """With workers, total wall time must be well below the serial sum
    (sample delay runs on threads while the consumer sleeps)."""
    delay = 0.02
    ds = SlowDataset(32, delay=delay)
    batches = _batches(32, 4)

    def run(workers):
        t0 = time.perf_counter()
        for _ in PrefetchLoader(ds, batches, _collate,
                                num_workers=workers):
            time.sleep(delay)     # consumer "device step"
        return time.perf_counter() - t0

    t_sync = run(0)
    t_par = run(4)
    assert t_par < t_sync * 0.75, (t_par, t_sync)


def test_early_break_shuts_down():
    ds = SlowDataset(100, delay=0.01)
    loader = PrefetchLoader(ds, _batches(100, 4), _collate,
                            num_workers=2)
    n_before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()
    time.sleep(0.3)
    assert threading.active_count() <= n_before + 1
