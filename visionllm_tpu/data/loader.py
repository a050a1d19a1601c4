"""Prefetching data loader (the reference's torch DataLoader worker pool,
TPU-native).

The reference hides per-sample decode/transform latency inside torch
DataLoader's worker processes (visionllmv2_trainer.py builds loaders
with num_workers>0). The TPU analog must overlap HOST work with DEVICE
steps — while the chip runs step N, worker threads build batch N+1..N+d.
Threads (not processes) are the right tool here: the hot per-sample
stages are either numpy (releases the GIL), PIL codecs (release the
GIL), or our native kernels (ctypes foreign calls release the GIL —
ops/native/imageproc.cc), so workers scale without pickling datasets
across process boundaries.

`PrefetchLoader` preserves exact batch ORDER and CONTENT: batches come
out in sampler order, identical to the synchronous loop (tested in
tests/test_loader.py), so switching num_workers never changes training
math. Sample errors propagate on `__next__` of the failed batch with
the original traceback."""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, List, Optional, Sequence


class PrefetchLoader:
    """Iterate `batches_of_indices`, building `collate([dataset[i]...])`
    ahead of the consumer on a thread pool.

    Args:
      dataset: indexable source.
      batch_iter: iterable of index lists (a batch sampler) OR a flat
        index iterable plus `batch_size`.
      collate: list-of-samples -> batch.
      num_workers: worker threads; 0 = fully synchronous (no threads).
      depth: max batches in flight / buffered (default 2*workers).
    """

    def __init__(self, dataset: Any,
                 batch_iter: Iterable,
                 collate: Callable[[List[Any]], Any],
                 *,
                 batch_size: Optional[int] = None,
                 num_workers: int = 2,
                 depth: Optional[int] = None):
        self.dataset = dataset
        self.batch_iter = batch_iter
        self.collate = collate
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.depth = depth or max(2, 2 * num_workers)

    def _index_batches(self) -> Iterator[List[int]]:
        if self.batch_size is None:
            for idx in self.batch_iter:
                yield list(idx)
        else:
            buf: List[int] = []
            for i in self.batch_iter:
                buf.append(i)
                if len(buf) == self.batch_size:
                    yield buf
                    buf = []
            # drop the ragged tail (static-shape batches only, like the
            # reference's drop_last loaders)

    def _build(self, idx: Sequence[int]) -> Any:
        return self.collate([self.dataset[i] for i in idx])

    def __iter__(self) -> Iterator[Any]:
        if self.num_workers <= 0:
            for idx in self._index_batches():
                yield self._build(idx)
            return

        # ticketed thread pool: workers grab (seq, idx) tickets, results
        # are re-ordered by seq so output order == sampler order
        tickets: "queue.Queue" = queue.Queue(maxsize=self.depth)
        results: "queue.Queue" = queue.Queue()
        stop = threading.Event()

        def feeder():
            seq = 0
            try:
                for idx in self._index_batches():
                    if stop.is_set():
                        return
                    tickets.put((seq, idx))
                    seq += 1
            finally:
                for _ in range(self.num_workers):
                    tickets.put(None)

        def worker():
            while not stop.is_set():
                t = tickets.get()
                if t is None:
                    results.put(None)
                    return
                seq, idx = t
                try:
                    results.put((seq, self._build(idx), None))
                except BaseException as e:          # noqa: BLE001
                    results.put((seq, None, e))

        threads = [threading.Thread(target=feeder, daemon=True)]
        threads += [threading.Thread(target=worker, daemon=True)
                    for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        pending = {}
        next_seq = 0
        done_workers = 0
        try:
            while done_workers < self.num_workers or pending:
                while next_seq in pending:
                    batch, err = pending.pop(next_seq)
                    next_seq += 1
                    if err is not None:
                        raise err
                    yield batch
                if done_workers == self.num_workers:
                    break
                r = results.get()
                if r is None:
                    done_workers += 1
                    continue
                seq, batch, err = r
                pending[seq] = (batch, err)
        finally:
            stop.set()
            # drain tickets so workers can reach their sentinel
            try:
                while True:
                    tickets.get_nowait()
            except queue.Empty:
                pass
