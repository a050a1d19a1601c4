"""Multi-host evaluation sharding + result gathering.

Behavioral reference: the reference's eval distribution
(DistributedSampler / InferenceSampler shard + mmdet collect_results_cpu
gather — eval/eval_det.py:153, vqa/evaluate_vqa.py:313-334). TPU-native:
`jax.process_index()` round-robin sharding and
`multihost_utils.process_allgather` for the gather; single-process runs
degrade to passthrough.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Sequence

import jax
import numpy as np


def shard_indices(n: int) -> List[int]:
    """InferenceSampler-style contiguous split of range(n) for this
    process."""
    p, np_ = jax.process_index(), jax.process_count()
    per = [n // np_ + (1 if i < n % np_ else 0) for i in range(np_)]
    start = sum(per[:p])
    return list(range(start, start + per[p]))


def all_gather_objects(local: Sequence[Any]) -> List[Any]:
    """Gather arbitrary picklable per-host result lists to every host
    (collect_results_cpu equivalent)."""
    if jax.process_count() == 1:
        return list(local)
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(list(local)), np.uint8)
    # pad to the global max length; ship lengths first
    n = np.asarray([blob.size], np.int32)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:blob.size] = blob
    gathered = multihost_utils.process_allgather(padded)
    out: List[Any] = []
    for i in range(jax.process_count()):
        out.extend(pickle.loads(gathered[i, :int(sizes[i])].tobytes()))
    return out
