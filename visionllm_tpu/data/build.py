"""Dataset registry, ratio subsampling, concatenation, and the
task-grouped batch sampler.

Behavioral reference: visionllmv2/datasets/build.py:47-309
(string-typed factory + ratio subsampling + ConcatDataset) and
visionllmv2/train/visionllmv2_trainer.py:210-295
(RandomTaskSourcedBatchSampler: every batch drawn from one tool group so
all devices run the same task graph — on TPU this is what keeps a pjit
step single-graph per batch).
"""

from __future__ import annotations

import bisect
import random
from typing import Any, Callable, Dict, Iterator, List, Sequence

DATASET_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_dataset(name: str):
    def deco(cls):
        DATASET_REGISTRY[name] = cls
        return cls
    return deco


def build_dataset(cfg: Dict, tokenizer, **common) -> Any:
    cfg = dict(cfg)
    type_name = cfg.pop("type")
    ratio = cfg.pop("ratio", None)
    ds = DATASET_REGISTRY[type_name](tokenizer=tokenizer, **cfg, **common)
    if ratio is not None and ratio < 1.0:
        ds = SubsetDataset(ds, ratio)
    return ds


def build_multi_datasets(cfgs: Sequence[Dict], tokenizer, **common):
    return ConcatDataset([build_dataset(c, tokenizer, **common)
                          for c in cfgs])


class SubsetDataset:
    def __init__(self, base, ratio: float, seed: int = 0):
        self.base = base
        n = max(1, int(len(base) * ratio))
        rng = random.Random(seed)
        self.indices = rng.sample(range(len(base)), n)
        self.task = getattr(base, "task", "chat")

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.base[self.indices[i]]


class ConcatDataset:
    def __init__(self, datasets: List[Any]):
        self.datasets = datasets
        self.cum = []
        total = 0
        for d in datasets:
            total += len(d)
            self.cum.append(total)

    def __len__(self):
        return self.cum[-1] if self.cum else 0

    def __getitem__(self, idx):
        di = bisect.bisect_right(self.cum, idx)
        prev = self.cum[di - 1] if di else 0
        return self.datasets[di][idx - prev]

    def task_of(self, idx: int) -> str:
        di = bisect.bisect_right(self.cum, idx)
        return getattr(self.datasets[di], "task", "chat")


# tool groups (visionllmv2_trainer.py:216-231): batches never mix tools
TASK_GROUPS = {
    "gdino": {"det", "grd", "seg", "interactive", "ic_mask", "semseg",
              "sod", "cod"},
    "unipose": {"pose"},
    "sd": {"t2i"},
    "ip2p": {"edit"},
    "vlm": {"chat", "region_refer", "region_recognition", "region_vqa",
            "ic_text"},
}


def group_of_task(task: str) -> str:
    for g, tasks in TASK_GROUPS.items():
        if task in tasks:
            return g
    return "vlm"


class TaskGroupedBatchSampler:
    """Yields index lists; each batch comes from a single tool group
    (reference RandomTaskSourcedBatchSampler) so every batch maps to one
    compiled train-step graph."""

    def __init__(self, dataset: ConcatDataset, batch_size: int,
                 seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last

    def __iter__(self) -> Iterator[List[int]]:
        rng = random.Random(self.seed)
        by_group: Dict[str, List[int]] = {}
        start = 0
        for d, end in zip(self.dataset.datasets, self.dataset.cum):
            g = group_of_task(getattr(d, "task", "chat"))
            by_group.setdefault(g, []).extend(range(start, end))
            start = end
        batches = []
        for idxs in by_group.values():
            rng.shuffle(idxs)
            for i in range(0, len(idxs), self.batch_size):
                b = idxs[i:i + self.batch_size]
                if len(b) == self.batch_size or not self.drop_last:
                    batches.append(b)
        rng.shuffle(batches)
        return iter(batches)

    def __len__(self):
        return sum(len(d) // self.batch_size
                   for d in self.dataset.datasets)
