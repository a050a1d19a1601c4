"""Batch collation → fixed-shape numpy batches.

Behavioral reference: visionllmv2/datasets/collator.py:319-412
(DataCollatorForHybridDetSegPoseGenDataset): pad input_ids/labels, stack
images, forward targets/img_metas. TPU-first: sequence lengths are
padded to a small bucket ladder and det targets arrive pre-padded from
the dataset, so each (task, seq-bucket, image-bucket) triple is one XLA
compilation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

from visionllm_tpu.constants import IGNORE_INDEX

SEQ_BUCKETS = (512, 1024, 2048, 4096)


def _seq_bucket(n: int, buckets: Sequence[int] = SEQ_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def collate(samples: List[Dict], pad_token_id: int = 0) -> Dict[str, Any]:
    """List of dataset dicts → one batch dict of stacked numpy arrays.

    input_ids/labels right-padded to the shared sequence bucket;
    image / image_aug / pixel_mask / targets stacked (the dataset already
    emits fixed shapes per bucket); img_metas kept as a python list.
    """
    L = _seq_bucket(max(len(s["input_ids"]) for s in samples))
    B = len(samples)
    input_ids = np.full((B, L), pad_token_id, np.int32)
    labels = np.full((B, L), IGNORE_INDEX, np.int32)
    attn = np.zeros((B, L), np.int32)
    for i, s in enumerate(samples):
        ids = np.asarray(s["input_ids"], np.int32)[:L]
        lab = np.asarray(s["labels"], np.int32)[:L]
        input_ids[i, :len(ids)] = ids
        labels[i, :len(lab)] = lab
        attn[i, :len(ids)] = 1

    batch: Dict[str, Any] = {
        "input_ids": input_ids,
        "labels": labels,
        "attn_mask": attn,
    }

    def pad_stack(arrays):
        """Stack arrays padding trailing spatial dims to the batch max
        (different samples may come from different resolution buckets)."""
        arrays = [np.asarray(a) for a in arrays]
        if len({a.shape for a in arrays}) == 1:
            return np.stack(arrays)
        nd = arrays[0].ndim
        maxes = [max(a.shape[d] for a in arrays) for d in range(nd)]
        out = np.zeros((len(arrays), *maxes), arrays[0].dtype)
        for i, a in enumerate(arrays):
            out[(i,) + tuple(slice(0, s) for s in a.shape)] = a
        return out

    def stack(key):
        if key in samples[0] and samples[0][key] is not None:
            batch_key = {"image": "images", "image_aug": "images_aug",
                         "pixel_mask": "pixel_mask"}.get(key, key)
            batch[batch_key] = pad_stack([s[key] for s in samples])

    for key in ("image", "image_aug", "pixel_mask", "input_images",
                "output_images"):
        stack(key)

    if "targets" in samples[0]:
        tgt_keys = samples[0]["targets"].keys()
        batch["targets"] = {
            k: pad_stack([s["targets"][k] for s in samples])
            for k in tgt_keys}
    if "img_metas" in samples[0]:
        batch["img_metas"] = [s["img_metas"] for s in samples]
    if "captions" in samples[0]:
        batch["captions"] = [s["captions"] for s in samples]
    return batch
