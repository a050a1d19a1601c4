"""Semantic segmentation (ADE20K-style) and salient-object evaluation.

Behavioral reference: visionllmv2/eval/eval_semseg.py (per-class mask
queries → argmax semantic map → mIoU/aAcc) and eval_sod.py
(pysodmetrics MAE / F-measure). Semantic seg treats every class as one
[DET/SEG][EMB..] text slot; the predicted per-query masks are combined
with class scores into a semantic map.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def semantic_map_from_queries(
    logits: np.ndarray,          # [Q, K] class logits
    masks: np.ndarray,           # [Q, h, w] mask logits
    num_classes: int,
) -> np.ndarray:
    """Mask2Former-style semantic inference: sem[k] = Σ_q p(q,k)·σ(mask_q)
    then argmax over classes → [h, w] label map."""
    p = 1 / (1 + np.exp(-logits[:, :num_classes]))       # [Q, K]
    m = 1 / (1 + np.exp(-masks))                         # [Q, h, w]
    sem = np.einsum("qk,qhw->khw", p, m)
    return sem.argmax(0)


class MIoUEvaluator:
    """Streaming confusion-matrix mIoU / aAcc (mmseg metric semantics)."""

    def __init__(self, num_classes: int, ignore_index: int = 255):
        self.K = num_classes
        self.ignore = ignore_index
        self.conf = np.zeros((num_classes, num_classes), np.int64)

    def update(self, pred: np.ndarray, gt: np.ndarray) -> None:
        valid = gt != self.ignore
        p = pred[valid].astype(np.int64)
        g = gt[valid].astype(np.int64)
        idx = g * self.K + p
        self.conf += np.bincount(idx, minlength=self.K * self.K).reshape(
            self.K, self.K)

    def summarize(self) -> Dict[str, float]:
        inter = np.diag(self.conf).astype(np.float64)
        union = self.conf.sum(0) + self.conf.sum(1) - inter
        iou = inter / np.maximum(union, 1)
        present = (self.conf.sum(1) > 0)
        return {
            "mIoU": float(iou[present].mean()) if present.any() else 0.0,
            "aAcc": float(inter.sum() / max(self.conf.sum(), 1)),
        }


def sod_metrics(pred: Sequence[np.ndarray],
                gt: Sequence[np.ndarray]) -> Dict[str, float]:
    """Salient-object metrics: MAE and max F-measure (β²=0.3), the two
    headline numbers of eval_sod.py / pysodmetrics."""
    maes, fbetas = [], []
    for p, g in zip(pred, gt):
        p = p.astype(np.float64)
        if p.max() > 1:
            p = p / 255.0
        g = (g > 0.5).astype(np.float64)
        maes.append(np.abs(p - g).mean())
        best = 0.0
        for t in np.linspace(0.05, 0.95, 19):
            b = p >= t
            tp = float((b * g).sum())
            prec = tp / max(b.sum(), 1)
            rec = tp / max(g.sum(), 1)
            f = (1.3 * prec * rec) / max(0.3 * prec + rec, 1e-9)
            best = max(best, f)
        fbetas.append(best)
    return {"MAE": float(np.mean(maes)),
            "maxF": float(np.mean(fbetas))}


def evaluate_semseg(model, params, dataset, tid, *, limit=None,
                    progress: bool = False) -> Dict[str, float]:
    """Runner: SemSegDataset(test_mode) → mask-query semantic maps →
    streaming mIoU/aAcc (reference eval/eval_semseg.py flow)."""
    import os

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from visionllm_tpu.eval.eval_det import make_det_infer_fn

    K = len(dataset.class_names)
    infer = make_det_infer_fn(model, tid, num_classes=K,
                              topk=min(100, K * 4))
    ev = MIoUEvaluator(K)
    n = min(len(dataset), limit) if limit else len(dataset)
    for i in range(n):
        s = dataset[i]
        out = jax.device_get(infer(
            params,
            jnp.asarray(s["input_ids"])[None],
            jnp.asarray(s["image"])[None],
            jnp.asarray(s["image_aug"])[None],
            jnp.asarray(s["pixel_mask"])[None]))
        meta = s["img_metas"]
        # assemble the semantic map from the top-k detections: per class,
        # max over its detections of (mask logit + log score)
        h4 = out["mask_logits"].shape[-2:]
        sem_logits = np.full((K, *h4), -1e4, np.float32)
        index2id = {v: k for k, v in meta["id2index"].items()}
        for q in range(out["scores"].shape[1]):
            cls_slot = int(out["labels"][0, q])
            cid = index2id.get(cls_slot)
            if cid is None:
                continue
            score = float(out["scores"][0, q])
            m = np.asarray(out["mask_logits"][0, q], np.float32)
            sem_logits[cid] = np.maximum(sem_logits[cid],
                                         m + np.log(max(score, 1e-6)))
        # upsample the argmax map to the original label size
        pred4 = sem_logits.argmax(0).astype(np.uint8)
        oh, ow = meta["ori_shape"]
        pred = np.asarray(Image.fromarray(pred4).resize(
            (ow, oh), Image.NEAREST))
        label = np.asarray(Image.open(os.path.join(
            dataset.img_prefix, dataset.rows[i]["label"])))
        ev.update(pred, label)
        if progress and (i + 1) % 20 == 0:
            print(f"eval_semseg: {i + 1}/{n}")
    return ev.summarize()
