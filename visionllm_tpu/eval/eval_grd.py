"""Referring-expression grounding evaluation.

Behavioral reference: the RefCOCO eval flow (refcoco_llava.py evaluation
via mmdet RefCOCOeval): the model predicts one box per expression (the
top-scoring query for the single [GRD] text slot); the metric is
Prec@0.5 (predicted box IoU ≥ 0.5 with the gt box), plus mask cIoU when
masks are evaluated (reasonseg-style).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.eval.coco_eval import box_iou_xyxy
from visionllm_tpu.eval.postprocess import scale_boxes_np
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.models.visionllm import SpecialTokenIds
from visionllm_tpu.ops.box_ops import box_cxcywh_to_xyxy


def make_grd_infer_fn(model: VisionLLMWithTools, tid: SpecialTokenIds):
    """Best box for the single grounding slot: argmax over queries of the
    slot-0 logit."""

    def fn(params, input_ids, images, images_aug, pixel_mask):
        out = model.apply({"params": params}, input_ids, images,
                          images_aug, tid, pixel_mask=pixel_mask,
                          method=VisionLLMWithTools.infer_det)
        logits = out["logits"][:, :, 0]              # [B, Q] slot 0
        best = jnp.argmax(logits, axis=1)
        boxes = box_cxcywh_to_xyxy(out["pred_boxes"])
        box = jnp.take_along_axis(boxes, best[:, None, None], axis=1)[:, 0]
        score = jax.nn.sigmoid(
            jnp.take_along_axis(logits, best[:, None], axis=1))[:, 0]
        mask = jnp.take_along_axis(
            out["pred_masks"], best[:, None, None, None], axis=1)[:, 0]
        return {"box": box, "score": score, "mask_logits": mask}

    return jax.jit(fn)


def evaluate_grd(model, params, dataset, tid: SpecialTokenIds, *,
                 iou_thr: float = 0.5, limit: Optional[int] = None,
                 with_mask: bool = False) -> Dict[str, float]:
    infer = make_grd_infer_fn(model, tid)
    n = min(len(dataset), limit) if limit else len(dataset)
    hits = 0
    inter_sum, union_sum = 0.0, 0.0
    for i in range(n):
        s = dataset[i]
        out = infer(params,
                    jnp.asarray(s["input_ids"])[None],
                    jnp.asarray(s["image"])[None],
                    jnp.asarray(s["image_aug"])[None],
                    jnp.asarray(s["pixel_mask"])[None])
        meta = s["img_metas"]
        box = scale_boxes_np(np.asarray(out["box"][0])[None],
                             meta["ori_shape"])
        image_id, ann, _ = dataset.items[i]
        x, y, w, h = ann["bbox"]
        gt = np.asarray([[x, y, x + w, y + h]], np.float32)
        iou = box_iou_xyxy(box, gt)[0, 0]
        hits += int(iou >= iou_thr)
        if with_mask:
            from visionllm_tpu.data.coco import decode_segmentation
            from visionllm_tpu.eval.postprocess import post_process_masks_np
            pm = post_process_masks_np(
                np.asarray(out["mask_logits"][0])[None],
                meta["img_shape"], meta["ori_shape"])[0]
            info = dataset.images[image_id]
            gm = decode_segmentation(ann.get("segmentation"),
                                     info["height"], info["width"]) > 0
            inter_sum += float(np.logical_and(pm, gm).sum())
            union_sum += float(np.logical_or(pm, gm).sum())
    res = {"prec@0.5": hits / max(n, 1)}
    if with_mask:
        res["cIoU"] = inter_sum / max(union_sum, 1.0)
    return res
