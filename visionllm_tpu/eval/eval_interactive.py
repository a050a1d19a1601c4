"""Interactive (visual-prompt) detection evaluation.

Behavioral reference: visionllmv2/eval/eval_visual_prompt.py — each
region prompt should ground its own object: the metric is per-region
box IoU@thr accuracy (the model predicts one box per <region> slot via
the slot's text-query logit column).
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


def make_interactive_infer_fn(model: VisionLLMWithTools,
                              tid: SpecialTokenIds, max_regions: int):
    """Best box per region slot: argmax over queries of slot r's logit."""

    def fn(params, input_ids, images, images_aug, pixel_mask, regions):
        out = model.apply({"params": params}, input_ids, images,
                          images_aug, tid, pixel_mask=pixel_mask,
                          regions=regions,
                          method=VisionLLMWithTools.infer_det)
        logits = out["logits"][:, :, :max_regions]       # [B, Q, R]
        best = jnp.argmax(logits, axis=1)                # [B, R]
        boxes = box_cxcywh_to_xyxy(out["pred_boxes"])
        picked = jnp.take_along_axis(boxes, best[..., None], axis=1)
        scores = jax.nn.sigmoid(jnp.take_along_axis(
            logits, best[:, None, :], axis=1))[:, 0]
        return {"boxes": picked, "scores": scores}

    return jax.jit(fn)


def evaluate_interactive(model, params, dataset, tid: SpecialTokenIds, *,
                         iou_thr: float = 0.5,
                         limit: Optional[int] = None) -> Dict[str, float]:
    infer = make_interactive_infer_fn(model, tid, dataset.max_regions)
    n = min(len(dataset), limit) if limit else len(dataset)
    hits, total = 0, 0
    for i in range(n):
        s = dataset[i]
        out = infer(params,
                    jnp.asarray(s["input_ids"])[None],
                    jnp.asarray(s["image"])[None],
                    jnp.asarray(s["image_aug"])[None],
                    jnp.asarray(s["pixel_mask"])[None],
                    jnp.asarray(s["regions"])[None])
        meta = s["img_metas"]
        ann = dataset.coco.load_anns(i)
        gt = ann["boxes"][:s["num_regions"]]
        pred = scale_boxes_np(np.asarray(out["boxes"][0]),
                              meta["ori_shape"])[:s["num_regions"]]
        for r in range(s["num_regions"]):
            iou = box_iou_xyxy(pred[r:r + 1], gt[r:r + 1])[0, 0]
            hits += int(iou >= iou_thr)
            total += 1
    return {"region_acc@0.5": hits / max(total, 1)}
