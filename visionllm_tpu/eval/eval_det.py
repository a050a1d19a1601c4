"""Detection / instance-segmentation evaluation runner.

Behavioral reference: visionllmv2/eval/eval_det.py:107-158 — per-image
single prefill forward (test prompts already contain the per-class
"[DET][EMB]..[EMB4]" blocks), top-k post-processing, COCO mAP. The
device half (forward + top-k) is one jitted function per shape bucket;
result gathering is plain host python (multi-host: shard by
jax.process_index, gather via multihost_utils).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.eval.coco_eval import CocoMAPEvaluator
from visionllm_tpu.eval.postprocess import (post_process_det,
                                            post_process_masks_np,
                                            scale_boxes_np)
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.models.visionllm import SpecialTokenIds


def make_det_infer_fn(model: VisionLLMWithTools, tid: SpecialTokenIds,
                      num_classes: int, topk: int = 100):
    """jitted (params, input_ids, images, images_aug, pixel_mask) →
    device-side detections + selected mask logits."""

    def fn(params, input_ids, images, images_aug, pixel_mask):
        out = model.apply({"params": params}, input_ids, images,
                          images_aug, tid, pixel_mask=pixel_mask,
                          method=VisionLLMWithTools.infer_det)
        post = post_process_det(out["logits"], out["pred_boxes"],
                                num_classes, topk)
        masks = jnp.take_along_axis(
            out["pred_masks"], post["query_idx"][..., None, None], axis=1)
        return {**post, "mask_logits": masks}

    return jax.jit(fn)


def evaluate_det(
    model: VisionLLMWithTools,
    params,
    dataset,                       # CocoDetDataset(test_mode=True)
    tid: SpecialTokenIds,
    *,
    with_mask: bool = False,
    topk: int = 100,
    limit: Optional[int] = None,
    progress: bool = True,
    batch_size: int = 8,
) -> Dict[str, float]:
    num_classes = len(dataset.class_names)
    infer = make_det_infer_fn(model, tid, num_classes, topk)

    evaluator = CocoMAPEvaluator(num_classes, "bbox")
    seg_eval = CocoMAPEvaluator(num_classes, "segm") if with_mask else None

    from visionllm_tpu.eval.batching import batched_samples
    n = min(len(dataset), limit) if limit else len(dataset)
    done = 0
    for idxs, samples, arrays, num_valid in batched_samples(
            dataset, n, batch_size,
            ("input_ids", "image", "image_aug", "pixel_mask")):
        out = jax.device_get(infer(
            params,
            jnp.asarray(arrays["input_ids"]),
            jnp.asarray(arrays["image"]),
            jnp.asarray(arrays["image_aug"]),
            jnp.asarray(arrays["pixel_mask"]),
        ))
        for bi in range(num_valid):
            i, s = idxs[bi], samples[bi]
            meta = s["img_metas"]
            ori = meta["ori_shape"]
            scores = np.asarray(out["scores"][bi])
            labels = np.asarray(out["labels"][bi])
            boxes = scale_boxes_np(np.asarray(out["boxes"][bi]), ori)
            # answer-slot → contiguous category id (invert id2index)
            index2id = {v: k for k, v in meta["id2index"].items()}
            labels = np.asarray([index2id.get(int(l), -1) for l in labels])
            keep = labels >= 0
            det = {"scores": scores[keep], "labels": labels[keep],
                   "boxes": boxes[keep]}

            ann = dataset.coco.load_anns(i, with_mask=with_mask)
            gt = {"labels": ann["labels"], "boxes": ann["boxes"]}
            evaluator.update(det, gt)

            if with_mask:
                from visionllm_tpu.ops.rle import rle_encode
                masks = post_process_masks_np(
                    np.asarray(out["mask_logits"][bi, keep, :, :]),
                    meta["img_shape"], ori)
                det["masks"] = [rle_encode(m) for m in masks]
                gt["masks"] = [rle_encode(m) for m in ann["masks"]]
                seg_eval.update(det, gt)

            done += 1
            if progress and done % 50 == 0:
                print(f"eval_det: {done}/{n}")

    results = {f"bbox_{k}": v for k, v in evaluator.summarize().items()}
    if seg_eval is not None:
        results.update(
            {f"segm_{k}": v for k, v in seg_eval.summarize().items()})
    return results
