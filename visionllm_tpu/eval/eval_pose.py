"""Keypoint evaluation: pose post-processing + OKS-matched mAP + PCK.

Behavioral reference: visionllmv2/eval/eval_pose.py (:19-86 top-k
selection and xyxyzz→xyzxyz conversion; PCK :225-300; COCO/CrowdPose
COCOeval via datasets/evaluation/crowdpose_eval.py). The OKS evaluator
reuses the greedy COCO matching machinery from eval/coco_eval.py with
OKS similarity in place of box IoU.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from visionllm_tpu.eval.coco_eval import (AREA_RNGS, IOU_THRS,
                                          CocoMAPEvaluator, _match_image)
from visionllm_tpu.train.pose_losses import pose_sigmas


def post_process_pose(pred_logits: np.ndarray,    # [G, P]
                      pred_boxes: np.ndarray,     # [G, 4] cxcywh norm
                      pred_keypoints: np.ndarray,  # [G, 3K] xyxy..vv norm
                      ori_size, topk: int = 20):
    """Top-k by max class prob; keypoints to absolute xyv triplets
    (eval_pose.py:19-86)."""
    K = pred_keypoints.shape[-1] // 3
    prob = 1 / (1 + np.exp(-pred_logits))
    scores_all = prob.max(-1)
    labels_all = prob.argmax(-1)
    order = np.argsort(-scores_all)[:topk]
    h, w = ori_size
    xy = pred_keypoints[order, :2 * K].reshape(-1, K, 2) * [[[w, h]]]
    v = pred_keypoints[order, 2 * K:].reshape(-1, K, 1)
    kpts = np.concatenate([xy, v], -1)          # xyzxyz layout [n, K, 3]
    cx, cy, bw, bh = (pred_boxes[order] * [w, h, w, h]).T
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                     -1)
    return {"scores": scores_all[order], "labels": labels_all[order],
            "boxes": boxes, "keypoints": kpts}


def oks_matrix(dt_kpts: np.ndarray, gt_kpts: np.ndarray,
               gt_areas: np.ndarray, sigmas: np.ndarray) -> np.ndarray:
    """[Nd, Ng] OKS (pycocotools computeOks semantics: visibility-masked
    gaussian per joint, normalized by gt area)."""
    Nd, Ng = len(dt_kpts), len(gt_kpts)
    out = np.zeros((Nd, Ng))
    var = (sigmas * 2) ** 2
    for j in range(Ng):
        vis = gt_kpts[j, :, 2] > 0
        if vis.sum() == 0:
            continue
        d2 = ((dt_kpts[:, :, 0] - gt_kpts[j, :, 0]) ** 2
              + (dt_kpts[:, :, 1] - gt_kpts[j, :, 1]) ** 2)
        e = d2 / (2 * var[None, :] * max(gt_areas[j], 1e-6))
        out[:, j] = np.exp(-e)[:, vis].mean(-1)
    return out


class OksMAPEvaluator(CocoMAPEvaluator):
    """Keypoint mAP at OKS .50:.05:.95 (COCO keypoints protocol)."""

    def __init__(self, num_keypoints: int = 17, max_dets: int = 20):
        super().__init__(num_classes=1, iou_type="keypoints",
                         max_dets=max_dets)
        self.sigmas = pose_sigmas(num_keypoints) * 10.0 / 10.0

    def update(self, det: Dict, gt: Dict) -> None:   # type: ignore[override]
        d_order = np.argsort(-det["scores"], kind="mergesort")[:self.max_dets]
        d_scores = det["scores"][d_order]
        d_kpts = det["keypoints"][d_order]
        g_kpts = gt["keypoints"]
        g_areas = np.asarray(gt.get("areas", np.ones(len(g_kpts))))
        g_crowd = np.asarray(gt.get("iscrowd", np.zeros(len(g_kpts))), bool)
        g_ignore = g_crowd | (np.asarray(
            [k[:, 2].sum() for k in g_kpts]) == 0 if len(g_kpts)
            else np.zeros(0, bool))
        ious = oks_matrix(d_kpts, g_kpts, g_areas, self.sigmas)
        g_order = np.argsort(g_ignore, kind="mergesort")
        rec = _match_image(d_scores, ious[:, g_order], g_ignore[g_order],
                           g_crowd[g_order])
        self._records.setdefault((0, "all"), []).append({
            "scores": d_scores, "dtm": rec["dtm"], "dt_ig": rec["dt_ig"],
            "num_gt": int(np.sum(~g_ignore)),
        })

    def summarize(self) -> Dict[str, float]:        # type: ignore[override]
        ap = self._pr_for(0, "all")
        if ap is None:
            return {"AP": float("nan"), "AP_50": float("nan"),
                    "AP_75": float("nan")}
        return {"AP": float(ap.mean()), "AP_50": float(ap[0]),
                "AP_75": float(ap[5])}


def pck(dt_kpts: Sequence[np.ndarray], gt_kpts: Sequence[np.ndarray],
        bboxes: Sequence[np.ndarray], thr: float = 0.2) -> float:
    """Percentage of Correct Keypoints @ thr·max(bbox wh)
    (eval_pose.py:225-300 protocol; one matched prediction per gt)."""
    correct, total = 0, 0
    for d, g, b in zip(dt_kpts, gt_kpts, bboxes):
        scale = max(b[2] - b[0], b[3] - b[1])
        vis = g[:, 2] > 0
        if vis.sum() == 0:
            continue
        dist = np.linalg.norm(d[:, :2] - g[:, :2], axis=-1)
        correct += int(((dist < thr * scale) & vis).sum())
        total += int(vis.sum())
    return correct / max(total, 1)


def evaluate_pose(model, params, dataset, tid, *, num_obj_patches: int = 1,
                  topk: int = 20, limit=None, progress: bool = False,
                  batch_size: int = 8) -> Dict[str, float]:
    """Runner: CocoPoseDataset(test_mode) → UniPose inference → keypoint
    unshuffle via kpt_id2index → OKS mAP (reference eval flow §3.4)."""
    import jax
    import jax.numpy as jnp

    from visionllm_tpu.eval.batching import batched_samples
    from visionllm_tpu.models.composite import VisionLLMWithTools

    def fn(p, ids, im, ia, pm):
        return model.apply({"params": p}, ids, im, ia, tid,
                           num_obj_patches, pixel_mask=pm,
                           method=VisionLLMWithTools.infer_pose)

    infer = jax.jit(fn)
    K = len(dataset.kpt_names)
    ev = OksMAPEvaluator(num_keypoints=K, max_dets=topk)
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
            jnp.asarray(arrays["pixel_mask"])))
        for bi in range(num_valid):
            i, s = idxs[bi], samples[bi]
            meta = s["img_metas"]
            det = post_process_pose(
                out["pred_logits"][bi], out["pred_boxes"][bi],
                out["pred_keypoints"][bi], meta["ori_shape"], topk=topk)
            # unshuffle answer slots back to keypoint-class order
            kpt_id2index = meta["kpt_id2index"]
            order = np.asarray([kpt_id2index[c] for c in range(K)])
            det_k = det["keypoints"][:, order]
            gt_k, gt_boxes = dataset._keypoints(i)
            areas = ((gt_boxes[:, 2] - gt_boxes[:, 0])
                     * (gt_boxes[:, 3] - gt_boxes[:, 1])) if len(gt_boxes) \
                else np.zeros(0)
            ev.update({"scores": det["scores"], "keypoints": det_k[:, :K]},
                      {"keypoints": gt_k, "areas": areas})
            done += 1
            if progress and done % 50 == 0:
                print(f"eval_pose: {done}/{n}")
    return ev.summarize()
