"""Detection / instance-segmentation post-processing.

Behavioral reference: visionllmv2/eval/eval_det.py:18-104
(post_process_det_gdino / post_process_instseg_gdino): sigmoid → flat
top-k over (queries × classes) → cxcywh→xyxy → scale to original image
size; masks: ×stride bilinear upsample, crop padding, resize to original,
σ > 0.5. No NMS anywhere (top-k only), which maps cleanly to
`lax.top_k` — fully on-device.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.ops.box_ops import box_cxcywh_to_xyxy


def post_process_det(
    logits: jnp.ndarray,          # [B, Q, T] (class logits over text slots)
    pred_boxes: jnp.ndarray,      # [B, Q, 4] cxcywh in [0, 1]
    num_classes: int,
    topk: int = 100,
) -> Dict[str, jnp.ndarray]:
    """Flat top-k over queries × classes (device-side half).

    Returns scores [B, k], labels [B, k], boxes_norm [B, k, 4] xyxy in
    [0, 1]; scaling to original sizes happens host-side per image.
    """
    logits = logits[:, :, :num_classes]
    B, Q, K = logits.shape
    prob = jax.nn.sigmoid(logits).reshape(B, Q * K)
    k = min(topk, Q * K)
    scores, idx = jax.lax.top_k(prob, k)
    q_idx = idx // K
    labels = idx % K
    boxes = box_cxcywh_to_xyxy(pred_boxes)
    boxes = jnp.take_along_axis(boxes, q_idx[..., None], axis=1)
    return {"scores": scores, "labels": labels, "boxes": boxes,
            "query_idx": q_idx}


def scale_boxes_np(boxes_norm: np.ndarray,
                   ori_size: Tuple[int, int]) -> np.ndarray:
    h, w = ori_size
    return boxes_norm * np.asarray([w, h, w, h], np.float32)


def post_process_masks_np(
    mask_logits: np.ndarray,       # [k, H/4, W/4] (already top-k selected)
    img_shape: Tuple[int, int],    # valid (un-padded) model input size
    ori_shape: Tuple[int, int],
    mask_stride: int = 4,
) -> np.ndarray:
    """Host-side mask finishing (matches eval_det.py:59-104): upsample
    ×stride, crop padding, resize to original size, σ > 0.5."""
    from PIL import Image
    k, H, W = mask_logits.shape
    out = np.zeros((k, ori_shape[0], ori_shape[1]), bool)
    for i in range(k):
        m = np.asarray(Image.fromarray(mask_logits[i]).resize(
            (W * mask_stride, H * mask_stride), Image.BILINEAR))
        m = m[:img_shape[0], :img_shape[1]]
        m = np.asarray(Image.fromarray(m).resize(
            (ori_shape[1], ori_shape[0]), Image.BILINEAR))
        out[i] = _sigmoid(m) > 0.5
    return out


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x.astype(np.float32)))
