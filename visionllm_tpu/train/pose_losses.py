"""Pose (UniPose) set-prediction losses: Hungarian matching with
keypoint/OKS costs + focal/L1/GIoU/keypoint/OKS losses.

Behavioral reference: visionllmv2/model/unipose/modeling_unipose.py
HungarianMatcher :3326-3443 (set_cost_keypoint=10, set_cost_oks=4),
SetCriterion :3538 (loss_labels/boxes/keypoints), OKS machinery in
unipose/utils/model_utils.py:207-335 (oks_overlaps with the COCO sigma
table extended to 68 joints, -log(oks) loss).

Keypoint layout is the reference's "xyxy..vv": first 2·K values are the
xy pairs, last K the visibility flags. Everything fixed-shape with
validity masks, matcher fully on-device (optax Hungarian).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.ops.box_ops import (box_cxcywh_to_xyxy,
                                       generalized_box_iou)
from visionllm_tpu.train.losses import (BIG, hungarian_match,
                                        sigmoid_focal_loss)

# COCO keypoint sigmas (17) extended with 0.25 for the extra 51 UniKPT
# slots (model_utils.py:279-286), /10
COCO_SIGMAS_17 = np.asarray(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07,
     .87, .87, .89, .89], np.float32)


def pose_sigmas(num_body_points: int) -> np.ndarray:
    if num_body_points <= 17:
        s = COCO_SIGMAS_17[:num_body_points]
    else:
        s = np.concatenate([COCO_SIGMAS_17,
                            np.full(num_body_points - 17, 0.25,
                                    np.float32)])
    return s / 10.0


def oks(pred_xy: jnp.ndarray,      # [..., K, 2]
        gt_xy: jnp.ndarray,        # [..., K, 2]
        vis: jnp.ndarray,          # [..., K]
        area: jnp.ndarray,         # [...]
        sigmas: jnp.ndarray) -> jnp.ndarray:
    """Object keypoint similarity (model_utils.py:207-226)."""
    var = (sigmas * 2) ** 2
    d2 = jnp.sum((pred_xy - gt_xy) ** 2, axis=-1)
    e = jnp.exp(-d2 / (area[..., None] * var * 2))
    return jnp.sum(e * vis, axis=-1) / (jnp.sum(vis, axis=-1) + 1e-6)


def _split_kpts(kp: jnp.ndarray, K: int):
    xy = kp[..., :2 * K].reshape(*kp.shape[:-1], K, 2)
    v = kp[..., 2 * K:3 * K]
    return xy, v


def _pose_cost(logits, boxes, kpts, tgt_labels, tgt_boxes, tgt_kpts,
               tgt_area, tgt_valid, *, K, sigmas, class_cost, bbox_cost,
               giou_cost, kpt_cost, oks_cost, alpha, gamma):
    """[Q, N] matching cost for one image (matcher :3364-3440)."""
    prob = jax.nn.sigmoid(logits)
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    neg = (1 - alpha) * (prob ** gamma) * (-jnp.log(1 - prob + 1e-8))
    cost_class = (pos - neg)[:, tgt_labels]

    cost_bbox = jnp.sum(jnp.abs(boxes[:, None] - tgt_boxes[None]), -1)
    cost_giou = -generalized_box_iou(box_cxcywh_to_xyxy(boxes),
                                     box_cxcywh_to_xyxy(tgt_boxes))

    p_xy, _ = _split_kpts(kpts, K)                  # [Q, K, 2]
    g_xy, g_v = _split_kpts(tgt_kpts, K)            # [N, K, 2], [N, K]
    d2 = jnp.sum((p_xy[:, None] - g_xy[None]) ** 2, -1)   # [Q, N, K]
    e = jnp.exp(-d2 / (tgt_area[None, :, None] * (sigmas * 2) ** 2 * 2))
    oks_qn = jnp.sum(e * g_v[None], -1) / (jnp.sum(g_v, -1)[None] + 1e-6)
    cost_oks = 1 - jnp.clip(oks_qn, 1e-6)
    l1 = jnp.abs(p_xy[:, None] - g_xy[None]) * g_v[None, :, :, None]
    cost_kpt = jnp.sum(l1, axis=(-1, -2))

    cost = (class_cost * cost_class + bbox_cost * cost_bbox
            + giou_cost * cost_giou + kpt_cost * cost_kpt
            + oks_cost * cost_oks)
    return jnp.where(tgt_valid[None], cost, BIG)


def pose_loss(
    outputs: Dict[str, jnp.ndarray],
    # pred_logits [B,G,T], pred_boxes [B,G,4], pred_keypoints [B,G,3K]
    targets: Dict[str, jnp.ndarray],
    # labels [B,N], boxes [B,N,4], keypoints [B,N,3K] (xyxy..vv,
    # normalized), area [B,N] (normalized), valid [B,N]
    *,
    cfg,                               # UniPoseConfig
    with_keypoints: bool = True,
    num_boxes: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    K = cfg.num_body_points
    sigmas = jnp.asarray(pose_sigmas(K))
    logits = outputs["pred_logits"]
    boxes = outputs["pred_boxes"]
    kpts = outputs.get("pred_keypoints")
    B, Q, T = logits.shape
    tgt_valid = targets["valid"].astype(bool)
    if num_boxes is None:
        num_boxes = jnp.maximum(jnp.sum(tgt_valid).astype(jnp.float32), 1.0)
    if kpts is None or not with_keypoints:
        kpts = jnp.zeros((B, Q, 3 * K))
        kpt_cost = oks_cost = 0.0
    else:
        kpt_cost, oks_cost = 10.0, 4.0   # matcher weights (config.py)

    cost = jax.vmap(functools.partial(
        _pose_cost, K=K, sigmas=sigmas, class_cost=cfg.class_loss_coef,
        bbox_cost=cfg.bbox_loss_coef, giou_cost=cfg.giou_loss_coef,
        kpt_cost=kpt_cost, oks_cost=oks_cost, alpha=cfg.focal_alpha,
        gamma=2.0))(
            logits, boxes, kpts, targets["labels"], targets["boxes"],
            targets["keypoints"], targets["area"], tgt_valid)
    match = jax.lax.stop_gradient(hungarian_match(cost))     # [B, N]

    b_idx = jnp.arange(B)[:, None]
    onehot = jnp.zeros((B, Q, T)).at[
        b_idx, match, targets["labels"]].add(tgt_valid.astype(jnp.float32))
    focal = sigmoid_focal_loss(logits, jnp.clip(onehot, 0, 1),
                               cfg.focal_alpha, 2.0)
    tmask = outputs.get("text_mask")
    if tmask is not None:
        focal = jnp.where(tmask[:, None, :], focal, 0.0)
    loss_class = jnp.sum(focal) / num_boxes

    m_boxes = jnp.take_along_axis(boxes, match[..., None], axis=1)
    l1 = jnp.sum(jnp.abs(m_boxes - targets["boxes"]), -1)
    loss_bbox = jnp.sum(jnp.where(tgt_valid, l1, 0.0)) / num_boxes
    giou = jax.vmap(generalized_box_iou)(
        box_cxcywh_to_xyxy(m_boxes), box_cxcywh_to_xyxy(targets["boxes"]))
    gd = jnp.diagonal(giou, axis1=1, axis2=2)
    loss_giou = jnp.sum(jnp.where(tgt_valid, 1 - gd, 0.0)) / num_boxes

    losses = {
        "loss_class": cfg.class_loss_coef * loss_class,
        "loss_bbox": cfg.bbox_loss_coef * loss_bbox,
        "loss_giou": cfg.giou_loss_coef * loss_giou,
    }

    if with_keypoints:
        m_kpts = jnp.take_along_axis(kpts, match[..., None], axis=1)
        p_xy, _ = _split_kpts(m_kpts, K)
        g_xy, g_v = _split_kpts(targets["keypoints"], K)
        l1k = jnp.sum(jnp.abs(p_xy - g_xy) * g_v[..., None], axis=(-1, -2))
        loss_kpt = jnp.sum(jnp.where(tgt_valid, l1k, 0.0)) / num_boxes
        o = oks(p_xy, g_xy, g_v, targets["area"], sigmas)
        # OKSLoss(linear=True): 1 - oks, NOT -log(oks)
        # (modeling_unipose.py:3562, model_utils.py:248-252)
        loss_oks = 1.0 - jnp.clip(o, 1e-6)
        loss_oks = jnp.sum(jnp.where(tgt_valid, loss_oks, 0.0)) / num_boxes
        losses["loss_keypoints"] = cfg.keypoint_loss_coef * loss_kpt
        # the reference weights loss_oks by keypoint_loss_coef, NOT
        # oks_loss_coef (modeling_unipose.py:240 — oks_loss_coef is set
        # by train.py:461 but never read); match the trained behavior
        losses["loss_oks"] = cfg.keypoint_loss_coef * loss_oks

    return losses


def pose_loss_with_aux(outputs: Dict, targets: Dict, *, cfg):
    """Per-layer pose losses: box-only for layers < num_box_decoder_layers
    (reference weight_dict construction :240-249)."""
    tgt_valid = targets["valid"].astype(bool)
    num_boxes = jnp.maximum(jnp.sum(tgt_valid).astype(jnp.float32), 1.0)
    total = 0.0
    detail = {}
    n = len(outputs["all_logits"])
    for lvl in range(n):
        with_kp = lvl >= cfg.num_box_decoder_layers
        out_l = {"pred_logits": outputs["all_logits"][lvl],
                 "pred_boxes": outputs["all_boxes"][lvl],
                 "pred_keypoints": (outputs["all_keypoints"][lvl]
                                    if with_kp else None),
                 "text_mask": outputs.get("text_mask")}
        losses = pose_loss(out_l, targets, cfg=cfg, with_keypoints=with_kp,
                           num_boxes=num_boxes)
        suffix = "" if lvl == n - 1 else f"_aux{lvl}"
        for k, v in losses.items():
            detail[k + suffix] = v
            total = total + v

    # interm (two-stage) loss on the top-k encoder proposals — box-only
    # (reference weight_dict "_interm" entries exclude keypoints, :249)
    if "enc_logits" in outputs:
        enc_out = {"pred_logits": outputs["enc_logits"],
                   "pred_boxes": outputs["enc_boxes"],
                   "text_mask": outputs.get("text_mask")}
        losses = pose_loss(enc_out, targets, cfg=cfg, with_keypoints=False,
                           num_boxes=num_boxes)
        for k, v in losses.items():
            detail[k + "_interm"] = v
            total = total + v
    return total, detail
