"""Contrastive denoising (CDN) query construction + loss.

Behavioral reference: modeling_ov_grounding_dino_mask_dn.py
prepare_for_cdn :2659-2828 (label jitter with prob ratio/2, box jitter
with positive noise in [0,1)·½wh and negative in [1,2)·½wh, group-
isolating attention mask, dn queries prepended before the 900 matching
queries), dn_post_process :2830-2857, DNGroundingDinoLoss :3613.

TPU redesign: the reference sizes the dn block dynamically from the
batch's max gt count; here the gt buffer is already padded to a static
N (targets["valid"] masks real rows), so the dn block is statically
[G groups × 2 (pos/neg) × N] and everything jits once. Invalid slots are
attention-blocked and loss-masked.

Layout per group g: rows [g·2N, g·2N+N) = positives, [g·2N+N, g·2N+2N) =
negatives (reference interleaves groups the same way: positive_idx /
negative_idx :2720-2726).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from visionllm_tpu.ops.box_ops import (box_cxcywh_to_xyxy,
                                       generalized_box_iou,
                                       inverse_sigmoid)
from visionllm_tpu.train.losses import sigmoid_focal_loss


def cdn_groups(dn_number: int, max_gt: int) -> int:
    return max(1, dn_number // max_gt)


def build_cdn_queries(
    rng: jnp.ndarray,
    targets: Dict[str, jnp.ndarray],   # labels [B,N], boxes [B,N,4], valid
    text_query: jnp.ndarray,           # [B, P, C] projected (d_model) tq
    text_query_masks: jnp.ndarray,     # [B, P]
    *,
    dn_number: int = 100,
    label_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
    num_queries: int = 900,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Returns (dn dict for the decoder, dn_targets for the loss)."""
    labels = targets["labels"]
    boxes = targets["boxes"]
    valid = targets["valid"].astype(bool)
    B, N = labels.shape
    P = text_query.shape[1]
    G = cdn_groups(dn_number, N)
    pad = G * 2 * N

    r_lab, r_new, r_sign, r_part = jax.random.split(rng, 4)

    # replicate gt to [B, G, 2, N]
    rep = lambda x: jnp.broadcast_to(x[:, None, None],
                                     (B, G, 2) + x.shape[1:])
    lab_r = rep(labels)
    box_r = rep(boxes)
    val_r = rep(valid)

    # ---- label jitter (prob ratio/2 over every dn slot). Replacement
    # classes are drawn from the sample's VALID text-query slots only
    # (reference flips within real label slots; text queries are
    # compacted so valid slots form a prefix) — otherwise jittered dn
    # queries can embed padding rows.
    flip = jax.random.uniform(r_lab, lab_r.shape) < (label_noise_ratio * 0.5)
    n_valid = jnp.maximum(
        text_query_masks.astype(jnp.int32).sum(axis=1), 1)     # [B]
    u = jax.random.uniform(r_new, lab_r.shape)
    new_lab = jnp.floor(
        u * n_valid[:, None, None, None].astype(u.dtype)).astype(lab_r.dtype)
    noisy_labels = jnp.where(flip, new_lab, lab_r)

    # ---- box jitter in xyxy with half-extent scaled noise
    xyxy = box_cxcywh_to_xyxy(box_r)
    half = jnp.concatenate([box_r[..., 2:] / 2, box_r[..., 2:] / 2], -1)
    sign = jax.random.randint(r_sign, xyxy.shape, 0, 2) * 2.0 - 1.0
    part = jax.random.uniform(r_part, xyxy.shape)
    is_neg = jnp.arange(2)[None, None, :, None, None] == 1
    part = part + is_neg.astype(part.dtype)       # negatives: [1, 2)
    noisy_xyxy = jnp.clip(xyxy + sign * part * half * box_noise_scale,
                          0.0, 1.0)
    cx = (noisy_xyxy[..., :2] + noisy_xyxy[..., 2:]) / 2
    wh = noisy_xyxy[..., 2:] - noisy_xyxy[..., :2]
    noisy_boxes = jnp.concatenate([cx, wh], -1)

    # ---- embeddings from the text queries at the (noisy) class slot
    flat_lab = noisy_labels.reshape(B, pad)
    query_label = jnp.take_along_axis(
        text_query, jnp.clip(flat_lab, 0, P - 1)[..., None], axis=1)
    query_bbox = inverse_sigmoid(noisy_boxes.reshape(B, pad, 4))

    # ---- attention mask [B, pad+Q, pad+Q], True = blocked
    total = pad + num_queries
    slot = jnp.arange(pad)
    grp = slot // (2 * N)
    same_group = grp[:, None] == grp[None, :]
    blocked_dn = ~same_group                                 # [pad, pad]
    mask = jnp.zeros((total, total), bool)
    mask = mask.at[:pad, :pad].set(blocked_dn)
    mask = mask.at[pad:, :pad].set(True)   # matching can't see dn
    mask = jnp.broadcast_to(mask[None], (B, total, total))
    # block everyone from attending invalid dn slots
    invalid_col = jnp.concatenate(
        [~val_r.reshape(B, pad), jnp.zeros((B, num_queries), bool)], 1)
    mask = mask | invalid_col[:, None, :]

    dn = {"query_label": query_label.astype(text_query.dtype),
          "query_bbox": query_bbox,
          "attn_mask": mask,
          "pad_size": pad}
    dn_targets = {
        "labels": lab_r.reshape(B, pad),
        "boxes": box_r.reshape(B, pad, 4),
        "valid": val_r.reshape(B, pad),
        "is_positive": jnp.broadcast_to(
            (jnp.arange(2) == 0)[None, None, :, None],
            (B, G, 2, N)).reshape(B, pad),
    }
    return dn, dn_targets


def dn_loss(
    dn_logits: jnp.ndarray,      # [B, pad, T] (dn slice of decoder output)
    dn_boxes: jnp.ndarray,       # [B, pad, 4]
    dn_targets: Dict[str, jnp.ndarray],
    *,
    cfg,                          # GDinoConfig
    text_mask: Optional[jnp.ndarray] = None,   # [B, T]
    num_boxes: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Denoising loss: known correspondence (no matching) — positives
    classify/regress to their own gt, negatives are background
    (DNGroundingDinoLoss :3613)."""
    B, pad, T = dn_logits.shape
    valid = dn_targets["valid"].astype(bool)
    pos = dn_targets["is_positive"].astype(bool) & valid
    if num_boxes is None:
        num_boxes = jnp.maximum(jnp.sum(pos), 1.0)

    onehot = jax.nn.one_hot(
        jnp.clip(dn_targets["labels"], 0, T - 1), T) * pos[..., None]
    focal = sigmoid_focal_loss(dn_logits, onehot, cfg.focal_alpha, 2.0)
    if text_mask is not None:
        focal = jnp.where(text_mask[:, None, :], focal, 0.0)
    focal = jnp.where(valid[..., None], focal, 0.0)
    loss_class = jnp.sum(focal) / num_boxes

    l1 = jnp.sum(jnp.abs(dn_boxes - dn_targets["boxes"]), -1)
    loss_bbox = jnp.sum(jnp.where(pos, l1, 0.0)) / num_boxes
    giou = 1 - jax.vmap(_diag_giou)(dn_boxes, dn_targets["boxes"])
    loss_giou = jnp.sum(jnp.where(pos, giou, 0.0)) / num_boxes

    return {
        "dn_loss_class": cfg.class_loss_coef * loss_class,
        "dn_loss_bbox": cfg.bbox_loss_coef * loss_bbox,
        "dn_loss_giou": cfg.giou_loss_coef * loss_giou,
    }


def _diag_giou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    g = generalized_box_iou(box_cxcywh_to_xyxy(a), box_cxcywh_to_xyxy(b))
    return jnp.diagonal(g)
