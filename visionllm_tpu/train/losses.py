"""Set-prediction losses for the detection/grounding/segmentation tool.

Behavioral reference: modeling_ov_grounding_dino_mask_dn.py —
`dice_loss` :3214, `token_sigmoid_binary_focal_loss` :3232,
`sigmoid_focal_loss` :3267, `GroundingDinoLoss` :3297 (mask losses on
12544 uncertainty-importance-sampled points, oversample 3.0 /
importance 0.75 :3313-3319, :3425-3446), `GroundingDinoHungarianMatcher`
:3796 (scipy linear_sum_assignment on CPU).

TPU-first redesign
------------------
* Targets arrive PADDED to a fixed N per image with a validity mask —
  no ragged per-image lists, one compiled shape.
* The Hungarian matcher is `optax.assignment.hungarian_algorithm`
  vmapped over the batch — fully on-device, jit/grad-safe (the
  reference's scipy call is a host sync every step).
* All reductions are masked sums normalized by the global (cross-device
  psum'd, when inside shard_map/pjit) number of boxes, exactly like the
  reference's dist-normalized `num_boxes` (:3555-3570).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from visionllm_tpu.ops.box_ops import (box_cxcywh_to_xyxy,
                                       generalized_box_iou)

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# elementwise losses
# ---------------------------------------------------------------------------

def sigmoid_focal_loss(logits: Array, targets: Array, alpha: float = 0.25,
                       gamma: float = 2.0) -> Array:
    """Elementwise focal loss (reference :3267-3292), no reduction."""
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def dice_loss_points(pred_logits: Array, targets: Array,
                     valid: Array) -> Array:
    """Dice loss over point-sampled masks (reference :3214-3230).

    pred_logits/targets: [B, N, P]; valid: [B, N]. Returns the masked
    SUM over instances (caller divides by num_boxes)."""
    probs = jax.nn.sigmoid(pred_logits)
    numer = 2 * jnp.sum(probs * targets, axis=-1)
    denom = jnp.sum(probs, axis=-1) + jnp.sum(targets, axis=-1)
    loss = 1 - (numer + 1) / (denom + 1)
    return jnp.sum(jnp.where(valid, loss, 0.0))


def lm_cross_entropy(logits: Array, labels: Array,
                     ignore_index: int = -100) -> Array:
    """Next-token CE with ignore mask (HF CausalLM shift semantics)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe = jnp.where(valid, shift_labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        shift_logits.astype(jnp.float32), safe)
    return jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


# ---------------------------------------------------------------------------
# point sampling (Mask2Former-style, reference :3313-3319, :3425-3446)
# ---------------------------------------------------------------------------

def _point_sample_chunk(masks: Array, points: Array) -> Array:
    """Dense separable bilinear sampling for one chunk of points.

    TPU-first: a bilinear tap has 2 nonzero weights per axis, so
    sampling factors into ``By[p,:] @ M @ Bx[p,:]^T`` with dense
    ``[P, H]``/``[P, W]`` hat-basis matrices ``max(0, 1-|coord-i|)``
    (zero outside the grid ⇒ grid_sample zero-padding exactly). Both
    einsums run on the MXU and their transposes (the backward) are
    matmuls too. The gather formulation this replaces ran at
    element-gather speed forward and SCATTER-ADD speed backward —
    measured 372 ms fwd / ~430 ms bwd per det train step at 512 px
    (6 layers × 20 masks × 37632+12544 points) vs ~5 ms dense."""
    H, W = masks.shape[-2:]
    x = points[..., 0].astype(jnp.float32) * W - 0.5      # [..., P]
    y = points[..., 1].astype(jnp.float32) * H - 0.5
    bx = jnp.maximum(
        0.0, 1.0 - jnp.abs(x[..., None]
                           - jnp.arange(W, dtype=jnp.float32)))
    by = jnp.maximum(
        0.0, 1.0 - jnp.abs(y[..., None]
                           - jnp.arange(H, dtype=jnp.float32)))
    # HIGHEST: on TPU the default runs these f32 einsums as single-pass
    # bf16 MXU dots (~1e-2 error vs the exact gather formulation this
    # replaced — measured vs torch grid_sample); multi-pass keeps the
    # loss exact and is still ~7x faster than gather/scatter overall
    t = jnp.einsum("...hw,...pw->...ph", masks.astype(jnp.float32), bx,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("...ph,...ph->...p", by, t,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def point_sample(masks: Array, points: Array, *,
                 chunk: int = 8192) -> Array:
    """Bilinear sample [.., H, W] masks at normalized [.., P, 2] (x, y)
    points, torch grid_sample(align_corners=False) semantics.

    Computed as dense hat-basis matmuls (see _point_sample_chunk),
    chunked over points so the [.., P, H] intermediate stays bounded."""
    P = points.shape[-2]
    if P <= chunk:
        return _point_sample_chunk(masks, points)
    outs = [_point_sample_chunk(masks, points[..., s:s + chunk, :])
            for s in range(0, P, chunk)]
    return jnp.concatenate(outs, axis=-1)


def uncertainty_points(rng: Array, coarse_logits: Array, num_points: int,
                       oversample_ratio: float,
                       importance_ratio: float) -> Array:
    """Uncertainty-based point coordinates (reference
    get_uncertain_point_coords_with_randomness :3425-3446).

    coarse_logits: [B, N, H, W] → points [B, N, num_points, 2]."""
    B, N = coarse_logits.shape[:2]
    n_sampled = int(num_points * oversample_ratio)
    r1, r2 = jax.random.split(rng)
    pts = jax.random.uniform(r1, (B, N, n_sampled, 2))
    logits_at = point_sample(coarse_logits, pts)            # [B, N, S]
    uncertainty = -jnp.abs(logits_at)
    n_unc = int(importance_ratio * num_points)
    n_rand = num_points - n_unc
    _, idx = jax.lax.top_k(uncertainty, n_unc)
    top = jnp.take_along_axis(pts, idx[..., None], axis=2)
    rand = jax.random.uniform(r2, (B, N, n_rand, 2))
    return jnp.concatenate([top, rand], axis=2)


# ---------------------------------------------------------------------------
# matcher
# ---------------------------------------------------------------------------

BIG = 1e5


def _single_cost(logits: Array, boxes: Array, tgt_labels: Array,
                 tgt_boxes: Array, tgt_valid: Array, *, class_cost: float,
                 bbox_cost: float, giou_cost: float, alpha: float,
                 gamma: float) -> Array:
    """[Q, N] matching cost for one image (reference matcher :3834-3906)."""
    prob = jax.nn.sigmoid(logits)                            # [Q, T]
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    neg = (1 - alpha) * (prob ** gamma) * (-jnp.log(1 - prob + 1e-8))
    cost_class = (pos - neg)[:, tgt_labels]                  # [Q, N]

    cost_bbox = jnp.sum(jnp.abs(boxes[:, None] - tgt_boxes[None]), -1)
    cost_giou = -generalized_box_iou(box_cxcywh_to_xyxy(boxes),
                                     box_cxcywh_to_xyxy(tgt_boxes))
    cost = (bbox_cost * cost_bbox + class_cost * cost_class
            + giou_cost * cost_giou)
    # invalid target slots: uniform large cost (assignment to them is
    # discarded afterwards — Hungarian still needs finite entries)
    return jnp.where(tgt_valid[None], cost, BIG)


def hungarian_match(cost: Array) -> Array:
    """cost: [B, Q, N] (N <= Q) → per-target matched query index [B, N].

    Uses optax's on-device Hungarian solver (base case of the reference's
    scipy linear_sum_assignment, but jit-able)."""
    def solve(c):
        i, j = optax.assignment.hungarian_algorithm(c.T)     # rows = targets
        # i = target rows (0..N-1 order may be permuted), j = query cols
        order = jnp.argsort(i)
        return j[order]
    return jax.vmap(solve)(cost)


# ---------------------------------------------------------------------------
# criterion
# ---------------------------------------------------------------------------

def matching_cost(outputs: Dict[str, Array], targets: Dict[str, Array],
                  *, cfg) -> Array:
    """[B, Q, N] Hungarian cost for one layer's outputs (no solve)."""
    return jax.vmap(functools.partial(
        _single_cost, class_cost=cfg.class_cost, bbox_cost=cfg.bbox_cost,
        giou_cost=cfg.giou_cost, alpha=cfg.focal_alpha, gamma=2.0))(
            outputs["logits"], outputs["pred_boxes"], targets["labels"],
            targets["boxes"], targets["valid"].astype(bool))


def detection_loss(
    outputs: Dict[str, Array],
    targets: Dict[str, Array],
    *,
    cfg,                                # GDinoConfig (weights, focal alpha)
    rng: Optional[Array] = None,
    num_boxes: Optional[Array] = None,
    match: Optional[Array] = None,
) -> Dict[str, Array]:
    """Hungarian-matched det/seg loss for one decoder-layer output.

    outputs: logits [B, Q, T], pred_boxes [B, Q, 4], optional pred_masks
    [B, Q, Hm, Wm]. targets: labels [B, N] (index into text slots),
    boxes [B, N, 4] cxcywh, valid [B, N], optional masks [B, N, H, W].
    `match` [B, N] short-circuits the solve (detection_loss_with_aux
    batches all layers' matchings into one vmapped call). Returns dict
    of scalar losses (already weighted by cfg coefs).
    """
    logits = outputs["logits"]
    boxes = outputs["pred_boxes"]
    B, Q, T = logits.shape
    N = targets["labels"].shape[1]
    tgt_valid = targets["valid"].astype(bool)

    if num_boxes is None:
        num_boxes = jnp.maximum(jnp.sum(tgt_valid), 1.0)

    if match is None:
        match = hungarian_match(matching_cost(outputs, targets, cfg=cfg))
    match = jax.lax.stop_gradient(match)

    # ---- class loss: binary focal over [B, Q, T] with positives at
    # (matched query, target label) (token_sigmoid_binary_focal_loss)
    onehot = jnp.zeros((B, Q, T))
    b_idx = jnp.arange(B)[:, None]
    lab = targets["labels"]
    onehot = onehot.at[b_idx, match, lab].add(
        tgt_valid.astype(jnp.float32))
    onehot = jnp.clip(onehot, 0.0, 1.0)
    # valid text region: slots < T that are real classes — approximated by
    # text_mask if provided
    text_mask = outputs.get("text_mask")                     # [B, T] bool
    focal = sigmoid_focal_loss(logits, onehot, cfg.focal_alpha, 2.0)
    if text_mask is not None:
        focal = jnp.where(text_mask[:, None, :], focal, 0.0)
    loss_class = jnp.sum(focal) / num_boxes

    # ---- box losses on matched pairs
    matched_boxes = jnp.take_along_axis(boxes, match[..., None], axis=1)
    l1 = jnp.sum(jnp.abs(matched_boxes - targets["boxes"]), -1)
    loss_bbox = jnp.sum(jnp.where(tgt_valid, l1, 0.0)) / num_boxes
    giou = jax.vmap(generalized_box_iou)(
        box_cxcywh_to_xyxy(matched_boxes),
        box_cxcywh_to_xyxy(targets["boxes"]))
    giou_diag = jnp.diagonal(giou, axis1=1, axis2=2)
    loss_giou = jnp.sum(jnp.where(tgt_valid, 1 - giou_diag, 0.0)) / num_boxes

    losses = {
        "loss_class": cfg.class_loss_coef * loss_class,
        "loss_bbox": cfg.bbox_loss_coef * loss_bbox,
        "loss_giou": cfg.giou_loss_coef * loss_giou,
    }

    # ---- mask losses on sampled points
    pred_masks = outputs.get("pred_masks")
    if pred_masks is not None and "masks" in targets:
        matched_masks = jnp.take_along_axis(
            pred_masks, match[..., None, None], axis=1)       # [B, N, h, w]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        pts = uncertainty_points(
            rng, jax.lax.stop_gradient(matched_masks), cfg.num_mask_points,
            cfg.oversample_ratio, cfg.importance_sample_ratio)
        pred_pts = point_sample(matched_masks, pts)
        tgt_pts = point_sample(targets["masks"].astype(jnp.float32),
                               jax.lax.stop_gradient(pts))
        tgt_pts = jax.lax.stop_gradient(tgt_pts)
        focal_m = sigmoid_focal_loss(pred_pts, tgt_pts, alpha=-1.0,
                                     gamma=0.0)  # plain BCE (reference
        # uses sigmoid_ce_loss for masks, :3380)
        lm = jnp.mean(focal_m, axis=-1)
        loss_mask = jnp.sum(jnp.where(tgt_valid, lm, 0.0)) / num_boxes
        loss_dice = dice_loss_points(pred_pts, tgt_pts,
                                     tgt_valid) / num_boxes
        losses["loss_mask"] = cfg.mask_loss_coef * loss_mask
        losses["loss_dice"] = cfg.dice_loss_coef * loss_dice

    return losses


def detection_loss_with_aux(
    outputs: Dict[str, Array],
    targets: Dict[str, Array],
    *,
    cfg,
    rng: Optional[Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Main + per-decoder-layer aux + encoder (two-stage) losses
    (reference :3030-3090). Returns (total, detail dict)."""
    tgt_valid = targets["valid"].astype(bool)
    num_boxes = jnp.maximum(jnp.sum(tgt_valid).astype(jnp.float32), 1.0)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    detail: Dict[str, Array] = {}
    total = 0.0
    n_layers = outputs["all_logits"].shape[0]

    layer_outs = []
    for lvl in range(n_layers):
        out_l = {"logits": outputs["all_logits"][lvl],
                 "pred_boxes": outputs["all_boxes"][lvl],
                 "text_mask": outputs.get("text_mask")}
        if "all_masks" in outputs:
            out_l["pred_masks"] = outputs["all_masks"][lvl]
        layer_outs.append(out_l)
    enc_out = None
    if cfg.two_stage and "enc_logits" in outputs:
        enc_out = {"logits": outputs["enc_logits"],
                   "pred_boxes": outputs["enc_boxes"],
                   "text_mask": outputs.get("text_mask")}

    # ONE vmapped Hungarian solve for every matching (6 decoder layers
    # + the two-stage encoder head): the solver is a serial
    # augmenting-path while_loop, so K independent solves in a batch
    # run in vmap lockstep for ~the price of one — measured 7x on chip
    # vs per-layer solves (the round-3 layout).
    all_outs = layer_outs + ([enc_out] if enc_out is not None else [])
    costs = jnp.stack(
        [matching_cost(o, targets, cfg=cfg) for o in all_outs])
    K, B, Q, N = costs.shape
    matches = hungarian_match(costs.reshape(K * B, Q, N))
    matches = matches.reshape(K, B, N)

    for lvl, out_l in enumerate(layer_outs):
        losses = detection_loss(out_l, targets, cfg=cfg,
                                rng=jax.random.fold_in(rng, lvl),
                                num_boxes=num_boxes, match=matches[lvl])
        suffix = "" if lvl == n_layers - 1 else f"_aux{lvl}"
        for k, v in losses.items():
            detail[k + suffix] = v
            total = total + v

    if enc_out is not None:
        losses = detection_loss(enc_out, targets, cfg=cfg,
                                rng=jax.random.fold_in(rng, 999),
                                num_boxes=num_boxes, match=matches[-1])
        for k, v in losses.items():
            detail[k + "_enc"] = v
            total = total + v

    return total, detail
