"""Pose losses: OKS math, matching behavior, loss ordering, and the
end-to-end pose training step on the tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import UniPoseConfig, tiny_test_config
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.models.visionllm import SpecialTokenIds
from visionllm_tpu.train.pose_losses import (oks, pose_loss,
                                             pose_loss_with_aux,
                                             pose_sigmas)

CFG = UniPoseConfig(num_body_points=4, num_groups=5)


def test_oks_perfect_is_one():
    K = 4
    sig = jnp.asarray(pose_sigmas(K))
    xy = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (3, K, 2)),
                     jnp.float32)
    v = jnp.ones((3, K))
    area = jnp.full((3,), 0.1)
    o = oks(xy, xy, v, area, sig)
    np.testing.assert_allclose(np.asarray(o), 1.0, atol=1e-6)
    # distant predictions → near-zero oks
    o2 = oks(xy, xy + 5.0, v, area, sig)
    assert np.asarray(o2).max() < 1e-3


def _outputs_targets(perfect: bool):
    G, T, K, N = 5, 3, 4, 2
    rng = np.random.default_rng(0)
    tgt_boxes = np.asarray([[[0.3, 0.3, 0.2, 0.2],
                             [0.7, 0.7, 0.2, 0.2]]], np.float32)
    tgt_xy = rng.uniform(0.2, 0.8, (1, N, K, 2)).astype(np.float32)
    tgt_kp = np.concatenate([tgt_xy.reshape(1, N, 2 * K),
                             np.ones((1, N, K), np.float32)], -1)
    targets = {
        "labels": jnp.asarray([[0, 1]], jnp.int32),
        "boxes": jnp.asarray(tgt_boxes),
        "keypoints": jnp.asarray(tgt_kp),
        "area": jnp.full((1, N), 0.04),
        "valid": jnp.asarray([[True, True]]),
    }
    logits = np.full((1, G, T), -8.0, np.float32)
    boxes = np.tile(np.asarray([0.5, 0.5, 0.1, 0.1], np.float32),
                    (1, G, 1))
    kpts = np.zeros((1, G, 3 * K), np.float32)
    if perfect:
        logits[0, 0, 0] = 8.0
        logits[0, 1, 1] = 8.0
        boxes[0, 0] = tgt_boxes[0, 0]
        boxes[0, 1] = tgt_boxes[0, 1]
        kpts[0, 0] = tgt_kp[0, 0]
        kpts[0, 1] = tgt_kp[0, 1]
    outputs = {"pred_logits": jnp.asarray(logits),
               "pred_boxes": jnp.asarray(boxes),
               "pred_keypoints": jnp.asarray(kpts)}
    return outputs, targets


def test_pose_loss_ordering():
    good_out, targets = _outputs_targets(True)
    bad_out, _ = _outputs_targets(False)
    good = pose_loss(good_out, targets, cfg=CFG)
    bad = pose_loss(bad_out, targets, cfg=CFG)
    assert float(sum(good.values())) < float(sum(bad.values()))
    assert float(good["loss_bbox"]) < 1e-6
    assert float(good["loss_keypoints"]) < 1e-6
    assert float(good["loss_oks"]) < 1e-4


def test_pose_train_forward():
    cfg = tiny_test_config()
    tid = SpecialTokenIds.synthetic()
    model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    img_len = cfg.vis_encoder.num_patches
    nb = cfg.unipose.num_body_points
    # prompt: [DET][EMB..] for the object class + [POSE][EMB..] per joint
    ids = ([1, 5] + [tid.imp] * img_len + [6]
           + [tid.det] + [tid.emb + i for i in range(cfg.num_embs)]
           + [tid.pose] + [tid.emb + i for i in range(cfg.num_embs)] + [2])
    B = 1
    input_ids = jnp.asarray([ids], jnp.int32)
    size = cfg.vis_encoder.image_size
    batch = {
        "input_ids": input_ids,
        "labels": jnp.where(input_ids >= 5, input_ids, -100),
        "attn_mask": jnp.ones_like(input_ids),
        "images": jnp.zeros((B, size, size, 3), jnp.float32),
        "images_aug": jnp.zeros((B, 64, 64, 3), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch, tid, 1,
                        method=VisionLLMWithTools.forward_pose)["params"]
    out = model.apply({"params": params}, batch, tid, 1,
                      method=VisionLLMWithTools.forward_pose)
    pose = out["pose"]
    G = cfg.unipose.num_groups
    assert pose["pred_boxes"].shape == (B, G, 4)
    assert pose["pred_keypoints"].shape == (B, G, nb * 3)

    N = 2
    rngk = np.random.default_rng(0)
    txy = rngk.uniform(0.2, 0.8, (B, N, nb * 2)).astype(np.float32)
    targets = {
        "labels": jnp.zeros((B, N), jnp.int32),
        "boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.2, 0.2]] * N]),
                          (B, 1, 1)),
        "keypoints": jnp.asarray(np.concatenate(
            [txy, np.ones((B, N, nb), np.float32)], -1)),
        "area": jnp.full((B, N), 0.04),
        "valid": jnp.ones((B, N), bool),
    }
    total, detail = pose_loss_with_aux(
        {"all_logits": pose["all_logits"],
         "all_boxes": pose["all_boxes"],
         "all_keypoints": pose["all_keypoints"]},
        targets, cfg=cfg.unipose)
    assert np.isfinite(float(total))
    assert "loss_oks" in detail


def test_pose_cdn_forward_and_loss():
    """Pose CDN: dn queries supervise the box layers, are dropped at the
    expansion, and matching outputs keep their shapes."""
    cfg = tiny_test_config()
    tid = SpecialTokenIds.synthetic()
    model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    img_len = cfg.vis_encoder.num_patches
    nb = cfg.unipose.num_body_points
    ids = ([1, 5] + [tid.imp] * img_len + [6]
           + [tid.det] + [tid.emb + i for i in range(cfg.num_embs)]
           + [tid.pose] + [tid.emb + i for i in range(cfg.num_embs)] + [2])
    B, N = 1, 2
    input_ids = jnp.asarray([ids], jnp.int32)
    size = cfg.vis_encoder.image_size
    rngk = np.random.default_rng(0)
    txy = rngk.uniform(0.2, 0.8, (B, N, nb * 2)).astype(np.float32)
    batch = {
        "input_ids": input_ids,
        "labels": jnp.where(input_ids >= 5, input_ids, -100),
        "attn_mask": jnp.ones_like(input_ids),
        "images": jnp.zeros((B, size, size, 3), jnp.float32),
        "images_aug": jnp.zeros((B, 64, 64, 3), jnp.float32),
        "targets": {
            "labels": jnp.zeros((B, N), jnp.int32),
            "boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.2, 0.2]] * N]),
                              (B, 1, 1)),
            "keypoints": jnp.asarray(np.concatenate(
                [txy, np.ones((B, N, nb), np.float32)], -1)),
            "area": jnp.full((B, N), 0.04),
            "valid": jnp.ones((B, N), bool),
        },
    }
    params = model.init(jax.random.PRNGKey(0), batch, tid, 1,
                        method=VisionLLMWithTools.forward_pose)["params"]
    out = model.apply({"params": params}, batch, tid, 1,
                      jax.random.PRNGKey(1),
                      method=VisionLLMWithTools.forward_pose)
    pose = out["pose"]
    G = cfg.unipose.num_groups
    # matching outputs unchanged by dn
    assert pose["pred_boxes"].shape == (B, G, 4)
    # dn is re-threaded through the post-expansion layers, so every
    # decoder layer contributes a dn slice (reference dn_post_process)
    assert len(pose["dn_logits"]) == cfg.unipose.decoder_layers
    assert pose["dn_targets"] is not None
    from visionllm_tpu.train.cdn import dn_loss
    d = dn_loss(pose["dn_logits"][0], pose["dn_boxes"][0],
                pose["dn_targets"], cfg=cfg.unipose)
    assert all(np.isfinite(float(v)) for v in d.values())
