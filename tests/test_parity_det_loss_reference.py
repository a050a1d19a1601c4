"""Detection TRAINING-loss parity vs the reference forward_train.

Runs the reference OVGroundingDino.forward_train (Hungarian matcher +
focal/L1/GIoU criterion, modeling_ov_grounding_dino_mask_dn.py:
2904-3100) in train mode (all dropouts zeroed, dn disabled — its
prepare_for_cdn hardcodes .cuda()) and compares the class/box/GIoU
components of its loss_dict — final, per-aux-layer, and two-stage
encoder — against our detection_loss_with_aux on the converted state
dict. Mask losses are excluded: both sides sample uncertainty points
with their own RNG, so those values are not comparable (the shared
POINT-SAMPLING math has its own oracle test in test_coco_eval/losses).
Targets are well-separated so the reference's extra mask-cost terms in
the matcher cannot flip the assignment.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference/VisionLLMv2"

D_MODEL = 32
TEXT_DIM = 48
N_Q = 12
P = 3          # text-query patches (classes)
NUM_EMBS = 4
IMG = 128


@pytest.fixture(scope="module")
def ref_modules():
    from visionllm_tpu.utils.ref_shims import install_reference_shims
    install_reference_shims()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import warnings
    warnings.filterwarnings("ignore")
    from visionllmv2.model.grounding_dino.configuration_grounding_dino import (  # noqa: E501
        GroundingDinoConfig)
    from visionllmv2.model.grounding_dino import (
        modeling_ov_grounding_dino_mask_dn as mg)
    # with dn disabled the dn-loss branch only emits zero placeholders,
    # but hardcodes .to('cuda') for them (:3669-3673) — skip it on CPU
    mg.DNGroundingDinoLoss.compute_dn_loss = (
        lambda self, *a, **k: {})
    return GroundingDinoConfig, mg.OVGroundingDinoForObjectDetection


def _build_reference(ref_modules, seed=0):
    import torch
    from transformers import SwinConfig as HFSwinConfig
    GroundingDinoConfig, OVGroundingDino = ref_modules
    swin = HFSwinConfig(
        image_size=IMG, patch_size=4, embed_dim=8, depths=[1, 1, 1, 1],
        num_heads=[2, 2, 4, 4], window_size=4, drop_path_rate=0.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        out_features=["stage1", "stage2", "stage3", "stage4"])
    cfg = GroundingDinoConfig(
        backbone_config=swin, d_model=D_MODEL,
        encoder_layers=1, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_queries=N_Q, num_feature_levels=4, max_text_len=48,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        fusion_dropout=0.0, fusion_droppath=0.0,
        text_enhancer_dropout=0.0)
    cfg.mask_dim = D_MODEL
    cfg.norm = "GN"
    cfg.l_hidden_size = TEXT_DIM
    # training-time attribute overrides (train/train.py:419-436)
    cfg.auxiliary_loss = True
    cfg.class_cost = 2.0
    cfg.dice_cost = 5.0
    cfg.mask_cost = 5.0
    cfg.box_cost = 5.0
    cfg.giou_cost = 2.0
    cfg.class_weight = 2.0
    cfg.dice_weight = 5.0
    cfg.mask_weight = 5.0
    cfg.box_weight = 5.0
    cfg.giou_weight = 2.0
    torch.manual_seed(seed)
    model = OVGroundingDino(cfg)
    model.train()
    model.dn_number = 0          # prepare_for_cdn hardcodes .cuda()
    return model


def _my_config():
    from visionllm_tpu.config import GDinoConfig
    return GDinoConfig(
        d_model=D_MODEL, num_queries=N_Q, encoder_layers=1,
        decoder_layers=2, num_heads=4, ffn_dim=64, text_dim=TEXT_DIM,
        mask_dim=D_MODEL, dn_number=0, max_text_len=48,
        backbone_overrides={"patch_size": 4, "embed_dim": 8,
                            "depths": (1, 1, 1, 1),
                            "num_heads": (2, 2, 4, 4),
                            "window_size": 4})


@pytest.mark.slow
def test_det_train_loss_parity_vs_reference(ref_modules):
    import torch

    ref = _build_reference(ref_modules)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    tq = rng.standard_normal((1, P, NUM_EMBS, TEXT_DIM)).astype(np.float32)
    tq_mask = np.ones((1, P), np.int64)
    pixel_mask = np.ones((1, IMG, IMG), bool)

    # two well-separated targets with distinct classes
    gt_boxes = np.asarray([[0.25, 0.25, 0.2, 0.2],
                           [0.75, 0.7, 0.18, 0.22]], np.float32)
    gt_labels = np.asarray([0, 1], np.int64)
    gt_masks = np.zeros((2, IMG, IMG), np.float32)
    gt_masks[0, 20:44, 20:44] = 1.0
    gt_masks[1, 76:104, 84:108] = 1.0

    labels = [{
        "class_labels": torch.from_numpy(gt_labels),
        "boxes": torch.from_numpy(gt_boxes),
        "mask_labels": torch.from_numpy(gt_masks),
    }]
    with torch.no_grad():
        out = ref.forward_train(
            pixel_values=torch.from_numpy(pixels),
            pixel_mask=torch.from_numpy(pixel_mask),
            text_query=torch.from_numpy(tq),
            text_query_masks=torch.from_numpy(tq_mask),
            labels=labels,
            img_metas=[{"id2index": {0: 0, 1: 1}}],
            return_dict=True,
        )
    ref_ld = {k: float(v) for k, v in out.loss_dict.items()}

    # ours, on the converted REAL state dict
    from visionllm_tpu.models.grounding_dino.model import GroundingDino
    from visionllm_tpu.models.swin import SwinConfig
    from visionllm_tpu.train.losses import detection_loss_with_aux
    from visionllm_tpu.utils.convert_gdino import convert_gdino
    cfg = _my_config()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    swin_cfg = SwinConfig(patch_size=4, embed_dim=8, depths=(1, 1, 1, 1),
                          num_heads=(2, 2, 4, 4), window_size=4,
                          out_stages=(0, 1, 2, 3))
    params = convert_gdino(sd, cfg, swin_cfg=swin_cfg)

    model = GroundingDino(cfg, dtype=jnp.float32)
    got = model.apply(
        {"params": params},
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(tq), jnp.asarray(tq_mask.astype(bool)),
        pixel_mask=jnp.asarray(pixel_mask))

    text_mask = jnp.zeros((1, cfg.max_text_len), bool).at[:, :P].set(True)
    outputs = {
        "all_logits": jnp.stack(got["all_logits"]),
        "all_boxes": jnp.stack(got["all_boxes"]),
        "enc_logits": got["enc_logits"],
        "enc_boxes": got["enc_boxes"],
        "text_mask": text_mask,
    }
    targets = {
        "labels": jnp.asarray(gt_labels)[None],
        "boxes": jnp.asarray(gt_boxes)[None],
        "valid": jnp.ones((1, 2), bool),
    }
    _, detail = detection_loss_with_aux(outputs, targets, cfg=cfg,
                                        rng=jax.random.PRNGKey(0))
    mine = {k: float(v) for k, v in detail.items()}

    # map (ref key, ref weight) -> our key; ref loss_dict is unweighted,
    # ours already carries the coefficient
    pairs = [
        ("loss_ce", cfg.class_loss_coef, "loss_class"),
        ("loss_bbox", cfg.bbox_loss_coef, "loss_bbox"),
        ("loss_giou", cfg.giou_loss_coef, "loss_giou"),
        ("loss_ce_0", cfg.class_loss_coef, "loss_class_aux0"),
        ("loss_bbox_0", cfg.bbox_loss_coef, "loss_bbox_aux0"),
        ("loss_giou_0", cfg.giou_loss_coef, "loss_giou_aux0"),
        ("loss_ce_enc", cfg.class_loss_coef, "loss_class_enc"),
        ("loss_bbox_enc", cfg.bbox_loss_coef, "loss_bbox_enc"),
        ("loss_giou_enc", cfg.giou_loss_coef, "loss_giou_enc"),
    ]
    report = []
    for rk, w, mk in pairs:
        want = ref_ld[rk] * w
        have = mine[mk]
        report.append(f"{rk:14s} ref*w={want:10.6f}  ours={have:10.6f}")
    print("\n".join(report))
    for rk, w, mk in pairs:
        np.testing.assert_allclose(mine[mk], ref_ld[rk] * w,
                                   rtol=2e-2, atol=2e-3, err_msg=rk)
