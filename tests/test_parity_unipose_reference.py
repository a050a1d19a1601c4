"""Semantic parity vs the ACTUAL reference UniPose forward.

Instantiates the reference torch UniPose (modeling_unipose.py:69-624)
on CPU via utils/ref_shims (timm/mmcv/mmdet/torchvision stubs + a
grid_sample re-composition of the MultiScaleDeformableAttention CUDA
extension), random-initializes it, converts its real state_dict through
utils/convert_unipose, and compares the eval forward against our
UniPose on identical inputs.

Two reference functions are patched (documented deviations):
- `prepare_for_mask` hardcodes `.to('cuda')` (modeling_unipose.py:890)
  AND builds the post-expansion self-attn mask with a group stride of
  num_body_points instead of num_body_points+1 (:891-899), which lets
  some queries attend outside their pose group. Our TPU redesign is
  strictly group-isolated (models/unipose/model.py docstring), so the
  test installs a CPU, strictly-group-isolated mask on the reference —
  everything else (backbone, fusion encoder, two-stage selection,
  box->kpt expansion, pose refinement, heads) is compared verbatim.

d_model must be 256 here: the reference hardcodes 128 sine features per
coordinate (utils/model_utils.py:182) and 256 text-position features
(modeling_unipose.py:2824), both of which only agree with its
d_model-sized projection heads at d_model=256.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF_ROOT = "/root/reference/VisionLLMv2"

D_MODEL = 256
NHEADS = 8
FFN = 512
ENC_LAYERS = 1
DEC_LAYERS = 4
N_Q = 60
NB = 68            # num_body_points (the matcher hardcodes its OKS
                   # sigma table for 68, modeling_unipose.py:3349-3358)
TEXT_DIM = 48      # l_hidden_size
P_OBJ = 3
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
    from visionllmv2.model.unipose.configuration_unipose import UniPoseConfig
    from visionllmv2.model.unipose import modeling_unipose
    return UniPoseConfig, modeling_unipose


def _ref_config_kwargs():
    return dict(
        # backbone
        backbone="swin_T_224_1k", return_interm_indices=[1, 2, 3],
        backbone_freeze_keywords=None, use_checkpoint=False,
        dilation=False, position_embedding="sine",
        pe_temperatureH=20, pe_temperatureW=20, pe_temperature=20,
        # transformer
        hidden_dim=D_MODEL, nheads=NHEADS, enc_layers=ENC_LAYERS,
        dec_layers=DEC_LAYERS, unic_layers=0, dim_feedforward=FFN,
        dropout=0.0, pre_norm=False, transformer_activation="relu",
        enc_n_points=4, dec_n_points=4, query_dim=4, num_patterns=0,
        num_queries=N_Q, num_feature_levels=4,
        random_refpoints_xy=False, fix_refpoints_hw=-1,
        use_deformable_box_attn=False, box_attn_type="roi_align",
        add_channel_attention=False, add_pos_value=False,
        dec_layer_number=None, decoder_layer_noise=False,
        dln_xy_noise=0.2, dln_hw_noise=0.2,
        use_detached_boxes_dec_out=False, use_transformer_ckpt=False,
        ffn_extra_layernorm=False, embed_init_tgt=True,
        decoder_sa_type="sa", decoder_module_seq=["sa", "ca", "ffn"],
        use_fusion_layer=True, use_text_enhancer=True,
        use_text_cross_attention=True, use_text_feat_guide=False,
        text_dropout=0.0, fusion_dropout=0.0, fusion_droppath=0.0,
        # two stage
        two_stage_type="standard", two_stage_add_query_num=0,
        two_stage_bbox_embed_share=False, two_stage_class_embed_share=False,
        two_stage_learn_wh=False, two_stage_keep_all_tokens=False,
        two_stage_pat_embed=0,
        # heads
        num_classes=2, l_hidden_size=TEXT_DIM,
        dec_pred_class_embed_share=True, dec_pred_bbox_embed_share=True,
        num_box_decoder_layers=2, num_body_points=NB,
        binary_query_selection=False, sub_sentence_present=True,
        use_label_enc=False,
        # dn (inert in eval mode)
        dn_number=0, dn_box_noise_scale=1.0, dn_label_noise_ratio=0.5,
        dn_labelbook_size=2000, use_cdn=True, use_dn=False,
        # losses (read in __init__)
        aux_loss=False, matcher_type="HungarianMatcher",
        set_cost_class=2.0, set_cost_bbox=5.0, set_cost_giou=2.0,
        set_cost_keypoint=10.0, set_cost_oks=4.0,
        cls_loss_coef=2.0, bbox_loss_coef=5.0, giou_loss_coef=2.0,
        keypoint_loss_coef=10.0, oks_loss_coef=4.0, focal_alpha=0.25,
    )


def _strict_prepare_for_mask(self, kpt_mask):
    """CPU, strictly-group-isolated replacement for
    modeling_unipose.py:887-916 (see module docstring)."""
    import torch
    bs, length = kpt_mask.shape
    tgt = 50 * length
    mask = torch.ones(bs, self.nheads, tgt, tgt, dtype=torch.bool)
    eq = kpt_mask[:, :, None] == kpt_mask[:, None, :]
    eqh = eq[:, None].expand(bs, self.nheads, length, length)
    for g in range(50):
        s, e = g * length, (g + 1) * length
        mask[:, :, s:e, s:e] = ~eqh
    return None, None, None, mask.flatten(0, 1), None


def _my_config():
    from visionllm_tpu.config import UniPoseConfig
    return UniPoseConfig(
        d_model=D_MODEL, num_queries=N_Q, encoder_layers=ENC_LAYERS,
        decoder_layers=DEC_LAYERS, num_heads=NHEADS, ffn_dim=FFN,
        text_dim=TEXT_DIM, num_box_decoder_layers=2, num_body_points=NB,
        num_groups=50, dn_number=0, pe_temperature=20.0)


@pytest.mark.slow
def test_unipose_forward_parity_vs_reference(ref_modules):
    import torch
    UniPoseConfig, mu = ref_modules

    cfg = UniPoseConfig(**_ref_config_kwargs())
    torch.manual_seed(0)
    ref = mu.UniPose(cfg)
    ref.eval()
    mu.UniPose.prepare_for_mask = _strict_prepare_for_mask

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    oq = rng.standard_normal((1, P_OBJ, NUM_EMBS, TEXT_DIM)).astype(
        np.float32)
    oqm = np.ones((1, P_OBJ), np.int64)
    kq = rng.standard_normal((1, NB, NUM_EMBS, TEXT_DIM)).astype(np.float32)
    kqm = np.ones((1, NB), np.int64)

    from visionllmv2.model.unipose.utils.misc import NestedTensor
    samples = NestedTensor(torch.from_numpy(pixels),
                           torch.zeros(1, IMG, IMG, dtype=torch.bool))
    text_query = {
        "obj_querys": torch.from_numpy(oq),
        "obj_query_masks": torch.from_numpy(oqm),
        "kpt_querys": torch.from_numpy(kq),
        "kpt_query_masks": torch.from_numpy(kqm),
    }
    with torch.no_grad():
        out = ref(samples, text_query=text_query)
    ref_logits = out["pred_logits"].numpy()        # [1, 50, P_OBJ]
    ref_boxes = out["pred_boxes"].numpy()          # [1, 50, 4]
    ref_kpts = out["pred_keypoints"].numpy()       # [1, 50, NB*3]

    # convert the reference's REAL state dict
    from visionllm_tpu.models.unipose.model import UniPose
    from visionllm_tpu.utils.convert_unipose import convert_unipose
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_unipose(sd, _my_config())

    model = UniPose(_my_config(), dtype=jnp.float32)
    got = model.apply(
        {"params": params},
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),   # NCHW -> NHWC
        jnp.asarray(oq), jnp.asarray(oqm.astype(bool)),
        jnp.asarray(kq), jnp.asarray(kqm.astype(bool)))

    my_logits = np.asarray(got["pred_logits"], np.float32)
    my_boxes = np.asarray(got["pred_boxes"], np.float32)
    my_kpts = np.asarray(got["pred_keypoints"], np.float32)

    from visionllm_tpu.utils.activation_diff import (diff_report,
                                                     format_report)
    print(format_report(diff_report([
        ("pred_logits", ref_logits, my_logits),
        ("pred_boxes", ref_boxes, my_boxes),
        ("pred_keypoints", ref_kpts, my_kpts),
    ])))
    np.testing.assert_allclose(my_boxes, ref_boxes, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(my_logits, ref_logits, atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(my_kpts, ref_kpts, atol=2e-3, rtol=1e-2)
