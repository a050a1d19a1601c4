"""Composite pose-branch parity vs the reference VisionLLMv2 forward.

Extends tests/test_parity_composite_reference.py to the pose task: the
reference model (tiny CLIP + tiny LLaMA + full-dim UniPose — the
reference hardcodes 256 sine features and 50 pose groups, see
tests/test_parity_unipose_reference.py) runs the 'pose' branch
(modeling_visionllmv2.py:798-852): [EMB] hidden states are split into
object vs keypoint queries by img_metas['id2index'] length, then fed to
UniPose. Ours runs infer_pose on the converted state dict.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_parity_unipose_reference import (DEC_LAYERS, ENC_LAYERS,
                                                 FFN, N_Q, NB, NHEADS,
                                                 _ref_config_kwargs,
                                                 _strict_prepare_for_mask)

REF_ROOT = "/root/reference/VisionLLMv2"

V_HID = 64
L_HID = 256      # reference UniPose projection_llava expects
                 # l_hidden_size; keep the LLM at 256 so hidden ==
                 # l_hidden_size without an extra bridge
VOCAB = 32100
IMG = 32
PATCH = 8
POSE_IMG = 128
N_KPT = 17       # keypoint classes carried in the prompt


@pytest.fixture(scope="module")
def ref_model():
    from visionllm_tpu.utils.ref_shims import install_reference_shims
    install_reference_shims()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import warnings
    warnings.filterwarnings("ignore")
    import torch
    from visionllmv2.model.configuration_visionllmv2 import VisionLLMv2Config
    from visionllmv2.model.modeling_visionllmv2 import VisionLLMv2Model
    from visionllmv2.model.unipose import modeling_unipose

    unipose_cfg = _ref_config_kwargs()
    unipose_cfg["l_hidden_size"] = L_HID
    cfg = VisionLLMv2Config(
        vis_encoder_config=dict(
            architectures=["CLIPVisionModel"], hidden_size=V_HID,
            intermediate_size=2 * V_HID, num_hidden_layers=2,
            num_attention_heads=4, image_size=IMG, patch_size=PATCH,
            projection_dim=V_HID),
        llm_config=dict(
            architectures=["LlamaForCausalLM"], hidden_size=L_HID,
            intermediate_size=2 * L_HID, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            vocab_size=VOCAB, rms_norm_eps=1e-5,
            max_position_embeddings=4096),
        vl_bridge_type="mlp2x_gelu", num_embs=4, num_embs_gen=64,
        use_unipose=True, unipose_config=unipose_cfg)
    torch.manual_seed(0)
    model = VisionLLMv2Model(cfg)
    model.eval()
    modeling_unipose.UniPose.prepare_for_mask = _strict_prepare_for_mask

    from visionllm_tpu.models.visionllm import SpecialTokenIds
    tid = SpecialTokenIds.synthetic()
    model.pad_token_id = tid.pad
    model.img_token_id = tid.img
    model.imp_token_id = tid.imp
    model.reg_token_id = tid.reg
    model.emb_token_id = tid.emb
    model.det_tool_id = tid.det
    model.grd_tool_id = tid.grd
    model.seg_tool_id = tid.seg
    model.pose_tool_id = tid.pose
    model.gen_tool_id = tid.gen
    model.edit_tool_id = tid.edit
    return model, tid


def _my_config():
    from visionllm_tpu.config import (LLMConfig, UniPoseConfig,
                                      VisionEncoderConfig,
                                      VisionLLMConfig)
    return VisionLLMConfig(
        vis_encoder=VisionEncoderConfig(
            image_size=IMG, patch_size=PATCH, hidden_size=V_HID,
            intermediate_size=2 * V_HID, num_layers=2, num_heads=4),
        llm=LLMConfig(vocab_size=VOCAB, hidden_size=L_HID,
                      intermediate_size=2 * L_HID, num_layers=2,
                      num_heads=4, num_kv_heads=4),
        vl_bridge_type="mlp2x_gelu",
        use_unipose=True,
        unipose=UniPoseConfig(
            d_model=256, num_queries=N_Q, encoder_layers=ENC_LAYERS,
            decoder_layers=DEC_LAYERS, num_heads=NHEADS, ffn_dim=FFN,
            text_dim=L_HID, num_box_decoder_layers=2, num_body_points=NB,
            num_groups=50, dn_number=0, pe_temperature=20.0))


@pytest.mark.slow
def test_composite_pose_forward_parity_vs_reference(ref_model):
    import torch
    ref, tid = ref_model
    cfg = _my_config()

    img_len = cfg.vis_encoder.num_patches
    emb4 = lambda tool: [tool] + [tid.emb + i for i in range(4)]
    ids = ([1, 10, 11, tid.img] + [tid.imp] * img_len + [12]
           + emb4(tid.det)                       # 1 object class
           + sum((emb4(tid.pose) for _ in range(N_KPT)), [])
           + [2])
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    images_aug = rng.standard_normal((3, POSE_IMG, POSE_IMG)).astype(
        np.float32)

    input_ids_t = torch.tensor([ids], dtype=torch.long)
    with torch.no_grad():
        out = ref(
            input_ids=input_ids_t,
            attention_mask=torch.ones_like(input_ids_t),
            images=torch.from_numpy(images),
            images_aug=[torch.from_numpy(images_aug)],
            img_metas=[{"task": "pose", "id2index": {0: 0}}],
            return_dict=True,
        )
    pose = out.unipose_outputs
    pose = pose if isinstance(pose, dict) else pose.__dict__
    ref_logits = np.asarray(pose["pred_logits"])
    ref_boxes = np.asarray(pose["pred_boxes"])
    ref_kpts = np.asarray(pose["pred_keypoints"])

    from visionllm_tpu.models.composite import VisionLLMWithTools
    from visionllm_tpu.utils.torch_convert import convert_composite
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_composite(sd, cfg)

    model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    got = model.apply(
        {"params": params}, jnp.asarray([ids], jnp.int32),
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(images_aug.transpose(1, 2, 0))[None], tid, 1,
        method=VisionLLMWithTools.infer_pose)

    my_logits = np.asarray(got["pred_logits"], np.float32)
    my_boxes = np.asarray(got["pred_boxes"], np.float32)
    my_kpts = np.asarray(got["pred_keypoints"], np.float32)

    from visionllm_tpu.utils.activation_diff import (diff_report,
                                                     format_report)
    print(format_report(diff_report([
        ("pose_logits", ref_logits[..., :1], my_logits[..., :1]),
        ("pose_boxes", ref_boxes, my_boxes),
        ("pose_keypoints", ref_kpts, my_kpts),
    ])))
    np.testing.assert_allclose(my_boxes, ref_boxes, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(my_logits[..., :1], ref_logits[..., :1],
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(my_kpts, ref_kpts, atol=2e-3, rtol=1e-2)
