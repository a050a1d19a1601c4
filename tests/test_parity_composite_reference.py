"""Semantic parity vs the ACTUAL reference VisionLLMv2 composite forward.

Instantiates the reference torch VisionLLMv2Model
(modeling_visionllmv2.py:394-897) on CPU — tiny CLIP vision tower +
tiny LLaMA + micro-swin grounding-dino — random-initialized, converts
its real state_dict through utils/torch_convert.convert_composite, and
compares against our VisionLLMWithTools on the same det-style prompt:

- LLM logits after [EMB]-embedding injection + image-feature scatter
  (validates the vectorized routing vs the reference's per-sample
  python loops, :423-527 + :589-607)
- the [EMB] hidden-state extraction into gdino text queries (:762-788)
- the grounding-dino head outputs end-to-end
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF_ROOT = "/root/reference/VisionLLMv2"

V_HID = 64
V_LAYERS = 3
L_HID = 64
L_LAYERS = 2
VOCAB = 32100
IMG = 32          # CLIP input
PATCH = 8         # -> 16 image patch tokens
DET_IMG = 128     # gdino input (stride-64 level stays >1x1)
D_MODEL = 32
N_Q = 12


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

    gdino_cfg = dict(
        backbone_config=dict(
            model_type="swin", image_size=DET_IMG, patch_size=4,
            embed_dim=8, depths=[1, 1, 1, 1], num_heads=[2, 2, 4, 4],
            window_size=4,
            out_features=["stage1", "stage2", "stage3", "stage4"]),
        d_model=D_MODEL, encoder_layers=1, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_queries=N_Q, num_feature_levels=4, max_text_len=48)
    cfg = VisionLLMv2Config(
        vis_encoder_config=dict(
            architectures=["CLIPVisionModel"], hidden_size=V_HID,
            intermediate_size=2 * V_HID, num_hidden_layers=V_LAYERS,
            num_attention_heads=4, image_size=IMG, patch_size=PATCH,
            projection_dim=V_HID),
        llm_config=dict(
            architectures=["LlamaForCausalLM"], hidden_size=L_HID,
            intermediate_size=2 * L_HID, num_hidden_layers=L_LAYERS,
            num_attention_heads=4, num_key_value_heads=4,
            vocab_size=VOCAB, rms_norm_eps=1e-5,
            max_position_embeddings=4096),
        vl_bridge_type="mlp2x_gelu", num_embs=4, num_embs_gen=64,
        use_gdino=True, gdino_config=gdino_cfg)
    # training-time attribute overrides (train/train.py:417-436)
    cfg.gdino_config.mask_dim = D_MODEL
    cfg.gdino_config.norm = "GN"
    cfg.gdino_config.l_hidden_size = L_HID
    torch.manual_seed(0)
    model = VisionLLMv2Model(cfg)
    model.eval()

    # init_special_token_ids without a tokenizer: the synthetic layout
    # mirrors the reference's token-addition order (train.py:350-354)
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
    from visionllm_tpu.config import (GDinoConfig, LLMConfig,
                                      VisionEncoderConfig,
                                      VisionLLMConfig)
    return VisionLLMConfig(
        vis_encoder=VisionEncoderConfig(
            image_size=IMG, patch_size=PATCH, hidden_size=V_HID,
            intermediate_size=2 * V_HID, num_layers=V_LAYERS,
            num_heads=4),
        llm=LLMConfig(vocab_size=VOCAB, hidden_size=L_HID,
                      intermediate_size=2 * L_HID, num_layers=L_LAYERS,
                      num_heads=4, num_kv_heads=4),
        vl_bridge_type="mlp2x_gelu",
        use_gdino=True,
        gdino=GDinoConfig(
            d_model=D_MODEL, num_queries=N_Q, encoder_layers=1,
            decoder_layers=2, num_heads=4, ffn_dim=64, text_dim=L_HID,
            mask_dim=D_MODEL, dn_number=0, max_text_len=48,
            backbone_overrides={"patch_size": 4, "embed_dim": 8,
                                "depths": (1, 1, 1, 1),
                                "num_heads": (2, 2, 4, 4),
                                "window_size": 4}))


@pytest.mark.slow
def test_composite_det_forward_parity_vs_reference(ref_model):
    import torch
    ref, tid = ref_model
    cfg = _my_config()

    img_len = cfg.vis_encoder.num_patches          # 16
    ids = ([1, 10, 11, tid.img] + [tid.imp] * img_len + [12]
           + [tid.det] + [tid.emb + i for i in range(cfg.num_embs)]
           + [2])
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    images_aug = rng.standard_normal((3, DET_IMG, DET_IMG)).astype(
        np.float32)

    input_ids_t = torch.tensor([ids], dtype=torch.long)
    with torch.no_grad():
        out = ref(
            input_ids=input_ids_t,
            attention_mask=torch.ones_like(input_ids_t),
            images=torch.from_numpy(images),
            images_aug=[torch.from_numpy(images_aug)],
            img_metas=[{"task": "det"}],
            return_dict=True,
        )
    ref_logits = out.logits.numpy()                    # [1, L, VOCAB]
    ref_det = out.gdino_outputs
    ref_boxes = ref_det.pred_boxes.numpy()
    ref_det_logits = ref_det.logits.numpy()
    ref_masks = ref_det.pred_masks.numpy()

    # convert the reference's REAL flat state dict
    from visionllm_tpu.models.composite import VisionLLMWithTools
    from visionllm_tpu.utils.torch_convert import convert_composite
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_composite(sd, cfg)

    model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    input_ids = jnp.asarray([ids], jnp.int32)
    images_j = jnp.asarray(images.transpose(0, 2, 3, 1))
    images_aug_j = jnp.asarray(images_aug.transpose(1, 2, 0))[None]

    def fwd(m):
        core = m.core(input_ids, images_j, tid, compute_logits=True)
        det = m.infer_det(input_ids, images_j, images_aug_j, tid)
        return core, det

    core, det = model.apply({"params": params}, method=fwd)
    my_logits = np.asarray(core["logits"], np.float32)
    my_boxes = np.asarray(det["all_boxes"][-1], np.float32)
    my_det_logits = np.asarray(det["all_logits"][-1], np.float32)
    my_masks = np.asarray(det["all_masks"][-1], np.float32)

    from visionllm_tpu.utils.activation_diff import (diff_report,
                                                     format_report)
    P = 1   # one [EMB] group -> one text-query patch
    print(format_report(diff_report([
        ("llm_logits", ref_logits, my_logits),
        ("det_boxes", ref_boxes, my_boxes),
        ("det_logits[:P]", ref_det_logits[..., :P], my_det_logits[..., :P]),
        ("det_masks", ref_masks, my_masks),
    ])))
    np.testing.assert_allclose(my_logits, ref_logits, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(my_boxes, ref_boxes, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(my_det_logits[..., :P],
                               ref_det_logits[..., :P],
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(my_masks, ref_masks, atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_composite_anyres_forward_parity_vs_reference(ref_model):
    """'anyres' image mode (images as a per-sample tile list, reference
    :562-575): tile features scatter into <im_patch> slots split-major.
    Ours takes the same tiles stacked [B, T, H, W, 3]."""
    import torch
    ref, tid = ref_model
    cfg = _my_config()

    T = 3                                      # 2 splits + global tile
    img_len = cfg.vis_encoder.num_patches
    ids = ([1, 10, 11, tid.img] + [tid.imp] * (T * img_len) + [12, 2])
    rng = np.random.default_rng(1)
    tiles = rng.standard_normal((T, 3, IMG, IMG)).astype(np.float32)

    input_ids_t = torch.tensor([ids], dtype=torch.long)
    with torch.no_grad():
        out = ref(
            input_ids=input_ids_t,
            attention_mask=torch.ones_like(input_ids_t),
            images=[torch.from_numpy(tiles)],      # anyres: list entry
            return_dict=True,
        )
    ref_logits = out.logits.numpy()

    from visionllm_tpu.models.composite import VisionLLMWithTools
    from visionllm_tpu.utils.torch_convert import convert_composite
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_composite(sd, cfg)
    model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                               tool_dtype=jnp.float32)

    def fwd(m):
        return m.core(jnp.asarray([ids], jnp.int32),
                      jnp.asarray(tiles.transpose(0, 2, 3, 1))[None],
                      tid, compute_logits=True)

    core = model.apply({"params": params}, method=fwd)
    my_logits = np.asarray(core["logits"], np.float32)
    np.testing.assert_allclose(my_logits, ref_logits, atol=2e-3, rtol=1e-2)
