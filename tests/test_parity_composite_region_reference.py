"""Composite region-branch parity vs the reference VisionLLMv2 forward.

The reference region path (modeling_visionllmv2.py:609-700): mask-shaped
visual prompts go through RegionEncoder driven by the last-3-level
vis-encoder hidden states, and the resulting features replace the
<region> tokens before the LLM runs. LLM logits are compared on the
converted state dict — this covers the RegionEncoder conversion, the
multi-level feature tap (hidden_states[-3:], CLS stripped), and the
<region> splice ordering.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF_ROOT = "/root/reference/VisionLLMv2"

V_HID = 64
L_HID = 64
VOCAB = 32100
IMG = 32
PATCH = 8


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

    cfg = VisionLLMv2Config(
        vis_encoder_config=dict(
            architectures=["CLIPVisionModel"], hidden_size=V_HID,
            intermediate_size=2 * V_HID, num_hidden_layers=3,
            num_attention_heads=4, image_size=IMG, patch_size=PATCH,
            projection_dim=V_HID),
        llm_config=dict(
            architectures=["LlamaForCausalLM"], hidden_size=L_HID,
            intermediate_size=2 * L_HID, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            vocab_size=VOCAB, rms_norm_eps=1e-5,
            max_position_embeddings=4096),
        vl_bridge_type="mlp2x_gelu", num_embs=4, num_embs_gen=64,
        use_region_encoder=True)
    torch.manual_seed(0)
    model = VisionLLMv2Model(cfg)
    model.eval()

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
    from visionllm_tpu.config import (LLMConfig, RegionEncoderConfig,
                                      VisionEncoderConfig,
                                      VisionLLMConfig)
    return VisionLLMConfig(
        vis_encoder=VisionEncoderConfig(
            image_size=IMG, patch_size=PATCH, hidden_size=V_HID,
            intermediate_size=2 * V_HID, num_layers=3, num_heads=4),
        llm=LLMConfig(vocab_size=VOCAB, hidden_size=L_HID,
                      intermediate_size=2 * L_HID, num_layers=2,
                      num_heads=4, num_kv_heads=4),
        vl_bridge_type="mlp2x_gelu",
        use_region_encoder=True,
        region_encoder=RegionEncoderConfig(
            hidden_dim=256, embed_dim=V_HID, out_dim=L_HID,
            patch_size=PATCH))


@pytest.mark.slow
def test_composite_region_forward_parity_vs_reference(ref_model):
    import torch
    ref, tid = ref_model
    cfg = _my_config()

    img_len = cfg.vis_encoder.num_patches
    ids = ([1, 10, 11, tid.img] + [tid.imp] * img_len + [12]
           + [tid.reg, 13, tid.reg] + [2])      # two region prompts
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    # two box-ish binary masks
    regions = np.zeros((2, IMG, IMG), np.float32)
    regions[0, 4:20, 6:28] = 1.0
    regions[1, 10:30, 2:16] = 1.0

    input_ids_t = torch.tensor([ids], dtype=torch.long)
    with torch.no_grad():
        out = ref(
            input_ids=input_ids_t,
            attention_mask=torch.ones_like(input_ids_t),
            images=torch.from_numpy(images),
            regions=[torch.from_numpy(regions)],
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
                      jnp.asarray(images.transpose(0, 2, 3, 1)), tid,
                      regions=jnp.asarray(regions)[None],
                      compute_logits=True)

    core = model.apply({"params": params}, method=fwd)
    my_logits = np.asarray(core["logits"], np.float32)

    from visionllm_tpu.utils.activation_diff import (diff_report,
                                                     format_report)
    print(format_report(diff_report([
        ("llm_logits", ref_logits, my_logits),
    ])))
    np.testing.assert_allclose(my_logits, ref_logits, atol=2e-3, rtol=1e-2)
