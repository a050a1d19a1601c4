"""Composite parity for the 26B-style variant: InternViT (QK-norm,
layer-scale) + InternLM2 (GQA, packed wqkv) + pixel-shuffle +
internvl_mlp bridge — the glue path of vllm_26b_config.

Mirrors tests/test_parity_composite_reference.py but exercises the
other encoder/LLM architectures end-to-end through
convert_composite_core's arch dispatch: reference VisionLLMv2 forward
(vendored InternVisionModel + InternLM2ForCausalLM,
modeling_visionllmv2.py:132-143 + pixel_shuffle :381-394 +
llm.output head :739) vs our core on the converted state dict.
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
            architectures=["InternVisionModel"], hidden_size=V_HID,
            intermediate_size=2 * V_HID, num_hidden_layers=3,
            num_attention_heads=4, image_size=IMG, patch_size=PATCH,
            qkv_bias=False, qk_normalization=True, use_flash_attn=False,
            initializer_factor=0.1, drop_path_rate=0.0),
        llm_config=dict(
            architectures=["InternLM2ForCausalLM"], hidden_size=L_HID,
            intermediate_size=2 * L_HID, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            vocab_size=VOCAB, rms_norm_eps=1e-5, bias=False,
            max_position_embeddings=4096, attn_implementation="eager"),
        vl_bridge_type="internvl_mlp", use_pixelshuffle=True,
        vis_output_layer=-1, num_embs=4, num_embs_gen=64)
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
    from visionllm_tpu.config import (LLMConfig, VisionEncoderConfig,
                                      VisionLLMConfig)
    return VisionLLMConfig(
        vis_encoder=VisionEncoderConfig(
            arch="intern_vit", image_size=IMG, patch_size=PATCH,
            hidden_size=V_HID, intermediate_size=2 * V_HID, num_layers=3,
            num_heads=4, layer_norm_eps=1e-6, hidden_act="gelu",
            qk_normalization=True, use_ls=True, qkv_bias=False,
            output_layer=-1),
        llm=LLMConfig(arch="internlm2", vocab_size=VOCAB,
                      hidden_size=L_HID, intermediate_size=2 * L_HID,
                      num_layers=2, num_heads=4, num_kv_heads=2),
        vl_bridge_type="internvl_mlp",
        use_pixelshuffle=True)


@pytest.mark.slow
def test_composite_internvl_forward_parity_vs_reference(ref_model):
    import torch
    ref, tid = ref_model
    cfg = _my_config()

    # pixel-shuffle 0.5 quarters the token count: 16 patches -> 4 rows
    n_imp = cfg.vis_encoder.num_patches // 4
    ids = ([1, 10, 11, tid.img] + [tid.imp] * n_imp + [12, 13, 2])
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)

    input_ids_t = torch.tensor([ids], dtype=torch.long)
    with torch.no_grad():
        out = ref(
            input_ids=input_ids_t,
            attention_mask=torch.ones_like(input_ids_t),
            images=torch.from_numpy(images),
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
                      compute_logits=True)

    core = model.apply({"params": params}, method=fwd)
    my_logits = np.asarray(core["logits"], np.float32)

    from visionllm_tpu.utils.activation_diff import (diff_report,
                                                     format_report)
    print(format_report(diff_report([("llm_logits", ref_logits,
                                      my_logits)])))
    np.testing.assert_allclose(my_logits, ref_logits, atol=2e-3, rtol=1e-2)
