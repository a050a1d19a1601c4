"""CLIP vision tower parity vs HF CLIPVisionModel (torch CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import VisionEncoderConfig
from visionllm_tpu.models.clip_vit import ClipVisionTower
from visionllm_tpu.utils.torch_convert import (convert_clip_vit,
                                               torch_state_dict_to_numpy)

torch = pytest.importorskip("torch")

CFG = VisionEncoderConfig(image_size=56, patch_size=14, hidden_size=48,
                          intermediate_size=96, num_layers=3, num_heads=4)


def test_hidden_states_parity():
    from transformers import CLIPVisionConfig
    from transformers.models.clip.modeling_clip import CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        image_size=CFG.image_size, patch_size=CFG.patch_size,
        hidden_size=CFG.hidden_size, intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers, num_attention_heads=CFG.num_heads,
        hidden_act="quick_gelu", layer_norm_eps=CFG.layer_norm_eps,
        attn_implementation="eager")
    torch.set_num_threads(1)
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    params = jax.tree.map(
        jnp.asarray, convert_clip_vit(torch_state_dict_to_numpy(hf), CFG))
    tower = ClipVisionTower(CFG, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, CFG.image_size, CFG.image_size, 3),
                                 dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2),
                 output_hidden_states=True)
    hs = tower.apply({"params": params}, jnp.asarray(pixels))

    assert hs.shape[0] == CFG.num_layers + 1
    for i in range(CFG.num_layers + 1):
        np.testing.assert_allclose(
            np.asarray(hs[i]), ref.hidden_states[i].numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f"hidden_states[{i}]")
