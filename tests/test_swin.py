"""Swin backbone parity vs HF SwinBackbone (torch CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.models.swin import SwinBackbone, SwinConfig
from visionllm_tpu.utils.torch_convert import (convert_swin,
                                               torch_state_dict_to_numpy)

torch = pytest.importorskip("torch")

CFG = SwinConfig(patch_size=4, embed_dim=16, depths=(2, 2, 2),
                 num_heads=(2, 2, 4), window_size=4, out_stages=(0, 1, 2))


@pytest.mark.parametrize("hw", [(32, 32), (36, 44)])
def test_backbone_parity(hw):
    from transformers import SwinConfig as HFSwinConfig
    from transformers.models.swin.modeling_swin import SwinBackbone as HFSwinBackbone

    hf_cfg = HFSwinConfig(
        image_size=224, patch_size=CFG.patch_size, embed_dim=CFG.embed_dim,
        depths=list(CFG.depths), num_heads=list(CFG.num_heads),
        window_size=CFG.window_size, mlp_ratio=CFG.mlp_ratio,
        drop_path_rate=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        out_features=["stage1", "stage2", "stage3"])
    torch.set_num_threads(1)
    torch.manual_seed(0)
    hf = HFSwinBackbone(hf_cfg).eval()

    params = jax.tree.map(
        jnp.asarray, convert_swin(torch_state_dict_to_numpy(hf), CFG))
    model = SwinBackbone(CFG, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    H, W = hw
    pixels = rng.standard_normal((2, H, W, 3), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2))
    feats = model.apply({"params": params}, jnp.asarray(pixels))

    assert len(feats) == len(ref.feature_maps)
    for i, (got, want) in enumerate(zip(feats, ref.feature_maps)):
        want = want.permute(0, 2, 3, 1).numpy()   # NCHW -> NHWC
        assert got.shape == want.shape, (i, got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4, err_msg=f"stage {i}")
