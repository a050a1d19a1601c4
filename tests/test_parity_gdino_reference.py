"""Semantic parity vs the ACTUAL reference grounding-dino forward.

Instantiates the reference's torch OVGroundingDinoForObjectDetection
(modeling_ov_grounding_dino_mask_dn.py) on CPU via utils/ref_shims,
random-initializes it, converts its real state_dict through
utils/convert_gdino, and compares the inference forward
(forward_test :3124-3210) against our GroundingDino on identical
inputs. This validates the converter AND the JAX model semantics
against the reference implementation itself — far stronger than the
round-trip tests (the released checkpoint is unreachable offline, but
the reference *code* is the same math).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference/VisionLLMv2"


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
    from visionllmv2.model.grounding_dino.modeling_ov_grounding_dino_mask_dn import (  # noqa: E501
        OVGroundingDinoForObjectDetection)
    return GroundingDinoConfig, OVGroundingDinoForObjectDetection


D_MODEL = 32
TEXT_DIM = 48
N_Q = 12
P = 5          # text-query patches
NUM_EMBS = 4
IMG = 128   # stride-64 extra level must be >1x1 for torch GN


def _build_reference(ref_modules, seed=0):
    import torch
    from transformers import SwinConfig as HFSwinConfig
    GroundingDinoConfig, OVGroundingDino = ref_modules
    swin = HFSwinConfig(
        image_size=IMG, patch_size=4, embed_dim=8, depths=[1, 1, 1, 1],
        num_heads=[2, 2, 4, 4], window_size=4,
        out_features=["stage1", "stage2", "stage3", "stage4"])
    cfg = GroundingDinoConfig(
        backbone_config=swin, d_model=D_MODEL,
        encoder_layers=1, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_queries=N_Q, num_feature_levels=4, max_text_len=48)
    # training-time attribute overrides (train/train.py:417-436)
    cfg.mask_dim = D_MODEL
    cfg.norm = "GN"
    cfg.l_hidden_size = TEXT_DIM
    torch.manual_seed(seed)
    model = OVGroundingDino(cfg)
    model.eval()
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
def test_forward_test_parity_vs_reference(ref_modules):
    import torch

    ref = _build_reference(ref_modules)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    tq = rng.standard_normal((1, P, NUM_EMBS, TEXT_DIM)).astype(np.float32)
    tq_mask = np.ones((1, P), np.int64)
    pixel_mask = np.ones((1, IMG, IMG), bool)

    with torch.no_grad():
        out = ref(
            pixel_values=torch.from_numpy(pixels),
            pixel_mask=torch.from_numpy(pixel_mask),
            text_query=torch.from_numpy(tq),
            text_query_masks=torch.from_numpy(tq_mask),
        )
    ref_logits = out.logits.numpy()          # [1, Q, max_text_len]
    ref_boxes = out.pred_boxes.numpy()       # [1, Q, 4]
    ref_masks = out.pred_masks.numpy()       # [1, Q, h, w]

    # convert the reference's REAL state dict
    from visionllm_tpu.models.grounding_dino.model import GroundingDino
    from visionllm_tpu.models.swin import SwinConfig
    from visionllm_tpu.utils.convert_gdino import convert_gdino
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    swin_cfg = SwinConfig(patch_size=4, embed_dim=8, depths=(1, 1, 1, 1),
                          num_heads=(2, 2, 4, 4), window_size=4,
                          out_stages=(0, 1, 2, 3))
    params = convert_gdino(sd, _my_config(), swin_cfg=swin_cfg)

    model = GroundingDino(_my_config(), dtype=jnp.float32)
    got = model.apply(
        {"params": params},
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),   # NCHW → NHWC
        jnp.asarray(tq), jnp.asarray(tq_mask.astype(bool)),
        pixel_mask=jnp.asarray(pixel_mask))

    my_logits = np.asarray(got["all_logits"][-1], np.float32)
    my_boxes = np.asarray(got["all_boxes"][-1], np.float32)
    my_masks = np.asarray(got["all_masks"][-1], np.float32)

    from visionllm_tpu.utils.activation_diff import (diff_report,
                                                     format_report)
    rows = diff_report([
        ("logits[:P]", ref_logits[..., :P], my_logits[..., :P]),
        ("pred_boxes", ref_boxes, my_boxes),
        ("pred_masks", ref_masks, my_masks),
    ])
    print(format_report(rows))
    np.testing.assert_allclose(my_boxes, ref_boxes, atol=1e-3, rtol=1e-3)
    # valid text columns must match; padded columns are -inf (torch)
    # vs finfo.min (XLA has no -inf literal path here) — both rank last
    np.testing.assert_allclose(my_logits[..., :P], ref_logits[..., :P],
                               atol=5e-3, rtol=1e-2)
    assert (my_logits[..., P:] < -1e30).all()
    assert np.isneginf(ref_logits[..., P:]).all()
    np.testing.assert_allclose(my_masks, ref_masks, atol=5e-3, rtol=1e-2)
