"""convert_unipose: structural round-trip (reference-named synthetic
state dict built from our params → converter → identical forward)."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_convert_gdino import (_inv_deformable, _inv_ln, _inv_lin,
                                      _inv_mha, _inv_mlp)
from visionllm_tpu.config import UniPoseConfig
from visionllm_tpu.models.swin import SwinConfig
from visionllm_tpu.models.unipose.model import UniPose
from visionllm_tpu.utils.convert_unipose import convert_unipose

CFG = UniPoseConfig(d_model=32, num_queries=12, encoder_layers=1,
                    decoder_layers=3, num_heads=4, ffn_dim=64, text_dim=48,
                    num_box_decoder_layers=2, num_body_points=18,
                    num_groups=4)
SWIN = SwinConfig(patch_size=4, embed_dim=8, depths=(1, 1, 1, 1),
                  num_heads=(2, 2, 4, 4), window_size=4,
                  out_stages=(1, 2, 3))


def _inv_conv(tree, name, sd):
    sd[name + ".weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(tree["kernel"]), (3, 2, 0, 1)))
    if "bias" in tree:
        sd[name + ".bias"] = np.asarray(tree["bias"])


def _inv_vendored_swin(tree, prefix, sd):
    _inv_conv(tree["patch_embed"], prefix + "patch_embed.proj", sd)
    _inv_ln(tree["patch_norm"], prefix + "patch_embed.norm", sd)
    for s in range(SWIN.num_stages):
        for b in range(SWIN.depths[s]):
            blk = tree[f"stage{s}_block{b}"]
            lp = prefix + f"layers.{s}.blocks.{b}."
            _inv_ln(blk["layernorm_before"], lp + "norm1", sd)
            _inv_ln(blk["layernorm_after"], lp + "norm2", sd)
            qw = np.asarray(blk["query"]["kernel"]).T
            kw = np.asarray(blk["key"]["kernel"]).T
            vw = np.asarray(blk["value"]["kernel"]).T
            sd[lp + "attn.qkv.weight"] = np.concatenate([qw, kw, vw], 0)
            sd[lp + "attn.qkv.bias"] = np.concatenate(
                [np.asarray(blk[k]["bias"])
                 for k in ("query", "key", "value")])
            _inv_lin(blk["proj"], lp + "attn.proj", sd)
            _inv_lin(blk["fc1"], lp + "mlp.fc1", sd)
            _inv_lin(blk["fc2"], lp + "mlp.fc2", sd)
            sd[lp + "attn.relative_position_bias_table"] = np.asarray(
                blk["relative_position_bias_table"])
        if s < SWIN.num_stages - 1:
            dp = prefix + f"layers.{s}.downsample."
            _inv_ln(tree[f"downsample{s}"]["norm"], dp + "norm", sd)
            sd[dp + "reduction.weight"] = np.ascontiguousarray(
                np.asarray(tree[f"downsample{s}"]["reduction"]["kernel"]).T)
    for s in SWIN.out_stages:
        _inv_ln(tree[f"out_norm{s}"], prefix + f"norm{s}", sd)


import pytest


@pytest.mark.slow  # 60s+ of CPU compile; strictly weaker than the
# reference parity test (test_parity_unipose_reference.py), which
# validates the converter against the actual torch UniPose
def test_unipose_converter_roundtrip():
    model = UniPose(CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    oq = jnp.asarray(rng.standard_normal((1, 4, 4, CFG.text_dim)),
                     jnp.float32)
    oqm = jnp.ones((1, 4), bool)
    kq = jnp.asarray(rng.standard_normal((1, CFG.num_body_points, 4,
                                          CFG.text_dim)), jnp.float32)
    kqm = jnp.ones((1, CFG.num_body_points), bool)

    import visionllm_tpu.models.unipose.model as um
    orig = um.swin_tiny_config
    um.swin_tiny_config = lambda **kw: SWIN
    try:
        params = model.init(jax.random.PRNGKey(0), px, oq, oqm, kq,
                            kqm)["params"]
        want = model.apply({"params": params}, px, oq, oqm, kq, kqm)

        sd = {}
        pr = jax.device_get(params)
        t = "transformer."
        _inv_vendored_swin(pr["backbone"], "backbone.0.", sd)
        for i in range(4):
            _inv_conv(pr[f"input_proj_{i}"], f"input_proj.{i}.0", sd)
            _inv_ln(pr[f"input_proj_norm_{i}"], f"input_proj.{i}.1", sd)
        _inv_mlp(pr["projection_llava"], "projection_llava", sd)
        _inv_mlp(pr["projection_kpt_llava"], "projection_kpt_llava", sd)
        for i in range(CFG.encoder_layers):
            enc = pr[f"encoder_layer_{i}"]
            fl = t + f"encoder.fusion_layers.{i}."
            fus = enc["fusion_layer"]
            _inv_ln(fus["layer_norm_vision"], fl + "layer_norm_v", sd)
            _inv_ln(fus["layer_norm_text"], fl + "layer_norm_l", sd)
            sd[fl + "gam_v"] = np.asarray(fus["vision_param"])
            sd[fl + "gam_l"] = np.asarray(fus["text_param"])
            for ours, theirs in (("vision_proj", "v_proj"),
                                 ("text_proj", "l_proj"),
                                 ("values_vision_proj", "values_v_proj"),
                                 ("values_text_proj", "values_l_proj"),
                                 ("out_vision_proj", "out_v_proj"),
                                 ("out_text_proj", "out_l_proj")):
                _inv_lin(fus["attn"][ours], fl + f"attn.{theirs}", sd)
            tl = t + f"encoder.text_layers.{i}."
            te = enc["text_layer"]
            _inv_mha(te["self_attn"], tl + "self_attn", sd)
            for n in ("norm1", "norm2"):
                _inv_ln(te[n], tl + n, sd)
            for n in ("linear1", "linear2"):
                _inv_lin(te[n], tl + n, sd)
            lp = t + f"encoder.layers.{i}."
            de = enc["deformable_layer"]
            _inv_deformable(de["self_attn"], lp + "self_attn", sd)
            _inv_ln(de["self_attn_layer_norm"], lp + "norm1", sd)
            _inv_lin(de["fc1"], lp + "linear1", sd)
            _inv_lin(de["fc2"], lp + "linear2", sd)
            _inv_ln(de["final_layer_norm"], lp + "norm2", sd)
        for i in range(CFG.decoder_layers):
            dec = pr[f"decoder_layer_{i}"]
            lp = t + f"decoder.layers.{i}."
            _inv_mha(dec["self_attn"], lp + "self_attn", sd)
            _inv_mha(dec["ca_text"], lp + "ca_text", sd)
            _inv_deformable(dec["cross_attn"], lp + "cross_attn", sd)
            for n in ("norm1", "norm2", "norm3", "catext_norm"):
                _inv_ln(dec[n], lp + n, sd)
            for n in ("linear1", "linear2"):
                _inv_lin(dec[n], lp + n, sd)
        _inv_ln(pr["decoder_norm"], t + "decoder.norm", sd)
        _inv_mlp(pr["ref_point_head"], t + "decoder.ref_point_head", sd)
        sd[t + "level_embed"] = np.asarray(pr["level_embed"])
        sd[t + "tgt_embed.weight"] = np.asarray(pr["tgt_embed"])
        _inv_lin(pr["enc_output"], t + "enc_output", sd)
        _inv_ln(pr["enc_output_norm"], t + "enc_output_norm", sd)
        _inv_mlp(pr["enc_out_bbox_embed"], t + "enc_out_bbox_embed", sd)
        _inv_mlp(pr["bbox_embed"], "bbox_embed.0", sd)
        _inv_mlp(pr["pose_embed"], "pose_embed.0", sd)
        _inv_mlp(pr["pose_hw_embed"], "pose_hw_embed.0", sd)
        sd[t + "decoder.hw.weight"] = np.asarray(pr["hw"])
        sd[t + "decoder.hw_append.weight"] = np.asarray(pr["hw_append"])

        conv = jax.tree.map(jnp.asarray,
                            convert_unipose(sd, CFG, swin_cfg=SWIN))
        got = model.apply({"params": conv}, px, oq, oqm, kq, kqm)
    finally:
        um.swin_tiny_config = orig

    np.testing.assert_allclose(np.asarray(got["pred_boxes"]),
                               np.asarray(want["pred_boxes"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["pred_keypoints"]),
                               np.asarray(want["pred_keypoints"]),
                               rtol=1e-5, atol=1e-5)
