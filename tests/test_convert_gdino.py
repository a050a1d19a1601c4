"""convert_gdino: structural round-trip — synthesize a reference-named
torch-layout state dict from our initialized params (inverse
transforms), convert it back, and check the forward reproduces the
original model's outputs exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import GDinoConfig
from visionllm_tpu.models.grounding_dino.model import GroundingDino
from visionllm_tpu.models.swin import SwinConfig
from visionllm_tpu.utils.convert_gdino import convert_gdino

CFG = GDinoConfig(d_model=32, num_queries=12, encoder_layers=1,
                  decoder_layers=2, num_heads=4, ffn_dim=64, text_dim=48,
                  mask_dim=32, dn_number=0)
SWIN = SwinConfig(patch_size=4, embed_dim=8, depths=(1, 1, 1, 1),
                  num_heads=(2, 2, 4, 4), window_size=4,
                  out_stages=(0, 1, 2, 3))


def _inv_lin(tree, name, sd):
    sd[name + ".weight"] = np.ascontiguousarray(
        np.asarray(tree["kernel"]).T)
    if "bias" in tree:
        sd[name + ".bias"] = np.asarray(tree["bias"])


def _inv_ln(tree, name, sd):
    sd[name + ".weight"] = np.asarray(tree["scale"])
    sd[name + ".bias"] = np.asarray(tree["bias"])


def _inv_conv(tree, name, sd):
    sd[name + ".weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(tree["kernel"]), (3, 2, 0, 1)))
    if "bias" in tree:
        sd[name + ".bias"] = np.asarray(tree["bias"])


def _inv_mha(tree, name, sd):
    qw = np.asarray(tree["q_proj"]["kernel"]).T
    kw = np.asarray(tree["k_proj"]["kernel"]).T
    vw = np.asarray(tree["v_proj"]["kernel"]).T
    sd[name + ".in_proj_weight"] = np.concatenate([qw, kw, vw], 0)
    sd[name + ".in_proj_bias"] = np.concatenate(
        [np.asarray(tree[k]["bias"]) for k in
         ("q_proj", "k_proj", "v_proj")])
    _inv_lin(tree["out_proj"], name + ".out_proj", sd)


def _inv_mlp(tree, name, sd):
    for k, v in tree.items():
        i = k.split("_")[1]
        _inv_lin(v, f"{name}.layers.{i}", sd)


def _inv_deformable(tree, name, sd):
    for k in ("sampling_offsets", "attention_weights", "value_proj",
              "output_proj"):
        _inv_lin(tree[k], f"{name}.{k}", sd)


def _inv_swin(tree, prefix, sd):
    _inv_conv(tree["patch_embed"],
              prefix + "embeddings.patch_embeddings.projection", sd)
    _inv_ln(tree["patch_norm"], prefix + "embeddings.norm", sd)
    for s in range(SWIN.num_stages):
        for b in range(SWIN.depths[s]):
            blk = tree[f"stage{s}_block{b}"]
            lp = prefix + f"encoder.layers.{s}.blocks.{b}."
            _inv_ln(blk["layernorm_before"], lp + "layernorm_before", sd)
            _inv_ln(blk["layernorm_after"], lp + "layernorm_after", sd)
            for ours, theirs in (("query", "attention.self.query"),
                                 ("key", "attention.self.key"),
                                 ("value", "attention.self.value"),
                                 ("proj", "attention.output.dense"),
                                 ("fc1", "intermediate.dense"),
                                 ("fc2", "output.dense")):
                _inv_lin(blk[ours], lp + theirs, sd)
            sd[lp + "attention.self.relative_position_bias_table"] = \
                np.asarray(blk["relative_position_bias_table"])
        if s < SWIN.num_stages - 1:
            dp = prefix + f"encoder.layers.{s}.downsample."
            _inv_ln(tree[f"downsample{s}"]["norm"], dp + "norm", sd)
            sd[dp + "reduction.weight"] = np.ascontiguousarray(
                np.asarray(tree[f"downsample{s}"]["reduction"]["kernel"]).T)
    for s in SWIN.out_stages:
        _inv_ln(tree[f"out_norm{s}"],
                prefix + f"hidden_states_norms.stage{s + 1}", sd)


def _build_reference_sd(params):
    sd = {}
    m = "model."
    _inv_swin(params["backbone"], m + "backbone.conv_encoder.model.", sd)
    for i in range(4):
        _inv_conv(params[f"input_proj_{i}"],
                  m + f"input_proj_vision.{i}.0", sd)
        _inv_ln(params[f"input_proj_norm_{i}"],
                m + f"input_proj_vision.{i}.1", sd)
    for i in range(CFG.encoder_layers):
        enc = params[f"encoder_layer_{i}"]
        lp = m + f"encoder.layers.{i}."
        fus = enc["fusion_layer"]
        _inv_ln(fus["layer_norm_vision"], lp + "fusion_layer.layer_norm_vision", sd)
        _inv_ln(fus["layer_norm_text"], lp + "fusion_layer.layer_norm_text", sd)
        sd[lp + "fusion_layer.vision_param"] = np.asarray(fus["vision_param"])
        sd[lp + "fusion_layer.text_param"] = np.asarray(fus["text_param"])
        for k in ("vision_proj", "text_proj", "values_vision_proj",
                  "values_text_proj", "out_vision_proj", "out_text_proj"):
            _inv_lin(fus["attn"][k], lp + f"fusion_layer.attn.{k}", sd)
        te = enc["text_enhancer_layer"]
        _inv_mha(te["self_attn"], lp + "text_enhancer_layer.self_attn", sd)
        _inv_ln(te["layer_norm_before"],
                lp + "text_enhancer_layer.layer_norm_before", sd)
        _inv_ln(te["layer_norm_after"],
                lp + "text_enhancer_layer.layer_norm_after", sd)
        _inv_lin(te["fc1"], lp + "text_enhancer_layer.fc1", sd)
        _inv_lin(te["fc2"], lp + "text_enhancer_layer.fc2", sd)
        de = enc["deformable_layer"]
        _inv_deformable(de["self_attn"], lp + "deformable_layer.self_attn", sd)
        _inv_ln(de["self_attn_layer_norm"],
                lp + "deformable_layer.self_attn_layer_norm", sd)
        _inv_lin(de["fc1"], lp + "deformable_layer.fc1", sd)
        _inv_lin(de["fc2"], lp + "deformable_layer.fc2", sd)
        _inv_ln(de["final_layer_norm"],
                lp + "deformable_layer.final_layer_norm", sd)
    for i in range(CFG.decoder_layers):
        dec = params[f"decoder_layer_{i}"]
        lp = m + f"decoder.layers.{i}."
        _inv_mha(dec["self_attn"], lp + "self_attn", sd)
        _inv_ln(dec["self_attn_layer_norm"], lp + "self_attn_layer_norm", sd)
        _inv_mha(dec["encoder_attn_text"], lp + "encoder_attn_text", sd)
        _inv_ln(dec["encoder_attn_text_layer_norm"],
                lp + "encoder_attn_text_layer_norm", sd)
        _inv_deformable(dec["encoder_attn"], lp + "encoder_attn", sd)
        _inv_ln(dec["encoder_attn_layer_norm"],
                lp + "encoder_attn_layer_norm", sd)
        _inv_lin(dec["fc1"], lp + "fc1", sd)
        _inv_lin(dec["fc2"], lp + "fc2", sd)
        _inv_ln(dec["final_layer_norm"], lp + "final_layer_norm", sd)
    _inv_ln(params["decoder_layer_norm"], m + "decoder.layer_norm", sd)
    _inv_mlp(params["reference_points_head"],
             m + "decoder.reference_points_head", sd)
    _inv_lin(params["enc_output"], m + "enc_output", sd)
    _inv_ln(params["enc_output_norm"], m + "enc_output_norm", sd)
    _inv_mlp(params["encoder_output_bbox_embed"],
             m + "encoder_output_bbox_embed", sd)
    sd[m + "query_position_embeddings.weight"] = np.asarray(
        params["query_position_embeddings"])
    sd[m + "level_embed"] = np.asarray(params["level_embed"])
    _inv_conv(params["lateral_conv"], m + "lateral_convs.0", sd)
    _inv_ln(params["lateral_norm"], m + "lateral_convs.0.norm", sd)
    _inv_conv(params["output_conv"], m + "output_convs.0", sd)
    _inv_ln(params["output_norm"], m + "output_convs.0.norm", sd)
    _inv_conv(params["mask_features"], m + "mask_features", sd)
    _inv_mlp(params["model_mask_embed"], m + "mask_embed", sd)
    _inv_mlp(params["bbox_embed"], "bbox_embed.0", sd)
    _inv_mlp(params["mask_embed"], "mask_embed.0", sd)
    _inv_mlp(params["patch2query"], "patch2query", sd)
    return sd


@pytest.mark.slow
def test_gdino_converter_roundtrip():
    model = GroundingDino(CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    tq = jnp.asarray(rng.standard_normal((1, 5, 4, CFG.text_dim)),
                     jnp.float32)
    tqm = jnp.ones((1, 5), bool)

    object.__setattr__(model, "_swin_override", SWIN)
    # build the model with the small swin via monkeypatching the config
    import visionllm_tpu.models.grounding_dino.model as gm
    orig = gm.swin_tiny_config
    gm.swin_tiny_config = lambda **kw: SWIN
    try:
        params = model.init(jax.random.PRNGKey(0), px, tq, tqm)["params"]
        out_orig = model.apply({"params": params}, px, tq, tqm)

        sd = _build_reference_sd(jax.device_get(params))
        converted = convert_gdino(sd, CFG, swin_cfg=SWIN)
        converted = jax.tree.map(jnp.asarray, converted)
        out_conv = model.apply({"params": converted}, px, tq, tqm)
    finally:
        gm.swin_tiny_config = orig

    np.testing.assert_allclose(
        np.asarray(out_conv["logits"]), np.asarray(out_orig["logits"]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_conv["pred_boxes"]),
        np.asarray(out_orig["pred_boxes"]), rtol=1e-5, atol=1e-5)
