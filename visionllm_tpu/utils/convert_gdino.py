"""Released-checkpoint converter for the grounding-dino atom tool.

Maps the reference OVGroundingDinoForObjectDetection state dict
(modeling_ov_grounding_dino_mask_dn.py — attribute paths cited inline)
onto our GroundingDino param tree (models/grounding_dino/model.py).
The released OpenGVLab/VisionLLMv2 checkpoint prefixes these keys with
"gdino."; pass `prefix="gdino."` when converting the composite dict.

Offline note: the released checkpoint is not downloadable in this
environment (zero egress) and the reference module cannot be
instantiated (detectron2/mmcv deps absent), so this mapping is validated
structurally (every consumed key enumerated from the reference code) and
numerically where torch modules are constructible (MHA packing — see
tests/test_convert_gdino.py).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from visionllm_tpu.utils.torch_convert import (_conv, _t,
                                               consume_tied_duplicates,
                                               convert_swin)

Array = np.ndarray


def _lin(sd, name):
    out = {"kernel": _t(sd[name + ".weight"])}
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"])
    return out


def _ln(sd, name):
    return {"scale": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def _gn(sd, name):
    return {"scale": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def _conv2d(sd, name, with_bias=True):
    out = {"kernel": _conv(sd[name + ".weight"])}
    if with_bias and name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"])
    return out


def _mha(sd, name):
    """torch nn.MultiheadAttention → our TorchMHA (packed in_proj split)."""
    w = np.asarray(sd[name + ".in_proj_weight"])
    b = np.asarray(sd[name + ".in_proj_bias"])
    d = w.shape[0] // 3
    return {
        "q_proj": {"kernel": _t(w[:d]), "bias": b[:d]},
        "k_proj": {"kernel": _t(w[d:2 * d]), "bias": b[d:2 * d]},
        "v_proj": {"kernel": _t(w[2 * d:]), "bias": b[2 * d:]},
        "out_proj": _lin(sd, name + ".out_proj"),
    }


def _mlp(sd, name, n=3):
    """GroundingDinoMLPPredictionHead / MLP with .layers.{i}."""
    return {f"layers_{i}": _lin(sd, f"{name}.layers.{i}")
            for i in range(n)}


def _deformable(sd, name):
    """GroundingDinoMultiscaleDeformableAttention (:647-786)."""
    return {
        "sampling_offsets": _lin(sd, name + ".sampling_offsets"),
        "attention_weights": _lin(sd, name + ".attention_weights"),
        "value_proj": _lin(sd, name + ".value_proj"),
        "output_proj": _lin(sd, name + ".output_proj"),
    }


def _fusion(sd, name):
    """GroundingDinoFusionLayer (:1045-1104)."""
    a = name + ".attn"
    return {
        "layer_norm_vision": _ln(sd, name + ".layer_norm_vision"),
        "layer_norm_text": _ln(sd, name + ".layer_norm_text"),
        "vision_param": np.asarray(sd[name + ".vision_param"]),
        "text_param": np.asarray(sd[name + ".text_param"]),
        "attn": {
            "vision_proj": _lin(sd, a + ".vision_proj"),
            "text_proj": _lin(sd, a + ".text_proj"),
            "values_vision_proj": _lin(sd, a + ".values_vision_proj"),
            "values_text_proj": _lin(sd, a + ".values_text_proj"),
            "out_vision_proj": _lin(sd, a + ".out_vision_proj"),
            "out_text_proj": _lin(sd, a + ".out_text_proj"),
        },
    }


def convert_gdino(sd: Mapping[str, Array], cfg,
                  prefix: str = "", swin_cfg=None) -> Dict:
    """cfg: GDinoConfig. Returns params for models.grounding_dino.
    GroundingDino."""
    p = prefix
    m = p + "model."
    out: Dict = {}

    # Swin backbone via HF AutoBackbone (:2078, GroundingDinoConvEncoder)
    from visionllm_tpu.models.swin import swin_tiny_config, swin_large_config
    if swin_cfg is None:
        overrides = dict(getattr(cfg, "backbone_overrides", None) or {})
        swin_cfg = (swin_tiny_config(out_stages=(0, 1, 2, 3), **overrides)
                    if cfg.backbone == "swin_tiny"
                    else swin_large_config(out_stages=(0, 1, 2, 3),
                                           **overrides))
    out["backbone"] = convert_swin(
        sd, swin_cfg, prefix=m + "backbone.conv_encoder.model.")

    # input projections (:2084-2103): ModuleList of [conv, GroupNorm]
    for i in range(3):
        out[f"input_proj_{i}"] = _conv2d(sd, m + f"input_proj_vision.{i}.0")
        out[f"input_proj_norm_{i}"] = _gn(sd, m + f"input_proj_vision.{i}.1")
    out["input_proj_3"] = _conv2d(sd, m + "input_proj_vision.3.0")
    out["input_proj_norm_3"] = _gn(sd, m + "input_proj_vision.3.1")

    # encoder layers (:1217-1289)
    for i in range(cfg.encoder_layers):
        lp = m + f"encoder.layers.{i}."
        te = lp + "text_enhancer_layer"
        de = lp + "deformable_layer"
        out[f"encoder_layer_{i}"] = {
            "fusion_layer": _fusion(sd, lp + "fusion_layer"),
            "text_enhancer_layer": {
                "self_attn": _mha(sd, te + ".self_attn"),
                "layer_norm_before": _ln(sd, te + ".layer_norm_before"),
                "layer_norm_after": _ln(sd, te + ".layer_norm_after"),
                "fc1": _lin(sd, te + ".fc1"),
                "fc2": _lin(sd, te + ".fc2"),
            },
            "deformable_layer": {
                "self_attn": _deformable(sd, de + ".self_attn"),
                "self_attn_layer_norm": _ln(sd, de + ".self_attn_layer_norm"),
                "fc1": _lin(sd, de + ".fc1"),
                "fc2": _lin(sd, de + ".fc2"),
                "final_layer_norm": _ln(sd, de + ".final_layer_norm"),
            },
        }

    # decoder layers (:1292-1407)
    for i in range(cfg.decoder_layers):
        lp = m + f"decoder.layers.{i}."
        out[f"decoder_layer_{i}"] = {
            "self_attn": _mha(sd, lp + "self_attn"),
            "self_attn_layer_norm": _ln(sd, lp + "self_attn_layer_norm"),
            "encoder_attn_text": _mha(sd, lp + "encoder_attn_text"),
            "encoder_attn_text_layer_norm": _ln(
                sd, lp + "encoder_attn_text_layer_norm"),
            "encoder_attn": _deformable(sd, lp + "encoder_attn"),
            "encoder_attn_layer_norm": _ln(sd, lp + "encoder_attn_layer_norm"),
            "fc1": _lin(sd, lp + "fc1"),
            "fc2": _lin(sd, lp + "fc2"),
            "final_layer_norm": _ln(sd, lp + "final_layer_norm"),
        }
    out["decoder_layer_norm"] = _ln(sd, m + "decoder.layer_norm")
    out["reference_points_head"] = _mlp(
        sd, m + "decoder.reference_points_head", 2)

    # two-stage machinery (:2167-2180)
    out["enc_output"] = _lin(sd, m + "enc_output")
    out["enc_output_norm"] = _ln(sd, m + "enc_output_norm")
    out["encoder_output_bbox_embed"] = _mlp(
        sd, m + "encoder_output_bbox_embed", 3)
    out["query_position_embeddings"] = np.asarray(
        sd[m + "query_position_embeddings.weight"])
    out["level_embed"] = np.asarray(sd[m + "level_embed"])

    # mask FPN (:2116-2152; detectron2 Conv2d carries .norm)
    out["lateral_conv"] = _conv2d(sd, m + "lateral_convs.0",
                                  with_bias=False)
    out["lateral_norm"] = _gn(sd, m + "lateral_convs.0.norm")
    out["output_conv"] = _conv2d(sd, m + "output_convs.0", with_bias=False)
    out["output_norm"] = _gn(sd, m + "output_convs.0.norm")
    out["mask_features"] = _conv2d(sd, m + "mask_features")
    out["model_mask_embed"] = _mlp(sd, m + "mask_embed", 3)

    # heads (shared across layers: decoder_bbox_embed_share, :2626-2640)
    out["bbox_embed"] = _mlp(sd, p + "bbox_embed.0", 3)
    out["mask_embed"] = _mlp(sd, p + "mask_embed.0", 3)
    out["patch2query"] = _mlp(sd, p + "patch2query", 3)
    # per-slot + decoder-attribute aliases of the shared heads: consume
    # them (torch serializes each tied reference) and verify the tie
    consume_tied_duplicates(sd, p + "bbox_embed.0",
                            [p + "bbox_embed", m + "decoder.bbox_embed"])
    consume_tied_duplicates(sd, p + "mask_embed.0", [p + "mask_embed"])
    return out
