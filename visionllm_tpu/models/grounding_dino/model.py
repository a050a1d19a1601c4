"""Open-vocabulary Grounding-DINO decoder (det/grd/seg atom tool).

Behavioral reference: visionllmv2/model/grounding_dino/
modeling_ov_grounding_dino_mask_dn.py (OVGroundingDinoModel :2065-2599,
OVGroundingDinoForObjectDetection :2609-3210). Text queries come from the
LLM's [EMB] hidden states (no BERT text encoder); classification is a
contrastive dot-product against them.

TPU design: all spatial shapes static per compiled bucket; top-900 query
selection via lax.top_k; the deformable gathers run through
ops.ms_deform_attn; everything batch-static (padded text queries with
masks, exactly as the reference already pads).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.config import GDinoConfig
from visionllm_tpu.models.common import MLP
from visionllm_tpu.models.grounding_dino.layers import (
    NEG_INF, DeformableAttention, DeformableEncoderLayer, FusionLayer,
    TextEnhancerLayer, TorchMHA, encoder_reference_points,
    get_sine_pos_embed, sine_position_embedding)
from visionllm_tpu.models.swin import (SwinBackbone, swin_large_config,
                                       swin_tiny_config)
from visionllm_tpu.ops.box_ops import inverse_sigmoid
from visionllm_tpu.utils.static_arg import Static, unwrap


def generate_masks_with_text_query_masks(
    text_query_masks: jnp.ndarray,          # [B, P] bool, valid = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Block-diagonal text self-attention mask + position ids (reference
    :2025-2043, vectorized). Valid tokens attend to all valid tokens;
    padding attends only to itself. Returns (mask [B,P,P] True=allowed,
    position_ids [B,P])."""
    B, P = text_query_masks.shape
    valid = text_query_masks.astype(bool)
    block = valid[:, :, None] & valid[:, None, :]
    eye = jnp.eye(P, dtype=bool)[None]
    mask = block | eye
    position_ids = jnp.where(valid, jnp.cumsum(valid, axis=1) - 1, 0)
    return mask, position_ids


class GDinoEncoderLayer(nn.Module):
    cfg: GDinoConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vision, text, *, vision_pos, spatial_shapes,
                 reference_points, vision_pad_mask, text_pad_mask,
                 text_self_attn_mask, text_pos):
        cfg = self.cfg
        spatial_shapes = unwrap(spatial_shapes)
        vision, text = FusionLayer(
            cfg.d_model, cfg.ffn_dim // 2, cfg.num_heads // 2, self.dtype,
            name="fusion_layer")(
                vision, text, vision_pad_mask=vision_pad_mask,
                text_pad_mask=text_pad_mask)
        text = TextEnhancerLayer(
            cfg.d_model, cfg.ffn_dim // 2, cfg.num_heads // 2, self.dtype,
            name="text_enhancer_layer")(
                text, attn_mask=~text_self_attn_mask,
                position_embeddings=text_pos)
        vision = DeformableEncoderLayer(
            cfg.d_model, cfg.ffn_dim, cfg.num_heads, cfg.num_feature_levels,
            cfg.num_points, self.dtype, name="deformable_layer")(
                vision, position_embeddings=vision_pos,
                reference_points=reference_points,
                spatial_shapes=spatial_shapes,
                value_mask=None if vision_pad_mask is None
                else ~vision_pad_mask)
        return vision, text


class GDinoDecoderLayer(nn.Module):
    cfg: GDinoConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, *, query_pos, reference_points,
                 spatial_shapes, vision, vision_valid_mask, text,
                 text_pad_mask, self_attn_mask):
        cfg = self.cfg
        spatial_shapes = unwrap(spatial_shapes)
        q = hidden + query_pos
        attn = TorchMHA(cfg.d_model, cfg.num_heads, self.dtype,
                        name="self_attn")(
            q, q, hidden, attn_mask=self_attn_mask)
        hidden = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(
            hidden + attn)

        attn = TorchMHA(cfg.d_model, cfg.num_heads, self.dtype,
                        name="encoder_attn_text")(
            hidden + query_pos, text, text,
            key_padding_mask=text_pad_mask)
        hidden = nn.LayerNorm(dtype=self.dtype,
                              name="encoder_attn_text_layer_norm")(
            hidden + attn)

        attn = DeformableAttention(
            cfg.d_model, cfg.num_heads, cfg.num_feature_levels,
            cfg.num_points, self.dtype, name="encoder_attn")(
                hidden, vision, position_embeddings=query_pos,
                reference_points=reference_points,
                spatial_shapes=spatial_shapes,
                value_mask=vision_valid_mask)
        hidden = nn.LayerNorm(dtype=self.dtype, name="encoder_attn_layer_norm")(
            hidden + attn)

        x = nn.Dense(cfg.ffn_dim, dtype=self.dtype, name="fc1")(hidden)
        x = nn.relu(x)
        x = nn.Dense(cfg.d_model, dtype=self.dtype, name="fc2")(x)
        return nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(
            hidden + x)


def contrastive_logits(vision_hidden, text_hidden, text_token_mask,
                       max_text_len: int) -> jnp.ndarray:
    """Open-vocab classification = queries · text embeddings, padded to
    max_text_len with -inf (reference :1410-1431)."""
    logits = jnp.einsum("bqc,btc->bqt", vision_hidden, text_hidden,
                        preferred_element_type=jnp.float32)
    logits = jnp.where(text_token_mask[:, None, :], logits, NEG_INF)
    B, Q, T = logits.shape
    pad = max_text_len - T
    if pad > 0:
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, pad)),
                         constant_values=NEG_INF)
    return logits[..., :max_text_len]


class GroundingDino(nn.Module):
    """The full det/grd/seg decoder with heads.

    __call__(pixel_values NHWC, pixel_mask, text_query, text_query_masks,
    dn_queries?) → dict(logits [B,Q,max_text_len], pred_boxes [B,Q,4]
    cxcywh normalized, pred_masks [B,Q,H/4,W/4], + per-layer stacks for
    training).
    """

    cfg: GDinoConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        overrides = dict(cfg.backbone_overrides or {})
        if cfg.backbone == "swin_tiny":
            swin_cfg = swin_tiny_config(out_stages=(0, 1, 2, 3),
                                        **overrides)
            self.backbone = SwinBackbone(swin_cfg, self.dtype,
                                         name="backbone")
        elif cfg.backbone == "swin_large":
            swin_cfg = swin_large_config(out_stages=(0, 1, 2, 3),
                                         **overrides)
            self.backbone = SwinBackbone(swin_cfg, self.dtype,
                                         name="backbone")
        elif cfg.backbone.startswith("intern_image"):
            from visionllm_tpu.models.intern_image import (
                InternImage, intern_image_h_config,
                intern_image_tiny_config)
            ii_cfg = (intern_image_h_config()
                      if cfg.backbone == "intern_image_h"
                      else intern_image_tiny_config(
                          depths=(1, 1, 1, 1), groups=(2, 2, 4, 4)))
            self.backbone = InternImage(ii_cfg, self.dtype,
                                        name="backbone")
        else:
            raise NotImplementedError(cfg.backbone)

        # input projections: 1x1 conv + GN for backbone strides 8/16/32,
        # extra 3x3 stride-2 conv from the stride-32 raw feature (:2084-2103)
        self.input_proj_convs = [
            nn.Conv(cfg.d_model, (1, 1), dtype=self.dtype,
                    name=f"input_proj_{i}") for i in range(3)]
        self.input_proj_norms = [
            nn.GroupNorm(num_groups=32, dtype=self.dtype,
                         name=f"input_proj_norm_{i}") for i in range(3)]
        self.extra_proj_conv = nn.Conv(
            cfg.d_model, (3, 3), strides=(2, 2), padding=1,
            dtype=self.dtype, name="input_proj_3")
        self.extra_proj_norm = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                            name="input_proj_norm_3")

        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (cfg.num_feature_levels, cfg.d_model), jnp.float32)

        enc_cls, dec_cls = GDinoEncoderLayer, GDinoDecoderLayer
        if cfg.remat:
            # lifted remat keeps the scope name, so param paths (and
            # therefore checkpoint converters) are unchanged.
            # spatial_shapes rides through as a Static treedef value.
            policy = (jax.checkpoint_policies.checkpoint_dots
                      if cfg.remat == "dots" else None)
            enc_cls = nn.remat(GDinoEncoderLayer, policy=policy,
                               prevent_cse=False)
            dec_cls = nn.remat(GDinoDecoderLayer, policy=policy,
                               prevent_cse=False)
        self.encoder_layers = [
            enc_cls(cfg, self.dtype, name=f"encoder_layer_{i}")
            for i in range(cfg.encoder_layers)]
        self.decoder_layers = [
            dec_cls(cfg, self.dtype, name=f"decoder_layer_{i}")
            for i in range(cfg.decoder_layers)]
        self.decoder_norm = nn.LayerNorm(dtype=self.dtype,
                                         name="decoder_layer_norm")
        self.reference_points_head = MLP(
            cfg.d_model, cfg.d_model, 2, self.dtype,
            name="reference_points_head")

        # two-stage machinery
        self.enc_output = nn.Dense(cfg.d_model, dtype=self.dtype,
                                   name="enc_output")
        self.enc_output_norm = nn.LayerNorm(dtype=self.dtype,
                                            name="enc_output_norm")
        self.encoder_output_bbox_embed = MLP(
            cfg.d_model, 4, 3, self.dtype, name="encoder_output_bbox_embed")

        self.query_position_embeddings = self.param(
            "query_position_embeddings", nn.initializers.normal(1.0),
            (cfg.num_queries, cfg.d_model), jnp.float32)

        # mask FPN (stride-4 path)
        self.lateral_conv = nn.Conv(cfg.d_model, (1, 1), use_bias=False,
                                    dtype=self.dtype, name="lateral_conv")
        self.lateral_norm = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                         name="lateral_norm")
        self.output_conv = nn.Conv(cfg.d_model, (3, 3), padding=1,
                                   use_bias=False, dtype=self.dtype,
                                   name="output_conv")
        self.output_norm = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                        name="output_norm")
        self.mask_features_conv = nn.Conv(cfg.mask_dim, (1, 1),
                                          dtype=self.dtype,
                                          name="mask_features")
        # model-level mask embed (two-stage intermediate masks, :2161)
        self.model_mask_embed = MLP(cfg.d_model, cfg.mask_dim, 3, self.dtype,
                                    name="model_mask_embed")

        # heads (shared across decoder layers: decoder_bbox_embed_share=True)
        self.bbox_embed = MLP(cfg.d_model, 4, 3, self.dtype,
                              name="bbox_embed")
        self.mask_embed = MLP(cfg.d_model, cfg.mask_dim, 3, self.dtype,
                              name="mask_embed")
        self.patch2query = MLP(cfg.d_model, cfg.d_model, 3, self.dtype,
                               name="patch2query")

    # ------------------------------------------------------------------

    def gen_proposals(self, enc_output, valid_mask,
                      spatial_shapes) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Anchor-like proposals per encoder token (reference :2228-2278).
        valid_mask: [B, S] True=valid. Returns (object_query [B,S,C],
        proposals_logit [B,S,4])."""
        B, S, _ = enc_output.shape
        props = []
        pos = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            m = valid_mask[:, pos:pos + h * w].reshape(B, h, w)
            valid_h = jnp.sum(m[:, :, 0], axis=1)
            valid_w = jnp.sum(m[:, 0, :], axis=1)
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32),
                                  indexing="ij")
            grid = jnp.stack([gx, gy], axis=-1)[None]          # [1,h,w,2]
            scale = jnp.stack([valid_w, valid_h], axis=-1).reshape(B, 1, 1, 2)
            grid = (grid + 0.5) / scale
            wh = jnp.full_like(grid, 0.05 * (2.0 ** lvl))
            props.append(jnp.concatenate([grid, wh], -1).reshape(B, -1, 4))
            pos += h * w
        proposals = jnp.concatenate(props, axis=1)             # [B, S, 4]
        prop_valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1,
                             keepdims=True)
        proposals = jnp.log(proposals / (1 - proposals))
        bad = (~valid_mask[..., None]) | (~prop_valid)
        proposals = jnp.where(bad, jnp.inf, proposals)
        oq = jnp.where(bad, 0.0, enc_output)
        oq = self.enc_output_norm(self.enc_output(oq))
        return oq, proposals

    def get_proposal_pos_embed(self, refs: jnp.ndarray) -> jnp.ndarray:
        """Sine embedding of (possibly 4d) reference boxes (reference
        :1755-1790): [B, Q, 4] → [B, Q, 2*d_model]."""
        d = self.cfg.d_model // 2
        return get_sine_pos_embed(refs, num_pos_feats=d, temperature=10000,
                                  exchange_xy=True)

    # ------------------------------------------------------------------

    def __call__(
        self,
        pixel_values: jnp.ndarray,            # [B, H, W, 3]
        text_query: jnp.ndarray,              # [B, P, num_embs, text_dim]
        text_query_masks: jnp.ndarray,        # [B, P] bool
        pixel_mask: Optional[jnp.ndarray] = None,   # [B, H, W] bool
        dn: Optional[Dict[str, jnp.ndarray]] = None,
        # dn: {"query_label": [B,N,C], "query_bbox": [B,N,4] (logit),
        #      "attn_mask": [.., N+Q, N+Q] bool True=blocked}
        targets: Optional[Dict[str, jnp.ndarray]] = None,
        dn_rng: Optional[jnp.ndarray] = None,
        # passing (targets, dn_rng) builds CDN queries internally from the
        # projected text queries (reference forward_train :2952-2957)
    ) -> Dict[str, Any]:
        cfg = self.cfg
        B, H, W, _ = pixel_values.shape
        if pixel_mask is None:
            pixel_mask = jnp.ones((B, H, W), bool)

        # text queries: MLP 4096→256 then mean over the num_embs axis
        tq = self.patch2query(text_query).mean(axis=-2)     # [B, P, 256]

        dn_targets = None
        if dn is None and targets is not None and dn_rng is not None \
                and cfg.dn_number > 0:
            from visionllm_tpu.train.cdn import build_cdn_queries
            dn, dn_targets = build_cdn_queries(
                dn_rng, targets, tq, text_query_masks,
                dn_number=cfg.dn_number,
                label_noise_ratio=cfg.label_noise_ratio,
                box_noise_scale=cfg.box_noise_scale,
                num_queries=cfg.num_queries)
        text_token_mask = text_query_masks.astype(bool)
        text_self_attn_mask, text_position_ids = (
            generate_masks_with_text_query_masks(text_query_masks))
        text_pos = get_sine_pos_embed(
            text_position_ids[..., None].astype(jnp.float32),
            num_pos_feats=cfg.d_model, exchange_xy=False)

        # backbone + projections: strides 4, 8, 16, 32 (+ extra 64)
        feats = self.backbone(pixel_values)                 # 4 levels NHWC
        sources, masks_l, pos_l = [], [], []
        for i in range(3):
            f = feats[i + 1]
            x = self.input_proj_norms[i](self.input_proj_convs[i](f))
            m = _downsample_mask(pixel_mask, x.shape[1:3])
            sources.append(x)
            masks_l.append(m)
            pos_l.append(sine_position_embedding(m, cfg.d_model))
        extra = self.extra_proj_norm(self.extra_proj_conv(feats[-1]))
        m = _downsample_mask(pixel_mask, extra.shape[1:3])
        sources.append(extra)
        masks_l.append(m)
        pos_l.append(sine_position_embedding(m, cfg.d_model))

        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in sources)
        src_flat = jnp.concatenate(
            [s.reshape(B, -1, cfg.d_model) for s in sources], axis=1)
        mask_flat = jnp.concatenate(
            [m.reshape(B, -1) for m in masks_l], axis=1)     # True = valid
        pos_flat = jnp.concatenate(
            [(p + self.level_embed[i][None, None, None]).reshape(
                B, -1, cfg.d_model)
             for i, p in enumerate(pos_l)], axis=1)

        valid_ratios = jnp.stack(
            [_valid_ratio(m) for m in masks_l], axis=1)      # [B, L, 2]

        # encoder
        ref_pts = encoder_reference_points(spatial_shapes, valid_ratios)
        vision, text = src_flat, tq
        vision_pad = ~mask_flat
        text_pad = ~text_token_mask
        for layer in self.encoder_layers:
            vision, text = layer(
                vision, text, vision_pos=pos_flat,
                spatial_shapes=Static(spatial_shapes),
                reference_points=ref_pts,
                vision_pad_mask=vision_pad, text_pad_mask=text_pad,
                text_self_attn_mask=text_self_attn_mask, text_pos=text_pos)

        # mask features FPN (stride 4)
        lvl0_len = spatial_shapes[0][0] * spatial_shapes[0][1]
        enc_lvl0 = vision[:, :lvl0_len].reshape(
            B, spatial_shapes[0][0], spatial_shapes[0][1], cfg.d_model)
        lat = self.lateral_norm(self.lateral_conv(feats[0]))
        up = jax.image.resize(enc_lvl0.astype(jnp.float32),
                              (B, lat.shape[1], lat.shape[2], cfg.d_model),
                              method="bilinear").astype(lat.dtype)
        fpn = nn.relu(self.output_norm(self.output_conv(lat + up)))
        mask_features = self.mask_features_conv(fpn)        # [B,h4,w4,mask_dim]

        # two-stage proposals → top-900 queries
        oq, proposals = self.gen_proposals(vision, mask_flat, spatial_shapes)
        enc_class = contrastive_logits(oq, text, text_token_mask,
                                       cfg.max_text_len)
        enc_coord_logits = self.encoder_output_bbox_embed(oq) + proposals
        topk_scores = jnp.max(enc_class, axis=-1)
        _, topk_idx = jax.lax.top_k(topk_scores, cfg.num_queries)
        topk_coords = jnp.take_along_axis(
            enc_coord_logits, topk_idx[..., None], axis=1)
        topk_coords = jax.lax.stop_gradient(topk_coords)
        reference_points = jax.nn.sigmoid(topk_coords)

        target = jnp.broadcast_to(
            self.query_position_embeddings[None].astype(self.dtype),
            (B, cfg.num_queries, cfg.d_model))
        intermediate_mask = jnp.einsum(
            "bqc,bhwc->bqhw", self.model_mask_embed(target), mask_features)

        self_attn_mask = None
        if dn is not None:
            target = jnp.concatenate([dn["query_label"], target], axis=1)
            reference_points = jnp.concatenate(
                [jax.nn.sigmoid(dn["query_bbox"]), reference_points], axis=1)
            self_attn_mask = dn["attn_mask"]
        init_reference_points = reference_points

        # decoder with iterative box refinement
        hidden = target
        intermediates, inter_refs = [], []
        for layer in self.decoder_layers:
            ref_input = (reference_points[:, :, None]
                         * jnp.concatenate([valid_ratios, valid_ratios],
                                           -1)[:, None])
            query_sine = self.get_proposal_pos_embed(ref_input[:, :, 0, :])
            query_pos = self.reference_points_head(query_sine)
            hidden = layer(
                hidden, query_pos=query_pos, reference_points=ref_input,
                spatial_shapes=Static(spatial_shapes), vision=vision,
                vision_valid_mask=mask_flat, text=text,
                text_pad_mask=text_pad, self_attn_mask=self_attn_mask)
            delta = self.bbox_embed(hidden)
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(reference_points))
            reference_points = jax.lax.stop_gradient(new_ref)
            intermediates.append(self.decoder_norm(hidden))
            inter_refs.append(new_ref)

        # heads per decoder layer
        out_classes, out_coords, out_masks = [], [], []
        for lvl, hs in enumerate(intermediates):
            ref = init_reference_points if lvl == 0 else inter_refs[lvl - 1]
            ref = inverse_sigmoid(ref)
            m = jnp.einsum("bqc,bhwc->bqhw", self.mask_embed(hs),
                           mask_features)
            cls = contrastive_logits(hs, text, text_token_mask,
                                     cfg.max_text_len)
            coord = jax.nn.sigmoid(self.bbox_embed(hs) + ref)
            out_classes.append(cls.astype(jnp.float32))
            out_coords.append(coord.astype(jnp.float32))
            out_masks.append(m.astype(jnp.float32))

        # dn_post_process (:2830-2857): split dn slice off the front so
        # matching outputs keep shape [lvl, B, Q, ...]
        dn_out = {}
        if dn is not None:
            pad = dn["query_label"].shape[1]
            dn_out = {
                "dn_all_logits": jnp.stack(
                    [c[:, :pad] for c in out_classes]),
                "dn_all_boxes": jnp.stack(
                    [c[:, :pad] for c in out_coords]),
                "dn_targets": dn_targets,
            }
            out_classes = [c[:, pad:] for c in out_classes]
            out_coords = [c[:, pad:] for c in out_coords]
            out_masks = [m[:, pad:] for m in out_masks]

        return {
            **dn_out,
            "logits": out_classes[-1],
            "pred_boxes": out_coords[-1],
            "pred_masks": out_masks[-1],
            "all_logits": jnp.stack(out_classes),      # [lvl, B, Q, T]
            "all_boxes": jnp.stack(out_coords),
            "all_masks": jnp.stack(out_masks),
            # two-stage (interm) loss supervises the TOP-K SELECTED
            # proposals, not the full proposal map (reference
            # enc_topk_class_logits / enc_topk_coords_logits, :3061-3063;
            # gathered WITHOUT the detach used for decoder init)
            "enc_logits": jnp.take_along_axis(
                enc_class, topk_idx[..., None], axis=1).astype(jnp.float32),
            "enc_boxes": jax.nn.sigmoid(jnp.take_along_axis(
                enc_coord_logits, topk_idx[..., None], axis=1)
            ).astype(jnp.float32),
            "intermediate_mask": intermediate_mask.astype(jnp.float32),
            "mask_features": mask_features,
            "text_features": text,
        }


def _valid_ratio(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] bool → [B, 2] (w_ratio, h_ratio) (reference :2199-2208)."""
    B, H, W = mask.shape
    vh = jnp.sum(mask[:, :, 0].astype(jnp.float32), axis=1) / H
    vw = jnp.sum(mask[:, 0, :].astype(jnp.float32), axis=1) / W
    return jnp.stack([vw, vh], axis=-1)


def _downsample_mask(pixel_mask: jnp.ndarray,
                     hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor downsample of the validity mask to a feature
    resolution (reference uses F.interpolate on the inverse mask)."""
    B = pixel_mask.shape[0]
    return jax.image.resize(pixel_mask.astype(jnp.float32),
                            (B, hw[0], hw[1]), method="nearest") > 0.5
