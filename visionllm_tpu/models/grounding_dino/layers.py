"""Shared transformer layers for the DETR-family decoders (grounding-dino
and unipose): sine position embeddings, torch-MHA-compatible attention,
deformable attention module, fusion (GLIP-style bi-attention), and the
text-enhancer layer.

Behavioral reference: modeling_ov_grounding_dino_mask_dn.py:509-1289.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.ops.ms_deform_attn import ms_deform_attn_quad, ms_deform_attn_reference

NEG_INF = float(np.finfo(np.float32).min)


def sine_position_embedding(mask: jnp.ndarray, dim: int,
                            temperature: float = 20.0) -> jnp.ndarray:
    """2D sine embeddings from a validity mask (reference :528-565,
    normalize=True, scale 2π). mask: [B, H, W] float/bool → [B, H, W, dim]."""
    m = mask.astype(jnp.float32)
    y = jnp.cumsum(m, axis=1)
    x = jnp.cumsum(m, axis=2)
    eps = 1e-6
    scale = 2 * math.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    half = dim // 2
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / half)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                   axis=-1).reshape(*px.shape[:-1], -1)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                   axis=-1).reshape(*py.shape[:-1], -1)
    return jnp.concatenate([py, px], axis=-1)


def get_sine_pos_embed(pos: jnp.ndarray, num_pos_feats: int = 128,
                       temperature: float = 10000.0,
                       exchange_xy: bool = True) -> jnp.ndarray:
    """Sine embedding of arbitrary coordinate tensors (reference
    :1190-1216). pos: [..., n] → [..., n * num_pos_feats]."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    x = pos[..., None] * scale / dim_t                   # [..., n, F]
    emb = jnp.stack([jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])],
                    axis=-1).reshape(*x.shape[:-1], -1)  # [..., n, F]
    parts = [emb[..., i, :] for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


class TorchMHA(nn.Module):
    """torch nn.MultiheadAttention-compatible attention (packed qkv in the
    checkpoint is split into q/k/v by the converter)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, *,
                 attn_mask: Optional[jnp.ndarray] = None,
                 key_padding_mask: Optional[jnp.ndarray] = None):
        """attn_mask: bool [Lq, Lk] or [B, Lq, Lk], True = NOT allowed
        (torch convention). key_padding_mask: bool [B, Lk], True = pad."""
        B, Lq, D = query.shape
        Lk = key.shape[1]
        h, hd = self.num_heads, self.dim // self.num_heads
        dense = lambda name: nn.Dense(self.dim, dtype=self.dtype, name=name)
        q = dense("q_proj")(query).reshape(B, Lq, h, hd)
        k = dense("k_proj")(key).reshape(B, Lk, h, hd)
        v = dense("v_proj")(value).reshape(B, Lk, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if attn_mask is not None:
            blocked = attn_mask if attn_mask.ndim == 3 else attn_mask[None]
            scores = jnp.where(blocked[:, None], NEG_INF, scores)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :], NEG_INF,
                               scores)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(
            out.reshape(B, Lq, D))


class DeformableAttention(nn.Module):
    """Multi-scale deformable attention module (reference :647-786)."""

    d_model: int
    num_heads: int
    num_levels: int
    num_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,           # [B, Q, C] queries
        encoder_hidden_states: jnp.ndarray,   # [B, S, C] value source
        *,
        position_embeddings: Optional[jnp.ndarray] = None,
        reference_points: jnp.ndarray = None,  # [B, Q, L, 2] or [B, Q, L, 4]
        spatial_shapes: Tuple[Tuple[int, int], ...] = None,
        value_mask: Optional[jnp.ndarray] = None,  # [B, S] bool, True=valid
    ) -> jnp.ndarray:
        H, L, P = self.num_heads, self.num_levels, self.num_points
        B, Q, C = hidden_states.shape
        S = encoder_hidden_states.shape[1]
        if position_embeddings is not None:
            hidden_states = hidden_states + position_embeddings

        value = nn.Dense(self.d_model, dtype=self.dtype,
                         name="value_proj")(encoder_hidden_states)
        if value_mask is not None:
            value = jnp.where(value_mask[..., None], value, 0)
        value = value.reshape(B, S, H, C // H)

        offsets = nn.Dense(H * L * P * 2, dtype=self.dtype,
                           name="sampling_offsets")(hidden_states)
        offsets = offsets.reshape(B, Q, H, L, P, 2)
        attw = nn.Dense(H * L * P, dtype=self.dtype,
                        name="attention_weights")(hidden_states)
        attw = jax.nn.softmax(attw.reshape(B, Q, H, L * P), axis=-1)
        attw = attw.reshape(B, Q, H, L, P)

        if reference_points.shape[-1] == 2:
            norm = jnp.asarray([(w, h) for (h, w) in spatial_shapes],
                               dtype=jnp.float32)          # [L, 2] (x, y)
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / norm[None, None, None, :, None, :])
        else:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / P * reference_points[:, :, None, :, None, 2:]
                   * 0.5)
        if jax.default_backend() == "tpu":
            out = ms_deform_attn_quad(value, spatial_shapes, loc, attw)
        else:
            out = ms_deform_attn_reference(value, spatial_shapes, loc, attw)
        return nn.Dense(self.d_model, dtype=self.dtype,
                        name="output_proj")(out)


class BiMultiHeadAttention(nn.Module):
    """GLIP-style bidirectional image↔text attention (reference :860-1006):
    one score matrix, max-subtracted and clamped to ±50000, softmaxed over
    text for the vision update and over vision for the text update."""

    d_model: int
    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vision, text, *, vision_pad_mask=None,
                 text_pad_mask=None):
        """pad masks: True = padding (torch convention)."""
        B, Lv, _ = vision.shape
        Lt = text.shape[1]
        h, hd = self.num_heads, self.embed_dim // self.num_heads
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)

        vq = dense(self.embed_dim, "vision_proj")(vision) * (hd ** -0.5)
        tk = dense(self.embed_dim, "text_proj")(text)
        vv = dense(self.embed_dim, "values_vision_proj")(vision)
        tv = dense(self.embed_dim, "values_text_proj")(text)

        vq = vq.reshape(B, Lv, h, hd)
        tk = tk.reshape(B, Lt, h, hd)
        vv = vv.reshape(B, Lv, h, hd)
        tv = tv.reshape(B, Lt, h, hd)

        scores = jnp.einsum("bvhd,bthd->bhvt", vq, tk,
                            preferred_element_type=jnp.float32)
        scores = scores - jnp.max(scores)
        scores = jnp.clip(scores, -50000, 50000)

        t_scores = scores.transpose(0, 1, 3, 2)             # [B, h, Lt, Lv]
        t_scores = t_scores - jnp.max(t_scores, axis=-1, keepdims=True)
        t_scores = jnp.clip(t_scores, -50000, 50000)

        if vision_pad_mask is not None:
            t_scores = jnp.where(vision_pad_mask[:, None, None, :], NEG_INF,
                                 t_scores)
        text_attn = jax.nn.softmax(t_scores, axis=-1)

        if text_pad_mask is not None:
            scores = jnp.where(text_pad_mask[:, None, None, :], NEG_INF,
                               scores)
        vision_attn = jax.nn.softmax(scores, axis=-1)

        v_out = jnp.einsum("bhvt,bthd->bvhd", vision_attn.astype(tv.dtype),
                           tv).reshape(B, Lv, self.embed_dim)
        t_out = jnp.einsum("bhtv,bvhd->bthd", text_attn.astype(vv.dtype),
                           vv).reshape(B, Lt, self.embed_dim)
        return (dense(self.d_model, "out_vision_proj")(v_out),
                dense(self.d_model, "out_text_proj")(t_out))


class FusionLayer(nn.Module):
    """Pre-LN bi-attention with layer-scale residuals (reference :1045-1104)."""

    d_model: int
    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vision, text, *, vision_pad_mask=None,
                 text_pad_mask=None):
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        v = ln("layer_norm_vision")(vision)
        t = ln("layer_norm_text")(text)
        dv, dt = BiMultiHeadAttention(
            self.d_model, self.embed_dim, self.num_heads, self.dtype,
            name="attn")(v, t, vision_pad_mask=vision_pad_mask,
                         text_pad_mask=text_pad_mask)
        vision_param = self.param("vision_param",
                                  nn.initializers.constant(1e-4),
                                  (self.d_model,), jnp.float32)
        text_param = self.param("text_param", nn.initializers.constant(1e-4),
                                (self.d_model,), jnp.float32)
        return v + vision_param * dv, t + text_param * dt


class TextEnhancerLayer(nn.Module):
    """Text self-attention block (reference :787-859). Post-LN residuals."""

    d_model: int
    ffn_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, *, attn_mask=None, position_embeddings=None):
        """attn_mask: bool [B, Lt, Lt], True = NOT allowed."""
        q = text if position_embeddings is None else text + position_embeddings
        attn = TorchMHA(self.d_model, self.num_heads, self.dtype,
                        name="self_attn")(q, q, text, attn_mask=attn_mask)
        text = nn.LayerNorm(dtype=self.dtype, name="layer_norm_before")(
            text + attn)
        x = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(text)
        x = nn.relu(x)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(x)
        return nn.LayerNorm(dtype=self.dtype, name="layer_norm_after")(
            text + x)


class DeformableEncoderLayer(nn.Module):
    """Vision deformable self-attention + FFN (reference :1105-1184)."""

    d_model: int
    ffn_dim: int
    num_heads: int
    num_levels: int
    num_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, *, position_embeddings, reference_points,
                 spatial_shapes, value_mask=None):
        attn = DeformableAttention(
            self.d_model, self.num_heads, self.num_levels, self.num_points,
            self.dtype, name="self_attn")(
                hidden, hidden, position_embeddings=position_embeddings,
                reference_points=reference_points,
                spatial_shapes=spatial_shapes, value_mask=value_mask)
        hidden = nn.LayerNorm(dtype=self.dtype,
                              name="self_attn_layer_norm")(hidden + attn)
        x = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(hidden)
        x = nn.relu(x)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(x)
        return nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(
            hidden + x)


def encoder_reference_points(
    spatial_shapes: Sequence[Tuple[int, int]],
    valid_ratios: jnp.ndarray,        # [B, L, 2] (w_ratio, h_ratio)
) -> jnp.ndarray:
    """Per-token normalized reference points (reference :1579-1605):
    [B, S, L, 2]."""
    pts = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry, rx = jnp.meshgrid(
            jnp.linspace(0.5, h - 0.5, h), jnp.linspace(0.5, w - 0.5, w),
            indexing="ij")
        ry = ry.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
        rx = rx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
        pts.append(jnp.stack([rx, ry], axis=-1))
    ref = jnp.concatenate(pts, axis=1)                    # [B, S, 2]
    return ref[:, :, None] * valid_ratios[:, None]        # [B, S, L, 2]
