"""CLIP-ViT vision tower (ViT-L/14-336 default).

Behavioral reference: HF CLIPVisionModel as consumed by the composite
model (visionllmv2/model/modeling_visionllmv2.py:559-571): the bridge
reads `hidden_states[vis_output_layer]` (default -2) with the CLS token
dropped; the region encoder additionally reads the last three levels.

The layer stack is one nn.scan whose ys collect every layer's output, so
the returned tensor indexes exactly like HF's `hidden_states` tuple
(entry 0 = embeddings output, entry i = output of layer i).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from visionllm_tpu.config import VisionEncoderConfig
from visionllm_tpu.models.common import ACT2FN
from visionllm_tpu.ops.attention import multi_head_attention


class ClipEncoderLayer(nn.Module):
    cfg: VisionEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        B, L, D = hidden.shape
        h = cfg.num_heads
        residual = hidden
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(hidden)
        dense = lambda feats, name: nn.Dense(feats, dtype=self.dtype,
                                             name=name)
        q = dense(D, "q_proj")(x).reshape(B, L, h, D // h)
        k = dense(D, "k_proj")(x).reshape(B, L, h, D // h)
        v = dense(D, "v_proj")(x).reshape(B, L, h, D // h)
        attn = multi_head_attention(q, k, v).reshape(B, L, D)
        hidden = residual + dense(D, "out_proj")(attn)

        residual = hidden
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(hidden)
        x = dense(cfg.intermediate_size, "fc1")(x)
        x = ACT2FN[cfg.hidden_act](x)
        hidden = residual + dense(D, "fc2")(x)
        return hidden


class _ScannedClipLayer(nn.Module):
    cfg: VisionEncoderConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, hidden, _):
        hidden = ClipEncoderLayer(self.cfg, self.dtype, name="layer")(hidden)
        return hidden, hidden


class ClipVisionTower(nn.Module):
    """Returns all hidden states stacked: [num_layers + 1, B, 1 + P, D]."""

    cfg: VisionEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: [B, H, W, 3] (NHWC, CLIP-normalized)."""
        cfg = self.cfg
        B = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False, dtype=self.dtype, name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(B, -1, cfg.hidden_size)   # [B, P, D]

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (1, 1, cfg.hidden_size), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype),
                               (B, 1, cfg.hidden_size))
        hidden = jnp.concatenate([cls, patches], axis=1)    # [B, 1+P, D]

        num_positions = cfg.num_patches + 1
        pos = nn.Embed(num_positions, cfg.hidden_size, dtype=self.dtype,
                       name="position_embedding")(
            jnp.arange(num_positions)[None])
        hidden = hidden + pos

        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="pre_layrnorm")(hidden)

        layers = nn.scan(
            _ScannedClipLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0, out_axes=0,
            length=cfg.num_layers,
        )(cfg, self.dtype, name="layers")
        _, per_layer = layers(hidden, jnp.zeros((cfg.num_layers,)))

        # match HF hidden_states indexing: embeddings output first
        return jnp.concatenate([hidden[None], per_layer], axis=0)
