"""InternViT-6B vision tower (the 26B-variant encoder).

Behavioral reference: visionllmv2/model/internvit/modeling_intern_vit.py
— CLIP-style ViT with pre-RMSNorm blocks, QK RMSNorm applied across the
*concatenated* head dims (:130-135), layer-scale residuals (ls1/ls2),
learned position embedding as a plain parameter, no post-embedding
layernorm, GELU MLP. Returns all hidden states like ClipVisionTower so
the composite consumes either interchangeably.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from visionllm_tpu.config import VisionEncoderConfig
from visionllm_tpu.models.common import ACT2FN, RMSNorm
from visionllm_tpu.ops.attention import multi_head_attention


class InternVitLayer(nn.Module):
    cfg: VisionEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        B, L, D = hidden.shape
        h = cfg.num_heads
        hd = D // h
        init_ls = nn.initializers.constant(0.1)

        x = RMSNorm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                    name="norm1")(hidden)
        qkv = nn.Dense(3 * D, use_bias=cfg.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if cfg.qk_normalization:
            # RMSNorm across the concatenated head dim (reference :130-135)
            q = RMSNorm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                        name="q_norm")(q)
            k = RMSNorm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                        name="k_norm")(k)
        attn = multi_head_attention(
            q.reshape(B, L, h, hd), k.reshape(B, L, h, hd),
            v.reshape(B, L, h, hd)).reshape(B, L, D)
        attn = nn.Dense(D, dtype=self.dtype, name="proj")(attn)
        ls1 = self.param("ls1", init_ls, (D,), jnp.float32)
        hidden = hidden + attn * ls1.astype(self.dtype)

        x = RMSNorm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                    name="norm2")(hidden)
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="fc1")(x)
        x = ACT2FN[cfg.hidden_act](x)
        x = nn.Dense(D, dtype=self.dtype, name="fc2")(x)
        ls2 = self.param("ls2", init_ls, (D,), jnp.float32)
        return hidden + x * ls2.astype(self.dtype)


class _ScannedInternLayer(nn.Module):
    cfg: VisionEncoderConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, hidden, _):
        hidden = InternVitLayer(self.cfg, self.dtype, name="layer")(hidden)
        return hidden, hidden


class InternVisionTower(nn.Module):
    """Returns all hidden states stacked: [num_layers + 1, B, 1 + P, D]."""

    cfg: VisionEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        B = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=self.dtype, name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(B, -1, cfg.hidden_size)

        cls = self.param("class_embedding", nn.initializers.normal(1.0),
                         (1, 1, cfg.hidden_size), jnp.float32)
        hidden = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype),
                              (B, 1, cfg.hidden_size)), patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, cfg.num_patches + 1, cfg.hidden_size),
                         jnp.float32)
        hidden = hidden + pos.astype(self.dtype)

        layers = nn.scan(
            _ScannedInternLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0, out_axes=0,
            length=cfg.num_layers,
        )(cfg, self.dtype, name="layers")
        _, per_layer = layers(hidden, jnp.zeros((cfg.num_layers,)))
        return jnp.concatenate([hidden[None], per_layer], axis=0)


def intern_vit_6b_config() -> VisionEncoderConfig:
    """InternViT-6B-448 geometry (internvit config defaults)."""
    return VisionEncoderConfig(
        arch="intern_vit", image_size=448, patch_size=14,
        hidden_size=3200, intermediate_size=12800, num_layers=48,
        num_heads=25, layer_norm_eps=1e-6, hidden_act="gelu",
        qk_normalization=True, use_ls=True, qkv_bias=False,
        output_layer=-1)
