"""SD-1.5-architecture conditional UNet, built natively in flax (NHWC).

Behavioral reference: the diffusers UNet2DConditionModel the reference
loads for its [GEN]/[EDIT] heads (visionllmv2/model/stable_diffusion/
modeling_sd.py:91, instruct_pix2pix/modeling_instruct_pix2pix.py —
"runwayml/stable-diffusion-v1-5" / "timbrooks/instruct-pix2pix" UNets:
block_out_channels (320, 640, 1280, 1280), 2 resnets/block, one
transformer block per attn with 8 heads, cross_attention_dim 768,
GEGLU FF). diffusers is not vendored — this is a from-scratch NHWC
implementation sized by UNetConfig so the same module serves SD-1.5
(in_channels=4) and InstructPix2Pix (in_channels=8).

TPU notes: all convs NHWC (XLA's native layout); attention over
(H·W, C) tokens uses the shared einsum attention (flash kernel not
needed at 64²..8² token counts); bf16 params/compute with fp32 norms.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8        # heads (SD-1.5 names it this way)
    norm_num_groups: int = 32
    # which down/up blocks carry cross-attention (SD-1.5: all but last)
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    freq_shift: int = 0
    flip_sin_to_cos: bool = True


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       freq_shift: int = 0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers convention."""
    half = dim // 2
    exponent = -math.log(10000) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    query_dim: int
    heads: int
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.query_dim
        hd = inner // self.heads
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_v")(context)
        B, L, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, L, self.heads, hd)
        k = k.reshape(B, Lk, self.heads, hd)
        v = v.reshape(B, Lk, self.heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    context_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.dim, self.heads, dtype=self.dtype,
                               name="attn1")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x))
        x = x + CrossAttention(self.dim, self.heads, self.context_dim,
                               dtype=self.dtype, name="attn2")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        h = GEGLU(self.dim * 4, dtype=self.dtype, name="ff_geglu")(h)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)


class Transformer2D(nn.Module):
    """GroupNorm → 1x1 proj_in → transformer block(s) → 1x1 proj_out +
    residual (diffusers Transformer2DModel, 1 block for SD-1.5)."""

    heads: int
    context_dim: int
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         name="norm")(x)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        h = BasicTransformerBlock(C, self.heads, self.context_dim,
                                  self.dtype, name="block_0")(h, context)
        h = h.reshape(B, H, W, C)
        return residual + nn.Conv(C, (1, 1), dtype=self.dtype,
                                  name="proj_out")(h)


class UNet2DCondition(nn.Module):
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray) -> jnp.ndarray:
        """sample [B, H, W, C_in], timesteps [B], context [B, 77, 768]
        → predicted noise [B, H, W, C_out]."""
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4
        context = encoder_hidden_states.astype(self.dtype)

        temb = timestep_embedding(timesteps, ch0, cfg.flip_sin_to_cos,
                                  cfg.freq_shift).astype(self.dtype)
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_dense1")(temb)
        temb = nn.Dense(temb_dim, dtype=self.dtype,
                        name="time_dense2")(nn.silu(temb))

        h = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(sample.astype(self.dtype))
        skips = [h]

        # down
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_num_groups, self.dtype,
                                name=f"down_{i}_res_{j}")(h, temb)
                if cfg.cross_attn_blocks[i]:
                    h = Transformer2D(cfg.attention_head_dim,
                                      cfg.cross_attention_dim,
                                      cfg.norm_num_groups, self.dtype,
                                      name=f"down_{i}_attn_{j}")(h, context)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # mid
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock(ch, cfg.norm_num_groups, self.dtype,
                        name="mid_res_0")(h, temb)
        h = Transformer2D(cfg.attention_head_dim, cfg.cross_attention_dim,
                          cfg.norm_num_groups, self.dtype,
                          name="mid_attn")(h, context)
        h = ResnetBlock(ch, cfg.norm_num_groups, self.dtype,
                        name="mid_res_1")(h, temb)

        # up (reversed channels, layers_per_block+1 resnets, skip concat)
        rev_channels = tuple(reversed(cfg.block_out_channels))
        rev_cross = tuple(reversed(cfg.cross_attn_blocks))
        for i, ch in enumerate(rev_channels):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(ch, cfg.norm_num_groups, self.dtype,
                                name=f"up_{i}_res_{j}")(h, temb)
                if rev_cross[i]:
                    h = Transformer2D(cfg.attention_head_dim,
                                      cfg.cross_attention_dim,
                                      cfg.norm_num_groups, self.dtype,
                                      name=f"up_{i}_attn_{j}")(h, context)
            if i < len(rev_channels) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)
