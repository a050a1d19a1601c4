"""AutoencoderKL (SD-1.5 VAE) in flax, NHWC.

Behavioral reference: the diffusers AutoencoderKL the reference loads
(modeling_sd.py:90): block_out_channels (128, 256, 512, 512), 2 resnets
per encoder block / 3 per decoder block, one mid attention, latent
channels 4, scaling_factor 0.18215.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        scores = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * (C ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, cfg.norm_num_groups, self.dtype,
                              name=f"down_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers pads asymmetrically ((0,1),(0,1)) for stride 2
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnet(ch, cfg.norm_num_groups, self.dtype,
                      name="mid_res_0")(h)
        h = VAEAttention(cfg.norm_num_groups, self.dtype, name="mid_attn")(h)
        h = VAEResnet(ch, cfg.norm_num_groups, self.dtype,
                      name="mid_res_1")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        h = VAEResnet(ch, cfg.norm_num_groups, self.dtype,
                      name="mid_res_0")(h)
        h = VAEAttention(cfg.norm_num_groups, self.dtype, name="mid_attn")(h)
        h = VAEResnet(ch, cfg.norm_num_groups, self.dtype,
                      name="mid_res_1")(h)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, cfg.norm_num_groups, self.dtype,
                              name=f"up_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype, name="encoder")
        self.decoder = Decoder(self.cfg, self.dtype, name="decoder")
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x: jnp.ndarray, rng=None) -> jnp.ndarray:
        """image [B, H, W, 3] → sampled latent [B, H/8, W/8, 4]
        (already scaled by scaling_factor)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar.astype(jnp.float32))
            mean = mean + (std * jax.random.normal(
                rng, mean.shape)).astype(mean.dtype)
        return mean * self.cfg.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        z = z / self.cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))
