"""[GEN]/[EDIT] atom tools: LLM embeddings → diffusion conditioning.

Behavioral reference: visionllmv2/model/stable_diffusion/modeling_sd.py
(StableDiffusionWithLLMEmb: emb_proj MLP 4096→768, 77 learned queries
mapped through a 1-enc/1-dec torch nn.Transformer (norm_first) into
SD-1.5's CLIP-text space; training loss = UNet ε-prediction MSE + 0.1×
caption-embedding MSE distill; inference via the SD pipeline with
prompt_embeds) and instruct_pix2pix/modeling_instruct_pix2pix.py (same
pattern; UNet input = concat(noisy latents, VAE latents of the input
image); CFG dropout masks for both text and image conditioning;
UNet trainable, vae/text-encoder frozen).

TPU redesign: the head consumes the [EMB] hidden states already gathered
by the routing machinery ([B, num_embs_gen, llm_dim] — fixed shape;
the reference re-scans input_ids for the trigger token with .nonzero()),
and inference runs the whole CFG denoise loop as one jitted lax.scan.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from visionllm_tpu.config import IP2PConfig, SDConfig
from visionllm_tpu.models.stable_diffusion.scheduler import (
    DiffusionSchedule, add_noise, ddim_sample_loop)
from visionllm_tpu.models.stable_diffusion.unet import (UNet2DCondition,
                                                        UNetConfig)
from visionllm_tpu.models.stable_diffusion.vae import AutoencoderKL, VAEConfig


class TorchTransformerLayer(nn.Module):
    """torch nn.TransformerEncoder/DecoderLayer, norm_first=True, relu FF,
    dropout 0 (modeling_sd.py:76-84). `memory=None` → encoder layer."""

    d_model: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory=None):
        from visionllm_tpu.models.grounding_dino.layers import TorchMHA
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        h = ln("norm1")(x)
        x = x + TorchMHA(self.d_model, self.num_heads, self.dtype,
                         name="self_attn")(h, h, h)
        if memory is not None:
            h = ln("norm_mem")(x)
            x = x + TorchMHA(self.d_model, self.num_heads, self.dtype,
                             name="cross_attn")(h, memory, memory)
        h = ln("norm2")(x)
        h = nn.Dense(self.d_model * 4, dtype=self.dtype, name="linear1")(h)
        h = nn.relu(h)
        return x + nn.Dense(self.d_model, dtype=self.dtype,
                            name="linear2")(h)


class LLM2SDMapper(nn.Module):
    """emb_proj + queries + transformer → [B, num_queries, sd_dim]."""

    llm_dim: int
    sd_dim: int
    num_queries: int
    num_encoder_layers: int = 1
    num_decoder_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embs: jnp.ndarray) -> jnp.ndarray:
        """embs: [B, num_embs_gen, llm_dim]."""
        B = embs.shape[0]
        x = nn.Dense(self.sd_dim, dtype=self.dtype, name="emb_proj_0")(embs)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.sd_dim, dtype=self.dtype, name="emb_proj_2")(x)

        queries = self.param("mapper_queries", nn.initializers.normal(1.0),
                             (1, self.num_queries, self.sd_dim), jnp.float32)

        src = x
        for i in range(self.num_encoder_layers):
            src = TorchTransformerLayer(self.sd_dim, dtype=self.dtype,
                                        name=f"encoder_{i}")(src)
        src = nn.LayerNorm(dtype=self.dtype, name="encoder_norm")(src)

        tgt = jnp.broadcast_to(queries.astype(self.dtype),
                               (B, self.num_queries, self.sd_dim))
        for i in range(self.num_decoder_layers):
            tgt = TorchTransformerLayer(self.sd_dim, dtype=self.dtype,
                                        name=f"decoder_{i}")(tgt, src)
        return nn.LayerNorm(dtype=self.dtype, name="decoder_norm")(tgt)


def unet_cfg_for(sample_size: int, in_channels: int,
                 cross_attention_dim: int) -> UNetConfig:
    if sample_size <= 16:                # tiny test geometry
        return UNetConfig(
            sample_size=sample_size, in_channels=in_channels,
            out_channels=4, block_out_channels=(32, 64),
            layers_per_block=1, cross_attention_dim=cross_attention_dim,
            attention_head_dim=4, norm_num_groups=8,
            cross_attn_blocks=(True, False))
    return UNetConfig(in_channels=in_channels,
                      cross_attention_dim=cross_attention_dim)


def vae_cfg_for(sample_size: int) -> VAEConfig:
    if sample_size <= 16:
        return VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                         norm_num_groups=8)
    return VAEConfig()


class StableDiffusionWithLLMEmb(nn.Module):
    """[GEN] head. Methods: map_embeddings, train_loss, generate."""

    cfg: SDConfig
    dtype: jnp.dtype = jnp.bfloat16
    schedule: DiffusionSchedule = DiffusionSchedule()

    def setup(self):
        cfg = self.cfg
        self.mapper = LLM2SDMapper(
            cfg.llm_hidden_size, cfg.sd_hidden_size, cfg.num_queries,
            cfg.num_encoder_layers, cfg.num_decoder_layers,
            jnp.float32, name="mapper")
        self.unet = UNet2DCondition(
            unet_cfg_for(cfg.sample_size, cfg.in_channels,
                         cfg.cross_attention_dim), self.dtype, name="unet")
        self.vae = AutoencoderKL(vae_cfg_for(cfg.sample_size), self.dtype,
                                 name="vae")

    # ------------------------------------------------------------------

    def map_embeddings(self, gen_embs: jnp.ndarray) -> jnp.ndarray:
        """[B, num_embs_gen, llm_dim] → prompt_embeds [B, 77, sd_dim]."""
        return self.mapper(gen_embs.astype(jnp.float32))

    def train_loss(self, gen_embs: jnp.ndarray, output_images: jnp.ndarray,
                   rng: jnp.ndarray,
                   caption_embeds: Optional[jnp.ndarray] = None
                   ) -> Dict[str, jnp.ndarray]:
        """ε-prediction MSE (+ caption distill). output_images:
        [B, H, W, 3] in [-1, 1]."""
        cond = self.map_embeddings(gen_embs)
        r_vae, r_noise, r_t = jax.random.split(rng, 3)
        # the reference freezes the VAE (modeling_sd.py:104) — treat the
        # encode as a fixed feature extractor (also prevents the
        # reparameterization exp from exploding encoder grads)
        latents = jax.lax.stop_gradient(
            self.vae.encode(output_images.astype(self.dtype), r_vae))
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        B = latents.shape[0]
        t = jax.random.randint(r_t, (B,), 0,
                               self.schedule.num_train_timesteps)
        noisy = add_noise(self.schedule, latents.astype(jnp.float32),
                          noise, t)
        pred = self.unet(noisy.astype(self.dtype), t, cond)
        image_loss = jnp.mean(
            (pred.astype(jnp.float32) - noise) ** 2)
        out = {"image_loss": image_loss, "loss": image_loss}
        if caption_embeds is not None:
            caption_loss = jnp.mean(
                (cond - caption_embeds.astype(cond.dtype)) ** 2)
            out["caption_loss"] = caption_loss
            out["loss"] = image_loss + (
                self.cfg.caption_distill_weight * caption_loss)
        return out

    def generate(self, gen_embs: jnp.ndarray, rng: jnp.ndarray,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 7.5,
                 null_cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """DDIM CFG sampling → decoded image [B, H, W, 3] in [-1, 1]."""
        cond = self.map_embeddings(gen_embs)
        B = cond.shape[0]
        size = self.cfg.sample_size
        lat = jax.random.normal(rng, (B, size, size, 4), jnp.float32)
        if null_cond is None:
            null_cond = jnp.zeros_like(cond)

        def unet_fn(l, t):
            both = jnp.concatenate([l, l], axis=0).astype(self.dtype)
            ctx = jnp.concatenate([null_cond, cond], axis=0)
            eps = self.unet(both, jnp.concatenate([t, t]), ctx)
            eps_u, eps_c = jnp.split(eps.astype(jnp.float32), 2, axis=0)
            return eps_u + guidance_scale * (eps_c - eps_u)

        final = ddim_sample_loop(unet_fn, self.schedule, lat,
                                 num_inference_steps)
        return self.vae.decode(final.astype(self.dtype))

    def __call__(self, gen_embs, output_images, rng):
        out = self.train_loss(gen_embs, output_images, rng)
        if self.is_initializing():
            # touch the decoder so one init covers generate() too
            s = self.cfg.sample_size
            self.vae.decode(jnp.zeros((1, s, s, 4), self.dtype))
        return out


class InstructPix2PixWithLLMEmb(nn.Module):
    """[EDIT] head: UNet input = concat(noisy latents, input-image
    latents); dual text/image CFG dropout in training."""

    cfg: IP2PConfig
    dtype: jnp.dtype = jnp.bfloat16
    schedule: DiffusionSchedule = DiffusionSchedule()

    def setup(self):
        cfg = self.cfg
        self.mapper = LLM2SDMapper(
            cfg.llm_hidden_size, cfg.sd_hidden_size, cfg.num_queries,
            cfg.num_encoder_layers, cfg.num_decoder_layers,
            jnp.float32, name="mapper")
        self.unet = UNet2DCondition(
            unet_cfg_for(cfg.sample_size, cfg.in_channels,
                         cfg.cross_attention_dim), self.dtype, name="unet")
        self.vae = AutoencoderKL(vae_cfg_for(cfg.sample_size), self.dtype,
                                 name="vae")

    def map_embeddings(self, edit_embs: jnp.ndarray) -> jnp.ndarray:
        return self.mapper(edit_embs.astype(jnp.float32))

    def train_loss(self, edit_embs: jnp.ndarray, input_images: jnp.ndarray,
                   output_images: jnp.ndarray, rng: jnp.ndarray,
                   null_cond: Optional[jnp.ndarray] = None,
                   caption_embeds: Optional[jnp.ndarray] = None
                   ) -> Dict[str, jnp.ndarray]:
        cond = self.map_embeddings(edit_embs)
        r_vae, r_noise, r_t, r_cfg = jax.random.split(rng, 4)
        # frozen VAE (modeling_instruct_pix2pix.py:102-104)
        latents = jax.lax.stop_gradient(
            self.vae.encode(output_images.astype(self.dtype), r_vae))
        img_cond = jax.lax.stop_gradient(
            self.vae.encode(input_images.astype(self.dtype)))
        # the reference conditions on latent_dist.mode() WITHOUT the
        # scaling factor (modeling_instruct_pix2pix.py:168) — undo it
        img_cond = img_cond / self.vae.cfg.scaling_factor
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        B = latents.shape[0]
        t = jax.random.randint(r_t, (B,), 0,
                               self.schedule.num_train_timesteps)
        noisy = add_noise(self.schedule, latents.astype(jnp.float32),
                          noise, t)

        p = self.cfg.cfg_drop_prob
        if p > 0:
            rand = jax.random.uniform(r_cfg, (B,))
            prompt_mask = (rand < 2 * p)[:, None, None]
            if null_cond is None:
                null_cond = jnp.zeros_like(cond)
            cond = jnp.where(prompt_mask, null_cond, cond)
            image_keep = 1.0 - ((rand >= p) & (rand < 3 * p)).astype(
                img_cond.dtype)
            img_cond = img_cond * image_keep[:, None, None, None]

        unet_in = jnp.concatenate(
            [noisy.astype(self.dtype), img_cond.astype(self.dtype)], axis=-1)
        pred = self.unet(unet_in, t, cond)
        image_loss = jnp.mean((pred.astype(jnp.float32) - noise) ** 2)
        out = {"image_loss": image_loss, "loss": image_loss}
        if caption_embeds is not None:
            caption_loss = jnp.mean(
                (cond - caption_embeds.astype(cond.dtype)) ** 2)
            out["caption_loss"] = caption_loss
            out["loss"] = image_loss + 0.1 * caption_loss
        return out

    def generate(self, edit_embs: jnp.ndarray, input_images: jnp.ndarray,
                 rng: jnp.ndarray, num_inference_steps: int = 50,
                 guidance_scale: float = 7.5,
                 image_guidance_scale: float = 1.5,
                 null_cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """3-way CFG (text + image conditioning, IP2P §3.2.1)."""
        cond = self.map_embeddings(edit_embs)
        B = cond.shape[0]
        size = self.cfg.sample_size
        img_cond = self.vae.encode(input_images.astype(self.dtype))
        img_cond = (img_cond / self.vae.cfg.scaling_factor).astype(
            jnp.float32)
        lat = jax.random.normal(rng, (B, size, size, 4), jnp.float32)
        if null_cond is None:
            null_cond = jnp.zeros_like(cond)

        def unet_fn(l, t):
            lat3 = jnp.concatenate([l, l, l], axis=0)
            img3 = jnp.concatenate(
                [img_cond, img_cond, jnp.zeros_like(img_cond)], axis=0)
            ctx3 = jnp.concatenate([cond, null_cond, null_cond], axis=0)
            unet_in = jnp.concatenate(
                [lat3, img3], axis=-1).astype(self.dtype)
            eps = self.unet(unet_in, jnp.concatenate([t, t, t]), ctx3)
            e_ct, e_ci, e_uu = jnp.split(eps.astype(jnp.float32), 3, axis=0)
            return (e_uu + guidance_scale * (e_ct - e_ci)
                    + image_guidance_scale * (e_ci - e_uu))

        final = ddim_sample_loop(unet_fn, self.schedule, lat,
                                 num_inference_steps)
        return self.vae.decode(final.astype(self.dtype))

    def __call__(self, edit_embs, input_images, output_images, rng):
        out = self.train_loss(edit_embs, input_images, output_images, rng)
        if self.is_initializing():
            s = self.cfg.sample_size
            self.vae.decode(jnp.zeros((1, s, s, 4), self.dtype))
        return out
