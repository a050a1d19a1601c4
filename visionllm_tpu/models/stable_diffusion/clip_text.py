"""CLIP text encoder (SD-1.5's conditioning tower), flax.

Behavioral reference: the HF CLIPTextModel loaded in modeling_sd.py:88 —
12 layers, hidden 768, 12 heads, causal attention, quick_gelu, final LN.
Used for caption-distillation loss and null-prompt (CFG) embeddings.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from visionllm_tpu.models.common import quick_gelu


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5


class ClipTextLayer(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, causal_mask):
        cfg = self.cfg
        B, L, D = hidden.shape
        h = cfg.num_heads
        residual = hidden
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(hidden)
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        q = dense(D, "q_proj")(x).reshape(B, L, h, D // h)
        k = dense(D, "k_proj")(x).reshape(B, L, h, D // h)
        v = dense(D, "v_proj")(x).reshape(B, L, h, D // h)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * ((D // h) ** -0.5)
        scores = jnp.where(causal_mask[None, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, D)
        hidden = residual + dense(D, "out_proj")(attn)

        residual = hidden
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(hidden)
        x = dense(cfg.intermediate_size, "fc1")(x)
        x = quick_gelu(x)
        return residual + dense(D, "fc2")(x)


class ClipTextModel(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids [B, 77] → last hidden state [B, 77, 768]."""
        cfg = self.cfg
        B, L = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embedding")(
            jnp.arange(L)[None])
        hidden = tok + pos
        causal = jnp.tril(jnp.ones((L, L), bool))
        for i in range(cfg.num_layers):
            hidden = ClipTextLayer(cfg, self.dtype, name=f"layer_{i}")(
                hidden, causal)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(hidden)
