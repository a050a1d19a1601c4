"""Shared building blocks: RMSNorm, rotary embeddings, MLPs.

RMSNorm matches apex FusedRMSNorm numerics (fp32 accumulation, then cast
back — the reference patches LlamaRMSNorm to apex's kernel in
visionllmv2/train/llama_forward_monkey_patch.py:168-180; XLA fuses the
same computation natively so no kernel is needed on TPU).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        normed = xf * jax.lax.rsqrt(var + self.eps)
        return (normed * scale).astype(self.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


ACT2FN: dict = {
    "gelu": nn.gelu,
    "quick_gelu": quick_gelu,
    "relu": nn.relu,
    "silu": nn.silu,
}


def rope_cos_sin(
    positions: jnp.ndarray,      # [B, L] int
    head_dim: int,
    theta: float = 10000.0,
    dtype: Dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotary tables, HF-LLaMA convention (half-split rotate_half)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)          # [B, L, D]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(
    q: jnp.ndarray,              # [B, L, H, D]
    k: jnp.ndarray,              # [B, L, H_kv, D]
    cos: jnp.ndarray,            # [B, L, D]
    sin: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    def rotate_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    cos_b = cos[:, :, None, :]
    sin_b = sin[:, :, None, :]
    q_out = q * cos_b + rotate_half(q) * sin_b
    k_out = k * cos_b + rotate_half(k) * sin_b
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


class MLP(nn.Module):
    """Simple N-layer MLP head (DETR-style), ReLU between layers."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            dim = self.out_dim if is_last else self.hidden_dim
            x = nn.Dense(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if not is_last:
                x = nn.relu(x)
        return x
