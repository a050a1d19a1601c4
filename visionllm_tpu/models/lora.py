"""LoRA adapters for the LLM projections.

Behavioral reference: modeling_visionllmv2.py:255-279 (wrap_llm_lora:
peft LoraConfig r=32, alpha=64, dropout 0.05, targeting q/k/v/o +
gate/up/down for LLaMA or wqkv/wo/w2/w3 for InternLM2; embeddings stay
trainable).

TPU-native: instead of peft's module surgery, `LoraDense` carries the
frozen base kernel plus (lora_a, lora_b); the optimizer freezes
everything except params whose path contains "lora_" (see
train_step.build_optimizer's `frozen` hook). Merging for inference is
`merge_lora_params`.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class LoraDense(nn.Module):
    features: int
    rank: int
    alpha: float = 64.0
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features), jnp.float32)
        y = jnp.dot(x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        if self.rank > 0:
            a = self.param("lora_a", nn.initializers.normal(0.02),
                           (in_dim, self.rank), jnp.float32)
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.rank, self.features), jnp.float32)
            scale = self.alpha / self.rank
            y = y + jnp.dot(jnp.dot(x, a.astype(self.dtype)),
                            b.astype(self.dtype)) * scale
        return y


def lora_frozen_predicate(path: str) -> bool:
    """For build_optimizer(frozen=...): train only LoRA factors, the
    emb embeddings, and tool decoders; freeze base LLM weights."""
    if "lora_" in path:
        return False
    if path.startswith("core/llm/"):
        return True
    return False


def merge_lora_params(params: Any, alpha: float = 64.0) -> Any:
    """Fold lora_a @ lora_b into the base kernels (inference export)."""
    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            out[k] = walk(v)
        if "lora_a" in out and "lora_b" in out and "kernel" in out:
            r = out["lora_a"].shape[-1]
            out["kernel"] = out["kernel"] + (
                out["lora_a"] @ out["lora_b"]) * (alpha / r)
            out.pop("lora_a")
            out.pop("lora_b")
        return out
    return walk(params)
