"""LLaMA-family causal decoder (Vicuna-7B default, InternLM2 via GQA and
packed-qkv naming handled in the weight converter).

Behavioral reference: HF LlamaForCausalLM as used by the composite model
(visionllmv2/model/modeling_visionllmv2.py:724-738 — takes inputs_embeds,
returns last-layer hidden states *after* the final RMSNorm plus lm_head
logits).

TPU design
----------
* layers are a single `nn.scan` over stacked parameters — one compile of
  one block instead of 32 unrolled copies; the KV cache is likewise a
  stacked [n_layers, ...] array scanned in lockstep.
* prefill and decode are the same module: `cache=None` (training) runs
  causal attention over the sequence; with a `KVCache`, q_len>1 is a
  prefill that writes the cache window, q_len==1 is a decode step that
  attends over the cache buffer (static max_len, masked by position).
* everything is static-shape: the cache buffer is allocated at
  `max_len` once; decode never reshapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from visionllm_tpu.config import LLMConfig
from visionllm_tpu.models.common import RMSNorm, apply_rope, rope_cos_sin
from visionllm_tpu.ops.attention import multi_head_attention
from visionllm_tpu.parallel.sequence import constrain_seq


@flax.struct.dataclass
class KVCache:
    k: jnp.ndarray          # [n_layers, B, max_len, H_kv, D]
    v: jnp.ndarray          # [n_layers, B, max_len, H_kv, D]
    index: jnp.ndarray      # scalar int32 — number of tokens already cached
    # int8 cache mode (serving): k/v stored int8 with per-(token, head)
    # bf16 scales — halves decode cache-read bandwidth (ops/quant.py)
    k_scale: Optional[jnp.ndarray] = None   # [n_layers, B, max_len, H_kv]
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, cfg: LLMConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads,
                 cfg.head_dim)
        if dtype == jnp.int8:
            return cls(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       index=jnp.zeros((), jnp.int32),
                       k_scale=jnp.ones(shape[:-1], jnp.bfloat16),
                       v_scale=jnp.ones(shape[:-1], jnp.bfloat16))
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   index=jnp.zeros((), jnp.int32))


class LlamaDecoderLayer(nn.Module):
    cfg: LLMConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden, cos, sin, attn_bias, cache_index, k_cache,
                 v_cache, ks_cache=None, vs_cache=None):
        """One block. Returns (hidden, (new_k, new_v, new_ks, new_vs)).

        k_cache/v_cache are this layer's [B, max_len, H_kv, D] slices (or
        None when running cache-less); int8 caches additionally carry
        per-(token, head) scale slices ks_cache/vs_cache [B, max_len,
        H_kv].
        """
        cfg = self.cfg
        B, L, _ = hidden.shape
        residual = hidden
        x = RMSNorm(eps=cfg.rms_norm_eps, dtype=self.dtype,
                    name="input_layernorm")(hidden)

        if cfg.lora_r > 0:
            from visionllm_tpu.models.lora import LoraDense
            dense = lambda feats, name: LoraDense(
                feats, cfg.lora_r, cfg.lora_alpha, dtype=self.dtype,
                name=name)
        elif cfg.quant == "int8":
            from visionllm_tpu.ops.quant import Int8Dense
            dense = lambda feats, name: Int8Dense(
                feats, dtype=self.dtype, name=name)
        elif cfg.quant == "w8a8":
            from visionllm_tpu.ops.quant import Int8ActDense
            dense = lambda feats, name: Int8ActDense(
                feats, dtype=self.dtype, name=name)
        elif cfg.quant == "int4":
            from visionllm_tpu.ops.quant4 import Int4Dense
            dense = lambda feats, name: Int4Dense(
                feats, dtype=self.dtype, name=name)
        else:
            dense = lambda feats, name: nn.Dense(
                feats, use_bias=False, dtype=self.dtype, name=name)
        q = dense(cfg.num_heads * cfg.head_dim, "q_proj")(x)
        k = dense(cfg.num_kv_heads * cfg.head_dim, "k_proj")(x)
        v = dense(cfg.num_kv_heads * cfg.head_dim, "v_proj")(x)
        q = q.reshape(B, L, cfg.num_heads, cfg.head_dim)
        k = k.reshape(B, L, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(B, L, cfg.num_kv_heads, cfg.head_dim)
        q, k = apply_rope(q, k, cos, sin)

        # a key-valid mask on a causal self-attention window (left-padded
        # prefill) is expressed as segment ids — valid tokens segment 1,
        # pads segment 0 — so the flash kernel path stays available;
        # outputs at valid rows are identical to the bias formulation
        seg = None
        prefill_mask = attn_bias
        if (attn_bias is not None and L > 1
                and attn_bias.shape == (B, 1, 1, L)):
            seg = attn_bias[:, 0, 0, :].astype(jnp.int32)
            prefill_mask = None

        # extend mode (speculative-decode verify window): L>1 new tokens
        # appended to a NON-empty cache — the bias spans the whole cache
        # buffer [B, 1, L, max_len], unlike the prefill window bias
        # [B, 1, 1, L]; detected by the key-dim matching the buffer
        extend = (k_cache is not None and L > 1 and attn_bias is not None
                  and attn_bias.shape[-1] == k_cache.shape[1]
                  and attn_bias.shape[-1] != L)

        new_ks = new_vs = None
        if k_cache is None:
            attn = multi_head_attention(q, k, v, mask=prefill_mask,
                                        causal=True, segment_ids=seg)
            new_k = new_v = None
        elif k_cache.dtype == jnp.int8:
            from visionllm_tpu.ops.quant import (int8_kv_attention,
                                                 quantize_kv)
            kq, ks = quantize_kv(k)
            vq, vs = quantize_kv(v)
            new_k = jax.lax.dynamic_update_slice(
                k_cache, kq, (0, cache_index, 0, 0))
            new_v = jax.lax.dynamic_update_slice(
                v_cache, vq, (0, cache_index, 0, 0))
            new_ks = jax.lax.dynamic_update_slice(
                ks_cache, ks, (0, cache_index, 0))
            new_vs = jax.lax.dynamic_update_slice(
                vs_cache, vs, (0, cache_index, 0))
            if L > 1 and not extend:
                # prefill attends the fresh bf16 window — exact; only the
                # cached history that DECODE reads back is quantized
                attn = multi_head_attention(q, k, v, mask=prefill_mask,
                                            causal=True, segment_ids=seg)
            else:
                # decode (L==1) or extend window: attend the whole
                # (masked) quantized buffer
                attn = int8_kv_attention(q, new_k, new_ks, new_v, new_vs,
                                         mask=attn_bias)
        else:
            new_k = jax.lax.dynamic_update_slice(
                k_cache, k.astype(k_cache.dtype), (0, cache_index, 0, 0))
            new_v = jax.lax.dynamic_update_slice(
                v_cache, v.astype(v_cache.dtype), (0, cache_index, 0, 0))
            if L > 1 and not extend:
                # prefill: attend within the fresh window only (cache was
                # empty before index=0 prefill)
                attn = multi_head_attention(q, k, v, mask=prefill_mask,
                                            causal=True, segment_ids=seg)
            else:
                # decode (L==1) or extend window: attend over the whole
                # (masked) cache buffer — the bias encodes causality
                attn = multi_head_attention(q, new_k.astype(q.dtype),
                                            new_v.astype(q.dtype),
                                            mask=attn_bias, causal=False)

        attn = attn.reshape(B, L, cfg.num_heads * cfg.head_dim)
        hidden = residual + dense(cfg.hidden_size, "o_proj")(attn)

        residual = hidden
        x = RMSNorm(eps=cfg.rms_norm_eps, dtype=self.dtype,
                    name="post_attention_layernorm")(hidden)
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        hidden = residual + dense(cfg.hidden_size, "down_proj")(
            nn.silu(gate) * up)
        # sequence parallelism: under a mesh with a context axis, pin
        # block outputs sequence-sharded (no-op otherwise)
        hidden = constrain_seq(hidden)
        return hidden, (new_k, new_v, new_ks, new_vs)


class _ScannedLayer(nn.Module):
    """scan-compatible wrapper: (carry, xs) -> (carry, ys)."""

    cfg: LLMConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, layer_cache):
        hidden, cos, sin, attn_bias, cache_index = carry
        k_cache, v_cache, ks_cache, vs_cache = layer_cache
        hidden, new_cache = LlamaDecoderLayer(
            self.cfg, self.dtype, name="layer")(
                hidden, cos, sin, attn_bias, cache_index, k_cache, v_cache,
                ks_cache, vs_cache)
        return (hidden, cos, sin, attn_bias, cache_index), new_cache


class LlamaModel(nn.Module):
    """Decoder stack + embeddings + lm_head (untied, like Vicuna)."""

    cfg: LLMConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
            name="embed_tokens")
        layer_cls = _ScannedLayer
        if cfg.remat:
            # recompute layer activations in the backward pass; under
            # scan prevent_cse is unnecessary (scan already isolates
            # iterations) and disabling it keeps the forward HLO clean
            policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      if cfg.remat == "dots" else None)
            layer_cls = nn.remat(_ScannedLayer, policy=policy,
                                 prevent_cse=False)
        self.layers = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
            length=cfg.num_layers,
        )(cfg, self.dtype, name="layers")
        self.norm = RMSNorm(eps=cfg.rms_norm_eps, dtype=self.dtype,
                            name="norm")
        if cfg.quant == "int8":
            from visionllm_tpu.ops.quant import Int8Dense
            self.lm_head = Int8Dense(cfg.vocab_size, dtype=self.dtype,
                                     name="lm_head")
        elif cfg.quant == "w8a8":
            from visionllm_tpu.ops.quant import Int8ActDense
            self.lm_head = Int8ActDense(cfg.vocab_size, dtype=self.dtype,
                                        name="lm_head")
        elif cfg.quant == "int4":
            from visionllm_tpu.ops.quant4 import Int4Dense
            self.lm_head = Int4Dense(cfg.vocab_size, dtype=self.dtype,
                                     name="lm_head")
        else:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                    dtype=self.dtype, name="lm_head")

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(input_ids)

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,             # [B, L, hid]
        positions: jnp.ndarray,                 # [B, L] absolute positions
        attn_mask: Optional[jnp.ndarray] = None,  # [B, L] (no cache) or
                                                  # [B, max_len] (decode)
        cache: Optional[KVCache] = None,
        compute_logits: bool = True,
        extend: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[KVCache]]:
        """Returns (hidden_after_final_norm, logits_fp32, new_cache).

        `extend=True` (speculative-decode verify window): the L inputs
        are appended at cache.index of a NON-empty cache and every query
        attends the whole buffer — history plus the causal part of the
        fresh window (position j visible to query i iff j <= index+i).
        """
        cfg = self.cfg
        B, L, _ = inputs_embeds.shape
        inputs_embeds = constrain_seq(inputs_embeds)
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                                dtype=self.dtype)

        # attention bias [B, 1, L, Lk] (True = attend); causal handled by
        # the kernel for the windowed paths
        if extend and cache is not None and L > 1:
            max_len = cache.k.shape[2]
            vis = (jnp.arange(max_len)[None, :]
                   <= (cache.index + jnp.arange(L))[:, None])  # [L, maxlen]
            bias = jnp.broadcast_to(vis[None, None], (B, 1, L, max_len))
            if attn_mask is not None:   # [B, max_len] buffer-valid mask
                bias = bias & attn_mask[:, None, None, :].astype(bool)
        elif cache is None or L > 1:
            bias = None
            if attn_mask is not None:
                bias = attn_mask[:, None, None, :].astype(bool)
        else:
            max_len = cache.k.shape[2]
            pos_valid = jnp.arange(max_len)[None, :] <= cache.index
            if attn_mask is not None:
                pos_valid = pos_valid & attn_mask.astype(bool)
            bias = pos_valid[:, None, None, :]

        hidden = inputs_embeds.astype(self.dtype)
        cache_index = cache.index if cache is not None else jnp.zeros(
            (), jnp.int32)
        layer_cache = ((cache.k, cache.v, cache.k_scale, cache.v_scale)
                       if cache is not None else (None, None, None, None))
        (hidden, *_), new_layer_cache = self.layers(
            (hidden, cos, sin, bias, cache_index), layer_cache)

        hidden = self.norm(hidden)
        logits = None
        if compute_logits:
            logits = self.lm_head(hidden).astype(jnp.float32)

        new_cache = None
        if cache is not None:
            new_k, new_v, new_ks, new_vs = new_layer_cache
            new_cache = KVCache(k=new_k, v=new_v, index=cache.index + L,
                                k_scale=new_ks, v_scale=new_vs)
        return hidden, logits, new_cache
