"""Attention entry points.

The reference uses the flash-attn CUDA package (via monkey patches,
visionllmv2/train/llama_flash_attn_monkey_patch.py and
internvit/flash_attention.py). On TPU the equivalents are:

  * prefill / training (long q): the Pallas TPU flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) — tiled online
    softmax, never materializes the [L, L] score matrix in HBM;
  * decode (q_len == 1): a plain einsum — the KV gather is
    bandwidth-bound and XLA already emits the optimal fused loop;
  * fallback (odd shapes, CPU tests): masked einsum attention with
    fp32 softmax accumulation.

All entry points take [B, L, H, D] tensors ("BLHD") and return the same
layout, which keeps the callers free of layout gymnastics.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _einsum_attention(
    q: jnp.ndarray,            # [B, Lq, H, D]
    k: jnp.ndarray,            # [B, Lk, H_kv, D]
    v: jnp.ndarray,            # [B, Lk, H_kv, D]
    mask: Optional[jnp.ndarray],   # [B, 1|H, Lq, Lk] bool, True = attend
    scale: float,
) -> jnp.ndarray:
    B, Lq, H, D = q.shape
    H_kv = k.shape[2]
    if H_kv != H:  # GQA: repeat kv heads
        rep = H // H_kv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _flash_ok(q, k) -> bool:
    """Whether the Pallas flash kernel applies: TPU backend, block-aligned
    lengths, and supported head dim."""
    if jax.default_backend() not in ("tpu",):
        return False
    Lq, Lk, D = q.shape[1], k.shape[1], q.shape[3]
    return Lq >= 128 and Lq % 128 == 0 and Lk % 128 == 0 and D % 128 == 0


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention, [B, L, H, D] in/out.

    `mask` is a boolean attend-mask broadcastable to [B, H, Lq, Lk]; if
    `causal` is set and mask is None the causal structure is handled by
    the kernel (flash path) or built inline (einsum path).
    """
    scale = q.shape[-1] ** -0.5
    if mask is None and _flash_ok(q, k):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa
        seg = None
        if segment_ids is not None:
            seg = fa.SegmentIds(q=segment_ids, kv=segment_ids)
        # kernel layout is [B, H, L, D]
        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)
        H, H_kv = qh.shape[1], kh.shape[1]
        if H_kv != H:
            kh = jnp.repeat(kh, H // H_kv, axis=1)
            vh = jnp.repeat(vh, H // H_kv, axis=1)
        out = fa.flash_attention(qh, kh, vh, causal=causal, segment_ids=seg,
                                 sm_scale=scale)
        return out.transpose(0, 2, 1, 3)

    if causal:
        Lq, Lk = q.shape[1], k.shape[1]
        # offset allows Lq < Lk (decode with cache): query i attends keys
        # <= i + (Lk - Lq)
        causal_mask = (
            jnp.arange(Lk)[None, :] <= jnp.arange(Lq)[:, None] + (Lk - Lq))
        causal_mask = causal_mask[None, None]
        mask = causal_mask if mask is None else (mask & causal_mask)
    return _einsum_attention(q, k, v, mask, scale)
