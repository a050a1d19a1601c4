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
    """Whether the Pallas flash kernel applies: TPU backend, big-enough
    problem, and a head dim the kernel tiles well."""
    if jax.default_backend() not in ("tpu",):
        return False
    Lq, Lk, D = q.shape[1], k.shape[1], q.shape[3]
    return Lq >= 128 and Lk >= 128 and D % 64 == 0


def _flash_causal_ok(q, k) -> bool:
    """Causal flash additionally requires Lq == Lk: the kernel
    start-aligns the causal mask (query i attends keys <= i) while the
    einsum path end-aligns (keys <= i + Lk - Lq, the cache-offset decode
    semantics) — for Lq != Lk the two disagree, so chunked-prefill-style
    callers must take the einsum path."""
    return _flash_ok(q, k) and q.shape[1] == k.shape[1]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


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

    Flash path: lengths are padded up to 128-multiples. Causal
    self-attention pads at the END, which is exact (later pad keys are
    causally invisible to valid queries); the non-causal path segments
    valid vs pad tokens so pad keys never contribute.
    """
    scale = q.shape[-1] ** -0.5
    if mask is None and (_flash_causal_ok(q, k) if causal
                         else _flash_ok(q, k)):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa
        B, Lq, H, D = q.shape
        Lk = k.shape[1]
        Lq_p, Lk_p = _round_up(Lq, 128), _round_up(Lk, 128)
        pq, pk = Lq_p - Lq, Lk_p - Lk
        if pq or pk:
            q = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
            k = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0)))
        seg = None
        if segment_ids is not None:
            sq = jnp.pad(segment_ids, ((0, 0), (0, pq)),
                         constant_values=-1)
            sk = jnp.pad(segment_ids, ((0, 0), (0, pk)),
                         constant_values=-1)
            seg = fa.SegmentIds(q=sq, kv=sk)
        elif not causal and (pq or pk):
            # segment out the padding for bidirectional attention
            sq = (jnp.arange(Lq_p) < Lq).astype(jnp.int32)[None]
            sk = (jnp.arange(Lk_p) < Lk).astype(jnp.int32)[None]
            seg = fa.SegmentIds(q=jnp.broadcast_to(sq, (B, Lq_p)),
                                kv=jnp.broadcast_to(sk, (B, Lk_p)))
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
        out = out.transpose(0, 2, 1, 3)
        return out[:, :Lq] if pq else out

    if segment_ids is not None:
        # einsum fallback honors segments the same way the flash kernel
        # does: attention only within equal segment ids (Lq == Lk here —
        # segments are a self-attention feature)
        seg_mask = (segment_ids[:, None, :, None]
                    == segment_ids[:, None, None, :])
        mask = seg_mask if mask is None else (mask & seg_mask)
    if causal:
        Lq, Lk = q.shape[1], k.shape[1]
        # offset allows Lq < Lk (decode with cache): query i attends keys
        # <= i + (Lk - Lq)
        causal_mask = (
            jnp.arange(Lk)[None, :] <= jnp.arange(Lq)[:, None] + (Lk - Lq))
        causal_mask = causal_mask[None, None]
        mask = causal_mask if mask is None else (mask & causal_mask)
    return _einsum_attention(q, k, v, mask, scale)
