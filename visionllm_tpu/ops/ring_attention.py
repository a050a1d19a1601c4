"""Ring attention over the "context" mesh axis (sequence parallelism).

The reference has no long-context path at all — DeepSpeed ZeRO shards
only optimizer state, and every sequence lives whole on one GPU
(SURVEY.md §5, visionllmv2/dist_utils.py). On TPU the natural long-
context design is to shard the SEQUENCE dimension over a mesh axis and
rotate K/V blocks around the ICI ring while each device keeps a running
online-softmax over its resident Q block (Liu et al., "Ring Attention
with Blockwise Transformers", arXiv:2310.01889 — PAPERS.md).

Why this shape for TPU:
  * each step is one [B, Lc, H, D] x [B, Lc, H, D] block attention — a
    dense MXU matmul, no gather, static shapes;
  * the K/V rotation is a single `ppermute` per step, which XLA
    schedules on ICI concurrently with the block compute (compute at
    step s hides the transfer for step s+1);
  * peak activation memory per chip is O(L/S) instead of O(L) — the
    full [L, L] score matrix never exists anywhere.

`ring_attention` is the shard_map-interior kernel; `ring_attention_spmd`
wraps it for callers holding global [B, L, H, D] arrays under a mesh.
Numerics match `ops.attention.multi_head_attention` to f32 round-off
(tests/test_ring_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e9  # finite mask fill: exp(_NEG - m) == 0 in f32, no -inf NaNs


def _block(q, k, v, scale, mask):
    """One Q-block x KV-block attention. Returns (m, l, o) with
    m=[B,H,Lq] rowmax, l=[B,H,Lq] rowsum, o=[B,Lq,H,D] unnormalized."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask, s, _NEG)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return m, l, o


def ring_attention(
    q: jnp.ndarray,                 # [B, Lc, H, D] local query shard
    k: jnp.ndarray,                 # [B, Lc, H_kv, D] local key shard
    v: jnp.ndarray,                 # [B, Lc, H_kv, D] local value shard
    *,
    axis_name: str,
    causal: bool = False,
) -> jnp.ndarray:
    """Exact attention over the sequence sharded on `axis_name`.

    Call inside `shard_map`; every device holds the same-shaped shard of
    a global [B, L, H, D] sequence (L = S * Lc, contiguous blocks in
    axis-index order). GQA is supported (H a multiple of H_kv).
    """
    S = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    B, Lc, H, D = q.shape
    H_kv = k.shape[2]
    if H_kv != H:
        rep = H // H_kv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = D ** -0.5
    qf = q.astype(jnp.float32)
    iq = jnp.arange(Lc)

    def step(s, carry):
        kb, vb, m, l, acc = carry
        kv_block = (me - s) % S                     # origin of current block
        mask = None
        if causal:
            gq = me * Lc + iq                       # global q positions
            gk = kv_block * Lc + iq                 # global k positions
            mask = (gq[:, None] >= gk[None, :])[None, None]
        mb, lb, ob = _block(qf, kb.astype(jnp.float32),
                            vb.astype(jnp.float32), scale, mask)
        m_new = jnp.maximum(m, mb)
        c_old = jnp.exp(m - m_new)
        c_blk = jnp.exp(mb - m_new)
        l = l * c_old + lb * c_blk
        acc = (acc * c_old.transpose(0, 2, 1)[..., None]
               + ob * c_blk.transpose(0, 2, 1)[..., None])
        # rotate K/V one hop around the ring (device j -> j+1)
        perm = [(j, (j + 1) % S) for j in range(S)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return kb, vb, m_new, l, acc

    m0 = jnp.full((B, H, Lc), _NEG, jnp.float32)
    l0 = jnp.zeros((B, H, Lc), jnp.float32)
    a0 = jnp.zeros((B, Lc, H, D), jnp.float32)
    _, _, _, l, acc = jax.lax.fori_loop(0, S, step, (k, v, m0, l0, a0))
    l = jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return (acc / l).astype(q.dtype)


def ring_attention_spmd(
    q: jnp.ndarray,                 # [B, L, H, D] global
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "context",
    causal: bool = False,
    batch_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """shard_map wrapper: sequence over `axis_name`, batch over
    `batch_axis` (if present in the mesh), heads/D replicated."""
    ba = batch_axis if (batch_axis and batch_axis in mesh.axis_names) else None
    spec = P(ba, axis_name, None, None)
    fn = functools.partial(ring_attention, axis_name=axis_name,
                           causal=causal)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)(q, k, v)
