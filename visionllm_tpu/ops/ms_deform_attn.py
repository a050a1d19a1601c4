"""Multi-scale deformable attention — the hot gather op of the detection
and pose decoders.

Semantics are defined by the reference's pure-PyTorch fallback
(visionllmv2/model/grounding_dino/modeling_ov_grounding_dino_mask_dn.py:607-643):
for each (query, head, level, point), bilinearly sample `value` at a
predicted normalized location and take the attention-weighted sum over
all (level, point) samples. Sampling follows
`grid_sample(mode="bilinear", padding_mode="zeros", align_corners=False)`:
with a location `t` in [0, 1], the pixel-space coordinate is
`t * extent - 0.5`, and out-of-bounds corners contribute zero.

TPU design notes
----------------
The CUDA reference (ms_deform_im2col_cuda.cuh) is a scalar gather loop —
the worst possible shape for the TPU's vector units. Here the op is
expressed as four batched `take_along_axis` gathers per pyramid level
(one per bilinear corner) over a level-flattened value tensor; XLA lowers
these to vectorized dynamic-gathers and fuses the weighting arithmetic.
`spatial_shapes` must be a *static* tuple so each level's extent is a
compile-time constant (no dynamic shapes inside jit).

Arrays (B=batch, S=sum of level sizes, H=heads, D=head dim, Q=queries,
L=levels, P=points):
  value:              [B, S, H, D]
  sampling_locations: [B, Q, H, L, P, 2]   (x, y) in [0, 1]
  attention_weights:  [B, Q, H, L, P]      softmaxed over (L, P)
  returns:            [B, Q, H * D]
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_level(
    value_l: jnp.ndarray,      # [B, H, HW, D]  (heads leading for gather)
    loc: jnp.ndarray,          # [B, Q, H, P, 2] in [0,1]
    height: int,
    width: int,
) -> jnp.ndarray:              # [B, H, Q, P, D]
    B, nH, _, D = value_l.shape
    Q, P = loc.shape[1], loc.shape[3]

    # align_corners=False pixel coordinates
    x = loc[..., 0] * width - 0.5    # [B, Q, H, P]
    y = loc[..., 1] * height - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0                      # weight toward the +1 corner
    fy = y - y0

    out = jnp.zeros((B, nH, Q, P, D), dtype=value_l.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            w = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
            valid = (xi >= 0) & (xi <= width - 1) & (yi >= 0) & (yi <= height - 1)
            xi_c = jnp.clip(xi, 0, width - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, height - 1).astype(jnp.int32)
            idx = yi_c * width + xi_c                       # [B, Q, H, P]
            idx = idx.transpose(0, 2, 1, 3).reshape(B, nH, Q * P)
            g = jnp.take_along_axis(value_l, idx[..., None], axis=2)
            g = g.reshape(B, nH, Q, P, D)
            wv = jnp.where(valid, w, 0.0).transpose(0, 2, 1, 3)  # [B, H, Q, P]
            out = out + g * wv[..., None].astype(value_l.dtype)
    return out


def ms_deform_attn_reference(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Pure-JAX (gather-based) multi-scale deformable attention.

    Numerically matches the reference torch fallback; used both as the
    production XLA path and as the parity oracle for the Pallas kernel.
    """
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)
    assert sampling_locations.shape[3] == L, (sampling_locations.shape, L)

    # split the level-flattened value once, statically
    sizes = [h * w for (h, w) in spatial_shapes]
    assert sum(sizes) == S, (spatial_shapes, S)
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)

    out = jnp.zeros((B, H, Q, D), dtype=jnp.promote_types(value.dtype, jnp.float32))
    for lvl, (h_l, w_l) in enumerate(spatial_shapes):
        v_l = value[:, offsets[lvl]:offsets[lvl + 1]]        # [B, HW, H, D]
        v_l = v_l.transpose(0, 2, 1, 3)                      # [B, H, HW, D]
        loc_l = sampling_locations[:, :, :, lvl]             # [B, Q, H, P, 2]
        sampled = _bilinear_gather_level(v_l, loc_l, h_l, w_l)  # [B,H,Q,P,D]
        w_l = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # [B,H,Q,P]
        out = out + jnp.sum(
            sampled.astype(out.dtype) * w_l[..., None].astype(out.dtype), axis=3)

    return out.transpose(0, 2, 1, 3).reshape(B, Q, H * D).astype(value.dtype)


# The public entry point. For now the XLA gather formulation *is* the
# production path; a Pallas kernel can be swapped in behind the same
# signature once profiling on real hardware justifies it.
@functools.partial(jax.jit, static_argnums=(1,))
def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    return ms_deform_attn_reference(
        value, spatial_shapes, sampling_locations, attention_weights)
