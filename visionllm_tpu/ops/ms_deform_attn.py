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
the worst possible shape for the TPU's vector units. Formulations
measured on v5e at the 800px encoder scale (S=Q=13294, H=8, D=32,
1.7M gathered rows):

  * per-level `take_along_axis` (4 gathers/level): ~90 ms;
  * corner-wise flat `jnp.take` ([B·H·S, D] table): 43.5 ms;
  * quad-row gather + einsum consumer (round-1 production): 28.8 ms
    f32 / 24.0 ms bf16;
  * quad-row gather + FUSED elementwise consumer (production below):
    **10.2 ms f32 / 7.0 ms bf16** — the einsum was the bottleneck, not
    the gather: a dot_general over (level·point, corner) forces XLA to
    materialize the 870 MB gathered-rows tensor, while the elementwise
    multiply+sum loop-fuses into the gather consumer.
  * floor: the bare row gather runs at 473M rows/s (242 GB/s on 512 B
    rows) ⇒ 3.6 ms; index/weight prep + reduction account for the rest.

Index layout matters: flattening gather indices as [B,H,L,P,Q] (queries
minor) is 2.5× faster end-to-end than [B,Q→major] orders — the take's
index vector and its consumers stay lane-contiguous in Q.

A Pallas kernel CANNOT express this op profitably in the current
toolchain — re-verified this round: Mosaic's `dynamic_gather` requires
operand/indices/output to share one shape AND the gather extent to fit
a single vreg (≤128 lanes, ≤8 f32 sublanes); vector ref-indexing
(`ref[idx_vec]`) and scalar-loop row loads are likewise rejected. The
one usable gather engine is XLA's own `jnp.take` row gather, which a
kernel cannot call. `ms_deform_attn_pallas` is kept as the record of
that design and used only when the flattened extent fits one vreg.
`spatial_shapes` must be a *static* tuple (no dynamic shapes inside
jit).

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


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------
#
# XLA lowers the take_along_axis gathers above to serial loops on TPU
# (~1 GB/s effective — 90 ms per 800px encoder layer). The TPU's fast
# path for data-dependent addressing is `tpu.dynamic_gather`: a VMEM
# vector op gathering along one dim of a 2D operand where operand /
# indices / output all share one shape. The kernel below restructures
# the op around it:
#
#   * value is laid out [B, H, D, S] (levels flattened on the lane dim);
#   * host-side XLA precomputes, per bilinear corner c and (level, point):
#       idx[b, h, c, l, p, :]  — flattened source column for every query
#       wgt[b, h, c, l, p, :]  — bilinear weight × attention weight
#     (out-of-bounds corners get weight 0 and index 0);
#   * the kernel, per (b, h, l) grid cell, accumulates
#       acc[D, S] += dynamic_gather(value, idx[c, p]) * wgt[c, p]
#     over the 4·P (corner, point) pairs — 16 vector gathers per level
#     instead of millions of scalar loads.
#
# Queries are padded up to S so the gather shapes line up (Q ≤ S always
# holds: decoder queries ≤ 1100 ≪ S, encoder Q == S).


def _precompute_corners(spatial_shapes, sampling_locations,
                        attention_weights, S):
    """→ idx [B,H,4,L,P,S] int32, wgt [B,H,4,L,P,S] f32 (queries padded
    to S)."""
    B, Q, H, L, P, _ = sampling_locations.shape
    offsets = []
    pos = 0
    for (h_l, w_l) in spatial_shapes:
        offsets.append(pos)
        pos += h_l * w_l

    hw = jnp.asarray([[h, w] for (h, w) in spatial_shapes], jnp.float32)
    x = sampling_locations[..., 0] * hw[:, 1][None, None, None, :, None]
    y = sampling_locations[..., 1] * hw[:, 0][None, None, None, :, None]
    x = x - 0.5
    y = y - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    idx_c, wgt_c = [], []
    W = jnp.asarray([w for (_, w) in spatial_shapes], jnp.float32)
    Hh = jnp.asarray([h for (h, _) in spatial_shapes], jnp.float32)
    off = jnp.asarray(offsets, jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            w = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
            Wl = W[None, None, None, :, None]
            Hl = Hh[None, None, None, :, None]
            valid = ((xi >= 0) & (xi <= Wl - 1)
                     & (yi >= 0) & (yi <= Hl - 1))
            xi_c = jnp.clip(xi, 0, Wl - 1)
            yi_c = jnp.clip(yi, 0, Hl - 1)
            lin = (off[None, None, None, :, None] + yi_c * Wl + xi_c)
            idx_c.append(lin.astype(jnp.int32))
            wgt_c.append(jnp.where(valid, w, 0.0))

    idx = jnp.stack(idx_c, axis=3)       # [B, Q, H, 4, L, P]
    wgt = jnp.stack(wgt_c, axis=3) * attention_weights[:, :, :, None]
    # [B, Q, H, 4, L, P] → [B, H, 4, L, P, Q] → pad Q to S
    idx = idx.transpose(0, 2, 3, 4, 5, 1)
    wgt = wgt.transpose(0, 2, 3, 4, 5, 1)
    if Q < S:
        pad = ((0, 0),) * 5 + ((0, S - Q),)
        idx = jnp.pad(idx, pad)
        wgt = jnp.pad(wgt, pad)
    return idx, wgt.astype(jnp.float32)


def _msda_kernel(value_ref, idx_ref, wgt_ref, out_ref):
    """Grid (B, H, L). Blocks: value [1,1,D,S]; idx/wgt [1,1,4,1,P,S];
    out [1,1,D,S] accumulated across the L grid steps."""
    import jax.experimental.pallas as pl  # noqa: F401 (doc)

    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v = value_ref[0, 0]                    # [D, S]
    D, S = v.shape
    acc = out_ref[0, 0]
    n4, P = idx_ref.shape[2], idx_ref.shape[4]
    for c in range(n4):
        for p in range(P):
            idx = idx_ref[0, 0, c, 0, p, :]               # [S]
            idx2 = jnp.broadcast_to(idx[None, :], (D, S))
            g = jnp.take_along_axis(v, idx2, axis=1)      # dynamic_gather
            wrow = wgt_ref[0, 0, c, 0, p, :][None, :]     # [1, S]
            acc = acc + g.astype(jnp.float32) * wrow
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnums=(1,))
def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]

    idx, wgt = _precompute_corners(spatial_shapes, sampling_locations,
                                   attention_weights, S)
    value_t = value.transpose(0, 2, 3, 1)          # [B, H, D, S]

    out = pl.pallas_call(
        _msda_kernel,
        grid=(B, H, L),
        in_specs=[
            pl.BlockSpec((1, 1, D, S), lambda b, h, l: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, 1, P, S),
                         lambda b, h, l: (b, h, 0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, 1, P, S),
                         lambda b, h, l: (b, h, 0, l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D, S), lambda b, h, l: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, D, S), jnp.float32),
    )(value_t, idx, wgt)

    out = out[..., :Q]                             # [B, H, D, Q]
    return out.transpose(0, 3, 1, 2).reshape(B, Q, H * D).astype(value.dtype)


def _kernel_blocks_ok(value, spatial_shapes, sampling_locations) -> bool:
    """Mosaic dynamic_gather needs the whole flattened extent inside one
    vreg (≤128 lanes) — true only for tiny test pyramids."""
    B, S, H, D = value.shape
    return (jax.default_backend() == "tpu" and S <= 128
            and sampling_locations.shape[1] <= S)


def ms_deform_attn_flat(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Production TPU formulation: ONE flat row gather for every
    (level, point, corner) sample, then a weighted reduction. ~4× the
    throughput of per-level take_along_axis on v5e (see module notes)."""
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]

    idx, wgt = _precompute_corners(spatial_shapes, sampling_locations,
                                   attention_weights, Q)
    # idx/wgt: [B, H, 4, L, P, Q] with flattened level-local indices
    head_off = (jnp.arange(B * H, dtype=jnp.int32) * S).reshape(B, H)
    gidx = idx + head_off[:, :, None, None, None, None]
    flat_v = value.transpose(0, 2, 1, 3).reshape(B * H * S, D)
    rows = jnp.take(flat_v, gidx.reshape(-1), axis=0)
    rows = rows.reshape(B, H, 4 * L * P, Q, D).astype(jnp.float32)
    w = wgt.reshape(B, H, 4 * L * P, Q)
    out = jnp.einsum("bhsq,bhsqd->bhqd", w, rows,
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, Q, H * D).astype(value.dtype)


def ms_deform_attn_quad(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Fastest TPU formulation: TPU row-gather throughput is per-ROW
    bound (~450M rows/s on v5e regardless of row width ≤256B), so the
    four bilinear corners are pre-concatenated into one 4·D "quad" row
    per source cell — ONE gathered row per (query, head, level, point),
    4× fewer rows than corner-wise gathering.

    Quad table per level (row-major cells): row i = [v(i), v(i+1),
    v(i+w), v(i+w+1)] = corners [(y,x),(y,x+1),(y+1,x),(y+1,x+1)] of the
    cell at clip positions; slice-cell weights w_r = max(0, 1−|coord−r|)
    masked to the valid extent reproduce zero-padding semantics exactly
    (including the x0=−1 / x0=w−1 edge cases)."""
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]

    # locations/weights always in f32: bf16's 8 mantissa bits quantize
    # a [0,1] location to ~0.4% of the map extent (half a cell at the
    # coarse levels); only the gathered VALUES may stay low-precision
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)

    v = value.transpose(0, 2, 1, 3).reshape(B * H, S, D)

    # build the concatenated quad table, level by level (static shifts)
    quads = []
    offsets = []
    pos = 0
    for (h_l, w_l) in spatial_shapes:
        hw = h_l * w_l
        vl = v[:, pos:pos + hw]
        pad = jnp.pad(vl, ((0, 0), (0, w_l + 1), (0, 0)))
        quads.append(jnp.concatenate(
            [vl, pad[:, 1:hw + 1], pad[:, w_l:hw + w_l],
             pad[:, w_l + 1:hw + w_l + 1]], axis=-1))
        offsets.append(pos)
        pos += hw
    quad = jnp.concatenate(quads, axis=1).reshape(B * H * S, 4 * D)

    # locations → [B, H, L, P, Q] layout once
    loc = sampling_locations.transpose(0, 2, 3, 4, 1, 5)  # [B,H,L,P,Q,2]
    attw = attention_weights.transpose(0, 2, 3, 4, 1)     # [B,H,L,P,Q]

    gidx_l, wcell_l = [], []
    for lvl, (h_l, w_l) in enumerate(spatial_shapes):
        x = loc[:, :, lvl, :, :, 0] * w_l - 0.5           # [B,H,P,Q]
        y = loc[:, :, lvl, :, :, 1] * h_l - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        xs = jnp.clip(x0, 0, max(w_l - 2, 0))
        ys = jnp.clip(y0, 0, max(h_l - 2, 0))
        gidx_l.append((offsets[lvl] + ys * w_l + xs).astype(jnp.int32))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(
            x[..., None] - (xs[..., None] + jnp.arange(2.0))))
        wx = jnp.where((xs[..., None] + jnp.arange(2.0)) <= w_l - 1, wx, 0.0)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            y[..., None] - (ys[..., None] + jnp.arange(2.0))))
        wy = jnp.where((ys[..., None] + jnp.arange(2.0)) <= h_l - 1, wy, 0.0)
        # corner order matches the quad layout: y-major, x-minor
        cell = (wy[..., :, None] * wx[..., None, :]).reshape(
            *wx.shape[:-1], 4)
        wcell_l.append(cell * attw[:, :, lvl, :, :, None])

    gidx = jnp.stack(gidx_l, axis=2)                      # [B,H,L,P,Q]
    wcell = jnp.stack(wcell_l, axis=2)                    # [B,H,L,P,Q,4]

    # Weighted reduction as elementwise multiply + axis sums, NOT an
    # einsum: a dot_general over the (LP, corner) contraction forces XLA
    # to materialize the gathered rows tensor ([B,H,LP,Q,4,D] = 870 MB
    # at the 800px scale) as a matmul operand, which dominated the whole
    # op. The elementwise form loop-fuses into the gather consumer.
    # Measured 800px encoder scale (S=Q=13294, H=8, D=32), v5e,
    # chained-slope timing (serialized iterations — single-call timings
    # through the axon relay are unreliable):
    #   einsum consumer            f32 28.8 ms   bf16 24.0 ms
    #   fused consumer, f32 rows   bf16 table   11.7 ms
    #   fused consumer + barrier   bf16 table    9.3 ms   (this code)
    #   pure row-gather floor: 3.6 ms (473M rows/s, table-dtype bound)
    # f32 weights + f32 accumulation even for a bf16 table: the upcast
    # fuses into the gather consumer but XLA still materializes the f32
    # gathered-rows buffer ([N, 4D]); gathering ALL levels at once makes
    # that buffer B·H·L·P·Q rows (1.33 GB + a layout copy at bs=4,
    # 512 px — OOMs next to the 13 GB param tree), so gather + weighted
    # reduce run per LEVEL: 4× smaller peak temp, identical row count,
    # and each level's gather→convert→mul→sum chain still fuses.
    # The barrier after each gather pins its output buffer at the TABLE
    # dtype: without it XLA fuses the f32 convert into the gather and
    # materializes the gathered rows at f32 width (2× the bytes written
    # AND re-read by the consumer — measured 11.7 → 9.3 ms/layer at
    # 800px, bit-identical output since the convert still runs in f32
    # registers inside the fused multiply-reduce).
    # Gather per (IMAGE, HEAD) — a static python loop, NOT one flat
    # [B·H·S, 4D] table: TPU row-gather throughput degrades once the
    # table outgrows a small working set (measured at the 512px encoder
    # shape, bs4: flat-table 18.9 ms vs per-image 10.4 ms — 1.80x vs
    # 1.04x per-image scaling; tools/profile_msda_parts.py). The same
    # cliff hits the BACKWARD even harder: autodiff mirrors each take
    # with a scatter-add into a table of the same size, and scatter into
    # a [H·S, 4D] table measured 3.97 ms vs 0.75 ms per-head (5.3x,
    # /tmp job 170 → docs/BATCH_SCALING.md lineage). Per-head tables
    # ([S, 4D], ~2 MB at 640 px) keep both directions on the fast path;
    # the train step's dominant term (gdino_bwd, the msda grad_v
    # scatters) is what this layout exists for.
    # The (b, h) chains are serialized by a barrier tie from each
    # head's table read to the previous head's output: without it the
    # scheduler overlaps all B·H chains and keeps every head's gathered
    # rows + f32 partials live at once (+584 MB at bs1/512px — enough
    # to OOM the e2e program next to the 13.5 GB tree).
    quad_bh = quad.reshape(B, H, S, 4 * D)
    N_l = P * Q
    prev = None
    outs = []
    for b in range(B):
        heads = []
        for h in range(H):
            tbl = quad_bh[b, h]
            if prev is not None:
                tbl, prev = jax.lax.optimization_barrier((tbl, prev))
            out_h = jnp.zeros((Q, D), jnp.float32)
            for lvl in range(L):
                rows = jnp.take(tbl, gidx[b, h, lvl].reshape(-1),
                                axis=0)
                rows = jax.lax.optimization_barrier(rows)
                w_l = wcell[b, h, lvl].reshape(N_l, 4, 1)
                out_l = (rows.reshape(N_l, 4, D).astype(jnp.float32)
                         * w_l).sum(1)
                out_h = out_h + out_l.reshape(P, Q, D).sum(0)
            heads.append(out_h)
            prev = out_h
        outs.append(jnp.stack(heads, axis=0))             # [H, Q, D]
    out = jnp.stack(outs, axis=0)                         # [B,H,Q,D]
    return out.transpose(0, 2, 1, 3).reshape(B, Q, H * D).astype(value.dtype)


# Public entry point: quad-gather formulation on TPU; the per-level
# gather reference elsewhere (CPU tests) and as the semantics oracle.
@functools.partial(jax.jit, static_argnums=(1,))
def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    if jax.default_backend() == "tpu":
        return ms_deform_attn_quad(
            value, spatial_shapes, sampling_locations, attention_weights)
    return ms_deform_attn_reference(
        value, spatial_shapes, sampling_locations, attention_weights)
