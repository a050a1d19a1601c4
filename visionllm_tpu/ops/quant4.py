"""Int4 (w4a16, group-128) weight-only quantization for serving decode.

Decode streams the whole weight tree once per token (HBM-bound —
ops/quant.py); int8 already halves bytes/token, int4 halves them again:
0.5 byte/param + bf16 group scales (1/128th). Per-output-channel scales
are too coarse at 4 bits, so scales are per (128-input-row group,
output channel) — the w4g128 recipe of the GPTQ/AWQ line of work.

Packing (split-half, TPU-first): byte ``[r, o]`` of the packed kernel
holds input-rows ``r`` (low nibble) and ``r + in/2`` (high nibble),
both SIGNED two's-complement nibbles. Unlike even/odd packing this
needs NO interleave to unpack — the matmul splits into
``x[:, :in/2] @ W_top + x[:, in/2:] @ W_bot`` where ``W_top/W_bot``
are elementwise nibble extractions of the SAME byte tile, so the
Pallas kernel reads each packed byte exactly once, dequantizes in
VMEM, and feeds the MXU bf16 dots. No bf16 copy of the weight ever
exists in HBM.

Decode at bs≤16 is VPU-dequant-bound, not HBM-bound (measured: the
round-3 offset-8 kernel with a full ``[in, out]`` scale multiply ran
at 0.21 HBM util — every weight cost ~6 VPU ops while bandwidth
affords ~2.3/byte at 819 GB/s vs the 8×128×4-ALU VPU). Two design
rules follow: (a) signed nibbles unpack with two arithmetic SHIFTS
(``w << 4 >> 4`` / ``w >> 4``) — no mask/subtract chain; (b) the
group scale multiplies the ``[groups, out]`` PARTIAL DOT SUMS, not
the ``[in, out]`` dequantized weights — G=128× less scale work. The
MXU contracts each 128-row group separately (one dot per group);
group partials accumulate in f32.

The XLA fallback (CPU tests, non-TPU backends) materializes the
dequantized tile per call — bit-identical results, no bandwidth win.

The reference has no quantized serving (bf16 ``model.generate()``,
modeling_visionllmv2.py); this extends the int8 serving mode.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

GROUP = 128           # input rows per scale group (shrinks for tiny dims)


def group_size(cin: int) -> int:
    """Scale-group length along the input axis: 128, shrunk so it
    divides ``cin//2`` (tiny test dims)."""
    g = min(GROUP, cin // 2)
    while (cin // 2) % g:
        g //= 2
    return g


def pack_int4(w: jnp.ndarray):
    """Quantize ``w [..., in, out]`` to packed int4 + group scales.

    Returns ``(wp int8 [..., in//2, out], scale bf16 [..., in//G, out])``
    with split-half packing: low nibble = row ``r``, high nibble = row
    ``r + in//2``, both signed two's-complement (−8..7) so the kernel
    unpacks with arithmetic shifts alone.
    """
    *lead, cin, cout = w.shape
    G = group_size(cin)
    assert cin % (2 * G) == 0, (cin, G)
    wf = w.astype(jnp.float32)
    g = wf.reshape(*lead, cin // G, G, cout)
    amax = jnp.max(jnp.abs(g), axis=-2)
    scale = jnp.maximum(amax / 7.0, 1e-8).astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(g / scale[..., None, :].astype(jnp.float32)),
                 -8, 7).astype(jnp.int32)
    q = q.reshape(*lead, cin, cout)
    half = cin // 2
    lo = q[..., :half, :] & 0xF
    hi = q[..., half:, :] & 0xF
    byte = (lo | (hi << 4)).astype(jnp.uint8)
    wp = jax.lax.bitcast_convert_type(byte, jnp.int8)
    return wp, scale


def int4_matmul_ref(x: jnp.ndarray, wp: jnp.ndarray,
                    scale: jnp.ndarray) -> jnp.ndarray:
    """XLA reference/fallback: dequantize then matmul. Exact spec for
    the Pallas kernel (same split-half signed-nibble unpack, same
    per-group f32 partial-sum scaling)."""
    half = wp.shape[-2]
    ngh = scale.shape[-2] // 2
    g = half // ngh
    # signed nibbles: arithmetic shifts sign-extend (int32 here; the
    # kernel does the same directly on the int8 lanes)
    wi = wp.astype(jnp.int32)
    lo = (wi << 28) >> 28
    hi = wi >> 4
    dt = x.dtype
    sf = scale.astype(jnp.float32)
    acc = None
    for nib, sl, x_off in ((lo, slice(0, ngh), 0),
                           (hi, slice(ngh, 2 * ngh), half)):
        wn = nib.astype(dt).reshape(*wp.shape[:-2], ngh, g, wp.shape[-1])
        xs = x[..., x_off:x_off + half]
        xg = xs.reshape(*x.shape[:-1], ngh, g)
        # per-group partial dots, then scale the [.., ngh, out] partials
        p = jnp.einsum("...ng,...ngo->...no", xg, wn,
                       preferred_element_type=jnp.float32)
        part = jnp.sum(p * sf[..., sl, :], axis=-2)
        acc = part if acc is None else acc + part
    return acc.astype(dt)


def _int4_kernel(x_ref, wp_ref, s_ref, out_ref):
    """One (row-tile, out-tile) cell: shift-unpack the byte tile in
    VMEM (signed nibbles → two arithmetic shifts, no mask/sub chain),
    one MXU dot per 128-row scale group, scale the [group, TO] f32
    partial sums (G× less scale work than scaling the weights)."""
    # Mosaic has no i8 vector shifts (arith.shli fails to legalize on
    # vector<..xi8>) — sign-extend the byte to i32 once, then shift
    w = wp_ref[:].astype(jnp.int32)                # int8 [half, TO] → i32
    lo = (w << 28) >> 28                           # signed low nibble
    hi = w >> 4                                    # signed high nibble
    s = s_ref[:].astype(jnp.float32)               # [n_groups, TO]
    ngh = s.shape[0] // 2
    half = w.shape[0]
    g = half // ngh
    dt = x_ref.dtype
    x = x_ref[:]
    acc = None
    for nib, x_off, s_off in ((lo, 0, 0), (hi, half, ngh)):
        for gi in range(ngh):
            p = jnp.dot(x[:, x_off + gi * g:x_off + (gi + 1) * g],
                        nib[gi * g:(gi + 1) * g].astype(dt),
                        preferred_element_type=jnp.float32)
            p = p * s[s_off + gi][None]
            acc = p if acc is None else acc + p
    out_ref[:] = acc.astype(out_ref.dtype)


def int4_matmul(x: jnp.ndarray, wp: jnp.ndarray, scale: jnp.ndarray,
                *, interpret: bool = False) -> jnp.ndarray:
    """``x [B, in] @ dequant(wp, scale) -> [B, out]`` via the fused
    Pallas kernel (TPU) or the XLA fallback elsewhere.

    Per grid cell the packed column block ([in/2, TILE_OUT] int8) is
    read once from HBM — decode's bandwidth cost is 0.5 byte/param.
    """
    B, cin = x.shape
    half, cout = wp.shape
    # the kernel tiles the output in 128-lane multiples; odd widths
    # (tiny test configs) take the XLA fallback — they are not the
    # bandwidth-bound case the kernel exists for
    if cout % 128 != 0:
        return int4_matmul_ref(x, wp, scale)
    if not interpret and jax.default_backend() != "tpu":
        return int4_matmul_ref(x, wp, scale)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ng = scale.shape[0]
    TILE_B = 16 if B <= 16 else 128
    TILE_O = 256 if cout % 256 == 0 else 128
    pb = (-B) % TILE_B
    if pb:
        x = jnp.pad(x, ((0, pb), (0, 0)))
    Bp = B + pb
    grid = (Bp // TILE_B, cout // TILE_O)
    out = pl.pallas_call(
        _int4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, cin), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half, TILE_O), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, TILE_O), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, TILE_O), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, cout), x.dtype),
        interpret=interpret,
    )(x, wp, scale)
    return out[:B] if pb else out


class Int4Dense(nn.Module):
    """Drop-in ``nn.Dense(use_bias=False)`` with packed-int4 weights.

    Params: ``kernel_p`` int8 ``[in//2, features]`` (two nibbles/byte,
    split-half) and ``scale`` bf16 ``[in//GROUP, features]``. Under
    ``nn.scan`` both gain the stacked leading axis automatically.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel_p = self.param(
            "kernel_p", nn.initializers.zeros,
            (cin // 2, self.features), jnp.int8)
        scale = self.param(
            "scale", nn.initializers.ones,
            (cin // group_size(cin), self.features), jnp.bfloat16)
        lead = x.shape[:-1]
        x2 = x.astype(self.dtype).reshape(-1, cin)
        y = int4_matmul(x2, kernel_p, scale)
        return y.reshape(*lead, self.features)


def quantize_llm_params_int4(llm_params: dict, *,
                             delete_source: bool = False) -> dict:
    """Rewrite a bf16/f32 LlamaModel tree for ``quant="int4"`` — every
    ``{*_proj,lm_head}/kernel`` becomes ``{kernel_p, scale}``; the rest
    passes through. Scanned stacks ``[n_layers, in, out]`` pack along
    the same axes with the leading dim preserved."""
    from visionllm_tpu.ops.quant import _is_proj_kernel

    pack = jax.jit(pack_int4)

    def rewrite(tree: dict, path: tuple) -> dict:
        out = {}
        for name, sub in tree.items():
            if isinstance(sub, dict):
                out[name] = rewrite(sub, path + (name,))
            elif _is_proj_kernel(path, name):
                wp, scale = pack(sub)
                if delete_source:
                    jax.block_until_ready(wp)
                    try:
                        sub.delete()
                    except Exception:   # noqa: BLE001 — host arrays
                        pass
                out["kernel_p"] = wp
                out["scale"] = scale
            else:
                out[name] = sub
        return out

    return rewrite(llm_params, ())
