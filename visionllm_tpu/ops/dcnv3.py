"""DCNv3 (deformable conv v3) — InternImage's core op.

Behavioral reference: visionllmv2/model/ops_dcnv3/functions/
dcnv3_func.py:64-160 (dcnv3_core_pytorch — the semantics oracle for the
CUDA kernel) and modules/dcnv3.py (DCNv3 module: depthwise conv →
offset/mask heads → sampling → output proj).

TPU formulation: DCNv3 sampling is exactly single-level multi-scale
deformable attention with groups as heads and the softmaxed modulation
mask as attention weights — the sampling core delegates to the quad-row
gather of ops/ms_deform_attn (one gathered row per (pixel, group,
kernel-point)).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.ops.ms_deform_attn import (ms_deform_attn_quad,
                                              ms_deform_attn_reference)


def dcnv3_core(
    x: jnp.ndarray,              # [N, H, W, C] (unpadded)
    offset: jnp.ndarray,         # [N, H_out, W_out, G*P*2] (x, y)
    mask: jnp.ndarray,           # [N, H_out, W_out, G*P] (softmaxed)
    *,
    kernel: int = 3,
    stride: int = 1,
    pad: int = 1,
    dilation: int = 1,
    group: int = 4,
    offset_scale: float = 1.0,
) -> jnp.ndarray:
    """Pure-function DCNv3 (reference dcnv3_core_pytorch:120-160)."""
    N, H, W, C = x.shape
    gc = C // group
    P = kernel * kernel
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    H_in, W_in = H + 2 * pad, W + 2 * pad
    H_out = (H_in - (dilation * (kernel - 1) + 1)) // stride + 1
    W_out = (W_in - (dilation * (kernel - 1) + 1)) // stride + 1

    # reference points (normalized over the PADDED extent, :64-93)
    base = (dilation * (kernel - 1)) // 2 + 0.5
    ry = (base + np.arange(H_out) * stride) / H_in
    rx = (base + np.arange(W_out) * stride) / W_in
    ref = np.stack(np.meshgrid(rx, ry, indexing="xy"), -1)  # [H_out,W_out,2]

    # dilation grid (kernel offsets, normalized; x varies fastest like the
    # reference meshgrid(x, y) with default 'ij' over (x, y) args :95-118)
    gx = -((dilation * (kernel - 1)) // 2) + np.arange(kernel) * dilation
    gy = gx.copy()
    gxx, gyy = np.meshgrid(gx, gy, indexing="ij")      # x-major
    grid = np.stack([gxx / W_in, gyy / H_in], -1).reshape(P, 2)

    loc = (jnp.asarray(ref, jnp.float32)[None, :, :, None, None]
           + jnp.asarray(grid, jnp.float32)[None, None, None, None]
           * offset_scale)                              # [1,Ho,Wo,1,P,2]
    norm = jnp.asarray([W_in, H_in], jnp.float32)
    off = offset.reshape(N, H_out, W_out, group, P, 2)
    loc = loc + off * offset_scale / norm

    Q = H_out * W_out
    value = xp.reshape(N, H_in * W_in, group, gc)
    sampling = loc.reshape(N, Q, group, 1, P, 2)
    weights = mask.reshape(N, Q, group, 1, P)
    fn = (ms_deform_attn_quad if jax.default_backend() == "tpu"
          else ms_deform_attn_reference)
    out = fn(value, ((H_in, W_in),), sampling, weights)
    return out.reshape(N, H_out, W_out, C)


class DCNv3(nn.Module):
    """The DCNv3 module (modules/dcnv3.py:222-340): depthwise conv path
    produces offsets + softmax masks; input/output 1x1 projections."""

    channels: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    group: int = 4
    offset_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        G, K = self.group, self.kernel
        P = K * K
        proj_in = nn.Dense(self.channels, dtype=self.dtype,
                           name="input_proj")(x)
        dw = nn.Conv(self.channels, (K, K), feature_group_count=self.channels,
                     padding=(K - 1) // 2, dtype=self.dtype,
                     name="dw_conv")(proj_in)
        dw = nn.LayerNorm(dtype=self.dtype, name="dw_norm")(dw)
        dw = nn.gelu(dw, approximate=False)
        offset = nn.Dense(G * P * 2, dtype=self.dtype, name="offset")(dw)
        mask = nn.Dense(G * P, dtype=self.dtype, name="mask")(dw)
        B, H, W, _ = mask.shape
        mask = jax.nn.softmax(
            mask.reshape(B, H, W, G, P).astype(jnp.float32), axis=-1)
        mask = mask.reshape(B, H, W, G * P).astype(self.dtype)
        out = dcnv3_core(
            proj_in, offset.astype(jnp.float32), mask,
            kernel=K, stride=self.stride, pad=self.pad,
            dilation=self.dilation, group=G,
            offset_scale=self.offset_scale)
        return nn.Dense(self.channels, dtype=self.dtype,
                        name="output_proj")(out)
