"""Vision→language bridge (reference: modeling_visionllmv2.py:159-190).

Variants: "linear", "internvl_mlp" (LN + Linear + GELU + Linear), and
"mlpNx_gelu" (N Linear layers with GELU between — llava style, default
mlp2x_gelu for the 7B model).
"""

from __future__ import annotations

import re

import flax.linen as nn
import jax.numpy as jnp


class VLBridge(nn.Module):
    bridge_type: str
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        t = self.bridge_type
        if t == "linear":
            return nn.Dense(self.out_dim, dtype=self.dtype, name="0")(x)
        if t in ("internvl_mlp", "internvl"):
            x = nn.LayerNorm(dtype=self.dtype, name="0")(x)
            x = nn.Dense(self.out_dim, dtype=self.dtype, name="1")(x)
            x = nn.gelu(x, approximate=False)
            return nn.Dense(self.out_dim, dtype=self.dtype, name="3")(x)
        m = re.match(r"^mlp(\d+)x_gelu*", t)
        if not m:
            raise NotImplementedError(f"vl_bridge_type {t!r} not supported")
        depth = int(m.group(1))
        # torch Sequential indices: Linear at 0, then (GELU, Linear) pairs →
        # Linear modules live at even indices; keep those names for the
        # weight converter.
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="0")(x)
        for i in range(1, depth):
            x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.out_dim, dtype=self.dtype, name=str(2 * i))(x)
        return x


def pixel_shuffle(x: jnp.ndarray, scale_factor: float = 0.5) -> jnp.ndarray:
    """Token-reduction pixel shuffle (reference modeling_visionllmv2.py:381-392):
    [B, H, W, C] -> [B, H*s, W*s, C/(s*s)] with s=0.5 quartering the token
    count. Matches the reference's view/permute order exactly.
    """
    B, H, W, C = x.shape
    s = scale_factor
    # [B, H, W*s, C/s]
    x = x.reshape(B, H, int(W * s), int(C / s))
    x = x.transpose(0, 2, 1, 3)                    # [B, W*s, H, C/s]
    x = x.reshape(B, int(W * s), int(H * s), int(C / (s * s)))
    x = x.transpose(0, 2, 1, 3)                    # [B, H*s, W*s, C/s^2]
    return x
