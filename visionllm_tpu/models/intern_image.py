"""InternImage backbone (26B-variant detector/pose backbone).

Behavioral reference: the InternImage implementation vendored inside
modeling_ov_grounding_dino_mask_dn.py:4636-5184 (InternImageLayer /
InternImageBlock / InternImage, build_internimage_h: channels 320,
depths [6,6,32,6], groups [10,20,40,80], dw_kernel 5, res_post_norm,
center_feature_scale). Core op = DCNv3 (ops/dcnv3.py, quad-row gather).

Structure per layer (pre-norm variant, H uses res_post_norm):
  x += res_post_norm1(dcn(norm1(x)));  x += res_post_norm2(mlp(norm2(x)))
Stem: two stride-2 convs with LN+GELU between; downsample between
stages: stride-2 conv + LN. Emits the per-stage feature maps (NHWC).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from visionllm_tpu.ops.dcnv3 import DCNv3


@dataclass(frozen=True)
class InternImageConfig:
    channels: int = 320
    depths: Tuple[int, ...] = (6, 6, 32, 6)
    groups: Tuple[int, ...] = (10, 20, 40, 80)
    mlp_ratio: float = 4.0
    offset_scale: float = 1.0
    res_post_norm: bool = True
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)

    def stage_channels(self, i: int) -> int:
        return self.channels * (2 ** i)


def intern_image_h_config(**kw) -> InternImageConfig:
    return InternImageConfig(**kw)


def intern_image_tiny_config(**kw) -> InternImageConfig:
    base = dict(channels=16, depths=(2, 2), groups=(2, 4))
    base.update(kw)
    out = base.pop("out_indices", tuple(range(len(base["depths"]))))
    return InternImageConfig(out_indices=out, **base)


class InternImageLayer(nn.Module):
    channels: int
    groups: int
    mlp_ratio: float
    offset_scale: float
    res_post_norm: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        h = DCNv3(self.channels, group=self.groups,
                  offset_scale=self.offset_scale, dtype=self.dtype,
                  name="dcn")(ln("norm1")(x))
        if self.res_post_norm:
            h = ln("res_post_norm1")(h)
        x = x + h
        h = ln("norm2")(x)
        h = nn.Dense(int(self.channels * self.mlp_ratio),
                     dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.channels, dtype=self.dtype, name="mlp_fc2")(h)
        if self.res_post_norm:
            h = ln("res_post_norm2")(h)
        return x + h


class InternImage(nn.Module):
    cfg: InternImageConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.cfg
        x = pixel_values.astype(self.dtype)
        # stem: conv s2 → LN → GELU → conv s2 → LN
        c = cfg.channels
        x = nn.Conv(c // 2, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="stem_conv1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="stem_norm1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(c, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="stem_conv2")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="stem_norm2")(x)

        outs = []
        for s, depth in enumerate(cfg.depths):
            ch = cfg.stage_channels(s)
            for b in range(depth):
                x = InternImageLayer(
                    ch, cfg.groups[s], cfg.mlp_ratio, cfg.offset_scale,
                    cfg.res_post_norm, self.dtype,
                    name=f"stage{s}_block{b}")(x)
            if s in cfg.out_indices:
                outs.append(nn.LayerNorm(dtype=self.dtype,
                                         name=f"out_norm{s}")(x))
            if s < len(cfg.depths) - 1:
                x = nn.Conv(cfg.stage_channels(s + 1), (3, 3),
                            strides=(2, 2), padding=1, dtype=self.dtype,
                            name=f"downsample{s}")(x)
                x = nn.LayerNorm(dtype=self.dtype,
                                 name=f"downsample_norm{s}")(x)
        return outs
