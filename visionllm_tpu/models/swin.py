"""Swin Transformer backbone (Swin-T default) for the detection/pose
decoders.

Behavioral reference: HF SwinBackbone as wrapped by the reference's
GroundingDinoConvEncoder (modeling_ov_grounding_dino_mask_dn.py:471-505)
— per-stage pre-downsample features with a per-stage LayerNorm, windows
always partitioned (always_partition=True).

TPU notes: everything is NHWC with static spatial dims per compiled
shape bucket; the shifted-window attention masks and relative-position
index are numpy constants baked at trace time; window partition is pure
reshape/transpose, which XLA lowers to free layout changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np



@dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5
    out_stages: Tuple[int, ...] = (1, 2, 3)   # stage indices (0-based) to emit

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2 ** i)


def swin_tiny_config(**kw) -> SwinConfig:
    return SwinConfig(**kw)


def swin_large_config(**kw) -> SwinConfig:
    base = dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
                window_size=12)
    base.update(kw)
    return SwinConfig(**base)


def _rel_pos_index(window: int) -> np.ndarray:
    """[w*w, w*w] index into the (2w-1)^2 relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # [2, w, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # [2, w*w, w*w]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


def _shift_attn_mask(pad_h: int, pad_w: int, window: int,
                     shift: int) -> np.ndarray:
    """[nW, w*w, w*w] additive mask (0 / -100) for shifted windows."""
    img = np.zeros((pad_h, pad_w))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(pad_h // window, window, pad_w // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, window*window, C] (H, W divisible)."""
    B, H, W, Cd = x.shape
    x = x.reshape(B, H // window, window, W // window, window, Cd)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, Cd)


def window_reverse(x: jnp.ndarray, window: int, B: int, H: int,
                   W: int) -> jnp.ndarray:
    Cd = x.shape[-1]
    x = x.reshape(B, H // window, W // window, window, window, Cd)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, Cd)


class SwinBlock(nn.Module):
    cfg: SwinConfig
    dim: int
    heads: int
    shift: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, C] (H, W arbitrary; padded internally)."""
        cfg = self.cfg
        w = cfg.window_size
        B, H, W, Cd = x.shape
        pad_h = (w - H % w) % w
        pad_w = (w - W % w) % w
        PH, PW = H + pad_h, W + pad_w
        # always_partition=True semantics (HF modeling_swin.py:1242, the
        # backbone path the reference uses): shift is applied regardless
        # of grid size; small grids are padded, never window-shrunk.
        shift = self.shift

        shortcut = x
        xs = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                          name="layernorm_before")(x)
        xs = jnp.pad(xs, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        if shift:
            xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
        windows = window_partition(xs, w)           # [B*nW, w*w, C]
        nW = (PH // w) * (PW // w)

        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        hd = Cd // self.heads
        q = dense(Cd, "query")(windows).reshape(-1, w * w, self.heads, hd)
        k = dense(Cd, "key")(windows).reshape(-1, w * w, self.heads, hd)
        v = dense(Cd, "value")(windows).reshape(-1, w * w, self.heads, hd)

        table = self.param(
            "relative_position_bias_table", nn.initializers.normal(0.02),
            ((2 * w - 1) ** 2, self.heads), jnp.float32)
        idx = _rel_pos_index(w)                      # static numpy
        bias = table[idx.reshape(-1)].reshape(w * w, w * w, self.heads)
        bias = bias.transpose(2, 0, 1)               # [heads, w*w, w*w]

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (hd ** -0.5) + bias[None].astype(jnp.float32)
        if shift:
            amask = jnp.asarray(_shift_attn_mask(PH, PW, w, shift))
            scores = scores.reshape(-1, nW, self.heads, w * w, w * w)
            scores = scores + amask[None, :, None].astype(jnp.float32)
            scores = scores.reshape(-1, self.heads, w * w, w * w)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(-1, w * w, Cd)
        attn = dense(Cd, "proj")(attn)

        xs = window_reverse(attn, w, B, PH, PW)
        if shift:
            xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
        xs = xs[:, :H, :W]
        x = shortcut + xs

        shortcut = x
        xs = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                          name="layernorm_after")(x)
        xs = dense(int(Cd * cfg.mlp_ratio), "fc1")(xs)
        xs = nn.gelu(xs, approximate=False)
        xs = dense(Cd, "fc2")(xs)
        return shortcut + xs


class PatchMerging(nn.Module):
    cfg: SwinConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, Cd = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, dtype=self.dtype,
                         name="norm")(x)
        return nn.Dense(2 * Cd, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinBackbone(nn.Module):
    """Returns the requested stages' pre-downsample features, each with
    its output LayerNorm applied: list of [B, H_s, W_s, C_s], strides
    4*2^s."""

    cfg: SwinConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.cfg
        p = cfg.patch_size
        B, H, W, _ = pixel_values.shape
        pad_h = (p - H % p) % p
        pad_w = (p - W % p) % p
        x = jnp.pad(pixel_values, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="patch_norm")(x)

        outputs = []
        for s in range(cfg.num_stages):
            dim = cfg.stage_dim(s)
            for b in range(cfg.depths[s]):
                shift = 0 if b % 2 == 0 else cfg.window_size // 2
                x = SwinBlock(cfg, dim, cfg.num_heads[s], shift, self.dtype,
                              name=f"stage{s}_block{b}")(x)
            if s in cfg.out_stages:
                out = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                   dtype=self.dtype, name=f"out_norm{s}")(x)
                outputs.append(out)
            if s < cfg.num_stages - 1:
                x = PatchMerging(cfg, self.dtype, name=f"downsample{s}")(x)
        return outputs
