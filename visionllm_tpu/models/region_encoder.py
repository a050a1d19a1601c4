"""Region (visual-prompt) encoder: binary mask + image → one LLM token.

Behavioral reference: visionllmv2/model/region_encoder.py:68-146 with
mask_pool_type='grid_sample' (the composite always builds it that way,
modeling_visionllmv2.py:247-252): concat(RGB, mask) → conv stem to the
ViT patch stride → accumulate the last-3 ViT feature levels → pool the
region feature → Linear embed_dim→LLM dim.

TPU-first pooling redesign
--------------------------
The reference pools by sampling ≤2304 random in-mask pixels
(`rand_sample`, multinomial without replacement) and averaging bilinear
`grid_sample` reads of the feature map — a data-dependent-shape,
host-random scatter/gather. Its expectation is exactly the
bilinear-adjoint-weighted mean of the feature map:

    E[mean_p f(coord(p))] = Σ_cells f · w / Σ w,
    w = Aᵀ_y · mask · A_x

where A_y [H, h_f], A_x [W, w_f] hold each pixel's bilinear weights onto
feature cells under the same align_corners=False mapping the reference
uses (y_f = y·h_f/H − 0.5). We compute that expectation directly: two
small matmuls (MXU) instead of 2304 random gathers — deterministic,
static-shape, and an unbiased drop-in for the reference's estimator.
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.config import RegionEncoderConfig


class LayerNorm2d(nn.Module):
    """Channel layernorm over NHWC (reference LayerNorm2d, eps 1e-6)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        xf = x.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        s = jnp.mean((xf - u) ** 2, axis=-1, keepdims=True)
        out = (xf - u) / jnp.sqrt(s + self.eps)
        return (out * weight + bias).astype(x.dtype)


def _bilinear_adjoint_matrix(in_size: int, out_size: int) -> np.ndarray:
    """A [in_size, out_size]: row i = bilinear weights of input pixel i
    onto output cells under y_f = i * out_size / in_size − 0.5 (matching
    the reference's grid_sample(2·(i/in)−1, align_corners=False))."""
    A = np.zeros((in_size, out_size), dtype=np.float32)
    for i in range(in_size):
        yf = i * out_size / in_size - 0.5
        y0 = int(np.floor(yf))
        f = yf - y0
        for c, w in ((y0, 1 - f), (y0 + 1, f)):
            if 0 <= c < out_size:
                A[i, c] = w
    return A


class RegionEncoder(nn.Module):
    cfg: RegionEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,          # [N, H, W, 3]
        masks: jnp.ndarray,           # [N, H, W] binary
        image_features: Sequence[jnp.ndarray],  # 3 x [N, img_len, embed]
    ) -> jnp.ndarray:                 # [N, out_dim]
        cfg = self.cfg
        N, H, W, _ = images.shape
        k = cfg.patch_size // 2

        x = jnp.concatenate(
            [images, masks[..., None].astype(images.dtype)], axis=-1)
        # conv stem (reference mask_embedding: torch Sequential 0..6)
        x = nn.Conv(cfg.hidden_dim // 4, (k, k), strides=(k, k),
                    dtype=self.dtype, name="stem_conv0")(x)
        x = LayerNorm2d(name="stem_norm0")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.hidden_dim, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name="stem_conv1")(x)
        x = LayerNorm2d(name="stem_norm1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.embed_dim, (1, 1), dtype=self.dtype,
                    name="stem_conv2")(x)

        hf, wf = x.shape[1], x.shape[2]

        # pooling weight map from the mask (exact expectation — see
        # module docstring); numpy constants are baked at trace time
        Ay = jnp.asarray(_bilinear_adjoint_matrix(H, hf))
        Ax = jnp.asarray(_bilinear_adjoint_matrix(W, wf))
        m = masks.astype(jnp.float32)
        wmap = jnp.einsum("hy,nhw,wx->nyx", Ay, m, Ax,
                          preferred_element_type=jnp.float32)
        # divide by the point COUNT, not the in-bounds weight sum: the
        # reference's grid_sample zero-pads out-of-bounds corners but its
        # mean still divides by n points (boundary weight is lost from the
        # numerator only)
        denom = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)[:, None, None]
        wmap = wmap / denom                              # [N, hf, wf]

        up_dim = nn.Dense(cfg.out_dim, dtype=self.dtype, name="up_dim")
        outs = []
        acc = x
        for lvl, feats in enumerate(image_features):
            f = feats.reshape(N, hf, wf, -1).astype(acc.dtype)
            acc = acc + f                                # level accumulation
            pooled = jnp.einsum("nyxc,nyx->nc", acc.astype(jnp.float32),
                                wmap).astype(self.dtype)
            outs.append(up_dim(pooled))
        return jnp.stack(outs).mean(axis=0)
