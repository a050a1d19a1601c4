"""RegionEncoder: conv-stem parity vs the torch reference architecture,
and pooled output vs the brute-force expectation of the reference's
random-point estimator (our closed-form pooling must equal the mean of
bilinear samples over ALL in-mask pixels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import RegionEncoderConfig
from visionllm_tpu.models.region_encoder import (RegionEncoder,
                                                 _bilinear_adjoint_matrix)

torch = pytest.importorskip("torch")

CFG = RegionEncoderConfig(hidden_dim=16, embed_dim=12, out_dim=20,
                          patch_size=14)


def _brute_force_pool(feat, mask):
    """Mean over in-mask pixels of bilinear grid_sample reads, exactly
    the expectation of reference rand_sample + point_sample
    (region_encoder.py:50-66, :24-47)."""
    import torch.nn.functional as F
    N, C, hf, wf = feat.shape
    H, W = mask.shape[-2:]
    outs = []
    for n in range(N):
        ys, xs = np.nonzero(mask[n])
        coords = np.stack([xs / W, ys / H], axis=-1)         # (x, y) in [0,1]
        grid = torch.from_numpy(coords).float()[None, :, None, :] * 2 - 1
        s = F.grid_sample(torch.from_numpy(feat[n:n + 1]).float(), grid,
                          align_corners=False)               # [1, C, P, 1]
        outs.append(s[0, :, :, 0].mean(dim=1).numpy())
    return np.stack(outs)


def test_adjoint_matrix_matches_grid_sample():
    rng = np.random.default_rng(0)
    H, hf = 56, 4
    feat = rng.standard_normal((1, 3, hf, hf)).astype(np.float32)
    mask = np.zeros((1, H, H), np.uint8)
    mask[0, 10:30, 5:40] = 1
    want = _brute_force_pool(feat, mask)

    Ay = _bilinear_adjoint_matrix(H, hf)
    m = mask[0].astype(np.float32)
    wmap = Ay.T @ m @ Ay                                    # [hf, hf]
    wmap = wmap / m.sum()
    got = np.einsum("chw,hw->c", feat[0], wmap)[None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_region_encoder_forward():
    model = RegionEncoder(CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    N, H = 2, 56
    img_len = (H // CFG.patch_size) ** 2
    images = jnp.asarray(rng.standard_normal((N, H, H, 3), dtype=np.float32))
    masks = np.zeros((N, H, H), np.float32)
    masks[0, 5:25, 5:25] = 1
    masks[1, 30:50, 10:40] = 1
    feats = [jnp.asarray(rng.standard_normal(
        (N, img_len, CFG.embed_dim), dtype=np.float32)) for _ in range(3)]
    params = model.init(jax.random.PRNGKey(0), images, jnp.asarray(masks),
                        feats)["params"]
    out = model.apply({"params": params}, images, jnp.asarray(masks), feats)
    assert out.shape == (N, CFG.out_dim)
    assert np.isfinite(np.asarray(out)).all()
    # a different mask must give a different feature
    masks2 = np.zeros_like(masks)
    masks2[0, 40:56, 40:56] = 1
    masks2[1, 0:10, 0:10] = 1
    out2 = model.apply({"params": params}, images, jnp.asarray(masks2), feats)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4
