"""DCNv3: exact-tap invariants (zero offsets hit integer pixel centers,
so bilinear sampling degenerates to exact kernel taps) + module shapes."""

import numpy as np

import jax
import jax.numpy as jnp

from visionllm_tpu.ops.dcnv3 import DCNv3, dcnv3_core


def test_center_tap_identity():
    """Zero offsets, mask one-hot at the kernel center → output == input
    (3x3, stride 1, pad 1)."""
    rng = np.random.default_rng(0)
    N, H, W, C = 2, 8, 10, 8
    G = 2
    P = 9
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    offset = jnp.zeros((N, H, W, G * P * 2), jnp.float32)
    mask = np.zeros((N, H, W, G, P), np.float32)
    mask[..., 4] = 1.0                      # center of x-major 3x3 grid
    out = dcnv3_core(x, offset, jnp.asarray(mask.reshape(N, H, W, G * P)),
                     group=G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_uniform_mask_equals_box_filter():
    """Zero offsets + uniform mask = 3x3 zero-padded box average."""
    rng = np.random.default_rng(1)
    N, H, W, C = 1, 6, 7, 4
    G = 1
    P = 9
    x = rng.standard_normal((N, H, W, C)).astype(np.float32)
    offset = jnp.zeros((N, H, W, G * P * 2), jnp.float32)
    mask = jnp.full((N, H, W, G * P), 1.0 / P, jnp.float32)
    out = np.asarray(dcnv3_core(jnp.asarray(x), offset, mask, group=G))
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            want += xp[:, dy:dy + H, dx:dx + W] / P
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_half_pixel_offset_interpolates():
    """Offset +0.5px in x → average of the two x-neighbors per tap."""
    rng = np.random.default_rng(2)
    N, H, W, C = 1, 5, 6, 2
    G, P = 1, 9
    x = rng.standard_normal((N, H, W, C)).astype(np.float32)
    off = np.zeros((N, H, W, G, P, 2), np.float32)
    off[..., 0] = 0.5                       # x offset in pixels
    mask = np.zeros((N, H, W, G, P), np.float32)
    mask[..., 4] = 1.0
    out = np.asarray(dcnv3_core(
        jnp.asarray(x), jnp.asarray(off.reshape(N, H, W, -1)),
        jnp.asarray(mask.reshape(N, H, W, -1)), group=G))
    xp = np.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    want = 0.5 * (x + xp[:, :, 1:1 + W])
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_dcnv3_module():
    m = DCNv3(channels=16, group=4)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 8, 16)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_intern_image_backbone():
    from visionllm_tpu.models.intern_image import (InternImage,
                                                   intern_image_tiny_config)
    cfg = intern_image_tiny_config()
    m = InternImage(cfg, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 32, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    outs = m.apply({"params": params}, x)
    # strides 4 and 8 for a 2-stage tiny config
    assert outs[0].shape == (1, 8, 8, 16)
    assert outs[1].shape == (1, 4, 4, 32)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_gdino_with_intern_image_backbone():
    """26B-variant wiring: gdino forward with the InternImage backbone."""
    from visionllm_tpu.config import GDinoConfig
    from visionllm_tpu.models.grounding_dino.model import GroundingDino
    cfg = GDinoConfig(backbone="intern_image_tiny", d_model=32,
                      num_queries=12, encoder_layers=1, decoder_layers=2,
                      num_heads=4, ffn_dim=64, text_dim=48, mask_dim=32,
                      dn_number=0)
    m = GroundingDino(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    tq = jnp.asarray(rng.standard_normal((1, 5, 4, 48)), jnp.float32)
    tqm = jnp.ones((1, 5), bool)
    params = m.init(jax.random.PRNGKey(0), px, tq, tqm)["params"]
    out = m.apply({"params": params}, px, tq, tqm)
    assert out["pred_boxes"].shape == (1, 12, 4)
    assert np.isfinite(np.asarray(out["logits"])).all()
