"""Parity tests for the multi-scale deformable attention op.

Oracle: torch.nn.functional.grid_sample composed exactly as the
reference's pure-PyTorch fallback (modeling_ov_grounding_dino_mask_dn.py
:607-643) — bilinear, zero padding, align_corners=False.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.ops import ms_deform_attn, ms_deform_attn_reference

torch = pytest.importorskip("torch")


def torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Independent re-composition of the op with torch.grid_sample."""
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    locs = torch.from_numpy(sampling_locations)
    attw = torch.from_numpy(attention_weights)
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = locs.shape
    sizes = [h * w for h, w in spatial_shapes]
    values = value.split(sizes, dim=1)
    grids = 2 * locs - 1
    samples = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = values[lvl].flatten(2).transpose(1, 2).reshape(B * H, D, h, w)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)  # [B*H, Q, P, 2]
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)                 # [B*H, D, Q, P]
        samples.append(s)
    attw = attw.transpose(1, 2).reshape(B * H, 1, Q, L * P)
    out = (torch.stack(samples, dim=-2).flatten(-2) * attw).sum(-1)
    out = out.view(B, H * D, Q).transpose(1, 2)
    return out.numpy()


def make_inputs(rng, B=2, H=4, D=8, Q=13, P=4,
                shapes=((11, 17), (6, 9), (3, 5), (2, 3)),
                loc_low=-0.3, loc_high=1.3):
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.standard_normal((B, S, H, D), dtype=np.float32)
    # include out-of-bounds locations to exercise zero padding
    locs = rng.uniform(loc_low, loc_high, (B, Q, H, L, P, 2)).astype(np.float32)
    attw = rng.random((B, Q, H, L, P)).astype(np.float32)
    attw /= attw.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)
    return value, shapes, locs, attw


@pytest.mark.parametrize("seed", [0, 1])
def test_reference_matches_torch_grid_sample(seed):
    rng = np.random.default_rng(seed)
    value, shapes, locs, attw = make_inputs(rng)
    expected = torch_oracle(value, shapes, locs, attw)
    got = np.asarray(ms_deform_attn_reference(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attw)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_jitted_entry_point():
    rng = np.random.default_rng(2)
    value, shapes, locs, attw = make_inputs(rng)
    expected = torch_oracle(value, shapes, locs, attw)
    got = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attw)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_gradients_flow():
    rng = np.random.default_rng(3)
    value, shapes, locs, attw = make_inputs(rng, B=1, Q=5)

    def loss(v, l, a):
        return jnp.sum(ms_deform_attn_reference(v, shapes, l, a) ** 2)

    g_v, g_l, g_a = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attw))
    assert np.isfinite(np.asarray(g_v)).all()
    assert np.isfinite(np.asarray(g_l)).all()
    assert np.isfinite(np.asarray(g_a)).all()
    # gradient wrt value should be nonzero somewhere
    assert np.abs(np.asarray(g_v)).max() > 0


def test_grad_value_matches_torch():
    rng = np.random.default_rng(4)
    value, shapes, locs, attw = make_inputs(rng, B=1, Q=7)

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locs).requires_grad_(True)
    ta = torch.from_numpy(attw).requires_grad_(True)

    import torch.nn.functional as F
    B, S, H, D = tv.shape
    _, Q, _, L, P, _ = tl.shape
    sizes = [h * w for h, w in shapes]
    values = tv.split(sizes, dim=1)
    grids = 2 * tl - 1
    samples = []
    for lvl, (h, w) in enumerate(shapes):
        v = values[lvl].flatten(2).transpose(1, 2).reshape(B * H, D, h, w)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        samples.append(F.grid_sample(v, g, mode="bilinear",
                                     padding_mode="zeros", align_corners=False))
    aw = ta.transpose(1, 2).reshape(B * H, 1, Q, L * P)
    out = (torch.stack(samples, dim=-2).flatten(-2) * aw).sum(-1)
    out.pow(2).sum().backward()

    def loss(v, l, a):
        return jnp.sum(ms_deform_attn_reference(v, shapes, l, a) ** 2)

    g_v, g_l, g_a = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attw))

    np.testing.assert_allclose(np.asarray(g_v), tv.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_a), ta.grad.numpy(), rtol=1e-4, atol=1e-4)
    # location grads involve floor() boundaries; compare where torch grad is
    # well-defined (same bin) — tolerate tiny mismatch count
    gl_j, gl_t = np.asarray(g_l), tl.grad.numpy()
    close = np.isclose(gl_j, gl_t, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.99


def test_quad_formulation_matches_reference():
    """ms_deform_attn_quad (the TPU production path) vs the oracle,
    including out-of-bounds locations and edge cells."""
    import jax
    import jax.numpy as jnp
    from visionllm_tpu.ops.ms_deform_attn import (ms_deform_attn_quad,
                                                  ms_deform_attn_reference)

    rng = np.random.default_rng(3)
    shapes = ((12, 16), (6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    B, H, D, P, Q = 2, 4, 16, 3, 30
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (B, Q, H, 3, P, 2)),
                      jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, (B, Q, H, 3, P)), jnp.float32)
    ref = np.asarray(ms_deform_attn_reference(value, shapes, loc, w))
    got = np.asarray(jax.jit(
        lambda v, l, a: ms_deform_attn_quad(v, shapes, l, a))(value, loc, w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_flat_formulation_matches_reference():
    import jax
    import jax.numpy as jnp
    from visionllm_tpu.ops.ms_deform_attn import (ms_deform_attn_flat,
                                                  ms_deform_attn_reference)

    rng = np.random.default_rng(4)
    shapes = ((8, 10), (4, 5))
    S = sum(h * w for h, w in shapes)
    B, H, D, P, Q = 1, 2, 8, 2, 20
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Q, H, 2, P, 2)),
                      jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, (B, Q, H, 2, P)), jnp.float32)
    ref = np.asarray(ms_deform_attn_reference(value, shapes, loc, w))
    got = np.asarray(jax.jit(
        lambda v, l, a: ms_deform_attn_flat(v, shapes, l, a))(value, loc, w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
