"""Ring attention (sequence-parallel exact attention) vs the dense op.

The sequence axis is sharded over the mesh's "context" axis; the ring
rotation must reproduce dense attention bit-for-round-off regardless of
where the blocks live."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visionllm_tpu.ops.attention import multi_head_attention
from visionllm_tpu.ops.ring_attention import (ring_attention,
                                              ring_attention_spmd)


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _ref(q, k, v, causal):
    return multi_head_attention(q, k, v, causal=causal)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_dense(causal):
    mesh = _mesh((2, 4), ("data", "context"))
    rng = np.random.RandomState(0)
    B, L, H, D = 2, 128, 4, 16
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    want = _ref(q, k, v, causal)
    got = jax.jit(lambda a, b, c: ring_attention_spmd(
        a, b, c, mesh, causal=causal))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_gqa_bf16():
    mesh = _mesh((4,), ("context",))
    rng = np.random.RandomState(1)
    B, L, H, H_kv, D = 1, 64, 8, 2, 32
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, L, H_kv, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, L, H_kv, D), jnp.bfloat16)
    kk = jnp.repeat(k, H // H_kv, axis=2)
    vv = jnp.repeat(v, H // H_kv, axis=2)
    want = multi_head_attention(q, kk, vv, causal=True)
    got = jax.jit(lambda a, b, c: ring_attention_spmd(
        a, b, c, mesh, causal=True, batch_axis=None))(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_ring_output_stays_sequence_sharded():
    """The result must come back sharded over context — no silent
    all-gather of the sequence dim."""
    mesh = _mesh((2, 4), ("data", "context"))
    B, L, H, D = 2, 64, 2, 8
    x = jnp.zeros((B, L, H, D), jnp.float32)
    sh = NamedSharding(mesh, P("data", "context"))
    q = jax.device_put(x, sh)
    out = jax.jit(lambda a: ring_attention_spmd(a, a, a, mesh,
                                                causal=True))(q)
    assert tuple(out.sharding.spec)[:2] == ("data", "context")


def test_ring_single_shard_degenerates_to_dense():
    mesh = _mesh((1,), ("context",))
    rng = np.random.RandomState(2)
    B, L, H, D = 1, 32, 2, 8
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    got = jax.shard_map(
        lambda a: ring_attention(a, a, a, axis_name="context",
                                 causal=True),
        mesh=mesh, in_specs=P(None, "context"),
        out_specs=P(None, "context"), check_vma=False)(q)
    want = _ref(q, q, q, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
