"""Sequence-parallel (context-axis) LLM prefill.

Under a mesh whose "context" axis is >1, `constrain_seq` pins the block
activations sequence-sharded; the prefill must produce the same logits
as the unsharded run and the constraint must be a no-op when the axis
is absent or the length doesn't divide."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visionllm_tpu.config import LLMConfig
from visionllm_tpu.models.llama import LlamaModel
from visionllm_tpu.parallel.mesh import build_mesh
from visionllm_tpu.parallel.sequence import constrain_seq


def _tiny_cfg():
    return LLMConfig(vocab_size=97, hidden_size=32, intermediate_size=64,
                     num_layers=2, num_heads=4, num_kv_heads=4,
                     max_position_embeddings=128)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = _tiny_cfg()
    model = LlamaModel(cfg, dtype=jnp.float32)
    B, L = 2, 64
    embeds = jnp.asarray(
        np.random.RandomState(0).randn(B, L, cfg.hidden_size), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L)).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), embeds, pos)["params"]
    return model, params, embeds, pos


def test_sp_prefill_matches_unsharded(model_and_params):
    model, params, embeds, pos = model_and_params

    def fwd(p, e, ps):
        _, logits, _ = model.apply({"params": p}, e, ps)
        return logits

    want = jax.jit(fwd)(params, embeds, pos)

    mesh = build_mesh(n_data=2, n_context=2, n_model=2)
    with jax.sharding.set_mesh(mesh):
        e_sh = jax.device_put(
            embeds, NamedSharding(mesh, P("data", "context", None)))
        got = jax.jit(fwd)(params, e_sh, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_sp_activations_actually_sharded(model_and_params):
    """The compiled prefill must keep block outputs sequence-sharded —
    check via the constraint helper's output sharding on a traced fn."""
    mesh = build_mesh(n_data=2, n_context=2, n_model=2)
    x = jnp.zeros((2, 64, 32), jnp.float32)
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda a: constrain_seq(a * 1.5))(x)
    assert tuple(out.sharding.spec)[:2] == ("data", "context")


def test_constrain_seq_noop_cases():
    # no ambient mesh
    x = jnp.zeros((2, 64, 32))
    assert constrain_seq(x) is x
    # mesh without a context axis
    devs = np.array(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devs, ("data",))
    with jax.sharding.set_mesh(mesh):
        assert constrain_seq(x) is x
    # length that doesn't divide the axis
    mesh = build_mesh(n_data=1, n_context=8, n_model=1)
    y = jnp.zeros((1, 9, 4))
    with jax.sharding.set_mesh(mesh):
        assert constrain_seq(y) is y
        # decode-shaped (L == 1) is always a no-op
        z = jnp.zeros((1, 1, 4))
        assert constrain_seq(z) is z
