"""GPipe pipeline parallelism over the scanned Llama layer stack.

The layer axis is sharded over a "pipe" mesh axis and microbatches flow
through stages via ppermute; logits must equal the unsharded model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from visionllm_tpu.config import LLMConfig
from visionllm_tpu.models.llama import LlamaModel
from visionllm_tpu.parallel.pipeline import pipeline_llm_forward


def _cfg(n_layers):
    return LLMConfig(vocab_size=61, hidden_size=32, intermediate_size=64,
                     num_layers=n_layers, num_heads=4, num_kv_heads=4,
                     max_position_embeddings=64)


def _setup(n_layers, B=4, L=16):
    cfg = _cfg(n_layers)
    model = LlamaModel(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(rng.randn(B, L, cfg.hidden_size), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L)).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), embeds, pos)["params"]
    _, want, _ = jax.jit(
        lambda p, e, ps: model.apply({"params": p}, e, ps))(
            params, embeds, pos)
    return cfg, params, embeds, pos, want


@pytest.mark.parametrize("n_layers,n_stages,n_micro", [
    (4, 4, 2),      # one layer per stage
    (8, 4, 4),      # two layers per stage
    (4, 2, 1),      # single microbatch (pure bubble)
])
def test_pipeline_matches_unsharded(n_layers, n_stages, n_micro):
    cfg, params, embeds, pos, want = _setup(n_layers)
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pipe",))
    got = jax.jit(lambda p, e, ps: pipeline_llm_forward(
        cfg, p, e, ps, mesh, n_microbatch=n_micro))(params, embeds, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_pipeline_backward_matches_unsharded():
    """PP training: jax autodiff flows through the GPipe schedule
    (ppermute grads are reverse permutes) — parameter gradients must
    equal the plain model's."""
    cfg, params, embeds, pos, _ = _setup(4)
    model = LlamaModel(cfg, dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))

    def loss_plain(p):
        _, logits, _ = model.apply({"params": p}, embeds, pos)
        return jnp.sum(logits ** 2) / logits.size

    def loss_pp(p):
        logits = pipeline_llm_forward(cfg, p, embeds, pos, mesh,
                                      n_microbatch=2)
        return jnp.sum(logits ** 2) / logits.size

    g_plain = jax.jit(jax.grad(loss_plain))(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_a = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_pp)}
    for k, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=5e-5, rtol=5e-4,
            err_msg=jax.tree_util.keystr(k))


def test_pipeline_rejects_indivisible():
    cfg, params, embeds, pos, _ = _setup(4)
    mesh = Mesh(np.array(jax.devices()[:3]), ("pipe",))
    with pytest.raises(AssertionError):
        pipeline_llm_forward(cfg, params, embeds, pos, mesh,
                             n_microbatch=2)
