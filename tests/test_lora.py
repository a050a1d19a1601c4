"""LoRA: zero-init equivalence, merge correctness, freeze predicate."""

import numpy as np

import jax
import jax.numpy as jnp

from visionllm_tpu.config import LLMConfig
from visionllm_tpu.models.llama import LlamaModel
from visionllm_tpu.models.lora import (LoraDense, lora_frozen_predicate,
                                       merge_lora_params)


def test_lora_zero_init_matches_base():
    """lora_b starts at 0 → wrapped layer output equals base Dense."""
    m = LoraDense(8, rank=4, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 6)),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    base = x @ params["kernel"]
    out = m.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-6)


def test_lora_merge():
    m = LoraDense(8, rank=4, alpha=64.0, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 6)),
                    jnp.float32)
    params = jax.device_get(m.init(jax.random.PRNGKey(0), x)["params"])
    params["lora_b"] = np.random.default_rng(1).standard_normal(
        (4, 8)).astype(np.float32) * 0.1
    out = m.apply({"params": params}, x)
    merged = merge_lora_params({"d": params}, alpha=64.0)["d"]
    assert "lora_a" not in merged
    out2 = x @ merged["kernel"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-4, atol=1e-5)


def test_llama_with_lora_params():
    cfg = LLMConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                    num_layers=2, num_heads=4, num_kv_heads=4, lora_r=2)
    m = LlamaModel(cfg, dtype=jnp.float32)
    emb = jnp.zeros((1, 3, 16))
    pos = jnp.arange(3)[None]
    params = m.init(jax.random.PRNGKey(0), emb, pos)["params"]
    layer = params["layers"]["layer"]
    assert "lora_a" in layer["q_proj"] and "lora_b" in layer["q_proj"]
    assert "lora_a" in layer["down_proj"]
    _, logits, _ = m.apply({"params": params}, emb, pos)
    assert np.isfinite(np.asarray(logits)).all()


def test_frozen_predicate():
    assert lora_frozen_predicate("core/llm/layers/layer/q_proj/kernel")
    assert not lora_frozen_predicate(
        "core/llm/layers/layer/q_proj/lora_a")
    assert not lora_frozen_predicate("gdino/bbox_embed/layers_0/kernel")
