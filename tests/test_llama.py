"""LLaMA decoder parity vs HF transformers (torch CPU) + KV-cache decode
consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import LLMConfig
from visionllm_tpu.models.llama import KVCache, LlamaModel
from visionllm_tpu.utils.torch_convert import (convert_llama,
                                               torch_state_dict_to_numpy)

torch = pytest.importorskip("torch")

TINY = LLMConfig(vocab_size=128, hidden_size=64, intermediate_size=172,
                 num_layers=3, num_heads=4, num_kv_heads=2,
                 max_position_embeddings=256)


@pytest.fixture(scope="module")
def hf_and_params():
    from transformers import LlamaConfig as HFConfig
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers, num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        max_position_embeddings=TINY.max_position_embeddings,
        rms_norm_eps=TINY.rms_norm_eps, rope_theta=TINY.rope_theta,
        attn_implementation="eager", tie_word_embeddings=False)
    # multi-threaded oneDNN matmuls reorder fp32 accumulation enough to
    # drift logits by ~3e-3 on random-init nets; pin to 1 thread so the
    # oracle is deterministic
    torch.set_num_threads(1)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    params = jax.tree.map(jnp.asarray,
                          convert_llama(torch_state_dict_to_numpy(hf), TINY))
    return hf, params


def test_logits_parity(hf_and_params):
    hf, params = hf_and_params
    model = LlamaModel(TINY, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, (2, 11))

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()

    embeds = model.apply({"params": params}, jnp.asarray(ids),
                         method=LlamaModel.embed)
    positions = jnp.broadcast_to(jnp.arange(11)[None], (2, 11))
    _, logits, _ = model.apply({"params": params}, embeds, positions)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward(hf_and_params):
    _, params = hf_and_params
    model = LlamaModel(TINY, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B, prompt_len, n_steps, max_len = 1, 7, 5, 32
    ids = rng.integers(0, TINY.vocab_size, (B, prompt_len + n_steps))

    # full forward
    embeds = model.apply({"params": params}, jnp.asarray(ids),
                         method=LlamaModel.embed)
    positions = jnp.arange(ids.shape[1])[None]
    _, full_logits, _ = model.apply({"params": params}, embeds, positions)

    # prefill + step-by-step decode
    cache = KVCache.create(TINY, B, max_len, dtype=jnp.float32)
    pre_embeds = embeds[:, :prompt_len]
    _, logits, cache = model.apply(
        {"params": params}, pre_embeds, positions[:, :prompt_len],
        cache=cache)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full_logits[:, :prompt_len]),
                               rtol=1e-4, atol=1e-4)
    for t in range(prompt_len, prompt_len + n_steps):
        step_embed = embeds[:, t:t + 1]
        _, logits, cache = model.apply(
            {"params": params}, step_embed, positions[:, t:t + 1],
            cache=cache)
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full_logits[:, t]),
            rtol=1e-4, atol=1e-4, err_msg=f"step {t}")


@pytest.mark.parametrize("mode", ["full", "dots"])
def test_remat_matches_plain_loss_and_grads(hf_and_params, mode):
    """cfg.remat recomputes layer activations in the backward pass; it
    must change memory only — loss and gradients stay numerically equal
    to the non-remat stack (same params tree, same forward HLO)."""
    import dataclasses

    _, params = hf_and_params
    rng = np.random.default_rng(2)
    ids = rng.integers(0, TINY.vocab_size, (2, 9))
    positions = jnp.arange(ids.shape[1])[None]

    def loss_fn(p, cfg):
        model = LlamaModel(cfg, dtype=jnp.float32)
        embeds = model.apply({"params": p}, jnp.asarray(ids),
                             method=LlamaModel.embed)
        _, logits, _ = model.apply({"params": p}, embeds, positions)
        return jnp.mean(jax.nn.log_softmax(logits)[..., 0] ** 2)

    remat_cfg = dataclasses.replace(TINY, remat=mode)
    loss0, grads0 = jax.value_and_grad(loss_fn)(params, TINY)
    loss1, grads1 = jax.value_and_grad(loss_fn)(params, remat_cfg)
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss0),
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        grads0, grads1)
