"""26B-variant components: InternLM2 wqkv unpacking parity and the
InternViT tower forward (QK-norm + layer scale)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import LLMConfig, VisionEncoderConfig
from visionllm_tpu.models.intern_vit import InternVisionTower
from visionllm_tpu.models.llama import LlamaModel
from visionllm_tpu.utils.torch_convert import convert_internlm2

torch = pytest.importorskip("torch")


def test_wqkv_unpack_parity():
    """Pack q/k/v the InternLM2 way (per kv group: ratio q's, then k,
    then v — modeling_internlm2.py:344-357), convert, and check each
    projection reproduces the reference slicing."""
    cfg = LLMConfig(arch="internlm2", vocab_size=64, hidden_size=24,
                    intermediate_size=48, num_layers=1, num_heads=6,
                    num_kv_heads=2)
    h, h_kv, d = 6, 2, 4
    ratio = h // h_kv
    rng = np.random.default_rng(0)
    wqkv = rng.standard_normal(((h + 2 * h_kv) * d, 24)).astype(np.float32)

    sd = {
        "model.layers.0.attention.wqkv.weight": wqkv,
        "model.layers.0.attention.wo.weight":
            rng.standard_normal((24, 24)).astype(np.float32),
        "model.layers.0.feed_forward.w1.weight":
            rng.standard_normal((48, 24)).astype(np.float32),
        "model.layers.0.feed_forward.w3.weight":
            rng.standard_normal((48, 24)).astype(np.float32),
        "model.layers.0.feed_forward.w2.weight":
            rng.standard_normal((24, 48)).astype(np.float32),
        "model.layers.0.attention_norm.weight": np.ones(24, np.float32),
        "model.layers.0.ffn_norm.weight": np.ones(24, np.float32),
        "model.tok_embeddings.weight":
            rng.standard_normal((64, 24)).astype(np.float32),
        "model.norm.weight": np.ones(24, np.float32),
        "output.weight": rng.standard_normal((64, 24)).astype(np.float32),
    }
    params = convert_internlm2(sd, cfg)

    x = rng.standard_normal((5, 24)).astype(np.float32)
    # reference slicing (rearrange 'b q (h gs d)' with gs = ratio+2)
    qkv = (x @ wqkv.T).reshape(5, h_kv, ratio + 2, d)
    want_q = qkv[:, :, :ratio].reshape(5, h * d)
    want_k = qkv[:, :, -2].reshape(5, h_kv * d)
    want_v = qkv[:, :, -1].reshape(5, h_kv * d)

    got_q = x @ np.asarray(params["layers"]["layer"]["q_proj"]["kernel"][0])
    got_k = x @ np.asarray(params["layers"]["layer"]["k_proj"]["kernel"][0])
    got_v = x @ np.asarray(params["layers"]["layer"]["v_proj"]["kernel"][0])
    np.testing.assert_allclose(got_q, want_q, rtol=1e-5)
    np.testing.assert_allclose(got_k, want_k, rtol=1e-5)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5)

    # the converted tree loads into our GQA LlamaModel
    model = LlamaModel(cfg, dtype=jnp.float32)
    emb = jnp.zeros((1, 3, 24))
    pos = jnp.arange(3)[None]
    out, logits, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, emb, pos)
    assert logits.shape == (1, 3, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_intern_vit_forward():
    cfg = VisionEncoderConfig(
        arch="intern_vit", image_size=56, patch_size=14, hidden_size=32,
        intermediate_size=64, num_layers=2, num_heads=4,
        hidden_act="gelu", qk_normalization=True, qkv_bias=False,
        output_layer=-1)
    model = InternVisionTower(cfg, dtype=jnp.float32)
    px = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 56, 56, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), px)["params"]
    hs = model.apply({"params": params}, px)
    assert hs.shape == (3, 2, 1 + 16, 32)
    assert np.isfinite(np.asarray(hs)).all()
    # qk norm params exist
    assert "q_norm" in params["layers"]["layer"]
