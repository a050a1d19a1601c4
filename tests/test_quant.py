"""Int8 weight-only serving quantization (ops/quant.py).

The reference serves in bf16 only; this is the TPU-first extension for
bandwidth-bound decode. Tests: quantize/dequant roundtrip error bound,
param-tree rewrite structure (plain + scanned stacks), logits agreement
between the bf16 model and its quantized twin, KV-cache decode running
quantized end-to-end, and generation through the public generate fn.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import LLMConfig
from visionllm_tpu.models.llama import KVCache, LlamaModel
from visionllm_tpu.ops.quant import (Int8Dense, quantize_int8,
                                     quantize_llm_params)

TINY = LLMConfig(vocab_size=128, hidden_size=64, intermediate_size=172,
                 num_layers=3, num_heads=4, num_kv_heads=2,
                 max_position_embeddings=256)
TINY_Q = dataclasses.replace(TINY, quant="int8")


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.02, (64, 172)), jnp.float32)
    wq, scale = quantize_int8(w)
    assert wq.dtype == jnp.int8 and scale.shape == (172,)
    deq = wq.astype(jnp.float32) * scale.astype(jnp.float32)[None, :]
    # max error per column is half a quantization step = scale/2
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(scale, np.float32)[None, :] * 0.5
            + 1e-6).all()


def test_quantize_stacked_kernel_axis():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(0, 0.02, (3, 64, 172)), jnp.float32)
    wq, scale = quantize_int8(w)
    assert wq.shape == (3, 64, 172) and scale.shape == (3, 172)


def test_int8_dense_matches_dequantized_matmul():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(0, 0.02, (64, 32)), jnp.float32)
    wq, scale = quantize_int8(w)
    x = jnp.asarray(rng.normal(0, 1, (5, 64)), jnp.float32)
    y = Int8Dense(32, dtype=jnp.float32).apply(
        {"params": {"kernel_q": wq, "scale": scale}}, x)
    ref = x @ (wq.astype(jnp.float32) * scale.astype(jnp.float32)[None, :])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def _init_params():
    model = LlamaModel(TINY, dtype=jnp.float32)
    embeds = jnp.zeros((1, 8, TINY.hidden_size))
    pos = jnp.arange(8)[None, :]

    def init_method(m, embeds, pos):
        m.embed(jnp.zeros((1, 1), jnp.int32))   # touch embed_tokens too
        return m(embeds, pos)

    return model.init(jax.random.PRNGKey(0), embeds, pos,
                      method=init_method)["params"]


def test_quantized_tree_structure_and_logits_agreement():
    params = _init_params()
    qparams = quantize_llm_params(params, jit=False)

    layer = qparams["layers"]["layer"]
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj"):
        assert set(layer[proj]) == {"kernel_q", "scale"}
        assert layer[proj]["kernel_q"].dtype == jnp.int8
        assert layer[proj]["kernel_q"].shape[0] == TINY.num_layers
    assert set(qparams["lm_head"]) == {"kernel_q", "scale"}
    # embeddings and norms untouched
    assert qparams["embed_tokens"]["embedding"].dtype == \
        params["embed_tokens"]["embedding"].dtype

    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.normal(0, 1, (2, 9, TINY.hidden_size)),
                         jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(9)[None, :], (2, 9))
    _, logits, _ = LlamaModel(TINY, jnp.float32).apply(
        {"params": params}, embeds, pos)
    _, qlogits, _ = LlamaModel(TINY_Q, jnp.float32).apply(
        {"params": qparams}, embeds, pos)
    # int8 weight-only at 3 layers: logits track closely and the top-1
    # token agrees nearly everywhere
    cos = np.sum(np.asarray(logits) * np.asarray(qlogits)) / (
        np.linalg.norm(logits) * np.linalg.norm(qlogits))
    assert cos > 0.999
    agree = (np.argmax(np.asarray(logits), -1)
             == np.argmax(np.asarray(qlogits), -1)).mean()
    assert agree >= 0.8


def test_quantized_decode_with_kv_cache():
    params = _init_params()
    qparams = quantize_llm_params(params, jit=False)
    model = LlamaModel(TINY_Q, jnp.float32)

    cache = KVCache.create(TINY, 1, 32, jnp.float32)
    rng = np.random.default_rng(4)
    embeds = jnp.asarray(rng.normal(0, 1, (1, 6, TINY.hidden_size)),
                         jnp.float32)
    pos = jnp.arange(6)[None, :]
    _, logits, cache = model.apply({"params": qparams}, embeds, pos,
                                   cache=cache)
    assert int(cache.index) == 6
    step = jnp.asarray(rng.normal(0, 1, (1, 1, TINY.hidden_size)),
                       jnp.float32)
    _, logits2, cache = model.apply(
        {"params": qparams}, step, jnp.full((1, 1), 6, jnp.int32),
        cache=cache)
    assert np.isfinite(np.asarray(logits2)).all()
    assert int(cache.index) == 7


def test_quantized_generation_serving_path():
    """End-to-end serving path: quantize a composite core's params via
    quantize_serving_params and decode through the public generate fn
    (the CLI --quant int8 route)."""
    from visionllm_tpu.config import tiny_test_config
    from visionllm_tpu.generation import build_generate_fn
    from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM
    from visionllm_tpu.ops.quant import quantize_serving_params

    cfg = tiny_test_config()
    tid = SpecialTokenIds.synthetic()
    model = VisionLLM(cfg, dtype=jnp.float32)
    img_len = cfg.vis_encoder.num_patches
    ids = jnp.asarray([[1, 5, 6] + [tid.imp] * img_len + [7]], jnp.int32)
    size = cfg.vis_encoder.image_size
    images = jnp.zeros((1, size, size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, images, tid)["params"]

    qparams = quantize_serving_params(params, jit=False)
    assert set(qparams["llm"]["lm_head"]) == {"kernel_q", "scale"}

    qcfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, quant="int8"))
    qmodel = VisionLLM(qcfg, dtype=jnp.float32)
    gen = build_generate_fn(qmodel, tid, max_new_tokens=6, max_len=128)
    out = gen(qparams, ids, images)
    toks = np.asarray(out["out_tokens"][0])
    assert (toks >= 0).all() and (toks < cfg.llm.vocab_size).all()
    assert 1 <= int(out["num_generated"]) <= 6

    # the quantized model's prefill logits track the bf16 model closely
    o = model.apply({"params": params}, ids, images, tid,
                    compute_logits=True)
    qo = qmodel.apply({"params": qparams}, ids, images, tid,
                      compute_logits=True)
    a, b = np.asarray(o["logits"]), np.asarray(qo["logits"])
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.995


# ---------------------------------------------------------------------------
# w8a8 (dynamic activation quant + int8×int8→int32 MXU dot — 2× the
# bf16 matmul rate on v5e; accelerates compute-bound prefill/TTFT)
# ---------------------------------------------------------------------------


def test_int8act_dense_matches_integer_reference():
    """The int32 accumulation is exact, so the module must match an
    explicit numpy int math reference bit-for-bit up to the final f32
    scale multiply."""
    from visionllm_tpu.ops.quant import Int8ActDense

    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.normal(0, 0.02, (64, 48)), jnp.float32)
    wq, scale = quantize_int8(w)
    x = jnp.asarray(rng.normal(0, 1.3, (5, 64)), jnp.float32)
    y = Int8ActDense(48, dtype=jnp.float32).apply(
        {"params": {"kernel_q": wq, "scale": scale}}, x)

    xn = np.asarray(x, np.float64)
    sx = np.maximum(np.abs(xn).max(-1, keepdims=True) / 127.0, 1e-8)
    xq = np.clip(np.round(xn / sx), -127, 127).astype(np.int32)
    acc = xq @ np.asarray(wq, np.int32)             # exact
    ref = acc.astype(np.float32) * sx.astype(np.float32) \
        * np.asarray(scale, np.float32)[None, :]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-6, atol=1e-6)


def test_w8a8_matmul_error_vs_float():
    """Both operands round once (≤ half a step each), the accumulate is
    exact — relative output error stays small on LLM-scale data."""
    from visionllm_tpu.ops.quant import Int8ActDense

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(0, 0.02, (256, 128)), jnp.float32)
    wq, scale = quantize_int8(w)
    x = jnp.asarray(rng.normal(0, 1, (16, 256)), jnp.float32)
    y = Int8ActDense(128, dtype=jnp.float32).apply(
        {"params": {"kernel_q": wq, "scale": scale}}, x)
    ref = np.asarray(x) @ np.asarray(w)
    err = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    assert err < 0.02, err


def test_w8a8_logits_track_float_model():
    """Same int8 param tree as weight-only; quant="w8a8" only changes
    the compute path. Logits must track the float model about as well
    as weight-only int8 does."""
    params = _init_params()
    qparams = quantize_llm_params(params, jit=False)
    rng = np.random.default_rng(8)
    embeds = jnp.asarray(rng.normal(0, 1, (2, 9, TINY.hidden_size)),
                         jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(9)[None, :], (2, 9))
    _, logits, _ = LlamaModel(TINY, jnp.float32).apply(
        {"params": params}, embeds, pos)
    cfg_a8 = dataclasses.replace(TINY, quant="w8a8")
    _, qlogits, _ = LlamaModel(cfg_a8, jnp.float32).apply(
        {"params": qparams}, embeds, pos)
    cos = np.sum(np.asarray(logits) * np.asarray(qlogits)) / (
        np.linalg.norm(logits) * np.linalg.norm(qlogits))
    assert cos > 0.998
    agree = (np.argmax(np.asarray(logits), -1)
             == np.argmax(np.asarray(qlogits), -1)).mean()
    assert agree >= 0.8


def test_w8a8_generation_serving_path():
    """CLI --quant w8a8 route: same quantize_serving_params tree, decode
    through the public generate fn, prefill logits track bf16."""
    from visionllm_tpu.config import tiny_test_config
    from visionllm_tpu.generation import build_generate_fn
    from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM
    from visionllm_tpu.ops.quant import quantize_serving_params

    cfg = tiny_test_config()
    tid = SpecialTokenIds.synthetic()
    model = VisionLLM(cfg, dtype=jnp.float32)
    img_len = cfg.vis_encoder.num_patches
    ids = jnp.asarray([[1, 5, 6] + [tid.imp] * img_len + [7]], jnp.int32)
    size = cfg.vis_encoder.image_size
    images = jnp.zeros((1, size, size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, images, tid)["params"]
    qparams = quantize_serving_params(params, jit=False)

    qcfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, quant="w8a8"))
    qmodel = VisionLLM(qcfg, dtype=jnp.float32)
    gen = build_generate_fn(qmodel, tid, max_new_tokens=6, max_len=128)
    out = gen(qparams, ids, images)
    toks = np.asarray(out["out_tokens"][0])
    assert (toks >= 0).all() and (toks < cfg.llm.vocab_size).all()
    assert 1 <= int(out["num_generated"]) <= 6

    o = model.apply({"params": params}, ids, images, tid,
                    compute_logits=True)
    qo = qmodel.apply({"params": qparams}, ids, images, tid,
                      compute_logits=True)
    a, b = np.asarray(o["logits"]), np.asarray(qo["logits"])
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99


# ---------------------------------------------------------------------------
# int8 KV cache (serving: halves decode cache-read bandwidth)
# ---------------------------------------------------------------------------


def test_quantize_kv_roundtrip():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 3, (2, 7, 4, 16)), jnp.float32)
    from visionllm_tpu.ops.quant import quantize_kv
    xq, s = quantize_kv(x)
    assert xq.dtype == jnp.int8 and s.shape == (2, 7, 4)
    deq = xq.astype(np.float32) * np.asarray(s, np.float32)[..., None]
    err = np.abs(deq - np.asarray(x))
    assert (err <= np.asarray(s, np.float32)[..., None] * 0.5 + 1e-6).all()


def test_int8_kv_attention_matches_dequantized():
    from visionllm_tpu.ops.quant import int8_kv_attention, quantize_kv
    rng = np.random.default_rng(6)
    B, Lq, H, H_kv, D, T = 2, 1, 4, 2, 16, 9
    q = jnp.asarray(rng.normal(0, 1, (B, Lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, T, H_kv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, T, H_kv, D)), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    mask = jnp.asarray(rng.uniform(size=(B, 1, Lq, T)) > 0.3)
    mask = mask.at[:, :, :, 0].set(True)   # keep at least one key
    out = int8_kv_attention(q, kq, ks, vq, vs, mask)

    # oracle: plain attention over the DEQUANTIZED cache
    from visionllm_tpu.ops.attention import _einsum_attention
    kd = (kq.astype(jnp.float32) * ks.astype(jnp.float32)[..., None])
    vd = (vq.astype(jnp.float32) * vs.astype(jnp.float32)[..., None])
    ref = _einsum_attention(q, kd, vd, mask, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_int8_kv_cache_decode_tracks_bf16():
    params = _init_params()
    model = LlamaModel(TINY, jnp.float32)
    rng = np.random.default_rng(7)
    embeds = jnp.asarray(rng.normal(0, 1, (1, 6, TINY.hidden_size)),
                         jnp.float32)
    pos = jnp.arange(6)[None, :]

    caches = {}
    logits = {}
    for name, dt in (("bf16", jnp.float32), ("int8", jnp.int8)):
        cache = KVCache.create(TINY, 1, 32, dt)
        if name == "int8":
            assert cache.k.dtype == jnp.int8
            assert cache.k_scale.shape == (TINY.num_layers, 1, 32,
                                           TINY.num_kv_heads)
        _, lg, cache = model.apply({"params": params}, embeds, pos,
                                   cache=cache)
        steps = []
        for i in range(3):
            step = jnp.asarray(rng.normal(0, 1, (1, 1, TINY.hidden_size)),
                               jnp.float32)
            steps.append(step)
        rng = np.random.default_rng(7)     # reset so both runs match
        caches[name] = cache
        logits[name] = lg

    # decode 3 steps with the SAME inputs through both cache modes
    outs = {}
    for name in ("bf16", "int8"):
        cache = caches[name]
        srng = np.random.default_rng(8)
        ls = []
        for i in range(3):
            step = jnp.asarray(srng.normal(0, 1, (1, 1, TINY.hidden_size)),
                               jnp.float32)
            _, lg, cache = model.apply(
                {"params": params}, step,
                jnp.full((1, 1), 6 + i, jnp.int32), cache=cache)
            ls.append(np.asarray(lg)[0, 0])
        outs[name] = np.stack(ls)
        assert int(cache.index) == 9

    a, b = outs["bf16"], outs["int8"]
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999
    assert (np.argmax(a, -1) == np.argmax(b, -1)).mean() >= 2 / 3


def test_int8_kv_generation_serving_path():
    """kv_quant=int8 through the public generate fn (CLI --kv-quant)."""
    from visionllm_tpu.config import tiny_test_config
    from visionllm_tpu.generation import build_generate_fn
    from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM

    cfg = tiny_test_config()
    qcfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, kv_quant="int8"))
    tid = SpecialTokenIds.synthetic()
    model = VisionLLM(cfg, dtype=jnp.float32)
    qmodel = VisionLLM(qcfg, dtype=jnp.float32)
    img_len = cfg.vis_encoder.num_patches
    ids = jnp.asarray([[1, 5, 6] + [tid.imp] * img_len + [7]], jnp.int32)
    size = cfg.vis_encoder.image_size
    images = jnp.zeros((1, size, size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, images, tid)["params"]

    gen = build_generate_fn(model, tid, max_new_tokens=6, max_len=64)
    qgen = build_generate_fn(qmodel, tid, max_new_tokens=6, max_len=64)
    out = gen(params, ids, images)
    qout = qgen(params, ids, images)
    toks = np.asarray(qout["out_tokens"][0])
    n = int(qout["num_generated"])
    assert 1 <= n <= 6 and (toks >= 0).all()
    # first generated token comes from the exact bf16 prefill → identical
    assert int(out["out_tokens"][0, 0]) == int(qout["out_tokens"][0, 0])
