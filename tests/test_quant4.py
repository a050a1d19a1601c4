"""Int4 (w4g128) weight-only serving quantization (ops/quant4.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.ops.quant4 import (Int4Dense, group_size, int4_matmul,
                                      int4_matmul_ref, pack_int4,
                                      quantize_llm_params_int4)


def _dequant(wp, scale):
    """Host-side unpack for oracles (signed two's-complement nibbles:
    arithmetic shifts sign-extend, matching the kernel)."""
    ng = scale.shape[-2]
    g = 2 * wp.shape[-2] // ng
    wi = np.asarray(wp).astype(np.int32)      # sign-extends the byte
    lo = (wi << 28) >> 28
    hi = wi >> 4
    w = np.concatenate([lo, hi], axis=-2).astype(np.float32)
    s = np.repeat(np.asarray(scale).astype(np.float32), g, axis=-2)
    return w * s


def test_pack_roundtrip_error_bound():
    """|dequant − w| ≤ scale/2 elementwise (symmetric round-to-nearest
    at 4 bits), and the packed byte really holds two rows."""
    rng = np.random.RandomState(0)
    w = rng.normal(0, 0.02, (512, 96)).astype(np.float32)
    wp, scale = pack_int4(jnp.asarray(w))
    assert wp.shape == (256, 96) and wp.dtype == jnp.int8
    g = group_size(512)
    assert scale.shape == (512 // g, 96)
    deq = _dequant(wp, scale)
    bound = np.repeat(np.asarray(scale, np.float32), g, axis=0) / 2 + 1e-6
    assert (np.abs(deq - w) <= bound).all()


def test_pack_scanned_stack():
    """[n_layers, in, out] stacks pack with the leading axis intact."""
    rng = np.random.RandomState(1)
    w = rng.normal(0, 0.05, (3, 256, 64)).astype(np.float32)
    wp, scale = pack_int4(jnp.asarray(w))
    assert wp.shape == (3, 128, 64)
    for l in range(3):
        wl, sl = pack_int4(jnp.asarray(w[l]))
        np.testing.assert_array_equal(np.asarray(wp[l]), np.asarray(wl))
        np.testing.assert_array_equal(np.asarray(scale[l]),
                                      np.asarray(sl))


def test_matmul_ref_equals_dequant():
    rng = np.random.RandomState(2)
    w = rng.normal(0, 0.05, (512, 128)).astype(np.float32)
    x = rng.normal(0, 1, (4, 512)).astype(np.float32)
    wp, scale = pack_int4(jnp.asarray(w))
    got = np.asarray(int4_matmul_ref(jnp.asarray(x), wp, scale))
    want = x @ _dequant(wp, scale)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_kernel_matches_ref():
    """The fused unpack-dequant-matmul kernel (interpret mode on CPU)
    must equal the XLA reference bit-for-bit at aligned shapes."""
    rng = np.random.RandomState(3)
    CIN, COUT = 512, 256
    w = rng.normal(0, 0.05, (CIN, COUT)).astype(np.float32)
    wp, scale = pack_int4(jnp.asarray(w))
    for B in (1, 5, 16):
        x = jnp.asarray(rng.normal(0, 1, (B, CIN)), jnp.float32)
        got = np.asarray(int4_matmul(x, wp, scale, interpret=True))
        want = np.asarray(int4_matmul_ref(x, wp, scale))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"B={B}")


def test_quantized_tree_matches_module_shapes():
    """quantize_llm_params_int4 output must drop into an Int4Dense
    llama tree: same treedef, same shapes/dtypes as a fresh init."""
    from visionllm_tpu.config import tiny_test_config
    from visionllm_tpu.models.llama import LlamaModel

    cfg = tiny_test_config().llm
    model = LlamaModel(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 8), jnp.int32)

    def fwd(m, ids):
        e = m.embed(ids)
        return m(e, jnp.arange(8)[None])

    params = model.init(jax.random.PRNGKey(0), x, method=fwd)["params"]
    qcfg = dataclasses.replace(cfg, quant="int4")
    qmodel = LlamaModel(qcfg, dtype=jnp.float32)
    qinit = qmodel.init(jax.random.PRNGKey(0), x, method=fwd)["params"]
    qtree = quantize_llm_params_int4(params)
    flat_a = jax.tree_util.tree_flatten_with_path(qinit)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(qtree)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        assert a.shape == b.shape and a.dtype == b.dtype, pa


def test_int4_generation_tracks_bf16():
    """End-to-end: int4-quantized tiny model generates; its logits stay
    directionally aligned with the source model (random weights are the
    worst case for 4-bit — real LLM weights quantize better)."""
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
    qparams = quantize_serving_params({"llm": params["llm"]}, bits=4)
    qparams = dict(params, llm=qparams["llm"])

    qcfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, quant="int4"))
    qmodel = VisionLLM(qcfg, dtype=jnp.float32)
    gen = build_generate_fn(qmodel, tid, max_new_tokens=6, max_len=64)
    out = gen(qparams, ids, images)
    toks = np.asarray(out["out_tokens"][0])
    assert 1 <= int(out["num_generated"]) <= 6
    assert (toks >= 0).all() and (toks < cfg.llm.vocab_size).all()

    # prefill logits cosine vs the unquantized model
    o_f = model.apply({"params": params}, ids, images, tid)
    o_q = qmodel.apply({"params": qparams}, ids, images, tid)
    a = np.asarray(o_f["logits"][0, -1]).astype(np.float64)
    b = np.asarray(o_q["logits"][0, -1]).astype(np.float64)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    # iid-gaussian random weights are the int4 worst case (no outlier
    # structure for the group scales to exploit; measured ~0.96 here);
    # the bound asserts directional tracking, not production quality —
    # that claim rests on the w4g128 literature and real checkpoints
    assert cos > 0.9, cos


def test_int4_weights_with_int8_kv_cache():
    """--quant int4 --kv-quant int8 combined serving mode decodes."""
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
    qparams = quantize_serving_params({"llm": params["llm"]}, bits=4)
    qparams = dict(params, llm=qparams["llm"])

    qcfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, quant="int4",
                                     kv_quant="int8"))
    qmodel = VisionLLM(qcfg, dtype=jnp.float32)
    gen = build_generate_fn(qmodel, tid, max_new_tokens=6, max_len=64)
    out = gen(qparams, ids, images)
    toks = np.asarray(out["out_tokens"][0])
    assert 1 <= int(out["num_generated"]) <= 6
    assert (toks >= 0).all() and (toks < cfg.llm.vocab_size).all()


def test_odd_output_width_falls_back():
    """cout not divisible by 128 (tiny configs, odd heads) must take
    the exact XLA fallback rather than a partial Pallas grid."""
    rng = np.random.RandomState(4)
    w = rng.normal(0, 0.05, (256, 320)).astype(np.float32)
    x = jnp.asarray(rng.normal(0, 1, (3, 256)), jnp.float32)
    wp, scale = pack_int4(jnp.asarray(w))
    got = np.asarray(int4_matmul(x, wp, scale, interpret=True))
    want = np.asarray(int4_matmul_ref(x, wp, scale))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.shape == (3, 320)
