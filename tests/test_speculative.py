"""Speculative decoding must be EXACTLY the step-by-step loop.

`build_speculative_generate_fn` (prompt-lookup drafts + forced-[EMB]
windows, generation.py) is an execution strategy, not a model change:
for every prompt it must emit the same tokens, the same count, and the
same recorded hidden states as `build_generate_fn` — including through
tool-token countdowns, early EOS, and draft misses. These tests sweep
those regimes on random tiny models and diff against the plain loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.generation import (build_generate_fn,
                                      build_speculative_generate_fn)
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM

CFG = tiny_test_config()
TID = SpecialTokenIds.synthetic()
MAX_NEW = 16


@pytest.fixture(scope="module")
def setup():
    model = VisionLLM(CFG, dtype=jnp.float32)
    img_len = CFG.vis_encoder.num_patches
    ids = [1, 5, 6] + [TID.imp] * img_len + [7, 8, 9, 7, 8]
    input_ids = jnp.asarray([ids], jnp.int32)
    size = CFG.vis_encoder.image_size
    images = jnp.zeros((1, size, size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), input_ids, images,
                        TID)["params"]
    ref = build_generate_fn(model, TID, max_new_tokens=MAX_NEW,
                            max_len=128)
    return model, params, input_ids, images, ref


def _assert_same(out_ref, out_spec):
    n_ref = int(out_ref["num_generated"])
    n_spec = int(out_spec["num_generated"])
    n = min(n_ref, MAX_NEW)
    assert n_spec == n, (n_spec, n_ref)
    tr = np.asarray(out_ref["out_tokens"][0, :n])
    ts = np.asarray(out_spec["out_tokens"][0, :n])
    np.testing.assert_array_equal(ts, tr)
    # hidden states feed the tool decoders — must match too. The last
    # recorded position is n-2 (neither loop records the final token's
    # hidden state).
    hr = np.asarray(out_ref["out_hidden"][0, :max(n - 1, 0)])
    hs = np.asarray(out_spec["out_hidden"][0, :max(n - 1, 0)])
    np.testing.assert_allclose(hs, hr, atol=2e-5, rtol=2e-5)
    # per-token logprobs (serving "logprobs": true) must agree too
    lr = np.asarray(out_ref["out_logprobs"][0, :n])
    ls = np.asarray(out_spec["out_logprobs"][0, :n])
    np.testing.assert_allclose(ls, lr, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("k_draft", [1, 3, 7])
def test_plain_text_matches(setup, k_draft):
    model, params, ids, imgs, ref = setup
    spec = build_speculative_generate_fn(
        model, TID, max_new_tokens=MAX_NEW, max_len=128, k_draft=k_draft)
    _assert_same(ref(params, ids, imgs), spec(params, ids, imgs))


def test_det_countdown_matches(setup):
    """[DET] trigger: 4 forced [EMB]..[EMB4] rows must come out of the
    windowed path identically (ids AND their hidden states, which become
    the detector's text queries)."""
    model, params, ids, imgs, ref = setup
    spec = build_speculative_generate_fn(
        model, TID, max_new_tokens=MAX_NEW, max_len=128, k_draft=3)
    _assert_same(ref(params, ids, imgs, TID.det),
                 spec(params, ids, imgs, TID.det))


def test_gen_countdown_matches(setup):
    """[GEN]: num_embs_gen repeated [EMB] rows — the long forced run the
    windows exist to accelerate; window size does not divide the run."""
    model, params, ids, imgs, ref = setup
    n_total = CFG.num_embs_gen + 6
    ref_g = build_generate_fn(model, TID, max_new_tokens=n_total,
                              max_len=256)
    spec_g = build_speculative_generate_fn(
        model, TID, max_new_tokens=n_total, max_len=256, k_draft=4)
    o_ref = ref_g(params, ids, imgs, TID.gen)
    o_spec = spec_g(params, ids, imgs, TID.gen)
    n = min(int(o_ref["num_generated"]), n_total)
    assert int(o_spec["num_generated"]) == n
    tr = np.asarray(o_ref["out_tokens"][0, :n])
    ts = np.asarray(o_spec["out_tokens"][0, :n])
    np.testing.assert_array_equal(ts, tr)
    assert (tr[1:1 + CFG.num_embs_gen] == TID.emb).all()
    np.testing.assert_allclose(
        np.asarray(o_spec["out_hidden"][0, :n - 1]),
        np.asarray(o_ref["out_hidden"][0, :n - 1]),
        atol=2e-5, rtol=2e-5)


def test_random_models_match(setup):
    """Sweep seeds: different random models take different sampled
    paths (draft hits, misses, tool tokens, eos) — all must match."""
    model, _, ids, imgs, ref = setup
    size = CFG.vis_encoder.image_size
    spec = build_speculative_generate_fn(
        model, TID, max_new_tokens=MAX_NEW, max_len=128, k_draft=5)
    for seed in range(3):
        params = model.init(jax.random.PRNGKey(100 + seed), ids,
                            jnp.zeros((1, size, size, 3), jnp.float32),
                            TID)["params"]
        _assert_same(ref(params, ids, imgs), spec(params, ids, imgs))


def test_repetitive_prompt_accepts_drafts(setup):
    """A prompt whose continuation repeats an earlier phrase: the
    n-gram drafter should finish in fewer loop iterations than tokens
    (indirectly observable: outputs still match exactly)."""
    model, params, _, imgs, ref = setup
    img_len = CFG.vis_encoder.num_patches
    phrase = [11, 12, 13, 14, 11, 12, 13, 14, 11, 12]
    ids = jnp.asarray([[1] + [TID.imp] * img_len + phrase], jnp.int32)
    spec = build_speculative_generate_fn(
        model, TID, max_new_tokens=MAX_NEW, max_len=128, k_draft=7)
    out = spec(params, ids, imgs)
    _assert_same(ref(params, ids, imgs), out)
    # acceptance accounting (serving auto-disable): windows reported,
    # and windows never exceed decoded tokens (first token is free)
    n_gen = int(out["num_generated"])
    n_win = int(out["num_windows"])
    assert 1 <= n_win <= max(n_gen - 1, 1), (n_win, n_gen)


def test_left_padded_matches_unpadded(setup):
    """Serving contract: a LEFT-padded prompt under attn_mask must
    decode identically to the unpadded prompt (one compiled shape for
    all prompt lengths)."""
    model, params, ids, imgs, _ = setup
    pad = 6
    L = ids.shape[1]
    ids_p = jnp.concatenate(
        [jnp.zeros((1, pad), jnp.int32), ids], axis=1)
    mask = jnp.concatenate(
        [jnp.zeros((1, pad), bool), jnp.ones((1, L), bool)], axis=1)
    spec = build_speculative_generate_fn(
        model, TID, max_new_tokens=MAX_NEW, max_len=128, k_draft=4)
    out_u = spec(params, ids, imgs)
    out_p = spec(params, ids_p, imgs, attn_mask=mask)
    _assert_same(out_u, out_p)


def test_batch_rejected():
    model = VisionLLM(CFG, dtype=jnp.float32)
    spec = build_speculative_generate_fn(model, TID, max_new_tokens=4,
                                         max_len=64)
    with pytest.raises(ValueError, match="single-sequence"):
        spec(None, jnp.zeros((2, 8), jnp.int32), None)


def test_int8_kv_spec_matches_int8_plain(setup):
    """kv_quant=int8 + speculative windows: the windowed int8 attention
    (per-token scales quantized identically to per-step) must reproduce
    the plain int8 decode token-for-token."""
    import dataclasses

    model, params, ids, imgs, _ = setup
    qcfg = dataclasses.replace(
        CFG, llm=dataclasses.replace(CFG.llm, kv_quant="int8"))
    qmodel = VisionLLM(qcfg, dtype=jnp.float32)
    ref = build_generate_fn(qmodel, TID, max_new_tokens=MAX_NEW,
                            max_len=128)
    spec = build_speculative_generate_fn(
        qmodel, TID, max_new_tokens=MAX_NEW, max_len=128, k_draft=3)
    _assert_same(ref(params, ids, imgs), spec(params, ids, imgs))
