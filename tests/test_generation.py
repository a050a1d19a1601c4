"""Decode loop: emb-countdown state machine + VQA harness smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.mock_tokenizer import MockTokenizer
from visionllm_tpu import constants as C
from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.eval.vqa import run_vqa
from visionllm_tpu.generation import _tool_kind, build_generate_fn
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM

CFG = tiny_test_config()
TID = SpecialTokenIds.synthetic()


def test_tool_kind():
    toks = jnp.asarray([TID.det, TID.seg, TID.grd, TID.pose, TID.gen,
                        TID.edit, 5])
    kinds = _tool_kind(toks, TID)
    assert kinds.tolist() == [C.TOOL_DET, C.TOOL_DET, C.TOOL_DET,
                              C.TOOL_POSE, C.TOOL_GEN, C.TOOL_EDIT, 0]


@pytest.fixture(scope="module")
def gen_setup():
    model = VisionLLM(CFG, dtype=jnp.float32)
    img_len = CFG.vis_encoder.num_patches
    ids = [1, 5, 6] + [TID.imp] * img_len + [7]
    input_ids = jnp.asarray([ids], jnp.int32)
    size = CFG.vis_encoder.image_size
    images = jnp.zeros((1, size, size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), input_ids, images,
                        TID)["params"]
    return model, params, input_ids, images


def test_generate_smoke(gen_setup):
    model, params, input_ids, images = gen_setup
    gen = build_generate_fn(model, TID, max_new_tokens=8, max_len=128)
    out = gen(params, input_ids, images)
    assert out["out_tokens"].shape == (1, 8)
    assert out["out_hidden"].shape == (1, 8, CFG.llm.hidden_size)
    n = int(out["num_generated"])
    assert 1 <= n <= 8
    toks = np.asarray(out["out_tokens"][0])
    assert (toks >= 0).all() and (toks < CFG.llm.vocab_size).all()


def test_forced_emb_after_tool_token(gen_setup):
    """Teacher-force [DET] as the first sampled token: the machine must
    emit exactly num_embs forced [EMB]..[EMB4] ids next (reference
    behavior modeling_visionllmv2.py:426-555), then resume sampling."""
    model, params, input_ids, images = gen_setup
    gen = build_generate_fn(model, TID, max_new_tokens=7, max_len=128)
    out = gen(params, input_ids, images, TID.det)
    toks = np.asarray(out["out_tokens"][0])
    assert toks[0] == TID.det
    np.testing.assert_array_equal(
        toks[1:1 + CFG.num_embs],
        [TID.emb + i for i in range(CFG.num_embs)])
    # after the countdown the next token is freely sampled (not an emb
    # forced id beyond the block)
    assert int(out["num_generated"]) == 7

    # [GEN]: repeats the SAME [EMB] id num_embs_gen times (:434-435)
    gen2 = build_generate_fn(model, TID,
                             max_new_tokens=CFG.num_embs_gen + 2,
                             max_len=256)
    out2 = gen2(params, input_ids, images, TID.gen)
    toks2 = np.asarray(out2["out_tokens"][0])
    assert toks2[0] == TID.gen
    np.testing.assert_array_equal(
        toks2[1:1 + CFG.num_embs_gen],
        [TID.emb] * CFG.num_embs_gen)


def test_vqa_harness(gen_setup):
    model, params, _, _ = gen_setup
    tok = MockTokenizer()
    gen = build_generate_fn(model, TID, max_new_tokens=6, max_len=128)
    rows = run_vqa(
        gen, params, tok,
        [{"image": np.zeros((32, 48, 3), np.uint8),
          "question": "what is this?", "answer": "cat"}],
        image_size=CFG.vis_encoder.image_size)
    assert len(rows) == 1
    assert "prediction" in rows[0]


def test_generate_batched(gen_setup):
    """Batched decode: per-sample countdowns run independently."""
    model, params, input_ids, images = gen_setup
    B = 2
    ids2 = jnp.tile(input_ids, (B, 1))
    imgs2 = jnp.tile(images, (B, 1, 1, 1))
    gen = build_generate_fn(model, TID, max_new_tokens=6, max_len=128)
    out = gen(params, ids2, imgs2, TID.det)
    toks = np.asarray(out["out_tokens"])
    assert toks.shape == (B, 6)
    for b in range(B):
        assert toks[b, 0] == TID.det
        np.testing.assert_array_equal(
            toks[b, 1:1 + CFG.num_embs],
            [TID.emb + i for i in range(CFG.num_embs)])


def test_vqa_harness_batched_matches_bs1(gen_setup):
    """run_vqa(batch_size=3): left-padded batched decode must produce
    the same predictions as the row-by-row loop (incl. a ragged final
    batch with dead rows)."""
    model, params, _, _ = gen_setup
    tok = MockTokenizer()
    gen = build_generate_fn(model, TID, max_new_tokens=6, max_len=160)
    rng = np.random.RandomState(3)
    qs = [{"image": rng.randint(0, 255, (32 + 4 * i, 40, 3), np.uint8),
           "question": f"what is object number {i}?",
           "answer": "thing"} for i in range(5)]
    solo = run_vqa(gen, params, tok, qs,
                   image_size=CFG.vis_encoder.image_size)
    batched = run_vqa(gen, params, tok, qs,
                      image_size=CFG.vis_encoder.image_size,
                      batch_size=3)
    assert [r["prediction"] for r in batched] == \
        [r["prediction"] for r in solo]
