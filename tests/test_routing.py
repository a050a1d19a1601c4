"""Unit tests for the super-link routing machinery (emb splice, image
scatter, text-query extraction) on a tiny composite model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu import constants as C
from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.models.visionllm import (SpecialTokenIds, VisionLLM,
                                            compact_masked_rows,
                                            tool_context)

CFG = tiny_test_config()
TID = SpecialTokenIds.synthetic()


@pytest.fixture(scope="module")
def model_and_params():
    model = VisionLLM(CFG, dtype=jnp.float32)
    img_len = CFG.vis_encoder.num_patches   # 16 for 56/14
    # prompt: text, 16 <im_patch>, text, [DET] [EMB..EMB4], [POSE] [EMB..4],
    # [GEN] [EMB]*8
    ids = ([5, 6] + [TID.imp] * img_len + [7]
           + [TID.det] + [TID.emb + i for i in range(4)]
           + [TID.pose] + [TID.emb + i for i in range(4)]
           + [TID.gen] + [TID.emb] * CFG.num_embs_gen
           + [8])
    input_ids = jnp.asarray([ids], dtype=jnp.int32)
    size = CFG.vis_encoder.image_size
    dummy_images = jnp.zeros((1, size, size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), input_ids, dummy_images,
                        TID)["params"]
    return model, params, input_ids, img_len


def test_tool_context(model_and_params):
    _, _, input_ids, img_len = model_and_params
    ctx, last_pos = tool_context(input_ids, TID)
    ctx = np.asarray(ctx[0])
    ids = np.asarray(input_ids[0])
    det_pos = int(np.where(ids == TID.det)[0][0])
    pose_pos = int(np.where(ids == TID.pose)[0][0])
    gen_pos = int(np.where(ids == TID.gen)[0][0])
    # emb positions after [DET] carry TOOL_DET, etc.
    assert (ctx[det_pos + 1:det_pos + 5] == C.TOOL_DET).all()
    assert (ctx[pose_pos + 1:pose_pos + 5] == C.TOOL_POSE).all()
    assert (ctx[gen_pos + 1:gen_pos + 9] == C.TOOL_GEN).all()
    # before any tool token: 0
    assert (ctx[:det_pos] == 0).all()
    lp = np.asarray(last_pos[0])
    assert (lp[gen_pos + 1:gen_pos + 9] == gen_pos).all()


def test_splice_emb_embeddings(model_and_params):
    model, params, input_ids, _ = model_and_params
    embeds = model.apply({"params": params}, input_ids,
                         method=VisionLLM.embed_tokens)
    spliced = model.apply({"params": params}, embeds, input_ids, TID,
                          method=VisionLLM.splice_emb_embeddings)
    ids = np.asarray(input_ids[0])
    det_pos = int(np.where(ids == TID.det)[0][0])
    pose_pos = int(np.where(ids == TID.pose)[0][0])
    gen_pos = int(np.where(ids == TID.gen)[0][0])
    e_det = params["emb_embeddings_det"]
    e_pose = params["emb_embeddings_pose"]
    e_gen = params["emb_embeddings_gen"]
    out = np.asarray(spliced[0])
    for i in range(4):
        np.testing.assert_allclose(out[det_pos + 1 + i], e_det[i], rtol=1e-6)
        np.testing.assert_allclose(out[pose_pos + 1 + i], e_pose[i], rtol=1e-6)
    for i in range(CFG.num_embs_gen):
        np.testing.assert_allclose(out[gen_pos + 1 + i], e_gen[i], rtol=1e-6)
    # non-emb positions untouched
    np.testing.assert_array_equal(out[0], np.asarray(embeds[0, 0]))
    np.testing.assert_array_equal(out[det_pos], np.asarray(embeds[0, det_pos]))


def test_image_scatter(model_and_params):
    model, params, input_ids, img_len = model_and_params
    B, L = input_ids.shape
    Cdim = CFG.llm.hidden_size
    embeds = jnp.zeros((B, L, Cdim))
    feats = jnp.arange(img_len * Cdim, dtype=jnp.float32).reshape(
        1, img_len, Cdim)
    out = VisionLLM.scatter_image_features(embeds, input_ids, feats, TID.imp)
    ids = np.asarray(input_ids[0])
    imp_positions = np.where(ids == TID.imp)[0]
    out = np.asarray(out[0])
    for k, p in enumerate(imp_positions):
        np.testing.assert_array_equal(out[p], np.asarray(feats[0, k]))
    assert (out[0] == 0).all()  # non-patch position untouched


def test_extract_text_query(model_and_params):
    model, params, input_ids, _ = model_and_params
    B, L = input_ids.shape
    Cdim = CFG.llm.hidden_size
    hidden = jnp.arange(B * L * Cdim, dtype=jnp.float32).reshape(B, L, Cdim)
    tq, tq_mask = model.apply({"params": params}, hidden, input_ids, TID,
                              method=VisionLLM.extract_text_query)
    assert tq.shape == (B, CFG.max_num_patches, CFG.num_embs, Cdim)
    ids = np.asarray(input_ids[0])
    emb_sel = (ids >= TID.emb) & (ids < TID.emb + CFG.num_embs)
    n_groups = emb_sel.sum() // CFG.num_embs
    assert np.asarray(tq_mask[0]).sum() == n_groups
    emb_positions = np.where(emb_sel)[0]
    expect = np.asarray(hidden[0])[emb_positions].reshape(
        n_groups, CFG.num_embs, Cdim)
    np.testing.assert_array_equal(np.asarray(tq[0, :n_groups]), expect)


def test_full_forward_shapes(model_and_params):
    model, params, input_ids, _ = model_and_params
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(
        (1, CFG.vis_encoder.image_size, CFG.vis_encoder.image_size, 3),
        dtype=np.float32))
    out = model.apply({"params": params}, input_ids, images, TID)
    B, L = input_ids.shape
    assert out["logits"].shape == (B, L, CFG.llm.vocab_size)
    assert out["hidden"].shape == (B, L, CFG.llm.hidden_size)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_compact_masked_rows_batched():
    x = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    mask = jnp.asarray([[True, False, True, False, True],
                        [False, False, False, True, False]])
    rows, valid = compact_masked_rows(x, mask, 4)
    np.testing.assert_array_equal(np.asarray(valid),
                                  [[1, 1, 1, 0], [1, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(rows[0, 0]), np.asarray(x[0, 0]))
    np.testing.assert_array_equal(np.asarray(rows[0, 1]), np.asarray(x[0, 2]))
    np.testing.assert_array_equal(np.asarray(rows[0, 2]), np.asarray(x[0, 4]))
    np.testing.assert_array_equal(np.asarray(rows[1, 0]), np.asarray(x[1, 3]))
    assert (np.asarray(rows[0, 3]) == 0).all()


def test_region_prompt_forward():
    """Regions flow: <region> rows replaced by RegionEncoder features
    (valid regions compacted in order; empty slots skipped)."""
    model = VisionLLM(CFG, dtype=jnp.float32)
    size = CFG.vis_encoder.image_size
    img_len = CFG.vis_encoder.num_patches
    ids = ([5, 6] + [TID.imp] * img_len + [7]
           + [TID.reg, 8, TID.reg] + [9])
    input_ids = jnp.asarray([ids], jnp.int32)
    images = jnp.zeros((1, size, size, 3), jnp.float32)
    regions = np.zeros((1, 3, size, size), np.float32)
    regions[0, 0, 5:20, 5:20] = 1
    regions[0, 1, 30:50, 10:40] = 1      # 2 valid, slot 2 empty
    params = model.init(jax.random.PRNGKey(0), input_ids, images, TID,
                        regions=jnp.asarray(regions))["params"]
    out = model.apply({"params": params}, input_ids, images, TID,
                      regions=jnp.asarray(regions))
    assert out["logits"].shape[1] == len(ids)
    assert np.isfinite(np.asarray(out["logits"])).all()
    # different region masks → different outputs at the <region> rows
    regions2 = regions.copy()
    regions2[0, 0] = 0
    regions2[0, 0, 40:56, 40:56] = 1
    out2 = model.apply({"params": params}, input_ids, images, TID,
                       regions=jnp.asarray(regions2))
    reg_pos = ids.index(TID.reg)
    d = np.abs(np.asarray(out["hidden"][0, reg_pos])
               - np.asarray(out2["hidden"][0, reg_pos])).max()
    assert d > 1e-6


def test_pixel_shuffle_parity_vs_reference():
    """pixel_shuffle must match the reference's view/permute sequence
    (modeling_visionllmv2.py:381-392) — verified against a torch port."""
    import torch
    from visionllm_tpu.models.vl_bridge import pixel_shuffle

    def torch_pixel_shuffle(x, scale_factor=0.5):
        n, w, h, c = x.size()
        x = x.view(n, w, int(h * scale_factor), int(c / scale_factor))
        x = x.permute(0, 2, 1, 3).contiguous()
        x = x.view(n, int(h * scale_factor), int(w * scale_factor),
                   int(c / (scale_factor * scale_factor)))
        x = x.permute(0, 2, 1, 3).contiguous()
        return x

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    want = torch_pixel_shuffle(torch.from_numpy(x)).numpy()
    got = np.asarray(pixel_shuffle(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_anyres_multitile_forward():
    """5D image batches (anyres tiles) flatten through the vision tower
    and scatter in (sample, tile) order."""
    model = VisionLLM(CFG, dtype=jnp.float32)
    size = CFG.vis_encoder.image_size
    img_len = CFG.vis_encoder.num_patches
    T = 2
    ids = [5] + [TID.imp] * (img_len * T) + [7]
    input_ids = jnp.asarray([ids], jnp.int32)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.standard_normal(
        (1, T, size, size, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), input_ids, tiles,
                        TID)["params"]
    out = model.apply({"params": params}, input_ids, tiles, TID)
    assert out["hidden"].shape == (1, len(ids), CFG.llm.hidden_size)
    # flattened 4D equivalent gives identical results
    out2 = model.apply({"params": params}, input_ids,
                       tiles.reshape(T, size, size, 3), TID)
    np.testing.assert_allclose(np.asarray(out["hidden"]),
                               np.asarray(out2["hidden"]), atol=1e-6)


def test_ragged_tile_batch_alignment():
    """Two samples with different real tile counts (padded to T): each
    sample's <im_patch> rows must read its OWN tiles, not the pad tiles
    of the previous sample."""
    model = VisionLLM(CFG, dtype=jnp.float32)
    size = CFG.vis_encoder.image_size
    img_len = CFG.vis_encoder.num_patches
    T = 2
    # sample 0 uses 1 tile, sample 1 uses 2 tiles; pad to same seq len
    ids0 = [5] + [TID.imp] * img_len + [7] + [0] * img_len
    ids1 = [5] + [TID.imp] * (img_len * T) + [7]
    input_ids = jnp.asarray([ids0, ids1], jnp.int32)
    rng = np.random.default_rng(0)
    tiles = np.zeros((2, T, size, size, 3), np.float32)
    tiles[0, 0] = rng.standard_normal((size, size, 3))
    tiles[1, 0] = rng.standard_normal((size, size, 3))
    tiles[1, 1] = rng.standard_normal((size, size, 3))
    tiles = jnp.asarray(tiles)
    params = model.init(jax.random.PRNGKey(0), input_ids, tiles,
                        TID)["params"]

    # the scatter for sample 1's SECOND tile must equal the single-sample
    # forward on sample 1 alone
    out_b = model.apply({"params": params}, input_ids, tiles, TID)
    out_1 = model.apply({"params": params}, input_ids[1:], tiles[1:], TID)
    np.testing.assert_allclose(np.asarray(out_b["hidden"][1]),
                               np.asarray(out_1["hidden"][0]), atol=1e-5)


def test_ignore_flag_on_image_token_mismatch(model_and_params):
    """Image/token-count mismatch must raise ignore_flag (reference
    modeling_visionllmv2.py:591-604) so losses degrade to 0 instead of
    training on mis-scattered features."""
    model, params, input_ids, img_len = model_and_params
    size = CFG.vis_encoder.image_size
    images = jnp.zeros((1, size, size, 3), jnp.float32)

    out = model.apply({"params": params}, input_ids, images, TID)
    assert float(out["ignore_flag"]) == 0.0

    # drop one <im_patch> token → count mismatch
    ids = np.asarray(input_ids).copy()
    imp_pos = np.nonzero(ids[0] == TID.imp)[0]
    ids[0, imp_pos[0]] = 5
    out = model.apply({"params": params}, jnp.asarray(ids), images, TID)
    assert float(out["ignore_flag"]) == 1.0

    # no images at all → no flag (pure-text batches are fine)
    out = model.apply({"params": params}, input_ids, None, TID)
    assert float(out["ignore_flag"]) == 0.0
