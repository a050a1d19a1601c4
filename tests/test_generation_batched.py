"""Batched serving generation: B prompts decode in one state machine.

The emb-countdown decode loop is [B]-vectorized (per-sample countdown/
kind/done); batched output must be token-identical to running each
prompt alone. Decode is HBM-bound, so B streams multiply aggregate
tok/s at serving time — this is the correctness contract behind the
bench's batched-decode stage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.generation import build_generate_fn
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tid = SpecialTokenIds.synthetic()
    core = VisionLLM(cfg, dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    rng = np.random.RandomState(0)
    B = 3
    ids = np.concatenate(
        [np.full((B, 1), 1), np.full((B, img_len), tid.imp),
         rng.randint(4, 90, (B, 5))], 1).astype(np.int32)
    imgs = 0.3 * rng.randn(B, size, size, 3).astype(np.float32)
    params = core.init(jax.random.PRNGKey(0), jnp.asarray(ids[:1]),
                       jnp.asarray(imgs[:1]), tid)["params"]
    gen = build_generate_fn(core, tid, max_new_tokens=8, max_len=128)
    return gen, params, ids, imgs


def test_batched_matches_per_sample(setup):
    gen, params, ids, imgs = setup
    outB = gen(params, jnp.asarray(ids), jnp.asarray(imgs))
    toksB = np.asarray(outB["out_tokens"])
    hidB = np.asarray(outB["out_hidden"])
    for b in range(ids.shape[0]):
        out1 = gen(params, jnp.asarray(ids[b:b + 1]),
                   jnp.asarray(imgs[b:b + 1]))
        np.testing.assert_array_equal(toksB[b],
                                      np.asarray(out1["out_tokens"][0]))
        np.testing.assert_allclose(hidB[b],
                                   np.asarray(out1["out_hidden"][0]),
                                   atol=1e-4, rtol=1e-4)


def test_batched_tool_countdown_stays_per_sample(setup):
    """Force a [DET] trigger on ONE row only — its [EMB] run must not
    leak into the other rows."""
    gen, params, ids, imgs = setup
    tid = SpecialTokenIds.synthetic()
    first = jnp.asarray([tid.det, 5, 7], jnp.int32)
    out = gen(params, jnp.asarray(ids), jnp.asarray(imgs),
              first_token=first)
    toks = np.asarray(out["out_tokens"])
    # row 0: [DET] then its 4 distinct [EMB..EMB4] ids
    np.testing.assert_array_equal(
        toks[0, :5], [tid.det, tid.emb, tid.emb + 1, tid.emb + 2,
                      tid.emb + 3])
    # rows 1-2 never emit a forced [EMB] (their first token is plain)
    for b in (1, 2):
        emb_hits = ((toks[b] >= tid.emb) & (toks[b] <= tid.emb + 3))
        pos = np.nonzero(emb_hits)[0]
        # any [EMB] here must itself follow a sampled tool token, not
        # row 0's countdown; with plain first tokens and random params
        # sampling [DET] is possible — check only independence:
        if len(pos):
            prev = toks[b, pos[0] - 1]
            assert prev in (tid.det, tid.seg, tid.grd, tid.pose,
                            tid.emb, tid.emb + 1, tid.emb + 2)


def test_left_padded_batch_matches_unpadded(setup):
    """Serving configuration: mixed-length prompts LEFT-padded to one
    compiled length under attn_mask, images as [B, 1, S, S, 3] tile
    stacks (per-sample feature scatter). Tokens must match each prompt
    generated alone, unpadded."""
    gen, params, ids, imgs = setup
    B, L = ids.shape
    pad = 7
    Lp = L + pad
    ids_p = np.zeros((B, Lp), np.int32)
    mask = np.zeros((B, Lp), bool)
    for b in range(B):
        # trim a different number of trailing tokens per row so the
        # batch is genuinely mixed-length
        n = L - b
        ids_p[b, Lp - n:] = ids[b, :n]
        mask[b, Lp - n:] = True
    outB = gen(params, jnp.asarray(ids_p), jnp.asarray(imgs)[:, None],
               attn_mask=jnp.asarray(mask),
               live=jnp.ones((B,), bool))
    toksB = np.asarray(outB["out_tokens"])
    for b in range(B):
        out1 = gen(params, jnp.asarray(ids[b:b + 1, :L - b]),
                   jnp.asarray(imgs[b:b + 1]))
        np.testing.assert_array_equal(
            toksB[b], np.asarray(out1["out_tokens"][0]),
            err_msg=f"row {b}")


def test_dead_rows_do_not_extend_or_leak(setup):
    """live=False rows (partially full serving batch) start done: they
    record nothing and the live rows' tokens are unchanged."""
    gen, params, ids, imgs = setup
    B, L = ids.shape
    live = np.array([True, False, True])
    mask = np.ones((B, L), bool)
    mask[1] = False                       # dead row is all padding
    ids_d = ids.copy()
    ids_d[1] = 0
    imgs_d = imgs.copy()
    imgs_d[1] = 0.0
    out = gen(params, jnp.asarray(ids_d), jnp.asarray(imgs_d)[:, None],
              attn_mask=jnp.asarray(mask), live=jnp.asarray(live))
    toks = np.asarray(out["out_tokens"])
    assert np.all(toks[1, 1:] == 0), "dead row recorded tokens"
    for b in (0, 2):
        ref = gen(params, jnp.asarray(ids[b:b + 1]),
                  jnp.asarray(imgs[b:b + 1]))
        np.testing.assert_array_equal(
            toks[b], np.asarray(ref["out_tokens"][0]), err_msg=f"row {b}")
