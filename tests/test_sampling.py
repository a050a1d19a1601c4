"""Temperature / top-p sampling (generation.py sampling=True).

The reference decodes greedily everywhere; sampling is a serving
extension and must (a) reduce EXACTLY to greedy at temperature 0,
(b) be deterministic under a fixed key, (c) respect per-row settings
in a batch, and (d) keep the tool-token state machine intact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.generation import build_generate_fn, sample_token
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM

CFG = tiny_test_config()
TID = SpecialTokenIds.synthetic()


@pytest.fixture(scope="module")
def setup():
    model = VisionLLM(CFG, dtype=jnp.float32)
    img_len = CFG.vis_encoder.num_patches
    ids = [1, 5, 6] + [TID.imp] * img_len + [7]
    input_ids = jnp.asarray([ids], jnp.int32)
    size = CFG.vis_encoder.image_size
    images = jnp.zeros((1, size, size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), input_ids, images,
                        TID)["params"]
    return model, params, input_ids, images


def test_temperature_zero_equals_greedy(setup):
    model, params, ids, imgs = setup
    greedy = build_generate_fn(model, TID, max_new_tokens=8, max_len=128)
    samp = build_generate_fn(model, TID, max_new_tokens=8, max_len=128,
                             sampling=True)
    a = greedy(params, ids, imgs)
    b = samp(params, ids, imgs, rng=jax.random.PRNGKey(5),
             temperature=0.0)
    np.testing.assert_array_equal(np.asarray(a["out_tokens"]),
                                  np.asarray(b["out_tokens"]))
    assert int(a["num_generated"]) == int(b["num_generated"])


def test_fixed_key_deterministic_and_varies(setup):
    model, params, ids, imgs = setup
    samp = build_generate_fn(model, TID, max_new_tokens=8, max_len=128,
                             sampling=True)
    o1 = samp(params, ids, imgs, rng=jax.random.PRNGKey(1),
              temperature=1.5)
    o2 = samp(params, ids, imgs, rng=jax.random.PRNGKey(1),
              temperature=1.5)
    np.testing.assert_array_equal(np.asarray(o1["out_tokens"]),
                                  np.asarray(o2["out_tokens"]))
    # at a hot temperature, SOME key should diverge from key 1
    diverged = any(
        not np.array_equal(
            np.asarray(samp(params, ids, imgs,
                            rng=jax.random.PRNGKey(k),
                            temperature=1.5)["out_tokens"]),
            np.asarray(o1["out_tokens"]))
        for k in range(2, 6))
    assert diverged


def test_per_row_mixed_batch(setup):
    """Row 0 greedy, row 1 hot: row 0 must equal the solo greedy run
    regardless of its sampled neighbor."""
    model, params, ids, imgs = setup
    B = 2
    ids2 = jnp.tile(ids, (B, 1))
    imgs2 = jnp.tile(imgs, (B, 1, 1, 1))
    greedy = build_generate_fn(model, TID, max_new_tokens=6, max_len=128)
    samp = build_generate_fn(model, TID, max_new_tokens=6, max_len=128,
                             sampling=True)
    ref = np.asarray(greedy(params, ids, imgs)["out_tokens"][0])
    out = samp(params, ids2, imgs2, rng=jax.random.PRNGKey(3),
               temperature=jnp.asarray([0.0, 2.0]))
    np.testing.assert_array_equal(np.asarray(out["out_tokens"][0]), ref)


def test_top_p_one_hot_limit():
    """top_p→0 keeps only the argmax token: nucleus sampling at any
    temperature then reduces to greedy."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.normal(0, 2, (4, 50)), jnp.float32)
    greedy = np.asarray(jnp.argmax(logits, -1))
    out = sample_token(logits, jax.random.PRNGKey(0),
                       temperature=jnp.full((4,), 3.0),
                       top_p=jnp.full((4,), 1e-6))
    np.testing.assert_array_equal(np.asarray(out), greedy)


def test_top_p_filters_tail():
    """With a 3-token distribution (0.6/0.3/0.1) and top_p=0.7, token 2
    must never be drawn."""
    p = jnp.log(jnp.asarray([[0.6, 0.3, 0.1]], jnp.float32))
    seen = set()
    for k in range(50):
        t = sample_token(p, jax.random.PRNGKey(k),
                         temperature=jnp.ones((1,)),
                         top_p=jnp.full((1,), 0.7))
        seen.add(int(t[0]))
    assert 2 not in seen
    assert 0 in seen
