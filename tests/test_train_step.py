"""Sharded det training step: runs on the 8-device CPU mesh, checks the
loss is finite and parameters actually move (end-to-end grad flow through
LLM → [EMB] routing → grounding-dino → Hungarian losses)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.models.visionllm import SpecialTokenIds
from visionllm_tpu.parallel.mesh import build_mesh
from visionllm_tpu.train.train_step import (OptimizerConfig, TrainState,
                                            build_optimizer,
                                            make_det_train_step,
                                            shard_train_step)

CFG = tiny_test_config()
TID = SpecialTokenIds.synthetic()


def _det_batch(B):
    img_len = CFG.vis_encoder.num_patches
    ids = ([1, 10, 11] + [TID.imp] * img_len + [12]
           + [TID.det] + [TID.emb + i for i in range(CFG.num_embs)] + [2])
    input_ids = jnp.tile(jnp.asarray([ids], jnp.int32), (B, 1))
    size = CFG.vis_encoder.image_size
    det = 64
    N = 3
    rng = np.random.default_rng(0)
    return {
        "input_ids": input_ids,
        "labels": jnp.where(input_ids >= 10, input_ids, -100),
        "attn_mask": jnp.ones_like(input_ids),
        "images": jnp.asarray(rng.standard_normal(
            (B, size, size, 3), dtype=np.float32)),
        "images_aug": jnp.asarray(rng.standard_normal(
            (B, det, det, 3), dtype=np.float32)),
        "targets": {
            "labels": jnp.zeros((B, N), jnp.int32),
            "boxes": jnp.tile(jnp.asarray(
                [[[0.3, 0.3, 0.2, 0.2], [0.6, 0.6, 0.3, 0.3],
                  [0.5, 0.5, 0.1, 0.1]]]), (B, 1, 1)),
            "valid": jnp.asarray([[True, True, False]] * B),
            "masks": jnp.ones((B, N, det // 4, det // 4), jnp.float32),
        },
    }


@pytest.mark.slow
def test_sharded_det_train_step():
    mesh = build_mesh(n_data=4, n_model=2)
    model = VisionLLMWithTools(CFG, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    batch = _det_batch(4)
    params = model.init(jax.random.PRNGKey(0), batch, TID)["params"]
    tx = build_optimizer(OptimizerConfig(learning_rate=1e-3,
                                         total_steps=10), params)
    state = TrainState.create(params, tx)
    step = make_det_train_step(model, tx, TID)

    with mesh:
        jitted, state_s, batch_s = shard_train_step(step, mesh, state, batch)
        new_state, metrics = jitted(state_s, batch_s, jax.random.PRNGKey(1))
        jax.block_until_ready(new_state.params)

    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["lm_loss"]))
    assert np.isfinite(float(metrics["det_loss"]))
    assert int(new_state.step) == 1

    # parameters moved — check a gdino head and an LLM kernel
    before = jax.tree_util.tree_leaves(params)
    after = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
        for a, b in zip(after, before))
    assert moved > len(before) // 2, f"only {moved}/{len(before)} moved"


def test_sharded_chat_train_step():
    """Chat (VLM-only) step under the same FSDP+TP mesh; checks the LLM
    tensor-parallel rules compile and the loss decreases over 3 steps."""
    mesh = build_mesh(n_data=4, n_model=2)
    model = VisionLLMWithTools(CFG, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    img_len = CFG.vis_encoder.num_patches
    ids = [1, 10, 11] + [TID.imp] * img_len + [12, 13, 14, 2]
    input_ids = jnp.tile(jnp.asarray([ids], jnp.int32), (4, 1))
    size = CFG.vis_encoder.image_size
    batch = {
        "input_ids": input_ids,
        "labels": jnp.where(input_ids >= 10, input_ids, -100),
        "attn_mask": jnp.ones_like(input_ids),
        "images": jnp.zeros((4, size, size, 3), jnp.float32),
    }
    from visionllm_tpu.models.visionllm import VisionLLM  # noqa: F401
    params = model.init(jax.random.PRNGKey(0), batch, TID,
                        method=VisionLLMWithTools.forward_chat)["params"]
    from visionllm_tpu.train.train_step import make_chat_train_step
    tx = build_optimizer(OptimizerConfig(learning_rate=5e-3,
                                         schedule="constant",
                                         total_steps=10), params)
    state = TrainState.create(params, tx)
    step = make_chat_train_step(model, tx, TID)
    with mesh:
        jitted, state_s, batch_s = shard_train_step(step, mesh, state, batch)
        losses = []
        for i in range(3):
            state_s, metrics = jitted(state_s, batch_s, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[0])
    assert losses[-1] < losses[0]          # same batch → loss must drop


@pytest.mark.slow
def test_gen_and_edit_train_steps():
    """[GEN]/[EDIT] steps: finite losses, SD/IP2P params receive grads."""
    from visionllm_tpu.train.train_step import make_gen_train_step
    model = VisionLLMWithTools(CFG, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    ids = ([1, 10] + [TID.gen] + [TID.emb] * CFG.num_embs_gen + [2])
    input_ids = jnp.asarray([ids], jnp.int32)
    batch = {
        "input_ids": input_ids,
        "labels": jnp.where(input_ids >= 10, input_ids, -100),
        "attn_mask": jnp.ones_like(input_ids),
        "output_images": jnp.zeros((1, 32, 32, 3), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch, TID,
                        jax.random.PRNGKey(1),
                        method=VisionLLMWithTools.forward_gen)["params"]
    tx = build_optimizer(OptimizerConfig(learning_rate=1e-3,
                                         total_steps=10), params)
    state = TrainState.create(params, tx)
    step = make_gen_train_step(model, tx, TID)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    moved = np.abs(
        np.asarray(new_state.params["sd"]["mapper"]["emb_proj_0"]["kernel"])
        - np.asarray(params["sd"]["mapper"]["emb_proj_0"]["kernel"])).max()
    assert moved > 0

    # edit variant
    ids_e = ([1, 10] + [TID.edit] + [TID.emb] * CFG.num_embs_gen + [2])
    input_ids_e = jnp.asarray([ids_e], jnp.int32)
    batch_e = {
        "input_ids": input_ids_e,
        "labels": jnp.where(input_ids_e >= 10, input_ids_e, -100),
        "attn_mask": jnp.ones_like(input_ids_e),
        "input_images": jnp.zeros((1, 32, 32, 3), jnp.float32),
        "output_images": jnp.zeros((1, 32, 32, 3), jnp.float32),
    }
    params_e = model.init(jax.random.PRNGKey(0), batch_e, TID,
                          jax.random.PRNGKey(1),
                          method=VisionLLMWithTools.forward_edit)["params"]
    tx_e = build_optimizer(OptimizerConfig(learning_rate=1e-3,
                                           total_steps=10), params_e)
    state_e = TrainState.create(params_e, tx_e)
    step_e = make_gen_train_step(model, tx_e, TID, edit=True)
    _, metrics_e = step_e(state_e, batch_e, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics_e["loss"]))


@pytest.mark.slow
def test_grad_accumulation_matches_single_step():
    """grad_accum_steps=k (optax.MultiSteps): k identical micro-batches
    accumulate into exactly one optimizer step — intermediate
    micro-steps leave parameters untouched, and the applied update
    equals the k=1 update on the same batch (mean of k identical grads
    is the grad)."""
    from visionllm_tpu.config import tiny_test_config as _ttc
    cfg = _ttc(use_gdino=False, use_unipose=False, use_sd=False,
               use_ip2p=False, use_region_encoder=False)
    model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    img_len = cfg.vis_encoder.num_patches
    ids = [1, 10, 11] + [TID.imp] * img_len + [12, 13, 14, 2]
    input_ids = jnp.tile(jnp.asarray([ids], jnp.int32), (2, 1))
    size = cfg.vis_encoder.image_size
    batch = {
        "input_ids": input_ids,
        "labels": jnp.where(input_ids >= 10, input_ids, -100),
        "attn_mask": jnp.ones_like(input_ids),
        "images": jnp.zeros((2, size, size, 3), jnp.float32),
    }
    from visionllm_tpu.train.train_step import make_chat_train_step
    params = model.init(jax.random.PRNGKey(0), batch, TID,
                        method=VisionLLMWithTools.forward_chat)["params"]

    opt = dict(learning_rate=5e-3, schedule="constant", total_steps=10)
    tx1 = build_optimizer(OptimizerConfig(**opt), params)
    txk = build_optimizer(OptimizerConfig(grad_accum_steps=2, **opt),
                          params)

    s1 = TrainState.create(params, tx1)
    sk = TrainState.create(params, txk)
    step1 = jax.jit(make_chat_train_step(model, tx1, TID))
    stepk = jax.jit(make_chat_train_step(model, txk, TID))

    sk_mid, _ = stepk(sk, batch, jax.random.PRNGKey(1))
    # micro-step 1 of 2: parameters must NOT move yet
    for a, b in zip(jax.tree_util.tree_leaves(sk_mid.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sk_done, _ = stepk(sk_mid, batch, jax.random.PRNGKey(1))
    s1_done, _ = step1(s1, batch, jax.random.PRNGKey(1))
    flat_k = jax.tree_util.tree_leaves(sk_done.params)
    flat_1 = jax.tree_util.tree_leaves(s1_done.params)
    for a, b in zip(flat_k, flat_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_grad_accumulation_sharded():
    """MultiSteps optimizer state (grad accumulator mirrors the param
    tree) shards under the FSDP/TP rules and the sharded accumulated
    step still matches: params frozen at micro-step 1, moved at 2."""
    mesh = build_mesh(n_data=4, n_model=2)
    from visionllm_tpu.config import tiny_test_config as _ttc
    cfg = _ttc(use_gdino=False, use_unipose=False, use_sd=False,
               use_ip2p=False, use_region_encoder=False)
    model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    img_len = cfg.vis_encoder.num_patches
    ids = [1, 10, 11] + [TID.imp] * img_len + [12, 13, 14, 2]
    input_ids = jnp.tile(jnp.asarray([ids], jnp.int32), (2, 1))
    size = cfg.vis_encoder.image_size
    batch = {
        "input_ids": input_ids,
        "labels": jnp.where(input_ids >= 10, input_ids, -100),
        "attn_mask": jnp.ones_like(input_ids),
        "images": jnp.zeros((2, size, size, 3), jnp.float32),
    }
    from visionllm_tpu.train.train_step import make_chat_train_step
    params = model.init(jax.random.PRNGKey(0), batch, TID,
                        method=VisionLLMWithTools.forward_chat)["params"]
    tx = build_optimizer(OptimizerConfig(learning_rate=5e-3,
                                         schedule="constant",
                                         total_steps=10,
                                         grad_accum_steps=2), params)
    state = TrainState.create(params, tx)
    step = make_chat_train_step(model, tx, TID)
    with mesh:
        jitted, state_s, batch_s = shard_train_step(step, mesh, state, batch)
        mid, _ = jitted(state_s, batch_s, jax.random.PRNGKey(1))
        done, _ = jitted(mid, batch_s, jax.random.PRNGKey(1))
        jax.block_until_ready(done.params)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(mid.params)),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(done.params)),
            jax.tree_util.tree_leaves(params)))
    assert moved > 0, "accumulated step never applied"


@pytest.mark.slow
def test_frozen_split_matches_full_tree_grads():
    """frozen-split mode (trainable-only diff; train_step.split_frozen)
    must produce the SAME parameters after a step as the full-tree mode
    with the optimizer's zero-frozen group — while keeping the frozen
    leaves byte-identical and the optimizer state O(trainable)."""
    from visionllm_tpu.train.train_step import split_frozen

    model = VisionLLMWithTools(CFG, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    batch = _det_batch(2)
    params = model.init(jax.random.PRNGKey(0), batch, TID)["params"]

    def frozen(path):
        # reference stage-1: vision encoder + LLM frozen
        return path.startswith(("core/vis_encoder", "core/llm"))

    opt = dict(learning_rate=1e-3, schedule="constant", total_steps=10)

    # full-tree mode: grads computed everywhere, frozen group zeroed
    tx_full = build_optimizer(OptimizerConfig(**opt), params,
                              frozen=frozen)
    s_full = TrainState.create(params, tx_full)
    step_full = jax.jit(make_det_train_step(model, tx_full, TID))
    s_full, m_full = step_full(s_full, batch, jax.random.PRNGKey(1))

    # split mode: optimizer + grads over the trainable subtree only
    train_tree, _ = split_frozen(params, frozen)
    tx_split = build_optimizer(OptimizerConfig(**opt), train_tree)
    s_split = TrainState.create(params, tx_split, frozen=frozen)
    step_split = jax.jit(make_det_train_step(model, tx_split, TID,
                                             frozen=frozen))
    s_split, m_split = step_split(s_split, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_full["loss"]),
                               float(m_split["loss"]), rtol=1e-6)

    # optimizer state is trainable-only in BOTH modes (multi_transform's
    # set_to_zero group stores no Adam moments), so sizes must agree;
    # the split mode's savings are in the gradient buffers + the pruned
    # frozen-prefix backward, proven by the identical-params check below
    size = lambda t: sum(np.prod(np.shape(x))           # noqa: E731
                         for x in jax.tree.leaves(t))
    assert size(s_split.opt_state) == size(s_full.opt_state)
    n_trainable = sum(np.prod(np.shape(x))
                      for x in jax.tree.leaves(train_tree))
    # mu + nu (+ per-group counts): ~2x trainable, nowhere near 2x total
    assert size(s_split.opt_state) < 2.5 * n_trainable

    flat_ref = dict(jax.tree_util.tree_leaves_with_path(params))
    flat_full = dict(jax.tree_util.tree_leaves_with_path(s_full.params))
    flat_split = dict(jax.tree_util.tree_leaves_with_path(s_split.params))
    assert flat_full.keys() == flat_split.keys()
    checked_frozen = checked_train = 0
    for path, a in flat_full.items():
        b, p0 = flat_split[path], flat_ref[path]
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if frozen(name):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(p0),
                                          err_msg=name)
            checked_frozen += 1
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7, err_msg=name)
            checked_train += 1
    assert checked_frozen > 0 and checked_train > 0
