"""Continuous batching (slots.py): per-request token streams must be
EXACTLY what `build_generate_fn` produces for each request alone —
regardless of when the request joined the batch and what else is
running in the other slots."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.generation import build_generate_fn
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM
from visionllm_tpu.slots import build_slot_fns

CFG = tiny_test_config()
TID = SpecialTokenIds.synthetic()
MAX_NEW = 10
L_PAD = 48          # common compiled prompt length (left-padded)


@pytest.fixture(scope="module")
def setup():
    model = VisionLLM(CFG, dtype=jnp.float32)
    img_len = CFG.vis_encoder.num_patches
    size = CFG.vis_encoder.image_size
    prompts = [
        [1, 5, 6] + [TID.imp] * img_len + [7, 8],
        [1] + [TID.imp] * img_len + [9, 10, 11, 12],
        [1, 13] + [TID.imp] * img_len + [14],
    ]
    rng = np.random.RandomState(0)
    images = rng.rand(len(prompts), size, size, 3).astype(np.float32)
    ids0 = jnp.asarray([prompts[0]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0,
                        jnp.asarray(images[:1]), TID)["params"]
    ref = build_generate_fn(model, TID, max_new_tokens=MAX_NEW,
                            max_len=128)
    solo = []
    for i, p in enumerate(prompts):
        out = ref(params, jnp.asarray([p], jnp.int32),
                  jnp.asarray(images[i:i + 1]))
        n = int(out["num_generated"])
        solo.append(np.asarray(out["out_tokens"][0, :n]))
    return model, params, prompts, images, solo


def _pad(prompt):
    n = len(prompt)
    ids = np.zeros((1, L_PAD), np.int32)
    mask = np.zeros((1, L_PAD), bool)
    ids[0, L_PAD - n:] = prompt
    mask[0, L_PAD - n:] = True
    return jnp.asarray(ids), jnp.asarray(mask)


def _drive(model, params, prompts, images, arrivals, n_slots=3):
    """Admit request i at decode-step arrivals[i]; run to completion.
    Returns the per-request token streams (first token + step tokens)."""
    init_state, prefill, insert, step = build_slot_fns(
        model, TID, n_slots=n_slots, max_len=128)
    state, slot_valid = init_state()
    streams = {}
    active = {}                       # slot -> request id
    t = 0
    pending = sorted(range(len(prompts)), key=lambda i: arrivals[i])
    while pending or active:
        while pending and arrivals[pending[0]] <= t:
            i = pending.pop(0)
            free = next(s for s in range(n_slots) if s not in active)
            ids, mask = _pad(prompts[i])
            pre = prefill(params, ids, jnp.asarray(images[i:i + 1]),
                          mask)
            state, slot_valid = insert(
                state, jnp.asarray(free), pre["first"], pre["embed"],
                pre["cache"], pre["valid"], slot_valid)
            streams[i] = [int(pre["first"])]
            active[free] = i
            if int(pre["first"]) == 2 or len(streams[i]) >= MAX_NEW:
                del active[free]
        if not active:
            t += 1
            continue
        out = step(params, state, slot_valid)
        state = out["state"]
        toks = np.asarray(out["token"])
        fins = np.asarray(out["finished"])
        for s in list(active):
            i = active[s]
            streams[i].append(int(toks[s]))
            if fins[s] or len(streams[i]) >= MAX_NEW:
                del active[s]
        t += 1
    return [np.asarray(streams[i]) for i in range(len(prompts))]


def test_simultaneous_arrivals_match_solo(setup):
    model, params, prompts, images, solo = setup
    streams = _drive(model, params, prompts, images, arrivals=[0, 0, 0])
    for i, (got, want) in enumerate(zip(streams, solo)):
        np.testing.assert_array_equal(got[:len(want)], want,
                                      err_msg=f"request {i}")


def test_staggered_arrivals_match_solo(setup):
    """Requests joining MID-DECODE of others: nobody's tokens change."""
    model, params, prompts, images, solo = setup
    streams = _drive(model, params, prompts, images, arrivals=[0, 3, 6])
    for i, (got, want) in enumerate(zip(streams, solo)):
        np.testing.assert_array_equal(got[:len(want)], want,
                                      err_msg=f"request {i}")


def test_slot_reuse_after_completion(setup):
    """More requests than slots: a freed slot serves a new request with
    no contamination from its previous occupant."""
    model, params, prompts, images, solo = setup
    # 2 slots, 3 requests: request 2 must wait for a free slot
    init_state, prefill, insert, step = build_slot_fns(
        model, TID, n_slots=2, max_len=128)
    state, slot_valid = init_state()
    streams = {i: [] for i in range(3)}
    active = {}
    queue = [0, 1, 2]
    guard = 0
    while (queue or active) and guard < 200:
        guard += 1
        while queue and len(active) < 2:
            i = queue.pop(0)
            free = next(s for s in range(2) if s not in active)
            ids, mask = _pad(prompts[i])
            pre = prefill(params, ids, jnp.asarray(images[i:i + 1]),
                          mask)
            state, slot_valid = insert(
                state, jnp.asarray(free), pre["first"], pre["embed"],
                pre["cache"], pre["valid"], slot_valid)
            streams[i].append(int(pre["first"]))
            active[free] = i
        out = step(params, state, slot_valid)
        state = out["state"]
        toks = np.asarray(out["token"])
        fins = np.asarray(out["finished"])
        for s in list(active):
            i = active[s]
            streams[i].append(int(toks[s]))
            if fins[s] or len(streams[i]) >= MAX_NEW:
                del active[s]
    for i in range(3):
        want = solo[i]
        got = np.asarray(streams[i])
        np.testing.assert_array_equal(got[:len(want)], want,
                                      err_msg=f"request {i}")


def test_tool_countdown_in_slot(setup):
    """A [DET]-triggered forced-[EMB] run inside a shared batch."""
    model, params, prompts, images, solo = setup
    init_state, prefill, insert, step = build_slot_fns(
        model, TID, n_slots=2, max_len=128)
    state, slot_valid = init_state()
    ids, mask = _pad(prompts[0])
    pre = prefill(params, ids, jnp.asarray(images[:1]), mask,
                  first_token=jnp.asarray(TID.det))
    state, slot_valid = insert(state, jnp.asarray(0), pre["first"],
                               pre["embed"], pre["cache"], pre["valid"],
                               slot_valid)
    # neighbor traffic in slot 1
    ids1, mask1 = _pad(prompts[1])
    pre1 = prefill(params, ids1, jnp.asarray(images[1:2]), mask1)
    state, slot_valid = insert(state, jnp.asarray(1), pre1["first"],
                               pre1["embed"], pre1["cache"],
                               pre1["valid"], slot_valid)
    toks = [int(pre["first"])]
    for _ in range(MAX_NEW - 1):
        out = step(params, state, slot_valid)
        state = out["state"]
        toks.append(int(np.asarray(out["token"])[0]))
    ref = build_generate_fn(model, TID, max_new_tokens=MAX_NEW,
                            max_len=128)
    want = np.asarray(ref(params, jnp.asarray([prompts[0]], jnp.int32),
                          jnp.asarray(images[:1]), TID.det
                          )["out_tokens"][0])
    np.testing.assert_array_equal(np.asarray(toks), want[:len(toks)])
    assert toks[0] == TID.det
    np.testing.assert_array_equal(
        toks[1:1 + CFG.num_embs],
        [TID.emb + i for i in range(CFG.num_embs)])


def _extend_valid(mask, max_len=128):
    return jnp.concatenate(
        [mask[0], jnp.ones((max_len - mask.shape[1],), bool)])


def test_chunked_prefill_matches_monolithic(setup):
    """Running the prompt through the LLM in 16-token windows must
    yield the same first token and the same subsequent decode stream
    as the one-shot prefill."""
    from visionllm_tpu.slots import build_chunked_prefill_fns

    model, params, prompts, images, solo = setup
    init_state, prefill, insert, step = build_slot_fns(
        model, TID, n_slots=1, max_len=128)
    new_row, embed_prompt, prefill_chunk, finish = (
        build_chunked_prefill_fns(model, TID, chunk=16, max_len=128))

    for i in range(2):
        ids, mask = _pad(prompts[i])            # L_PAD=48 → 3 chunks
        emb = embed_prompt(params, ids, jnp.asarray(images[i:i + 1]))
        cache_row = new_row()
        valid = _extend_valid(mask)
        last = None
        for k in range(L_PAD // 16):
            cache_row, last = prefill_chunk(
                params, emb[:, k * 16:(k + 1) * 16], cache_row, valid)
        first, embed, _ = finish(params, last)

        mono = prefill(params, ids, jnp.asarray(images[i:i + 1]), mask)
        assert int(first[0]) == int(mono["first"]), f"req {i}"

        # same decode stream through a slot
        state, slot_valid = init_state()
        state, slot_valid = insert(state, jnp.asarray(0), first[0],
                                   embed, cache_row, valid, slot_valid)
        toks = [int(first[0])]
        for _ in range(MAX_NEW - 1):
            out = step(params, state, slot_valid)
            state = out["state"]
            toks.append(int(np.asarray(out["token"])[0]))
        want = solo[i]
        np.testing.assert_array_equal(
            np.asarray(toks[:len(want)]), want, err_msg=f"req {i}")


def test_chunked_prefill_interleaved_with_decode(setup):
    """Decode steps for a live slot BETWEEN the chunks of a new
    admission: neither request's stream changes."""
    from visionllm_tpu.slots import build_chunked_prefill_fns

    model, params, prompts, images, solo = setup
    init_state, prefill, insert, step = build_slot_fns(
        model, TID, n_slots=2, max_len=128)
    new_row, embed_prompt, prefill_chunk, finish = (
        build_chunked_prefill_fns(model, TID, chunk=16, max_len=128))

    # request 0 admitted monolithically and decoding
    ids0, mask0 = _pad(prompts[0])
    pre0 = prefill(params, ids0, jnp.asarray(images[:1]), mask0)
    state, slot_valid = init_state()
    state, slot_valid = insert(state, jnp.asarray(0), pre0["first"],
                               pre0["embed"], pre0["cache"],
                               pre0["valid"], slot_valid)
    s0 = [int(pre0["first"])]

    # request 1 prefills in chunks; slot 0 decodes between chunks
    ids1, mask1 = _pad(prompts[1])
    emb = embed_prompt(params, ids1, jnp.asarray(images[1:2]))
    cache_row = new_row()
    valid1 = _extend_valid(mask1)
    last = None
    for k in range(L_PAD // 16):
        cache_row, last = prefill_chunk(
            params, emb[:, k * 16:(k + 1) * 16], cache_row, valid1)
        out = step(params, state, slot_valid)
        state = out["state"]
        s0.append(int(np.asarray(out["token"])[0]))
    first1, embed1, _ = finish(params, last)
    state, slot_valid = insert(state, jnp.asarray(1), first1[0], embed1,
                               cache_row, valid1, slot_valid)
    s1 = [int(first1[0])]
    while len(s0) < MAX_NEW or len(s1) < MAX_NEW:
        out = step(params, state, slot_valid)
        state = out["state"]
        toks = np.asarray(out["token"])
        if len(s0) < MAX_NEW:
            s0.append(int(toks[0]))
        if len(s1) < MAX_NEW:
            s1.append(int(toks[1]))
    np.testing.assert_array_equal(np.asarray(s0[:len(solo[0])]), solo[0])
    np.testing.assert_array_equal(np.asarray(s1[:len(solo[1])]), solo[1])


@pytest.mark.slow
def test_tp_sharded_slot_step_matches_unsharded(setup):
    """Continuous batching under a {data, model} mesh — the serving
    configuration for 7B on v5e-8. Params FSDP+TP sharded; XLA
    propagates shardings through the vmapped per-slot step and emits
    the collectives. Streams must match the unsharded slots run."""
    from visionllm_tpu.parallel.mesh import build_mesh, shard_params

    model, params, prompts, images, solo = setup
    mesh = build_mesh(n_data=4, n_model=2)
    with mesh:
        sharded = jax.device_put(params, shard_params(params, mesh))
        streams = _drive(model, sharded, prompts, images,
                         arrivals=[0, 2, 4])
    for i, (got, want) in enumerate(zip(streams, solo)):
        np.testing.assert_array_equal(got[:len(want)], want,
                                      err_msg=f"request {i}")


def test_span_step_matches_single_steps(setup):
    """span>1 (multi-token device ticks) must emit exactly the frames
    that span=1 produces, including a slot EOSing MID-span."""
    model, params, prompts, images, solo = setup
    init1, prefill, insert, step1 = build_slot_fns(
        model, TID, n_slots=2, max_len=128)
    init4, _, insert4, step4 = build_slot_fns(
        model, TID, n_slots=2, max_len=128, span=4)

    def admit(insert_fn, state, slot_valid, slot, i):
        ids, mask = _pad(prompts[i])
        pre = prefill(params, ids, jnp.asarray(images[i:i + 1]), mask)
        state, slot_valid = insert_fn(
            state, jnp.asarray(slot), pre["first"], pre["embed"],
            pre["cache"], pre["valid"], slot_valid)
        return state, slot_valid, int(pre["first"])

    s1, v1 = init1()
    s4, v4 = init4()
    firsts = {}
    for slot, i in ((0, 0), (1, 1)):
        s1, v1, f = admit(insert, s1, v1, slot, i)
        s4, v4, firsts[slot] = admit(insert4, s4, v4, slot, i)
        assert f == firsts[slot]

    frames1 = []
    for _ in range(8):
        out = step1(params, s1, v1)
        s1 = out["state"]
        frames1.append((np.asarray(out["token"]),
                        np.asarray(out["finished"])))
    toks4, fins4 = [], []
    for _ in range(2):
        out = step4(params, s4, v4)
        s4 = out["state"]
        toks4.append(np.asarray(out["token"]))
        fins4.append(np.asarray(out["finished"]))
    toks4 = np.concatenate(toks4, axis=0)       # [8, S]
    fins4 = np.concatenate(fins4, axis=0)
    assert toks4.shape == (8, 2)
    for t, (tok1, fin1) in enumerate(frames1):
        np.testing.assert_array_equal(toks4[t], tok1, err_msg=f"t={t}")
        np.testing.assert_array_equal(fins4[t], fin1, err_msg=f"t={t}")
