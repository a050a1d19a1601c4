"""Session (multi-turn prefix) KV reuse for continuous batching.

Contract: a follow-up turn served through a parked session — only its
NEW tokens run through the LLM — produces exactly the tokens the
full-history re-prefill path produces. Device-level exactness is
checked against monolithic prefill of the whole (prompt + generated +
delta) sequence; service-level behavior (hit, fallback on prefix
mismatch, LRU eviction) over the real scheduler.
"""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.mock_tokenizer import MockTokenizer
from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM
from visionllm_tpu.serve import ChatService
from visionllm_tpu.slots import build_session_fns, build_slot_fns

CFG = tiny_test_config()
TID = SpecialTokenIds.synthetic()
L_PAD = 96
MAX_LEN = 192
CHUNK = 8


from visionllm_tpu.utils.simple_tokenizer import RoundTripTokenizer


# ---------------------------------------------------------------- #
# device level: extension == monolithic prefill                     #
# ---------------------------------------------------------------- #

@pytest.fixture(scope="module")
def dev():
    model = VisionLLM(CFG, dtype=jnp.float32)
    img_len = CFG.vis_encoder.num_patches
    size = CFG.vis_encoder.image_size
    prompt1 = [1, 5, 6] + [TID.imp] * img_len + [7, 8]
    rng = np.random.RandomState(0)
    image = rng.rand(1, size, size, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray([prompt1], jnp.int32),
                        jnp.asarray(image), TID)["params"]
    return model, params, prompt1, image


def _pad(prompt):
    n = len(prompt)
    ids = np.zeros((1, L_PAD), np.int32)
    mask = np.zeros((1, L_PAD), bool)
    ids[0, L_PAD - n:] = prompt
    mask[0, L_PAD - n:] = True
    return jnp.asarray(ids), jnp.asarray(mask)


def _decode_n(step, params, state, slot_valid, slot, n):
    toks = []
    for _ in range(n):
        out = step(params, state, slot_valid)
        state = out["state"]
        toks.append(int(np.asarray(out["token"])[slot]))
        if bool(np.asarray(out["finished"])[slot]):
            break
    return toks, state


@pytest.mark.parametrize("delta_len", [3, 11])
def test_extension_matches_monolithic_prefill(dev, delta_len):
    """Turn-1 decode → park → extend with a delta (1 and 2 windows,
    exercising the right-pad index rollback) must produce the stream
    monolithic prefill of the full token sequence produces."""
    model, params, prompt1, image = dev
    init_state, prefill, insert, step = build_slot_fns(
        model, TID, n_slots=2, max_len=MAX_LEN)
    extract, embed_delta, extend, finish, kill = build_session_fns(model)

    # ---- turn 1 in slot 0
    state, slot_valid = init_state()
    ids, mask = _pad(prompt1)
    pre = prefill(params, ids, jnp.asarray(image), mask)
    state, slot_valid = insert(state, jnp.asarray(0), pre["first"],
                               pre["embed"], pre["cache"], pre["valid"],
                               slot_valid)
    t1 = 5
    stream1, state = _decode_n(step, params, state, slot_valid, 0, t1)
    stream1 = [int(pre["first"])] + stream1
    state = kill(state, jnp.asarray(0))

    cached = list(prompt1) + stream1[:-1]
    delta = list(range(200, 200 + delta_len))
    full2 = cached + delta

    # ---- reference: monolithic prefill of the full sequence in slot 1
    ids2, mask2 = _pad(full2)
    ref_pre = prefill(params, ids2, jnp.asarray(image), mask2)
    ref_state, ref_valid = init_state()
    ref_state, ref_valid = insert(
        ref_state, jnp.asarray(1), ref_pre["first"], ref_pre["embed"],
        ref_pre["cache"], ref_pre["valid"], ref_valid)
    ref_stream, _ = _decode_n(step, params, ref_state, ref_valid, 1, 6)
    ref_stream = [int(ref_pre["first"])] + ref_stream

    # ---- session path: extend slot 0's cache with the delta
    row, valid_row = extract(state, slot_valid, jnp.asarray(0))
    assert int(row.index) == L_PAD + len(stream1) - 1
    d = len(delta)
    dp = np.concatenate([np.asarray(delta, np.int32),
                         np.zeros(((-d) % CHUNK,), np.int32)])
    emb = embed_delta(params, jnp.asarray(dp[None]))
    last = None
    for k in range(len(dp) // CHUNK):
        n_real = min(CHUNK, d - k * CHUNK)
        row, last = extend(params, emb[:, k * CHUNK:(k + 1) * CHUNK],
                           row, valid_row,
                           jnp.asarray(n_real, jnp.int32))
    # fill index rolled back over the window pads
    assert int(row.index) == L_PAD + len(stream1) - 1 + d
    first_t, embed, _lp = finish(params, last)
    state, slot_valid = insert(state, jnp.asarray(0), first_t[0], embed,
                               row, valid_row, slot_valid)
    sess_stream, _ = _decode_n(step, params, state, slot_valid, 0, 6)
    sess_stream = [int(first_t[0])] + sess_stream

    assert sess_stream == ref_stream


def test_session_fns_reject_int8_kv():
    import dataclasses
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, kv_quant="int8"))
    with pytest.raises(ValueError, match="int8"):
        build_session_fns(VisionLLM(cfg, dtype=jnp.float32))


# ---------------------------------------------------------------- #
# service level: scheduler hit / fallback / eviction                #
# ---------------------------------------------------------------- #

@pytest.fixture(scope="module")
def svc():
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = RoundTripTokenizer()
    s = ChatService(cfg, None, tok,
                    image_size=cfg.vis_encoder.image_size,
                    max_new_tokens=6, max_prompt=160, slots=3,
                    sessions=2, session_chunk=8, dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [s.tid.imp] * img_len + [5, 6]], jnp.int32)
    s.params = s.core.init(
        jax.random.PRNGKey(7), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), s.tid)["params"]
    return s


def test_session_turn2_matches_history_prefill(svc):
    img = np.random.RandomState(3).randint(0, 255, (40, 56, 3),
                                           np.uint8)
    r1 = svc.generate("hello there", image=img, session="s1")
    assert r1["session_reused"] is False
    hist = ["hello there", r1["text"]]
    # reference: full-history re-prefill (no session key)
    want = svc.generate("and now this", image=img, history=hist)
    got = svc.generate("and now this", image=img, history=hist,
                       session="s1")
    assert got["session_reused"] is True, svc.metrics()
    assert got["text"] == want["text"]
    # turn 3 extends the extended cache again
    hist3 = hist + ["and now this", got["text"]]
    want3 = svc.generate("third turn", image=img, history=hist3)
    got3 = svc.generate("third turn", image=img, history=hist3,
                        session="s1")
    assert got3["session_reused"] is True
    assert got3["text"] == want3["text"]
    m = svc.metrics()
    assert m["session_hits"] >= 2


def test_session_prefix_mismatch_falls_back(svc):
    r1 = svc.generate("fresh start", session="s2")
    assert r1["session_reused"] is False
    # doctored history that cannot match the cached prefix
    bad_hist = ["fresh start", "completely made up reply"]
    want = svc.generate("next", history=bad_hist)
    got = svc.generate("next", history=bad_hist, session="s2")
    assert got["session_reused"] is False
    assert got["text"] == want["text"]


def test_session_lru_eviction(svc):
    # park more sessions than the budget (2); oldest gets evicted and
    # its follow-up falls back to a full prefill — still correct
    for sid in ("e1", "e2", "e3"):
        svc.generate(f"opening for {sid}", session=sid)
    assert len(svc._sessions) <= 2
    hist = ["opening for e1",
            svc.generate("opening for e1")["text"]]
    # e1 was evicted: reuse misses but the answer is still right
    want = svc.generate("follow up", history=hist)
    got = svc.generate("follow up", history=hist, session="e1")
    assert got["session_reused"] is False
    assert got["text"] == want["text"]


def test_session_requires_slots_and_no_sampling():
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    with pytest.raises(ValueError, match="slots"):
        ChatService(cfg, None, MockTokenizer(),
                    image_size=cfg.vis_encoder.image_size,
                    sessions=2, dtype=jnp.float32)
    with pytest.raises(ValueError, match="sampling"):
        ChatService(cfg, None, MockTokenizer(),
                    image_size=cfg.vis_encoder.image_size,
                    slots=2, sessions=2, sampling=True,
                    dtype=jnp.float32)


def test_session_without_server_support_rejected(svc):
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    plain = ChatService(cfg, None, MockTokenizer(),
                        image_size=cfg.vis_encoder.image_size,
                        max_new_tokens=4, max_prompt=64,
                        dtype=jnp.float32)
    with pytest.raises(ValueError, match="session"):
        plain.generate("hi", session="x")


def test_concurrent_sessions_dont_cross(svc):
    """Two sessions interleaving turns keep independent contexts."""
    ra = svc.generate("alpha opening", session="c1")
    rb = svc.generate("beta opening", session="c2")
    hist_a = ["alpha opening", ra["text"]]
    hist_b = ["beta opening", rb["text"]]
    outs = {}

    def go(name, prompt, hist, sid):
        outs[name] = svc.generate(prompt, history=hist, session=sid)

    ths = [threading.Thread(target=go,
                            args=("a", "alpha next", hist_a, "c1")),
           threading.Thread(target=go,
                            args=("b", "beta next", hist_b, "c2"))]
    for t in ths:
        t.start()
    for t in ths:
        t.join(timeout=300)
    want_a = svc.generate("alpha next", history=hist_a)
    want_b = svc.generate("beta next", history=hist_b)
    assert outs["a"]["text"] == want_a["text"]
    assert outs["b"]["text"] == want_b["text"]


def test_session_image_swap_falls_back(svc):
    """Same history, different image pixels: ids alone can't tell the
    images apart (the <image> placeholder expands identically), so the
    parked entry's pixel fingerprint must force a full prefill."""
    img_a = np.random.RandomState(11).randint(0, 255, (40, 56, 3),
                                              np.uint8)
    img_b = np.random.RandomState(12).randint(0, 255, (40, 56, 3),
                                              np.uint8)
    r1 = svc.generate("look at this", image=img_a, session="im1")
    hist = ["look at this", r1["text"]]
    want = svc.generate("what now", image=img_b, history=hist)
    got = svc.generate("what now", image=img_b, history=hist,
                       session="im1")
    assert got["session_reused"] is False
    assert got["text"] == want["text"]
    # the re-parked session (img_b) hits again on the next turn
    hist2 = hist + ["what now", got["text"]]
    again = svc.generate("go on", image=img_b, history=hist2,
                         session="im1")
    assert again["session_reused"] is True


def test_session_padded_overflow_falls_back(svc):
    """The room check must budget the delta right-padded to
    session_chunk — an overrun would be clamped by dynamic_update_slice
    and silently corrupt cached K/V, so it must miss instead."""
    r1 = svc.generate("grow me", session="of1")
    ent = svc._sessions["of1"]
    # fabricate a fill level where delta(+response) fits un-padded but
    # the chunk-padded last window would overrun the KV buffer
    E = svc.session_chunk
    hist = ["grow me", r1["text"]]
    # a follow-up delta of a few tokens pads to one full E window
    ent["fill"] = svc.slot_max_len - E + 1
    got = svc.generate("hm", history=hist, session="of1")
    assert got["session_reused"] is False  # guard forced the miss
