"""Continuous batching: requests join and leave the decode batch
mid-flight (slot-based serving, the vLLM scheduling model without
paging — one static KV region per slot).

The static micro-batching of `serve.ChatService` (`--max-batch`) runs
each coalesced batch to completion: a short answer waits for the
longest one in its batch, and a request arriving mid-decode waits for
the whole batch. Here the decode batch is a set of SLOTS with
independent fill levels:

  * `prefill(params, ids, images, attn_mask)` — one request's prompt
    through the full vision+LLM prefill (left-padded to the compiled
    length), returning its first sampled token, next-step embedding,
    and a single-row KV cache.
  * `insert(state, slot, pre)` — copy that row into slot `slot` of the
    persistent multi-slot state (one `dynamic_update_slice` per cache
    buffer; O(1) programs, `slot` is a traced scalar).
  * `step(params, state)` — ONE token for every live slot. Each slot
    attends its own history under its own fill level: the single-row
    decode step (scalar cache index — the machinery `build_generate_fn`
    compiles) is `jax.vmap`-ed over slots, so per-slot positions,
    causal masks, and cache writes all fall out of the existing
    scalar-index path. Dead slots compute too (static shapes) but
    neither advance their index nor surface tokens.

The tool-token state machine ([DET]/[GEN]/... → forced [EMB] rows,
generation.py) runs per-slot inside `step`, so perception/generation
triggers decode correctly mid-batch.

Equivalence contract: a request decoded through slots — at any
arrival time, next to any other traffic — produces exactly the tokens
`build_generate_fn` produces for it alone (tests/test_slots.py).

Host-side scheduling (admission, eviction, HTTP) lives in
`serve.SlotScheduler`; this module is the device program set.

Reference: the upstream serves nothing (generation is offline bs=1,
evaluate_vqa.py:531); this is a capability extension for production
serving. Design per the continuous-batching literature (Orca/vLLM),
re-shaped for XLA: fixed shapes, no paging, host drives admission.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from visionllm_tpu import constants as C
from visionllm_tpu.generation import _tool_kind
from visionllm_tpu.models.llama import KVCache
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM


@flax.struct.dataclass
class SlotState:
    cache: KVCache              # index: [S] int32 — PER-SLOT fill level
    cur_embed: jnp.ndarray      # [S, 1, C] next decode input per slot
    emb_countdown: jnp.ndarray  # [S] int32
    emb_kind: jnp.ndarray       # [S] int32
    live: jnp.ndarray           # [S] bool
    temperature: jnp.ndarray = None  # [S] f32 (0 = greedy per slot)
    top_p: jnp.ndarray = None        # [S] f32
    rng: jnp.ndarray = None          # PRNG key (sampling builds only)


def build_slot_fns(
    model: VisionLLM,
    tid: SpecialTokenIds,
    *,
    n_slots: int,
    max_len: int = 4096,
    eos_id: int = 2,
    sampling: bool = False,
    span: int = 1,
):
    """Returns (init_state, prefill, insert, step) — all jitted except
    init_state. `step` emits one token per slot per call; the host
    reads them, detects per-slot EOS/length stop, and frees slots.

    ``span > 1`` returns a MULTI-token step: a `lax.scan` of `span`
    single-token ticks inside one device program, emitting stacked
    `token`/`logprob`/`finished` of shape [span, S]. One host↔device
    round trip then costs `span` tokens instead of one — on a relay
    link with O(10 ms) RTT this is the difference between ~50 and
    ~150+ aggregate tok/s (bench_serve --decode-span). Per-slot EOS is
    exact (a slot that ends mid-span stops advancing via `live`);
    the tradeoffs are admission/stream latency quantized to `span`
    tokens and up to `span-1` discarded tokens past a host-side
    length stop.

    ``sampling=True`` compiles per-slot temperature/top-p sampling
    (generation.sample_token): each slot carries its own settings
    (0 = greedy) and the state carries one PRNG key split per tick —
    per-request seeds are not reproducible in a shared batch."""
    cfg = model.cfg
    num_embs, num_embs_gen = cfg.num_embs, cfg.num_embs_gen
    cache_dtype = (jnp.int8 if cfg.llm.kv_quant == "int8"
                   else model.dtype)
    quant_kv = cache_dtype == jnp.int8
    hid = cfg.llm.hidden_size

    def init_state():
        """Returns (state, slot_valid): slot_valid [S, max_len] is the
        per-slot buffer mask (True where the slot's cache positions are
        attendable — prompt pads stay False for the slot's lifetime)."""
        cache = KVCache.create(cfg.llm, n_slots, max_len,
                               dtype=cache_dtype)
        cache = cache.replace(
            index=jnp.zeros((n_slots,), jnp.int32))
        state = SlotState(
            cache=cache,
            cur_embed=jnp.zeros((n_slots, 1, hid), model.dtype),
            emb_countdown=jnp.zeros((n_slots,), jnp.int32),
            emb_kind=jnp.zeros((n_slots,), jnp.int32),
            live=jnp.zeros((n_slots,), bool),
            temperature=(jnp.zeros((n_slots,), jnp.float32)
                         if sampling else None),
            top_p=(jnp.ones((n_slots,), jnp.float32)
                   if sampling else None),
            rng=jax.random.PRNGKey(0) if sampling else None,
        )
        return state, jnp.ones((n_slots, max_len), bool)

    def prefill(params, input_ids: jnp.ndarray,
                images: Optional[jnp.ndarray],
                attn_mask: Optional[jnp.ndarray] = None,
                regions: Optional[jnp.ndarray] = None,
                first_token: Optional[jnp.ndarray] = None,
                rng: Optional[jnp.ndarray] = None,
                temperature: Optional[jnp.ndarray] = None,
                top_p: Optional[jnp.ndarray] = None
                ) -> Dict[str, Any]:
        """[1, Lp] prompt → first token + embedding + single-row cache.
        Left-pad under attn_mask for the one-compiled-shape contract."""
        from visionllm_tpu.generation import _token_logprob, sample_token
        cache = KVCache.create(cfg.llm, 1, max_len, dtype=cache_dtype)
        out = model.apply({"params": params}, input_ids, images, tid,
                          attn_mask=attn_mask, cache=cache,
                          regions=regions)
        if sampling:
            t1 = (jnp.zeros((1,), jnp.float32) if temperature is None
                  else jnp.broadcast_to(
                      jnp.asarray(temperature, jnp.float32), (1,)))
            p1 = (jnp.ones((1,), jnp.float32) if top_p is None
                  else jnp.broadcast_to(
                      jnp.asarray(top_p, jnp.float32), (1,)))
            key = rng if rng is not None else jax.random.PRNGKey(0)
            first = sample_token(out["logits"][:, -1, :], key, t1, p1)
        else:
            first = jnp.argmax(out["logits"][:, -1, :], axis=-1
                               ).astype(jnp.int32)
        if first_token is not None:
            first = jnp.broadcast_to(
                jnp.asarray(first_token, jnp.int32), first.shape)
        embed = model.apply({"params": params}, first[:, None],
                            method=VisionLLM.embed_tokens)
        # buffer-valid mask for decode: pads invisible forever
        if attn_mask is not None:
            valid = jnp.concatenate(
                [attn_mask.astype(bool)[0],
                 jnp.ones((max_len - input_ids.shape[1],), bool)])
        else:
            valid = jnp.ones((max_len,), bool)
        return {"first": first[0], "embed": embed,
                "logprob": _token_logprob(out["logits"][:, -1, :],
                                          first)[0],
                "cache": out["cache"], "valid": valid}

    def insert(state: SlotState, slot: jnp.ndarray, first: jnp.ndarray,
               embed: jnp.ndarray, row_cache: KVCache,
               valid: jnp.ndarray, slot_valid: jnp.ndarray,
               temperature: jnp.ndarray = 0.0, top_p: jnp.ndarray = 1.0
               ) -> SlotState:
        """Copy a prefilled request into slot `slot` (traced scalar).
        `slot_valid` is the [S, max_len] per-slot buffer mask carried
        alongside (returned updated — see step())."""
        c = state.cache
        k = jax.lax.dynamic_update_slice(c.k, row_cache.k,
                                         (0, slot, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(c.v, row_cache.v,
                                         (0, slot, 0, 0, 0))
        if quant_kv:
            ks = jax.lax.dynamic_update_slice(
                c.k_scale, row_cache.k_scale, (0, slot, 0, 0))
            vs = jax.lax.dynamic_update_slice(
                c.v_scale, row_cache.v_scale, (0, slot, 0, 0))
        else:
            ks = vs = None
        index = c.index.at[slot].set(row_cache.index)
        kind0 = _tool_kind(first, tid)
        total0 = jnp.where(kind0 >= C.TOOL_GEN, num_embs_gen, num_embs)
        new_state = SlotState(
            cache=KVCache(k=k, v=v, index=index, k_scale=ks, v_scale=vs),
            cur_embed=jax.lax.dynamic_update_slice(
                state.cur_embed, embed.astype(state.cur_embed.dtype),
                (slot, 0, 0)),
            emb_countdown=state.emb_countdown.at[slot].set(
                jnp.where(kind0 > 0, total0, 0)),
            emb_kind=state.emb_kind.at[slot].set(kind0),
            live=state.live.at[slot].set(first != eos_id),
            temperature=(None if state.temperature is None else
                         state.temperature.at[slot].set(
                             jnp.asarray(temperature, jnp.float32))),
            top_p=(None if state.top_p is None else
                   state.top_p.at[slot].set(
                       jnp.asarray(top_p, jnp.float32))),
            rng=state.rng,
        )
        slot_valid = jax.lax.dynamic_update_slice(
            slot_valid, valid[None], (slot, 0))
        return new_state, slot_valid

    # ---- one decode step for ONE slot (scalar cache index) ----------
    def _row_step(params, e_row, k, v, ks, vs, idx, valid_row):
        row_cache = KVCache(
            k=k[:, None], v=v[:, None], index=idx,
            k_scale=None if ks is None else ks[:, None],
            v_scale=None if vs is None else vs[:, None])
        pos = jnp.broadcast_to(idx[None, None], (1, 1)).astype(jnp.int32)
        out = model.apply({"params": params}, e_row[None], pos,
                          row_cache, valid_row[None],
                          method=VisionLLM.llm_step)
        nc = out["cache"]
        return (out["logits"][0], out["hidden"][0],
                nc.k[:, 0], nc.v[:, 0],
                None if nc.k_scale is None else nc.k_scale[:, 0],
                None if nc.v_scale is None else nc.v_scale[:, 0])

    def step(params, state: SlotState, slot_valid: jnp.ndarray
             ) -> Dict[str, Any]:
        """One token for every slot. Returns dict with `state`,
        `token` [S] (0 on dead slots), `done` [S] (newly finished)."""
        c = state.cache
        if quant_kv:
            logits, hidden, nk, nv, nks, nvs = jax.vmap(
                _row_step, in_axes=(None, 0, 1, 1, 1, 1, 0, 0),
                out_axes=(0, 0, 1, 1, 1, 1))(
                    params, state.cur_embed, c.k, c.v, c.k_scale,
                    c.v_scale, c.index, slot_valid)
        else:
            def _row_nq(params, e_row, k, v, idx, valid_row):
                out = _row_step(params, e_row, k, v, None, None, idx,
                                valid_row)
                return out[0], out[1], out[2], out[3]

            logits, hidden, nk, nv = jax.vmap(
                _row_nq, in_axes=(None, 0, 1, 1, 0, 0),
                out_axes=(0, 0, 1, 1))(
                    params, state.cur_embed, c.k, c.v, c.index,
                    slot_valid)
            nks = nvs = None

        from visionllm_tpu.generation import _token_logprob, sample_token
        new_rng = state.rng
        if sampling:
            new_rng, sub = jax.random.split(state.rng)
            sampled = sample_token(logits[:, -1, :], sub,
                                   state.temperature, state.top_p)
        else:
            sampled = jnp.argmax(logits[:, -1, :], axis=-1
                                 ).astype(jnp.int32)

        # per-slot emb-countdown machine (shared with the step-by-step
        # loop — generation.advance_tool_state)
        from visionllm_tpu.generation import advance_tool_state
        forcing = state.emb_countdown > 0
        next_token, next_embed, countdown, kind = advance_tool_state(
            model, params, tid, num_embs, num_embs_gen,
            sampled, state.emb_countdown, state.emb_kind)

        ended = (~forcing) & (sampled == eos_id)
        live = state.live
        token_out = jnp.where(live, next_token, 0)
        # dead slots do not advance (their garbage writes land on the
        # same masked position until the slot is reused)
        index = jnp.where(live, c.index + 1, c.index)

        new_state = SlotState(
            cache=KVCache(k=nk, v=nv, index=index,
                          k_scale=nks, v_scale=nvs),
            cur_embed=next_embed,
            emb_countdown=jnp.where(live, countdown,
                                    state.emb_countdown),
            emb_kind=jnp.where(live, kind, state.emb_kind),
            live=live & ~ended,
            temperature=state.temperature,
            top_p=state.top_p,
            rng=new_rng,
        )
        return {"state": new_state, "token": token_out,
                "hidden": hidden[:, -1, :].astype(jnp.float32),
                "logprob": jnp.where(
                    live, _token_logprob(logits[:, -1, :], next_token),
                    0.0),
                "finished": live & ended}

    if span > 1:
        def step_span(params, state: SlotState, slot_valid: jnp.ndarray
                      ) -> Dict[str, Any]:
            def body(st, _):
                out = step(params, st, slot_valid)
                return out["state"], (out["token"], out["logprob"],
                                      out["finished"])
            new_state, (toks, lps, fins) = jax.lax.scan(
                body, state, None, length=span)
            return {"state": new_state, "token": toks,
                    "logprob": lps, "finished": fins}
        step_fn = jax.jit(step_span, donate_argnums=(1,))
    else:
        step_fn = jax.jit(step, donate_argnums=(1,))

    return (init_state, jax.jit(prefill),
            jax.jit(insert, donate_argnums=(0, 6)), step_fn)


def _llm_window(model: VisionLLM, params, emb_chunk: jnp.ndarray,
                cache_row: KVCache, valid_row: jnp.ndarray):
    """One cached-extend LLM window (shared by chunked prefill, session
    extension): positions continue from the row's fill index."""
    pos = (cache_row.index
           + jnp.arange(emb_chunk.shape[1]))[None].astype(jnp.int32)
    return model.apply({"params": params}, emb_chunk, pos, cache_row,
                       valid_row[None], method=VisionLLM.llm_window)


def _greedy_finish(model: VisionLLM):
    """(params, last_logits) -> (first_token [1], its embed, logprob) —
    the shared admission tail after the last prefill/extend window."""

    def finish(params, last_logits):
        from visionllm_tpu.generation import _token_logprob
        first = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        embed = model.apply({"params": params}, first[:, None],
                            method=VisionLLM.embed_tokens)
        return first, embed, _token_logprob(last_logits, first)[0]

    return finish


def build_session_fns(model: VisionLLM):
    """Session (multi-turn prefix) KV reuse for continuous batching —
    the vLLM "prefix caching" idea restricted to the exact
    previous-conversation prefix.

    A finished chat turn's slot KV is PARKED instead of freed; the
    follow-up turn runs only its NEW tokens (the delta after the cached
    prefix) through the cached-extend LLM window, skipping the
    re-prefill of the whole conversation — including the vision encode,
    whose K/V are already in the cache.

    Exactness: the delta window is right-padded to the host's chosen
    window width (`ChatService(session_chunk=...)`); after
    each window the row's fill index is rolled BACK over the pads, so
    the next write overwrites their garbage K/V before any position
    above the fill index ever becomes attendable (`llama.py` decode
    bias: j <= cache.index), and positions stay gap-free. Extension is
    therefore the same computation as prefilling the full history
    (tests/test_sessions.py asserts token-identical streams).

    Returns (extract_row, embed_delta, extend_window, finish, kill):
      * extract_row(state, slot_valid, slot) -> (row_cache, valid_row)
        — copy a parked slot's cache out of the multi-slot state;
      * embed_delta(params, ids [1, E]) — plain token embeddings (the
        host guards that the delta has no image/region/[EMB] tokens,
        which would need the prompt-assembly splices);
      * extend_window(params, emb [1, W, C], row_cache, valid_row,
        n_real) -> (row_cache', last_logits [1, V]) — one window;
        `last_logits` is row n_real-1 (the last REAL token);
      * finish(params, last_logits) -> (first [1], embed, logprob);
      * kill(state, slot) — mark a slot dead on device so a parked
        (host-finished but length-stopped) slot stops advancing.

    The reference serves nothing (SURVEY §1: no serving layer); this is
    a production-serving capability extension.
    """
    cfg = model.cfg
    if getattr(cfg.llm, "kv_quant", "") == "int8":
        raise ValueError(
            "session reuse requires an exact (non-quantized) KV cache: "
            "the extend window reads the cache back, and int8 "
            "requantization would drift from monolithic prefill")

    def extract_row(state: SlotState, slot_valid: jnp.ndarray,
                    slot: jnp.ndarray):
        c = state.cache
        nl, _, L, H, D = c.k.shape
        k = jax.lax.dynamic_slice(c.k, (0, slot, 0, 0, 0),
                                  (nl, 1, L, H, D))
        v = jax.lax.dynamic_slice(c.v, (0, slot, 0, 0, 0),
                                  (nl, 1, L, H, D))
        idx = jax.lax.dynamic_index_in_dim(c.index, slot, keepdims=False)
        row = KVCache(k=k, v=v, index=idx, k_scale=None, v_scale=None)
        valid = jax.lax.dynamic_slice(
            slot_valid, (slot, 0), (1, slot_valid.shape[1]))[0]
        return row, valid

    def embed_delta(params, delta_ids: jnp.ndarray):
        return model.apply({"params": params}, delta_ids,
                           method=VisionLLM.embed_tokens)

    def extend_window(params, emb_chunk: jnp.ndarray,
                      cache_row: KVCache, valid_row: jnp.ndarray,
                      n_real: jnp.ndarray):
        out = _llm_window(model, params, emb_chunk.astype(model.dtype),
                          cache_row, valid_row)
        cache = out["cache"]
        # roll the fill index back over the window's right-pads: their
        # garbage K/V sit above the rolled-back index and are
        # overwritten by the next write before becoming attendable
        cache = cache.replace(
            index=cache.index - (emb_chunk.shape[1] - n_real))
        last = jax.lax.dynamic_slice_in_dim(
            out["logits"], n_real - 1, 1, axis=1)[:, 0]
        return cache, last

    finish = _greedy_finish(model)

    def kill(state: SlotState, slot: jnp.ndarray) -> SlotState:
        return state.replace(live=state.live.at[slot].set(False))

    return (jax.jit(extract_row), jax.jit(embed_delta),
            jax.jit(extend_window, donate_argnums=(2,)),
            jax.jit(finish), jax.jit(kill, donate_argnums=(0,)))


def build_chunked_prefill_fns(
    model: VisionLLM,
    tid: SpecialTokenIds,
    *,
    chunk: int,
    max_len: int = 4096,
):
    """Chunked prefill for continuous batching: a long prompt is run
    through the LLM in fixed `chunk`-token windows so the scheduler can
    interleave decode steps for the LIVE slots between windows —
    bounding the decode stall a new admission causes to ~one chunk's
    latency instead of the full prompt's (the Sarathi/vLLM
    chunked-prefill idea, static-shaped for XLA).

    The window forward is the same cached "extend" path speculative
    decoding uses (`VisionLLM.llm_window` — queries attend history +
    the causal part of the window), which for an initially empty cache
    is exactly prefill attention, so chunked == monolithic numerically
    (tests/test_slots.py::test_chunked_prefill_*).

    Returns (embed_prompt, prefill_chunk, finish):
      * embed_prompt(params, ids [1, Lp], images, regions) — the
        multimodal embedding assembly (vision encode + scatters),
        Lp a multiple of `chunk`;
      * prefill_chunk(params, emb_chunk [1, chunk, C], cache_row,
        valid_row) -> (cache_row, last_logits) — one LLM window;
      * finish(params, last_logits) -> (first_token [1], embed
        [1,1,C]) — the sampled first token and its decode input.
    """
    cfg = model.cfg
    cache_dtype = (jnp.int8 if cfg.llm.kv_quant == "int8"
                   else model.dtype)

    def new_row_cache() -> KVCache:
        return KVCache.create(cfg.llm, 1, max_len, dtype=cache_dtype)

    def embed_prompt(params, input_ids, images,
                     regions: Optional[jnp.ndarray] = None):
        emb, _, _ = model.apply(
            {"params": params}, input_ids, images, tid, regions,
            method=VisionLLM.build_prompt_embeds)
        return emb

    def prefill_chunk(params, emb_chunk, cache_row: KVCache,
                      valid_row: jnp.ndarray):
        out = _llm_window(model, params, emb_chunk, cache_row, valid_row)
        return out["cache"], out["logits"][:, -1]

    finish = _greedy_finish(model)

    return (new_row_cache, jax.jit(embed_prompt),
            jax.jit(prefill_chunk, donate_argnums=(2,)),
            jax.jit(finish))
