"""Autoregressive generation with super-link tool routing.

Reference behavior (modeling_visionllmv2.py:426-555 + generate loop):
when the LLM samples a tool token ([DET]/[GRD]/[SEG]/[POSE]/[GEN]/[EDIT]),
the next 4 (perception) or 64 (generation) *inputs* are the tool's
learnable [EMB] embeddings, and the corresponding [EMB] token ids are
appended to the sequence; their hidden states become the tool's text
queries.

The reference implements this by growing input_ids/attention_mask
mid-decode (dynamic shapes — a non-starter under XLA). Here the same
semantics are an *emb-countdown state machine* inside a single
`lax.while_loop`: every iteration feeds exactly one embedding row — a
sampled token's embedding, or, while the countdown is live, the next
forced [EMB] row — so shapes never change and one compiled step serves
the whole decode. Per-step final-layer hidden states are recorded into a
fixed buffer so tool decoders can gather their text queries afterwards.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from visionllm_tpu import constants as C
from visionllm_tpu.config import VisionLLMConfig
from visionllm_tpu.models.llama import KVCache
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM


@flax.struct.dataclass
class DecodeState:
    cache: KVCache
    cur_embed: jnp.ndarray       # [B, 1, C] input for this step
    out_tokens: jnp.ndarray      # [B, max_new] generated ids (incl. [EMB]s)
    out_hidden: jnp.ndarray      # [B, max_new, C] final-norm hidden states
    step: jnp.ndarray            # scalar int32 — tokens emitted so far
    emb_countdown: jnp.ndarray   # [B] forced [EMB] rows still to feed
    emb_kind: jnp.ndarray        # [B] TOOL_* of the live countdown
    done: jnp.ndarray            # [B] bool
    out_logprobs: jnp.ndarray = None  # [B, max_new] f32 logp of each token
    rng: Optional[jnp.ndarray] = None   # PRNG key (sampling mode only)


def _token_logprob(logits: jnp.ndarray, token: jnp.ndarray
                   ) -> jnp.ndarray:
    """log softmax of `logits` [B, V] at `token` [B] → [B] f32."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, token[:, None], axis=-1)[:, 0]


def sample_token(logits: jnp.ndarray, key, temperature: jnp.ndarray,
                 top_p: jnp.ndarray) -> jnp.ndarray:
    """Per-row temperature / nucleus sampling over [B, V] logits.

    ``temperature[b] <= 0`` means greedy for that row (so a mixed batch
    can carry greedy and sampled requests side by side). Nucleus
    filtering keeps the smallest prefix of the descending-probability
    distribution whose mass reaches ``top_p[b]`` (the first token is
    always kept); the [B, V] sort runs under a ``lax.cond`` so pure
    temperature sampling never pays for it. The reference generates
    greedily everywhere (evaluate_vqa.py) — sampling is a serving
    extension."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]

    def nucleus(s):
        order = jnp.argsort(-s, axis=-1)
        s_sorted = jnp.take_along_axis(s, order, -1)
        probs = jax.nn.softmax(s_sorted, axis=-1)
        csum = jnp.cumsum(probs, axis=-1)
        keep = (csum - probs) < top_p[:, None]
        s_sorted = jnp.where(keep, s_sorted, -jnp.inf)
        inv = jnp.argsort(order, axis=-1)
        return jnp.take_along_axis(s_sorted, inv, -1)

    scaled = jax.lax.cond(jnp.any(top_p < 1.0), nucleus,
                          lambda s: s, scaled)
    drawn = jax.random.categorical(key, scaled).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, drawn)


def _tool_kind(token: jnp.ndarray, tid: SpecialTokenIds) -> jnp.ndarray:
    kind = jnp.zeros_like(token)
    for ids, code in (((tid.det, tid.seg, tid.grd), C.TOOL_DET),
                      ((tid.pose,), C.TOOL_POSE),
                      ((tid.gen,), C.TOOL_GEN),
                      ((tid.edit,), C.TOOL_EDIT)):
        for t in ids:
            kind = jnp.where(token == t, code, kind)
    return kind


def advance_tool_state(model, params, tid, num_embs, num_embs_gen,
                       sampled, countdown, kind):
    """One step of the emb-countdown tool state machine, shared by the
    step-by-step decode loop and the slot scheduler (slots.py): given
    the freshly sampled token and the per-row (countdown, kind), pick
    the emitted token (forced [EMB] id while counting down), its
    next-step input embedding (tool table row vs vocab embedding), and
    the updated (countdown, kind).

    Returns (next_token [B], next_embed [B, 1, C], countdown', kind')."""
    forcing = countdown > 0
    total = jnp.where(kind >= C.TOOL_GEN, num_embs_gen, num_embs)
    offset = total - countdown
    # perception embs have distinct ids [EMB]..[EMB4]; gen/edit repeat
    # [EMB] (reference :434-435)
    forced_token = jnp.where(kind >= C.TOOL_GEN, tid.emb,
                             tid.emb + offset)
    next_token = jnp.where(forcing, forced_token, sampled)

    tables = {
        C.TOOL_DET: params["emb_embeddings_det"],
        C.TOOL_POSE: params["emb_embeddings_pose"],
        C.TOOL_GEN: params["emb_embeddings_gen"],
        C.TOOL_EDIT: params["emb_embeddings_edit"],
    }
    next_embed = model.apply({"params": params}, next_token[:, None],
                             method=VisionLLM.embed_tokens)
    for code, table in tables.items():
        n = table.shape[0]
        row = table[jnp.clip(offset, 0, n - 1)]     # [B, C]
        use = forcing & (kind == code)
        next_embed = jnp.where(use[:, None, None],
                               row[:, None, :].astype(next_embed.dtype),
                               next_embed)

    # countdown bookkeeping: start on sampled tool token, else decrement
    new_kind = _tool_kind(sampled, tid)
    started = (~forcing) & (new_kind > 0)
    start_total = jnp.where(new_kind >= C.TOOL_GEN, num_embs_gen,
                            num_embs)
    new_countdown = jnp.where(
        forcing, countdown - 1,
        jnp.where(started, start_total, 0))
    kind_out = jnp.where(forcing, kind,
                         jnp.where(started, new_kind, 0))
    return next_token, next_embed, new_countdown, kind_out


def build_generate_fn(
    model: VisionLLM,
    tid: SpecialTokenIds,
    *,
    max_new_tokens: int = 256,
    eos_id: int = 2,
    max_len: int = 4096,
    sampling: bool = False,
):
    """Returns a jitted `generate(params, input_ids, images)` closure.

    input_ids: [1, L_prompt] (right-aligned, no padding — reference
    enforces bs=1 for generation too). Returns dict with out_tokens
    [1, max_new_tokens], out_hidden [1, max_new, C], num_generated.

    ``sampling=True`` compiles the temperature/top-p path: `generate`
    then also takes `rng` (PRNG key), `temperature` [B] and `top_p` [B]
    (per-row; temperature 0 = greedy for that row). The default greedy
    program is unchanged.
    """
    cfg = model.cfg
    num_embs, num_embs_gen = cfg.num_embs, cfg.num_embs_gen

    def step_fn(params, state: DecodeState,
                decode_mask: Optional[jnp.ndarray] = None,
                sample_args=None) -> DecodeState:
        B = state.cur_embed.shape[0]
        pos = jnp.broadcast_to(state.cache.index[None, None], (B, 1))
        out = model.apply(
            {"params": params}, state.cur_embed, pos.astype(jnp.int32),
            state.cache, decode_mask, method=VisionLLM.llm_step)
        logits, hidden, cache = out["logits"], out["hidden"], out["cache"]
        new_rng = state.rng
        if sample_args is not None:
            temperature, top_p = sample_args
            new_rng, sub = jax.random.split(state.rng)
            sampled = sample_token(logits[:, -1, :], sub, temperature,
                                   top_p)
        else:
            sampled = jnp.argmax(logits[:, -1, :], axis=-1
                                 ).astype(jnp.int32)

        forcing = state.emb_countdown > 0
        next_token, next_embed, countdown, kind = advance_tool_state(
            model, params, tid, num_embs, num_embs_gen,
            sampled, state.emb_countdown, state.emb_kind)

        done = state.done | ((~forcing) & (sampled == eos_id))
        rec_token = jnp.where(state.done, 0, next_token)
        out_tokens = jax.lax.dynamic_update_slice(
            state.out_tokens, rec_token[:, None], (0, state.step))
        rec_lp = jnp.where(state.done, 0.0,
                           _token_logprob(logits[:, -1, :], next_token))
        out_logprobs = jax.lax.dynamic_update_slice(
            state.out_logprobs, rec_lp[:, None], (0, state.step))
        # `hidden` is the LLM output FOR the embedding fed this step,
        # i.e. for out_tokens[step-1] — align the buffers so
        # out_hidden[i] is the hidden state AT token i, matching the
        # reference's hidden_states[emb_select] extraction (:762-788).
        # (A token emitted at the very last step never gets its hidden
        # recorded; [EMB] runs are always followed by a sampled token,
        # so tool queries are unaffected.)
        out_hidden = jax.lax.dynamic_update_slice(
            state.out_hidden, hidden.astype(state.out_hidden.dtype),
            (0, state.step - 1, 0))
        return DecodeState(
            cache=cache, cur_embed=next_embed, out_tokens=out_tokens,
            out_hidden=out_hidden, step=state.step + 1,
            emb_countdown=countdown, emb_kind=kind, done=done,
            out_logprobs=out_logprobs, rng=new_rng)

    def generate(params, input_ids: jnp.ndarray,
                 images: Optional[jnp.ndarray],
                 first_token: Optional[jnp.ndarray] = None,
                 regions: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 live: Optional[jnp.ndarray] = None,
                 rng: Optional[jnp.ndarray] = None,
                 temperature: Optional[jnp.ndarray] = None,
                 top_p: Optional[jnp.ndarray] = None,
                 ) -> Dict[str, Any]:
        """`first_token` [B] optionally overrides the first sampled token
        (teacher-forcing a tool trigger, e.g. [GEN] for generation eval).

        `regions` [B, R, H, W] binary visual-prompt masks condition the
        prefill: the RegionEncoder replaces the <region> token embeddings
        (reference threads regions= through prepare_inputs_for_generation,
        modeling_visionllmv2.py:355-379; used by the region-caption/
        recognition/classification evals, eval_region_caption_refcoco.py
        :176-179).

        `attn_mask` [B, L_prompt] marks valid prompt tokens for
        LEFT-padded batches (serving: mixed-length prompts padded to one
        compiled length). Pad tokens are excluded from attention in both
        prefill and decode; RoPE is relative, so left-padding under the
        mask is numerically exact vs the unpadded prompt.

        `live` [B] marks real batch rows; dummy rows (a partially full
        serving batch) start `done` and never extend the decode loop."""
        B, L = input_ids.shape
        cache_dtype = (jnp.int8 if cfg.llm.kv_quant == "int8"
                       else model.dtype)
        cache = KVCache.create(cfg.llm, B, max_len, dtype=cache_dtype)
        out = model.apply({"params": params}, input_ids, images, tid,
                          attn_mask=attn_mask, cache=cache, regions=regions)
        logits, cache = out["logits"], out["cache"]
        sample_args = None
        rng0 = None
        if sampling:
            rng0 = rng if rng is not None else jax.random.PRNGKey(0)
            temperature = (jnp.zeros((B,), jnp.float32)
                           if temperature is None
                           else jnp.broadcast_to(
                               jnp.asarray(temperature, jnp.float32),
                               (B,)))
            top_p = (jnp.ones((B,), jnp.float32) if top_p is None
                     else jnp.broadcast_to(
                         jnp.asarray(top_p, jnp.float32), (B,)))
            sample_args = (temperature, top_p)
            rng0, sub0 = jax.random.split(rng0)
            first = sample_token(logits[:, -1, :], sub0, temperature,
                                 top_p)
        else:
            first = jnp.argmax(logits[:, -1, :], axis=-1
                               ).astype(jnp.int32)
        if first_token is not None:
            first = jnp.broadcast_to(
                jnp.asarray(first_token, jnp.int32), first.shape)
        first_embed = model.apply({"params": params}, first[:, None],
                                  method=VisionLLM.embed_tokens)

        decode_mask = None
        if attn_mask is not None:
            # [B, max_len]: prompt pads stay invisible; every slot the
            # decode loop writes (>= L) is valid
            decode_mask = jnp.concatenate(
                [attn_mask.astype(bool),
                 jnp.ones((B, max_len - L), bool)], axis=1)

        kind0 = _tool_kind(first, tid)
        total0 = jnp.where(kind0 >= C.TOOL_GEN, num_embs_gen, num_embs)
        hid = cfg.llm.hidden_size
        done0 = first == eos_id
        if live is not None:
            done0 = done0 | ~live.astype(bool)
        first_lp = _token_logprob(logits[:, -1, :], first)
        state = DecodeState(
            cache=cache,
            cur_embed=first_embed,
            out_tokens=jnp.zeros((B, max_new_tokens), jnp.int32
                                 ).at[:, 0].set(
                                     jnp.where(done0 & (first != eos_id),
                                               0, first)),
            out_hidden=jnp.zeros((B, max_new_tokens, hid), jnp.float32),
            step=jnp.ones((), jnp.int32),
            emb_countdown=jnp.where(kind0 > 0, total0, 0),
            emb_kind=kind0,
            done=done0,
            out_logprobs=jnp.zeros((B, max_new_tokens), jnp.float32
                                   ).at[:, 0].set(first_lp),
            rng=rng0,
        )

        def cond(s: DecodeState):
            return (s.step < max_new_tokens) & ~jnp.all(s.done)

        state = jax.lax.while_loop(
            cond,
            lambda s: step_fn(params, s, decode_mask, sample_args),
            state)
        return {"out_tokens": state.out_tokens,
                "out_hidden": state.out_hidden,
                "out_logprobs": state.out_logprobs,
                "num_generated": state.step,
                "cache": state.cache}

    return jax.jit(generate)


@flax.struct.dataclass
class SpecDecodeState:
    cache: KVCache
    cur_embed: jnp.ndarray     # [1, 1, C] input for the next window's slot 0
    tokens: jnp.ndarray        # [1, buf] prompt + emitted (n-gram source)
    n_tok: jnp.ndarray         # scalar int32 — valid length of `tokens`
    out_hidden: jnp.ndarray    # [1, out_buf, C]
    step: jnp.ndarray          # scalar int32 — tokens emitted so far
    emb_countdown: jnp.ndarray  # scalar int32
    emb_kind: jnp.ndarray       # scalar int32
    done: jnp.ndarray           # scalar bool
    out_logprobs: jnp.ndarray = None  # [1, out_buf] f32
    n_windows: jnp.ndarray = None  # scalar int32 — verify windows run


def build_speculative_generate_fn(
    model: VisionLLM,
    tid: SpecialTokenIds,
    *,
    max_new_tokens: int = 256,
    eos_id: int = 2,
    max_len: int = 4096,
    k_draft: int = 7,
):
    """Speculative greedy decoding — EXACT same tokens and hidden states
    as `build_generate_fn`, usually in far fewer sequential steps.

    Two draft sources feed a (k_draft+1)-token verify window per
    iteration, both TPU-shaped (fixed sizes, no host round-trips):

      * prompt-lookup drafting (the n-gram scheme of "assisted
        generation" without a draft model): the last 2-gram of
        prompt+output is matched against its own history and the
        continuation of the most recent match is proposed. VQA/caption/
        grounding answers echo prompt phrases constantly, so acceptance
        is high exactly where the reference evals decode.
      * forced-[EMB] windowing: while the emb-countdown is live the next
        inputs are KNOWN (the tool's [EMB] table rows), so up to
        k_draft+1 forced rows run in ONE forward — the reference's
        [GEN]/[EDIT] runs append 64 such tokens one step at a time
        (modeling_visionllmv2.py:426-555); here they take ⌈64/(k+1)⌉
        windows.

    A verify window costs about one decode step — decode is HBM-bound
    on the weight tree and KV cache, which a multi-token window reads
    once — so every accepted draft is a step saved. Greedy acceptance
    (token == argmax) makes the output provably identical to the
    step-by-step loop; `tests/test_speculative.py` asserts it.

    Single-sequence only (B=1): per-row variable acceptance would need
    per-row cache indices. Batched serving throughput uses
    `build_generate_fn(live=...)`; this is the latency configuration.
    """
    cfg = model.cfg
    num_embs, num_embs_gen = cfg.num_embs, cfg.num_embs_gen
    K = k_draft
    W = K + 1
    hid = cfg.llm.hidden_size
    out_buf = max_new_tokens + W

    def _totals(kind):
        return jnp.where(kind >= C.TOOL_GEN, num_embs_gen, num_embs)

    def spec_step(params, state: SpecDecodeState, buf: int,
                  decode_mask: Optional[jnp.ndarray] = None
                  ) -> SpecDecodeState:
        c = state.emb_countdown
        kind = state.emb_kind
        idx = state.cache.index
        total = _totals(kind)

        # ---- prompt-lookup draft: continuation of the most recent
        # earlier occurrence of the trailing n-gram, longest first
        # (3-gram match preferred over 2-gram — the standard
        # prompt-lookup laddering; longer keys draft more accurately) --
        Tb = state.tokens[0]
        tm3 = jnp.take(Tb, state.n_tok - 3)
        t0 = jnp.take(Tb, state.n_tok - 2)
        t1 = jnp.take(Tb, state.n_tok - 1)
        jarr = jnp.arange(buf)
        r1 = jnp.roll(Tb, -1)
        cand2 = ((Tb == t0) & (r1 == t1)
                 & (jarr + 1 < state.n_tok - 1))
        cand3 = (cand2 & (jnp.roll(Tb, 1) == tm3)
                 & (jarr >= 1) & (state.n_tok >= 3))
        jm3 = jnp.max(jnp.where(cand3, jarr, -1))
        jm2 = jnp.max(jnp.where(cand2, jarr, -1))
        jm = jnp.where(jm3 >= 0, jm3, jm2)
        start = jnp.clip(jm + 2, 0, buf - K)
        drafts = jax.lax.dynamic_slice(Tb, (start,), (K,))      # [K]
        drafts = jnp.where(jm >= 0, drafts, 0)

        # ---- window inputs ----
        # window position i emits token t_i; positions i < c are forced
        iarr = jnp.arange(W)
        forcing = iarr < c                                      # [W]
        offs = jnp.clip(total - c + iarr, 0, None)              # [W]
        forced_tok = jnp.where(kind >= C.TOOL_GEN, tid.emb,
                               tid.emb + offs)
        tables = {
            C.TOOL_DET: params["emb_embeddings_det"],
            C.TOOL_POSE: params["emb_embeddings_pose"],
            C.TOOL_GEN: params["emb_embeddings_gen"],
            C.TOOL_EDIT: params["emb_embeddings_edit"],
        }
        draft_emb = model.apply({"params": params}, drafts[None],
                                method=VisionLLM.embed_tokens)[0]  # [K, C]
        forced_rows = jnp.zeros_like(draft_emb)
        for code, table in tables.items():
            n = table.shape[0]
            rows = table[jnp.clip(offs[:K], 0, n - 1)].astype(
                draft_emb.dtype)
            forced_rows = jnp.where(kind == code, rows, forced_rows)
        # inputs: e_0 = cur_embed; e_{i+1} = forced row offs_i while
        # forcing, else the drafted token's embedding
        pred_in = jnp.where(forcing[:K, None], forced_rows, draft_emb)
        window = jnp.concatenate(
            [state.cur_embed, pred_in[None].astype(state.cur_embed.dtype)],
            axis=1)                                             # [1, W, C]
        pos = (idx + iarr)[None].astype(jnp.int32)

        out = model.apply({"params": params}, window, pos, state.cache,
                          decode_mask, method=VisionLLM.llm_window)
        logits, hidden, new_cache = (out["logits"], out["hidden"],
                                     out["cache"])
        s = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)    # [W]
        s_kind = _tool_kind(s, tid)

        # ---- greedy acceptance ----
        t = jnp.where(forcing, forced_tok, s)                   # emitted
        # position i+1 is emitted iff input e_{i+1} was the true input:
        # forced rows always are; a draft must match the sample AND not
        # be a tool/eos token (their successors take table rows / stop)
        cont = forcing[:K] | ((drafts == s[:K]) & (s_kind[:K] == 0)
                              & (s[:K] != eos_id))
        acc = jnp.cumprod(cont.astype(jnp.int32))
        m = 1 + jnp.sum(acc)                                    # 1..W

        last = m - 1
        t_last = jnp.take(t, last)
        last_forced = last < c                                  # ⇔ c >= W
        kind_s = _tool_kind(t_last, tid)
        started = (~last_forced) & (kind_s > 0)
        c_new = jnp.where(last_forced, c - m,
                          jnp.where(started, _totals(kind_s), 0))
        kind_new = jnp.where(last_forced, kind,
                             jnp.where(started, kind_s, 0))

        # next window's slot-0 input: the embedding the step-by-step
        # loop would feed after emitting t_last
        emb_last = model.apply({"params": params}, t_last[None, None],
                               method=VisionLLM.embed_tokens)   # [1,1,C]
        offs_last = jnp.take(offs, last)
        next_forced = jnp.zeros((1, 1, emb_last.shape[-1]),
                                emb_last.dtype)
        for code, table in tables.items():
            n = table.shape[0]
            row_cont = table[jnp.clip(offs_last, 0, n - 1)]
            row_start = table[0]
            sel = jnp.where(last_forced & (kind == code), row_cont,
                            jnp.where(started & (kind_s == code),
                                      row_start, next_forced[0, 0]))
            next_forced = sel[None, None].astype(emb_last.dtype)
        use_table = last_forced | started
        cur_embed = jnp.where(use_table, next_forced, emb_last)

        # ---- record tokens + hidden (masked window writes) ----
        keep = iarr < m
        tok_old = jax.lax.dynamic_slice(
            state.tokens, (0, state.n_tok), (1, W))
        tok_new = jnp.where(keep, t, tok_old[0])[None]
        tokens = jax.lax.dynamic_update_slice(
            state.tokens, tok_new, (0, state.n_tok))
        # logits[i] scored the token emitted at out position step+i
        lp_w = _token_logprob(logits[0], t)                     # [W]
        lp_old = jax.lax.dynamic_slice(
            state.out_logprobs, (0, state.step), (1, W))
        lp_new = jnp.where(keep, lp_w, lp_old[0])[None]
        out_logprobs = jax.lax.dynamic_update_slice(
            state.out_logprobs, lp_new, (0, state.step))
        # hidden[i] is the LLM output for input e_i = the token at out
        # position step-1+i (same alignment as the step-by-step loop)
        h_old = jax.lax.dynamic_slice(
            state.out_hidden, (0, state.step - 1, 0), (1, W, hid))
        h_new = jnp.where(keep[:, None],
                          hidden[0].astype(jnp.float32), h_old[0])[None]
        out_hidden = jax.lax.dynamic_update_slice(
            state.out_hidden, h_new, (0, state.step - 1, 0))

        return SpecDecodeState(
            cache=new_cache.replace(index=idx + m),
            cur_embed=cur_embed,
            tokens=tokens,
            n_tok=state.n_tok + m,
            out_hidden=out_hidden,
            step=state.step + m,
            emb_countdown=c_new,
            emb_kind=kind_new,
            done=state.done | (t_last == eos_id),
            out_logprobs=out_logprobs,
            n_windows=state.n_windows + 1,
        )

    def generate(params, input_ids: jnp.ndarray,
                 images: Optional[jnp.ndarray],
                 first_token: Optional[jnp.ndarray] = None,
                 regions: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 ) -> Dict[str, Any]:
        """`attn_mask` [1, L_prompt]: LEFT-padded prompt support (the
        serving one-compiled-shape contract) — pad slots are excluded
        from attention in the prefill and in every verify window; the
        n-gram drafter sees the pad zeros but can only draft zeros off
        them, which greedy acceptance rejects."""
        B, L = input_ids.shape
        if B != 1:
            raise ValueError("speculative decoding is single-sequence "
                             "(B=1); use build_generate_fn for batches")
        buf = L + max_new_tokens + W + 2
        cache_dtype = (jnp.int8 if cfg.llm.kv_quant == "int8"
                       else model.dtype)
        cache = KVCache.create(cfg.llm, B, max_len, dtype=cache_dtype)
        out = model.apply({"params": params}, input_ids, images, tid,
                          attn_mask=attn_mask, cache=cache,
                          regions=regions)
        logits, cache = out["logits"], out["cache"]
        first = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        if first_token is not None:
            first = jnp.broadcast_to(
                jnp.asarray(first_token, jnp.int32), first.shape)
        kind0 = _tool_kind(first, tid)[0]
        # slot 0 of the first window is the vocab embedding of the first
        # emitted token — the step-by-step loop's cur_embed after prefill
        first_embed = model.apply({"params": params}, first[:, None],
                                  method=VisionLLM.embed_tokens)

        tokens = jnp.zeros((1, buf), jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, input_ids, (0, 0))
        tokens = tokens.at[0, L].set(first[0])

        state = SpecDecodeState(
            cache=cache,
            cur_embed=first_embed,
            tokens=tokens,
            n_tok=jnp.asarray(L + 1, jnp.int32),
            out_hidden=jnp.zeros((1, out_buf, hid), jnp.float32),
            step=jnp.ones((), jnp.int32),
            emb_countdown=jnp.where(kind0 > 0, _totals(kind0), 0),
            emb_kind=kind0,
            done=first[0] == eos_id,
            out_logprobs=jnp.zeros((1, out_buf), jnp.float32
                                   ).at[:, 0].set(
                _token_logprob(logits[:, -1, :], first)),
            n_windows=jnp.zeros((), jnp.int32),
        )

        def cond(s: SpecDecodeState):
            return (s.step < max_new_tokens) & ~s.done

        decode_mask = None
        if attn_mask is not None:
            decode_mask = jnp.concatenate(
                [attn_mask.astype(bool),
                 jnp.ones((B, max_len - L), bool)], axis=1)

        state = jax.lax.while_loop(
            cond, lambda s: spec_step(params, s, buf, decode_mask), state)
        out_tokens = jax.lax.dynamic_slice(
            state.tokens, (0, L), (1, max_new_tokens))
        # tokens past max_new_tokens (window overshoot) are dropped
        n = jnp.minimum(state.step, max_new_tokens)
        valid = jnp.arange(max_new_tokens)[None] < n
        return {"out_tokens": jnp.where(valid, out_tokens, 0),
                "out_hidden": state.out_hidden[:, :max_new_tokens],
                "out_logprobs": jnp.where(
                    valid, state.out_logprobs[:, :max_new_tokens], 0.0),
                "num_generated": n,
                # acceptance accounting for the serving auto-disable:
                # tokens-per-window = (step) / n_windows (the prefill's
                # first token is free — not a window)
                "num_windows": state.n_windows,
                "cache": state.cache}

    return jax.jit(generate)


def extract_tool_queries_from_generation(
    cfg: VisionLLMConfig,
    tid: SpecialTokenIds,
    out_tokens: jnp.ndarray,      # [B, max_new]
    out_hidden: jnp.ndarray,      # [B, max_new, C]
) -> Dict[str, Any]:
    """Post-decode: gather text queries for each tool from the recorded
    hidden states (host-side convenience, small arrays)."""
    from visionllm_tpu.models.visionllm import compact_masked_rows

    is_emb = ((out_tokens >= tid.emb)
              & (out_tokens < tid.emb + cfg.num_embs))
    from visionllm_tpu.models.visionllm import tool_context
    ctx, _ = tool_context(out_tokens, tid)

    result = {}
    for name, code, n in (("det", C.TOOL_DET, cfg.num_embs),
                          ("pose", C.TOOL_POSE, cfg.num_embs),
                          ("gen", C.TOOL_GEN, cfg.num_embs_gen),
                          ("edit", C.TOOL_EDIT, cfg.num_embs_gen)):
        mask = is_emb & (ctx == code)
        rows, valid = compact_masked_rows(
            out_hidden, mask, cfg.max_num_patches * n)
        B = out_tokens.shape[0]
        tq = rows.reshape(B, cfg.max_num_patches, n, -1)
        tq_mask = valid.reshape(B, cfg.max_num_patches, n)[..., 0]
        result[name] = (tq, tq_mask)
    return result
