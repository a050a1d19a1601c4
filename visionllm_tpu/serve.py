"""HTTP serving front-end for the composite model.

The reference ships no demo/serving layer at all (its README stops at
offline eval scripts); production deployment needs one, so this module
provides a minimal dependency-free server over the jitted generation
loop:

  * `ChatService` — owns (config, params, tokenizer, generate_fn) and
    turns (prompt, image) requests into decoded text. The underlying
    decode is the emb-countdown while_loop of `generation.py`, compiled
    ONCE at static [max_batch, max_prompt] / [max_batch, 1, H, W, 3]
    shapes: prompts are LEFT-padded to the compiled length under an
    attention mask (exact — RoPE is relative and pads are excluded from
    attention in prefill and decode), so the TPU program never
    recompiles regardless of prompt length or load.
  * Micro-batching: concurrent requests are coalesced by a dispatcher
    thread into one [max_batch]-vectorized generate call (decode is
    HBM-bound on the weights, so B streams cost about one stream's
    step time — aggregate tok/s scales with B). Partially full batches
    run with dummy rows flagged dead via `live=`; batched output is
    token-identical to per-request (tests/test_generation_batched.py).
    The reference pins generation to bs=1 (evaluate_vqa.py:531).

Endpoints
  GET  /healthz      -> {"ok": true, "model": ..., "devices": [...]}
  POST /v1/generate  -> {"text": ..., "num_tokens": N, "latency_s": ...}
      body: {"prompt": str,                 # user question / instruction
             "image_b64": str | null,      # base64 raw RGB uint8 bytes
             "image_shape": [H, W, 3],     # required with image_b64
             "max_new_tokens": int | null}

Serving-mode quantization (`--quant int8`, `--kv-quant int8`) applies
exactly as in the eval CLIs (ops/quant.py).
"""

from __future__ import annotations

import base64
import json
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

from visionllm_tpu.constants import DEFAULT_TOKENS


class Overloaded(RuntimeError):
    """Request queue is full — callers should retry later (HTTP 503)."""


def _image_key(image: Optional[np.ndarray]) -> Optional[str]:
    """Fingerprint of the preprocessed image pixels — session reuse must
    fall back when the same conversation arrives with a swapped image."""
    if image is None:
        return None
    import hashlib
    return hashlib.sha1(
        np.ascontiguousarray(image).tobytes()).hexdigest()


def _eos_or_default(tokenizer) -> int:
    """eos token id, defaulting to 2 only when the tokenizer has NONE
    (a plain `or 2` would remap a legitimate id of 0)."""
    eos = getattr(tokenizer, "eos_token_id", None)
    return 2 if eos is None else int(eos)


class _Request:
    __slots__ = ("ids", "image", "event", "tokens", "error", "stream_q",
                 "temperature", "top_p", "seed", "logprobs", "session",
                 "session_hit", "regions")

    def __init__(self, ids: np.ndarray, image: Optional[np.ndarray],
                 temperature: float = 0.0, top_p: float = 1.0,
                 seed: Optional[int] = None,
                 session: Optional[str] = None,
                 regions: Optional[np.ndarray] = None):
        self.session = session       # session id for KV reuse (slots)
        self.session_hit = False     # set by the scheduler on reuse
        self.regions = regions       # [R_max, S, S] padded masks or None
        self.ids = ids
        self.image = image           # preprocessed [S, S, 3] or None
        self.event = threading.Event()
        self.tokens: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None
        # streaming (slots mode): per-token queue, None = finished
        self.stream_q: Optional["queue.Queue"] = None
        self.temperature = temperature
        self.top_p = top_p
        self.seed = seed
        self.logprobs: Optional[np.ndarray] = None


class ChatService:
    """One loaded model + tokenizer; thread-safe greedy generation with
    request micro-batching (see module docstring)."""

    def __init__(self, cfg, params, tokenizer, *, image_size: int = 336,
                 conv_version: str = "vicuna_v1",
                 max_new_tokens: int = 256, max_prompt: int = 1024,
                 max_batch: int = 1, batch_window_ms: float = 4.0,
                 spec_k: int = 0, slots: int = 0,
                 prefill_chunk: int = 0, decode_span: int = 1,
                 sampling: bool = False,
                 max_queue: int = 256, sessions: int = 0,
                 session_chunk: int = 64,
                 max_ctx: Optional[int] = None,
                 max_regions: int = 8, dtype=None):
        import jax.numpy as jnp

        from visionllm_tpu.generation import (
            build_generate_fn, build_speculative_generate_fn)
        from visionllm_tpu.models.visionllm import (SpecialTokenIds,
                                                    VisionLLM)

        if spec_k > 0 and max_batch > 1:
            raise ValueError(
                "spec_k (latency mode) and max_batch>1 (throughput mode) "
                "are mutually exclusive: speculative acceptance advances "
                "each stream a different number of tokens per step")
        if slots > 0 and (max_batch > 1 or spec_k > 0):
            raise ValueError(
                "slots (continuous batching) replaces max_batch/spec_k "
                "— pick one serving mode")
        if sampling and spec_k > 0:
            raise ValueError(
                "sampling and speculative decoding are mutually "
                "exclusive: greedy acceptance is what makes the "
                "speculative output exact")
        if sampling and prefill_chunk > 0:
            raise ValueError(
                "sampling with chunked prefill is not wired yet: the "
                "chunked finish samples the first token greedily")
        if prefill_chunk > 0 and getattr(cfg.llm, "kv_quant", "") == \
                "int8":
            raise ValueError(
                "chunked prefill with an int8 KV cache is not exact: "
                "monolithic prefill attends the fresh bf16 window while "
                "chunk windows read back the quantized cache — run "
                "--prefill-chunk without --kv-quant")
        if sessions > 0 and slots <= 0:
            raise ValueError(
                "session KV reuse rides the continuous-batching slot "
                "state — pass slots > 0 (serve --slots N --sessions M)")
        if sessions > 0 and sampling:
            raise ValueError(
                "session reuse with sampling is not wired yet: the "
                "extension finish samples the first token greedily "
                "(same limitation as chunked prefill)")
        if sessions > 0 and getattr(cfg.llm, "kv_quant", "") == "int8":
            raise ValueError(
                "session reuse with an int8 KV cache is not exact: the "
                "extend window reads the cache back — run --sessions "
                "without --kv-quant")
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.conv_version = conv_version
        self.max_prompt = max_prompt
        self.max_new_tokens = max_new_tokens
        self.max_batch = max_batch
        self.batch_window_s = batch_window_ms / 1e3
        self.spec_k = spec_k
        self.slots = slots
        self.img_len = (image_size // 14) ** 2
        self.max_sessions = 0
        self.max_regions = max_regions
        self.tid = SpecialTokenIds.from_tokenizer(tokenizer)
        self.eos_id = _eos_or_default(tokenizer)
        self.core = VisionLLM(cfg, dtype=dtype or jnp.bfloat16)
        if slots > 0:
            from visionllm_tpu.slots import (build_chunked_prefill_fns,
                                             build_slot_fns)
            self.prefill_chunk = prefill_chunk
            if prefill_chunk > 0:
                # pad prompts up to a chunk multiple so every chunk is
                # full-width (left-pad under the attention mask)
                self.max_prompt = (-(-max_prompt // prefill_chunk)
                                   * prefill_chunk)
            slot_max_len = self.max_prompt + max_new_tokens + 8
            if sessions > 0:
                # parked conversations grow turn by turn — give the KV
                # buffer follow-up headroom beyond the single-turn size
                slot_max_len += 3 * (max_new_tokens + 2 * session_chunk)
            if max_ctx is not None:
                slot_max_len = max(slot_max_len, max_ctx)
            self.slot_max_len = slot_max_len
            (self._slot_init, self._slot_prefill, self._slot_insert,
             self._slot_step) = build_slot_fns(
                self.core, self.tid, n_slots=slots,
                max_len=slot_max_len, eos_id=self.eos_id,
                sampling=sampling, span=max(1, decode_span))
            if prefill_chunk > 0:
                (self._chunk_row, self._chunk_embed, self._chunk_run,
                 self._chunk_finish) = build_chunked_prefill_fns(
                    self.core, self.tid, chunk=prefill_chunk,
                    max_len=slot_max_len)
            self.max_sessions = sessions
            self.session_chunk = session_chunk
            # sid -> {"slot", "ids" (cached token prefix whose K/V are
            # in the slot), "fill" (row fill index), "stamp"}
            self._sessions: Dict[str, dict] = {}
            self._slot_sid: Dict[int, str] = {}
            self._stamp = 0
            if sessions > 0:
                from visionllm_tpu.slots import build_session_fns
                (self._sess_extract, self._sess_embed,
                 self._sess_extend, self._sess_finish,
                 self._sess_kill) = build_session_fns(self.core)
            loop = self._slot_loop
        elif spec_k > 0:
            self.generate_fn = build_speculative_generate_fn(
                self.core, self.tid, max_new_tokens=max_new_tokens,
                eos_id=self.eos_id,
                max_len=max_prompt + max_new_tokens + 8, k_draft=spec_k)
            loop = self._dispatch_loop
        else:
            self.generate_fn = build_generate_fn(
                self.core, self.tid, max_new_tokens=max_new_tokens,
                eos_id=self.eos_id,
                max_len=max_prompt + max_new_tokens + 8,
                sampling=sampling)
            loop = self._dispatch_loop
        self.sampling = sampling
        self._seed_counter = 0
        # acceptance accounting for spec auto-disable: spec only wins
        # while tokens-per-window clears the window cost (~1.03x a plain
        # step — bench.py spec_window_cost_vs_step); persistently
        # sub-break-even acceptance flips this service to the plain
        # decode loop (_track_spec_acceptance)
        self._spec_tokens = 0
        self._spec_windows = 0
        self._spec_disabled = False
        # serving counters (GET /metrics); ints/floats mutated under the
        # GIL from the dispatcher + request threads — reads are
        # monotonic-ish snapshots, which is all a scrape needs
        self.stats = {"requests_total": 0, "tokens_generated_total": 0,
                      "latency_sum_s": 0.0, "errors_total": 0,
                      "scheduler_ticks": 0, "occupied_slot_ticks": 0}
        if getattr(self, "max_sessions", 0) > 0:
            self.stats["session_hits"] = 0
            self.stats["session_misses"] = 0
        # bounded admission queue: beyond max_queue waiting requests the
        # service sheds load (Overloaded → HTTP 503) instead of growing
        # an unbounded backlog of doomed-to-time-out work
        self._queue: "queue.Queue[_Request]" = queue.Queue(
            maxsize=max_queue)
        self._dispatcher = threading.Thread(target=loop, daemon=True)
        self._dispatcher.start()

    def close(self):
        """Stop the dispatcher thread and drop its references so the
        param/KV arrays can be freed (long-lived hosts reloading a
        model would otherwise leak the full device tree — the thread
        blocks on the queue forever holding `self`)."""
        try:
            self._queue.put_nowait(None)
        except queue.Full:
            self._queue.put(None)
        self._dispatcher.join(timeout=30)
        self.params = None

    # spec auto-disable thresholds: a verify window costs ~1.03x a plain
    # decode step (bench.py spec_window_cost_vs_step), so spec breaks
    # even at ~1.03 accepted tokens/window; require a 10% margin over a
    # meaningful sample before giving up on the drafter
    SPEC_MIN_WINDOWS = 64
    SPEC_BREAK_EVEN = 1.15

    def _track_spec_acceptance(self, n_gen: int, n_windows: int) -> None:
        """VERDICT r3 #5: measure the drafter's real acceptance and fall
        back to the plain decode loop when spec is a net loss. The first
        token comes from the prefill (free), so tokens-per-window is
        (n_gen - 1) / windows; 1.0 means the drafter never helps."""
        self._spec_tokens += max(n_gen - 1, 0)
        self._spec_windows += max(n_windows, 0)
        if (self._spec_disabled
                or self._spec_windows < self.SPEC_MIN_WINDOWS):
            return
        accept = self._spec_tokens / self._spec_windows
        if accept >= self.SPEC_BREAK_EVEN:
            return
        from visionllm_tpu.generation import build_generate_fn
        print(f"[serve] speculative decoding disabled: measured "
              f"{accept:.2f} tokens/window over {self._spec_windows} "
              f"windows (< break-even {self.SPEC_BREAK_EVEN}); "
              "switching to the plain decode loop", file=sys.stderr,
              flush=True)
        # sampling and spec are mutually exclusive (ctor check), so the
        # plain fn is greedy like the spec one; compiles on first use
        self.generate_fn = build_generate_fn(
            self.core, self.tid, max_new_tokens=self.max_new_tokens,
            eos_id=self.eos_id,
            max_len=self.max_prompt + self.max_new_tokens + 8)
        self._spec_disabled = True
        self.spec_k = 0

    def _submit(self, req: "_Request") -> None:
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            self.stats["errors_total"] += 1
            raise Overloaded(
                f"request queue full ({self._queue.maxsize} waiting)"
            ) from None

    def metrics(self) -> dict:
        s = dict(self.stats)
        n = max(s["requests_total"], 1)
        s["latency_avg_s"] = round(s.pop("latency_sum_s") / n, 4)
        if self.slots > 0:
            t = max(s["scheduler_ticks"], 1)
            s["slot_occupancy"] = round(
                s["occupied_slot_ticks"] / (t * self.slots), 4)
        else:
            s.pop("scheduler_ticks")
            s.pop("occupied_slot_ticks")
        s["mode"] = ("slots" if self.slots > 0 else
                     "speculative" if self.spec_k > 0 else
                     f"batch{self.max_batch}")
        if self.spec_k > 0 or self._spec_disabled:
            s["spec_tokens_per_window"] = round(
                self._spec_tokens / max(self._spec_windows, 1), 3)
            s["spec_windows_total"] = self._spec_windows
            s["spec_disabled"] = self._spec_disabled
        return s

    # ---- request assembly (caller thread) ----

    def _check_regions(self, regions: Optional[List],
                       image: Optional[np.ndarray]
                       ) -> Optional[np.ndarray]:
        """Validate mode support + build the padded mask array."""
        if regions is None:
            return None
        if not getattr(self.cfg, "use_region_encoder", False):
            raise ValueError("this model config has no RegionEncoder "
                             "(use_region_encoder=False)")
        if image is None:
            raise ValueError("region prompts need the image they "
                             "refer to (pass image/image_b64)")
        if self.max_batch > 1:
            raise ValueError(
                "region prompts are not supported with request "
                "micro-batching — serve with --max-batch 1 or --slots")
        return self._region_masks(regions, image)

    def _region_masks(self, regions: List,
                      image: np.ndarray) -> np.ndarray:
        """Visual prompts → [max_regions, S, S] CLIP-geometry masks.
        Each region is an xyxy box [4] or a binary mask [H, W], both in
        the ORIGINAL image geometry (reference region-eval protocol:
        eval_region_caption_refcoco.py boxes_to_masks + pad clip)."""
        from visionllm_tpu.eval.region_eval import (_clip_region_masks,
                                                    boxes_to_masks)
        h, w = image.shape[:2]
        masks = []
        for r in regions:
            r = np.asarray(r, np.float32)
            if r.ndim == 1 and r.shape[0] == 4:
                masks.append(boxes_to_masks(r[None], h, w)[0])
            elif r.ndim == 2 and r.shape == (h, w):
                masks.append((r > 0).astype(np.float32))
            else:
                raise ValueError(
                    f"each region must be an xyxy box [4] or a mask "
                    f"matching the image [{h}, {w}]; got {r.shape}")
        if not 0 < len(masks) <= self.max_regions:
            raise ValueError(
                f"1..{self.max_regions} regions supported per request "
                f"(max_regions), got {len(masks)}")
        clipped = _clip_region_masks(np.stack(masks), self.image_size)
        out = np.zeros((self.max_regions, self.image_size,
                        self.image_size), np.float32)
        out[:len(masks)] = clipped   # zero pads compact away on device
        return out

    def _encode(self, prompt: str, image: Optional[np.ndarray],
                history: Optional[List] = None,
                num_regions: int = 0):
        """`history`: prior turns as [user_text, assistant_text, ...] or
        [{"role": "user"|"assistant", "content": ...}, ...] — rendered
        through the conversation template ahead of the new prompt
        (reference chat format, conversation.py). The <image> marker
        attaches to the FIRST user turn, matching the reference."""
        from visionllm_tpu.data.conversation import get_conv_template
        from visionllm_tpu.data.mm_utils import (clip_preprocess,
                                                 expand_image_tokens,
                                                 tokenizer_image_token)

        conv = get_conv_template(self.conv_version)
        turns: List[str] = []
        for i, h in enumerate(history or []):
            if isinstance(h, dict):
                want = ("user", "assistant")[i % 2]
                if h.get("role", want) != want:
                    raise ValueError(
                        f"history must alternate user/assistant "
                        f"starting with user; turn {i} is "
                        f"{h.get('role')!r}")
                turns.append(h["content"])
            else:
                turns.append(h)
        if len(turns) % 2:
            raise ValueError("history must end with an assistant turn")
        turns.append(prompt)
        if num_regions:
            # one '<regions>' placeholder per conversation (it may sit
            # in a HISTORY turn on follow-ups — clients echo their
            # original prompts back) → the reference's visual-prompt
            # token structure '<reg>region1<region></reg>, ...'
            from visionllm_tpu.eval.region_eval import region_str
            occ = [i for i, t in enumerate(turns) if "<regions>" in t]
            if sum(t.count("<regions>") for t in turns) != 1:
                raise ValueError(
                    "region-prompted requests must place exactly one "
                    "<regions> placeholder in the conversation (e.g. "
                    "'What is <regions>?'); it expands to the region "
                    "token structure for all passed regions")
            turns[occ[0]] = turns[occ[0]].replace(
                "<regions>", region_str(num_regions), 1)
        if image is not None:
            turns[0] = "<image>\n" + turns[0]
        for i, text in enumerate(turns):
            conv.append_message(conv.roles[i % 2], text)
        conv.append_message(conv.roles[1], None)
        ids = tokenizer_image_token(conv.get_prompt(), self.tokenizer)
        img = None
        if image is not None:
            imp_id = self.tokenizer.convert_tokens_to_ids(
                DEFAULT_TOKENS["imp"])
            ids = expand_image_tokens(ids, self.img_len, imp_id)
            img = clip_preprocess(image, self.image_size, "pad")
        return np.asarray(ids, np.int32)[-self.max_prompt:], img, conv

    def generate(self, prompt: str, image: Optional[np.ndarray] = None,
                 max_new_tokens: Optional[int] = None,
                 history: Optional[List] = None,
                 temperature: float = 0.0, top_p: float = 1.0,
                 seed: Optional[int] = None,
                 logprobs: bool = False,
                 session: Optional[str] = None,
                 regions: Optional[List] = None) -> dict:
        from visionllm_tpu.data.mm_utils import find_stop

        if temperature > 0 and not self.sampling:
            raise ValueError("temperature > 0 requires a sampling "
                             "server (ChatService(sampling=True) / "
                             "serve --sampling)")
        if session is not None and self.max_sessions <= 0:
            raise ValueError("session KV reuse requires a session "
                             "server (serve --slots N --sessions M)")
        regs = self._check_regions(regions, image)
        ids, img, conv = self._encode(prompt, image, history,
                                      num_regions=len(regions or ()))
        req = _Request(ids, img, temperature=temperature, top_p=top_p,
                       seed=seed, session=session, regions=regs)
        t0 = time.perf_counter()
        self._submit(req)
        req.event.wait()
        latency = time.perf_counter() - t0
        if req.error is not None:
            raise req.error
        tokens = req.tokens
        if max_new_tokens is not None:
            tokens = tokens[:max_new_tokens]
        text = self.tokenizer.decode(tokens, skip_special_tokens=True)
        stop = conv.sep2 or conv.sep
        cut = find_stop(text, [stop])
        if cut is not None:
            text = text[:cut]
        self.stats["requests_total"] += 1
        self.stats["tokens_generated_total"] += int(len(tokens))
        self.stats["latency_sum_s"] += latency
        out = {"text": text.strip(), "num_tokens": int(len(tokens)),
               "ids": [int(t) for t in tokens],
               "latency_s": round(latency, 4)}
        if logprobs:
            lp = req.logprobs[:len(tokens)]
            out["logprobs"] = [round(float(x), 5) for x in lp]
        if session is not None:
            out["session"] = session
            out["session_reused"] = bool(req.session_hit)
        return out

    def generate_stream(self, prompt: str,
                        image: Optional[np.ndarray] = None,
                        history: Optional[List] = None,
                        max_new_tokens: Optional[int] = None,
                        temperature: float = 0.0, top_p: float = 1.0,
                        seed: Optional[int] = None,
                        session: Optional[str] = None,
                        regions: Optional[List] = None):
        """Incremental generation: returns an iterator of text deltas
        as the slot scheduler decodes (continuous-batching mode only —
        the other modes run the whole decode inside one jitted call and
        have no per-token host visibility).

        Validation (mode, sampling flags, history shape) happens HERE,
        before any token — the HTTP layer can still answer 400; the
        returned iterator only raises for mid-decode failures. Applies
        the same conversation stop-string trim and per-request
        max_new_tokens as the blocking path, so the concatenated deltas
        equal the non-streaming answer."""
        from visionllm_tpu.data.mm_utils import find_stop

        if self.slots <= 0:
            raise ValueError("streaming requires continuous batching "
                             "(slots > 0)")
        if temperature > 0 and not self.sampling:
            raise ValueError("temperature > 0 requires a sampling "
                             "server (serve --sampling)")
        if session is not None and self.max_sessions <= 0:
            raise ValueError("session KV reuse requires a session "
                             "server (serve --slots N --sessions M)")
        regs = self._check_regions(regions, image)
        ids, img, conv = self._encode(prompt, image, history,
                                      num_regions=len(regions or ()))
        r = _Request(ids, img, temperature=temperature, top_p=top_p,
                     seed=seed, session=session, regions=regs)
        r.stream_q = queue.Queue()
        stop = conv.sep2 or conv.sep
        limit = min(max_new_tokens or self.max_new_tokens,
                    self.max_new_tokens)

        # submit before handing back the iterator so a full queue is a
        # real Overloaded (HTTP 503), not an error frame after headers
        t0 = time.perf_counter()
        self._submit(r)

        def deltas():
            sent = ""
            toks: List[int] = []
            while True:
                item = r.stream_q.get()
                if item is None:
                    break
                toks.append(item)
                text = self.tokenizer.decode(toks[:limit],
                                             skip_special_tokens=True)
                cut = find_stop(text, [stop])
                hit_stop = cut is not None
                if hit_stop:
                    text = text[:cut]
                delta = text[len(sent):]
                if delta:
                    sent = text
                    yield delta
                if hit_stop or len(toks) >= limit:
                    break
            if r.error is not None:
                raise r.error
            self.stats["requests_total"] += 1
            self.stats["tokens_generated_total"] += len(toks)
            self.stats["latency_sum_s"] += time.perf_counter() - t0

        return deltas()

    # ---- session (multi-turn prefix) KV reuse -----------------------

    def _session_delta(self, r: "_Request"):
        """If `r` can extend a parked session, return
        (slot, delta_ids, prev_fill); else evict any stale parked entry
        for its sid and return None. Reuse requires the new
        conversation's token ids to start with the EXACT cached prefix
        (prompt + previously generated tokens whose K/V are in the
        slot), the SAME image pixels (the <image> placeholder expands
        to identical ids for any pixels, so ids alone can't detect a
        swapped image whose vision KV reuse would skip), a delta free
        of image/region/[EMB] tokens (those need the prompt-assembly
        splices, not plain embeddings), and room in the KV buffer for
        the chunk-padded delta + a full response."""
        ent = self._sessions.get(r.session)
        if ent is None:
            return None
        cached, ids = ent["ids"], np.asarray(r.ids, np.int32)
        ok = (len(ids) > len(cached)
              and bool(np.array_equal(ids[:len(cached)], cached))
              and ent["img"] == _image_key(r.image)
              and ent["reg"] == _image_key(r.regions))
        if ok:
            delta = ids[len(cached):]
            guard = {self.tid.img, self.tid.imp, self.tid.reg} | set(
                range(self.tid.emb, self.tid.emb + 8))
            ok = not any(int(t) in guard for t in delta)
        if ok:
            # the last extend window writes the delta right-padded to
            # session_chunk — an overrun would be CLAMPED by
            # dynamic_update_slice and silently shift over history
            E = self.session_chunk
            padded = -(-len(delta) // E) * E
            ok = (ent["fill"]
                  + max(padded, len(delta) + self.max_new_tokens + 1)
                  <= self.slot_max_len)
        if not ok:
            self._evict_session(r.session)
            return None
        return ent["slot"], delta, ent["fill"]

    def _evict_session(self, sid: str) -> None:
        ent = self._sessions.pop(sid, None)
        if ent is not None:
            self._slot_sid.pop(ent["slot"], None)

    def _evict_lru_session(self) -> Optional[int]:
        """Drop the least-recently-used parked session; returns its
        freed slot (None if nothing is parked)."""
        if not self._sessions:
            return None
        sid = min(self._sessions,
                  key=lambda s: self._sessions[s]["stamp"])
        slot = self._sessions[sid]["slot"]
        self._evict_session(sid)
        return slot

    def _park(self, r: "_Request", slot: int, stream: List[int],
              device_dead: bool, state, fill0: int):
        """Keep a finished session request's slot KV for the follow-up
        turn. The LAST token's K/V is not in the cache (it was sampled
        but never fed), so it belongs to the next turn's delta."""
        if r.session is None or self.max_sessions <= 0:
            return state
        import jax.numpy as jnp
        if not device_dead:
            # length-stopped: the device still thinks the slot is live
            # and would advance its fill index every tick
            state = self._sess_kill(state, jnp.asarray(slot))
        self._evict_session(r.session)
        self._stamp += 1
        self._sessions[r.session] = {
            "slot": slot,
            "ids": np.concatenate([np.asarray(r.ids, np.int32),
                                   np.asarray(stream[:-1], np.int32)]),
            "img": _image_key(r.image),
            "reg": _image_key(r.regions),
            "fill": int(fill0) + len(stream) - 1,
            "stamp": self._stamp}
        self._slot_sid[slot] = r.session
        while len(self._sessions) > self.max_sessions:
            self._evict_lru_session()
        return state

    def _extend_session(self, slot: int, delta: np.ndarray, state,
                        slot_valid, active):
        """Run a session delta through cached-extend windows (decode
        steps for live slots interleave between windows, like chunked
        admission). Returns (pre, state) with `pre` shaped like a
        prefill result for the shared insert path."""
        import jax.numpy as jnp
        E = self.session_chunk
        row, valid_row = self._sess_extract(state, slot_valid,
                                            jnp.asarray(slot))
        d = len(delta)
        dp = np.concatenate(
            [delta, np.zeros(((-d) % E,), np.int32)])
        last = None
        for k in range(len(dp) // E):
            # embed per fixed-width window (not the whole ragged delta)
            # so the server compiles ONE embed program, not one per
            # distinct padded delta length
            emb = self._sess_embed(
                self.params, jnp.asarray(dp[None, k * E:(k + 1) * E]))
            n_real = min(E, d - k * E)
            row, last = self._sess_extend(
                self.params, emb, row, valid_row,
                jnp.asarray(n_real, jnp.int32))
            if active:
                out = self._slot_step(self.params, state, slot_valid)
                state = self._dispatch_tokens(out, active, out["state"])
        first_t, embed, lp = self._sess_finish(self.params, last)
        pre = {"first": first_t[0], "embed": embed, "logprob": lp,
               "cache": row, "valid": valid_row}
        return pre, state

    # ---- continuous-batching scheduler (slots.py engine) ----

    def _slot_loop(self):
        """Single scheduler thread owns the device state. Each tick:
        admit waiting requests into free slots (prefill + insert), run
        ONE decode step for every live slot, hand finished requests
        their token streams. A request joining mid-decode never
        perturbs the others (tests/test_slots.py)."""
        import jax.numpy as jnp

        state, slot_valid = self._slot_init()
        active = {}                 # slot -> (_Request, [tokens])
        backlog: List[_Request] = []
        S = self.image_size
        L = self.max_prompt
        while True:
            # block only when fully idle
            if not active and not backlog:
                nxt = self._queue.get()
                if nxt is None:             # close() sentinel
                    return
                backlog.append(nxt)
            while True:
                try:
                    nxt = self._queue.get_nowait()
                    if nxt is None:
                        return
                    backlog.append(nxt)
                except queue.Empty:
                    break
            try:
                while backlog and len(active) < self.slots:
                    r = backlog.pop(0)
                    ext = (self._session_delta(r)
                           if r.session is not None
                           and self.max_sessions > 0 else None)
                    if ext is not None:
                        slot, delta, fill_prev = ext
                        self._evict_session(r.session)
                        self.stats["session_hits"] += 1
                        r.session_hit = True
                        pre, state = self._extend_session(
                            slot, delta, state, slot_valid, active)
                        fill0 = fill_prev + len(delta)
                        state, slot_valid = self._slot_insert(
                            state, jnp.asarray(slot), pre["first"],
                            pre["embed"], pre["cache"], pre["valid"],
                            slot_valid)
                        state = self._finish_admission(
                            r, slot, pre, active, state, fill0)
                        continue
                    if r.session is not None and self.max_sessions > 0:
                        self.stats["session_misses"] += 1
                    free = [s for s in range(self.slots)
                            if s not in active
                            and s not in self._slot_sid]
                    if not free:
                        freed = self._evict_lru_session()
                        if freed is None:
                            backlog.insert(0, r)
                            break
                        free = [freed]
                    slot = free[0]
                    n = len(r.ids)
                    ids = np.zeros((1, L), np.int32)
                    mask = np.zeros((1, L), bool)
                    ids[0, L - n:] = r.ids
                    mask[0, L - n:] = True
                    img = np.zeros((1, 1, S, S, 3), np.float32)
                    if r.image is not None:
                        img[0, 0] = r.image
                    sample_kw = {}
                    if self.sampling:
                        import jax
                        self._seed_counter += 1
                        seed = (r.seed if r.seed is not None
                                else self._seed_counter)
                        sample_kw = dict(
                            rng=jax.random.PRNGKey(seed),
                            temperature=np.float32(r.temperature),
                            top_p=np.float32(r.top_p))
                    if self.prefill_chunk > 0:
                        # chunked admission: live slots keep decoding
                        # between chunks, so the stall a long prompt
                        # causes is one chunk, not the whole prefill
                        C = self.prefill_chunk
                        chunk_kw = {}
                        if r.regions is not None:
                            chunk_kw = dict(
                                regions=jnp.asarray(r.regions[None]))
                        emb = self._chunk_embed(
                            self.params, jnp.asarray(ids),
                            jnp.asarray(img), **chunk_kw)
                        cache_row = self._chunk_row()
                        valid = jnp.concatenate(
                            [jnp.asarray(mask[0]),
                             jnp.ones((cache_row.k.shape[2] - L,),
                                      bool)])
                        last = None
                        for k in range(L // C):
                            cache_row, last = self._chunk_run(
                                self.params, emb[:, k * C:(k + 1) * C],
                                cache_row, valid)
                            if active:
                                out = self._slot_step(
                                    self.params, state, slot_valid)
                                state = self._dispatch_tokens(
                                    out, active, out["state"])
                        first_t, embed, first_lp_t = self._chunk_finish(
                            self.params, last)
                        pre = {"first": first_t[0], "embed": embed,
                               "logprob": first_lp_t,
                               "cache": cache_row, "valid": valid}
                    else:
                        if r.regions is not None:
                            sample_kw = dict(
                                sample_kw,
                                regions=jnp.asarray(r.regions[None]))
                        pre = self._slot_prefill(
                            self.params, jnp.asarray(ids),
                            jnp.asarray(img), jnp.asarray(mask),
                            **sample_kw)
                    ins_kw = {}
                    if self.sampling:
                        ins_kw = dict(
                            temperature=np.float32(r.temperature),
                            top_p=np.float32(r.top_p))
                    state, slot_valid = self._slot_insert(
                        state, jnp.asarray(slot), pre["first"],
                        pre["embed"], pre["cache"], pre["valid"],
                        slot_valid, **ins_kw)
                    state = self._finish_admission(
                        r, slot, pre, active, state, L)
                if active:
                    self.stats["scheduler_ticks"] += 1
                    self.stats["occupied_slot_ticks"] += len(active)
                    out = self._slot_step(self.params, state, slot_valid)
                    state = self._dispatch_tokens(
                        out, active, out["state"])
            except BaseException as e:              # noqa: BLE001
                self.stats["errors_total"] += len(active) + len(backlog)
                for r, *_ in active.values():
                    r.error = e
                    if r.stream_q is not None:
                        r.stream_q.put(None)
                    r.event.set()
                for r in backlog:
                    r.error = e
                    if r.stream_q is not None:
                        r.stream_q.put(None)
                    r.event.set()
                active.clear()
                backlog.clear()
                # parked KV lives in the state we just reset
                self._sessions.clear()
                self._slot_sid.clear()
                state, slot_valid = self._slot_init()

    def _finish_admission(self, r, slot, pre, active, state, fill0):
        """Shared post-insert tail of admission: surface the first
        token, finish-or-activate; `fill0` is the row fill index right
        after prefill/extension (needed to park the session later)."""
        first = int(pre["first"])
        first_lp = float(pre.get("logprob", 0.0))
        if r.stream_q is not None:
            r.stream_q.put(first)
        if first == self.eos_id or self.max_new_tokens <= 1:
            r.tokens = np.asarray([first], np.int32)
            r.logprobs = np.asarray([first_lp], np.float32)
            state = self._park(r, slot, [first],
                               first == self.eos_id, state, fill0)
            if r.stream_q is not None:
                r.stream_q.put(None)
            r.event.set()
        else:
            active[slot] = (r, [first], [first_lp], fill0)
        return state

    def _dispatch_tokens(self, out, active, state):
        """Hand each live slot its new token; finish on EOS/length.
        Returns the (possibly updated — session parking) slot state."""
        toks = np.asarray(out["token"])
        fins = np.asarray(out["finished"])
        lps = np.asarray(out["logprob"])
        if toks.ndim == 1:                  # span=1 step: one frame
            toks, fins, lps = toks[None], fins[None], lps[None]
        for t in range(toks.shape[0]):      # frames in decode order
            for slot in list(active):
                r, stream, lstream, fill0 = active[slot]
                tok = int(toks[t, slot])
                stream.append(tok)
                lstream.append(float(lps[t, slot]))
                if r.stream_q is not None:
                    r.stream_q.put(tok)
                if fins[t, slot] or len(stream) >= self.max_new_tokens:
                    r.tokens = np.asarray(stream, np.int32)
                    r.logprobs = np.asarray(lstream, np.float32)
                    del active[slot]
                    state = self._park(r, slot, stream,
                                       bool(fins[t, slot]),
                                       state, fill0)
                    if r.stream_q is not None:
                        r.stream_q.put(None)
                    r.event.set()
        return state

    # ---- batching dispatcher (single thread owns the TPU) ----

    def _dispatch_loop(self):
        while True:
            first = self._queue.get()
            if first is None:               # close() sentinel
                return
            batch = [first]
            if self.max_batch > 1:
                deadline = time.perf_counter() + self.batch_window_s
                while len(batch) < self.max_batch:
                    left = deadline - time.perf_counter()
                    if left <= 0:
                        break
                    try:
                        nxt = self._queue.get(timeout=left)
                        if nxt is None:     # close() during traffic:
                            self._queue.put(None)   # re-arm, finish batch
                            break
                        batch.append(nxt)
                    except queue.Empty:
                        break
            try:
                outs = self._run(batch)
                for r, (t, lp) in zip(batch, outs):
                    r.tokens = t
                    r.logprobs = lp
                    r.event.set()
            except BaseException as e:              # noqa: BLE001
                self.stats["errors_total"] += len(batch)
                for r in batch:
                    r.error = e
                    r.event.set()

    def _run(self, batch: List[_Request]) -> List[np.ndarray]:
        """One fixed-shape [max_batch] generate call; dummy rows are
        dead (`live=False`) and never extend the decode loop."""
        import jax.numpy as jnp

        B, S, L = self.max_batch, self.image_size, self.max_prompt
        ids = np.zeros((B, L), np.int32)
        mask = np.zeros((B, L), bool)
        # [B, 1, S, S, 3] tile stacks select the PER-SAMPLE feature
        # scatter — mixed image/text-only rows stay aligned (the global
        # flattened scatter assumes every row carries <im_patch> tokens)
        imgs = np.zeros((B, 1, S, S, 3), np.float32)
        live = np.zeros((B,), bool)
        regs = None
        for b, r in enumerate(batch):
            n = len(r.ids)
            ids[b, L - n:] = r.ids
            mask[b, L - n:] = True
            if r.image is not None:
                imgs[b, 0] = r.image
            if r.regions is not None:   # B == 1 (checked at submit)
                regs = np.asarray(r.regions[None])
            live[b] = True
        reg_kw = {} if regs is None else dict(regions=jnp.asarray(regs))
        if self.spec_k > 0:
            # latency mode: B=1, speculative windows (no `live` rows)
            out = self.generate_fn(self.params, jnp.asarray(ids),
                                   jnp.asarray(imgs),
                                   attn_mask=jnp.asarray(mask),
                                   **reg_kw)
        elif self.sampling:
            import jax
            # one key per generate call: per-request seed determinism
            # holds at bs=1 (a shared key samples the whole batch)
            seed = batch[0].seed
            if seed is None:
                self._seed_counter += 1
                seed = self._seed_counter
            temp = np.zeros((B,), np.float32)
            topp = np.ones((B,), np.float32)
            for b, r in enumerate(batch):
                temp[b] = r.temperature
                topp[b] = r.top_p
            out = self.generate_fn(self.params, jnp.asarray(ids),
                                   jnp.asarray(imgs),
                                   attn_mask=jnp.asarray(mask),
                                   live=jnp.asarray(live),
                                   rng=jax.random.PRNGKey(seed),
                                   temperature=jnp.asarray(temp),
                                   top_p=jnp.asarray(topp), **reg_kw)
        else:
            out = self.generate_fn(self.params, jnp.asarray(ids),
                                   jnp.asarray(imgs),
                                   attn_mask=jnp.asarray(mask),
                                   live=jnp.asarray(live), **reg_kw)
        n_gen = int(out["num_generated"])
        if self.spec_k > 0:
            self._track_spec_acceptance(n_gen, int(out["num_windows"]))
        toks = np.asarray(out["out_tokens"][:, :n_gen])
        lps = np.asarray(out["out_logprobs"][:, :n_gen])
        results = []
        for b in range(len(batch)):
            row, lp = toks[b], lps[b]
            ends = np.nonzero(row == self.eos_id)[0]
            if ends.size:
                row, lp = row[:ends[0] + 1], lp[:ends[0] + 1]
            results.append((row, lp))
        return results


class _Handler(BaseHTTPRequestHandler):
    service: ChatService = None     # set by serve()
    predictor = None                # optional infer.Predictor
    predictor_lock = None           # serializes perception calls
    predictor_sem = None            # bounds waiting perception requests
    model_name: str = "visionllm_tpu"

    def log_message(self, fmt, *args):   # quiet by default
        pass

    def _reply(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            import jax
            self._reply(200, {"ok": True, "model": self.model_name,
                              "devices": [str(d) for d in jax.devices()]})
        elif self.path == "/metrics":
            self._reply(200, self.service.metrics())
        else:
            self._reply(404, {"error": "not found"})

    def _read_image(self, req, required=False):
        if req.get("image_b64"):
            raw = base64.b64decode(req["image_b64"])
            shape = tuple(req["image_shape"])
            return np.frombuffer(raw, np.uint8).reshape(shape)
        if required:
            raise KeyError("image_b64")
        return None

    def _perception(self, req: dict) -> dict:
        """POST /v1/{detect,ground,pose} → Predictor, JSON-safe out."""
        if self.predictor is None:
            raise ValueError(
                "perception endpoints need a perception server "
                "(serve --perception)")
        p = self.predictor
        img = self._read_image(req, required=True)
        # bounded concurrency: at most N waiting+running perception
        # requests (same shed-don't-queue policy as /v1/generate)
        if not self.predictor_sem.acquire(blocking=False):
            raise Overloaded("perception queue full")
        try:
            return self._perception_locked(req, p, img)
        finally:
            self.predictor_sem.release()

    def _perception_locked(self, req: dict, p, img) -> dict:
        with self.predictor_lock:
            if self.path == "/v1/detect":
                out = p.detect(img, [str(c) for c in req["classes"]],
                               threshold=float(req.get("threshold", 0.3)),
                               topk=int(req.get("topk", 100)),
                               with_mask=bool(req.get("with_mask")))
            elif self.path == "/v1/ground":
                out = p.ground(img, str(req["expression"]),
                               with_mask=bool(req.get("with_mask")))
            else:
                out = p.pose(img,
                             keypoint_names=req.get("keypoint_names"),
                             threshold=float(req.get("threshold", 0.3)),
                             topk=int(req.get("topk", 20)))
        res = {}
        for k, v in out.items():
            if k in ("masks", "mask"):
                from visionllm_tpu.ops.rle import rle_encode
                res[k] = ([rle_encode(m) for m in v]
                          if k == "masks" else rle_encode(v))
            elif isinstance(v, np.ndarray):
                res[k] = (v.tolist()
                          if np.issubdtype(v.dtype, np.integer)
                          else np.round(v.astype(np.float64), 5).tolist())
            else:
                res[k] = v
        return res

    def do_POST(self):
        try:
            if self.path in ("/v1/detect", "/v1/ground", "/v1/pose"):
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                self._reply(200, self._perception(req))
                return
        except (KeyError, ValueError, TypeError) as e:
            self._reply(400, {"error": f"bad request: {e}"})
            return
        except Overloaded as e:
            self._reply(503, {"error": str(e), "retry": True})
            return
        except Exception as e:                          # noqa: BLE001
            self._reply(500, {"error": str(e)[:500]})
            return
        if self.path != "/v1/generate":
            self._reply(404, {"error": "not found"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            prompt = req["prompt"]
            image = self._read_image(req)
            regions = None
            if req.get("region_boxes") or req.get("region_masks"):
                regions = [np.asarray(b, np.float32)
                           for b in req.get("region_boxes") or ()]
                if req.get("region_masks"):
                    from visionllm_tpu.ops.rle import rle_decode
                    regions += [
                        rle_decode(m["counts"], *m["size"]).astype(
                            np.float32)
                        for m in req["region_masks"]]
            if req.get("stream"):
                # validation (mode, sampling flags, history) happens
                # before any header goes out, so bad requests are real
                # 400s; only mid-decode failures become error frames
                it = self.service.generate_stream(
                    prompt, image, history=req.get("history"),
                    max_new_tokens=req.get("max_new_tokens"),
                    temperature=float(req.get("temperature", 0.0)),
                    top_p=float(req.get("top_p", 1.0)),
                    seed=req.get("seed"),
                    session=req.get("session"),
                    regions=regions)
                # server-sent events: one data frame per text delta
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                try:
                    for delta in it:
                        frame = json.dumps({"delta": delta})
                        self.wfile.write(
                            f"data: {frame}\n\n".encode())
                        self.wfile.flush()
                except Exception as e:              # noqa: BLE001
                    frame = json.dumps({"error": str(e)[:300]})
                    self.wfile.write(f"data: {frame}\n\n".encode())
                self.wfile.write(b"data: [DONE]\n\n")
                return
            out = self.service.generate(
                prompt, image, max_new_tokens=req.get("max_new_tokens"),
                history=req.get("history"),
                temperature=float(req.get("temperature", 0.0)),
                top_p=float(req.get("top_p", 1.0)),
                seed=req.get("seed"),
                logprobs=bool(req.get("logprobs")),
                session=req.get("session"),
                regions=regions)
            self._reply(200, out)
        except (KeyError, ValueError, TypeError) as e:
            self._reply(400, {"error": f"bad request: {e}"})
        except Overloaded as e:
            self._reply(503, {"error": str(e), "retry": True})
        except Exception as e:                          # noqa: BLE001
            self._reply(500, {"error": str(e)[:500]})


def make_server(service: ChatService, host: str = "127.0.0.1",
                port: int = 8000, model_name: str = "visionllm_tpu",
                predictor=None) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server — tests drive this."""
    handler = type("Handler", (_Handler,),
                   {"service": service, "model_name": model_name,
                    "predictor": predictor,
                    "predictor_lock": threading.Lock(),
                    "predictor_sem": threading.BoundedSemaphore(32)})
    return ThreadingHTTPServer((host, port), handler)


def serve(service: ChatService, host: str = "0.0.0.0", port: int = 8000,
          model_name: str = "visionllm_tpu", predictor=None) -> None:
    srv = make_server(service, host, port, model_name, predictor)
    print(f"serving {model_name} on http://{host}:{port} "
          f"(POST /v1/generate"
          + (", /v1/detect, /v1/ground, /v1/pose" if predictor else "")
          + ", GET /healthz)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
