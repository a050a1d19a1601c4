"""Serving-stack benchmark: drive the REAL HTTP server end-to-end.

Measures what a deployment sees — requests/sec, latency percentiles,
and aggregate generated tok/s — through the full stack (HTTP → prompt
templating → prefill → decode → detokenize), for each serving mode:

    python bench_serve.py --mode batch --max-batch 8 --requests 32
    python bench_serve.py --mode slots --slots 8
    python bench_serve.py --mode spec  --spec-k 7
    python bench_serve.py --tiny ...          # CPU smoke (tests)

Defaults to the 7B serving configuration with int8 weight-only
quantization (the 16 GB v5e chip holds the 6.7 GB int8 tree
comfortably; random-init — timing is value-independent). Emits ONE
JSON line and writes bench_serve.json.

Latency caveat: on the axon relay each host↔device round trip costs
O(10 ms)+, which inflates per-request latency (slots mode pays one
trip per token). Aggregate tok/s and requests/sec amortize it less;
on-pod deployments see lower latencies than these numbers.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time


def log(msg):
    print(f"[bench_serve +{time.time()-T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.time()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="batch",
                    choices=["plain", "batch", "slots", "spec",
                             "sessions"])
    ap.add_argument("--turns", type=int, default=3,
                    help="sessions mode: conversation turns per session")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--spec-k", type=int, default=7)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--concurrency", default="8",
                    help="comma list (e.g. 8,32): the measured window "
                         "runs once per level")
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--max-prompt", type=int, default=704)
    ap.add_argument("--quant", default="int8",
                    choices=["", "int8", "int4"])
    ap.add_argument("--kv-quant", default="", choices=["", "int8"])
    ap.add_argument("--decode-span", type=int, default=1,
                    help="slots mode: tokens per device call (amortizes "
                         "the relay round trip; see slots.build_slot_fns)")
    ap.add_argument("--prefill-chunk", type=int, default=0,
                    help="slots mode: chunked prefill width (0 = "
                         "monolithic; exclusive with --kv-quant)")
    ap.add_argument("--stream", action="store_true",
                    help="slots mode: drive SSE streaming requests and "
                         "report TTFT + per-token latency percentiles")
    ap.add_argument("--mixed-prompts", action="store_true",
                    help="draw prompt lengths from short/medium/long "
                         "buckets instead of 4 short questions")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    concurrency_levels = [int(c) for c in
                          str(args.concurrency).split(",")]
    args.concurrency = concurrency_levels[0]

    import numpy as np

    import jax

    # persistent compile cache (off-repo): repeat bench runs inside a
    # round skip the multi-minute XLA compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.tiny:
        # CPU smoke: must win over the environment's TPU pin before any
        # backend initializes (env vars are too late — see conftest.py)
        jax.config.update("jax_platforms", "cpu")
    else:
        # fail fast if the TPU backend is unreachable (same contract as
        # bench.py's probe): 2 retries then CPU fallback with a note
        for attempt in range(3):
            try:
                jax.devices()
                break
            except Exception as e:              # noqa: BLE001
                log(f"backend probe failed ({attempt + 1}): "
                    f"{str(e)[:150]}")
                if attempt == 2:
                    jax.config.update("jax_platforms", "cpu")
                    log("falling back to CPU")
                time.sleep(5)
    import jax.numpy as jnp

    from visionllm_tpu.config import tiny_test_config, vllm_7b_config
    from visionllm_tpu.serve import ChatService, make_server
    from visionllm_tpu.utils.simple_tokenizer import (MockTokenizer,
                                                      RoundTripTokenizer)

    if args.tiny:
        cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                               use_sd=False, use_ip2p=False,
                               use_region_encoder=False)
    else:
        import dataclasses
        cfg = vllm_7b_config()
        cfg = dataclasses.replace(
            cfg, use_gdino=False, use_unipose=False, use_sd=False,
            use_ip2p=False, use_region_encoder=False,
            llm=dataclasses.replace(cfg.llm, quant=args.quant,
                                    kv_quant=args.kv_quant))
    # sessions mode re-renders each turn's history back into ids; the
    # cached-prefix match needs generated ids to survive the text round
    # trip (a real subword tokenizer does; the word-level mock doesn't)
    tok = RoundTripTokenizer() if args.mode == "sessions" \
        else MockTokenizer()
    mode_kw = {}
    if args.mode == "batch":
        mode_kw = dict(max_batch=args.max_batch, batch_window_ms=30.0)
    elif args.mode == "slots":
        mode_kw = dict(slots=args.slots,
                       prefill_chunk=args.prefill_chunk,
                       decode_span=args.decode_span)
    elif args.mode == "sessions":
        mode_kw = dict(slots=args.slots, sessions=args.slots,
                       decode_span=args.decode_span)
    elif args.mode == "spec":
        mode_kw = dict(spec_k=args.spec_k)
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    svc = ChatService(cfg, None, tok,
                      image_size=cfg.vis_encoder.image_size,
                      max_new_tokens=args.max_new_tokens,
                      max_prompt=args.max_prompt, dtype=dtype,
                      **mode_kw)

    # random-init params shaped by a probe prompt, cast to the serving
    # dtype inside jit (the f32 tree would not fit the chip at 7B)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [svc.tid.imp] * img_len + [5, 6]],
                      jnp.int32)

    def init(r):
        p = svc.core.init(r, ids,
                          jnp.zeros((1, size, size, 3), jnp.float32),
                          svc.tid)["params"]
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if x.dtype == jnp.float32 else x, p)

    t = time.time()
    params = jax.jit(init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"init {time.time()-t:.1f}s")
    if args.quant and not args.tiny:
        from visionllm_tpu.ops.quant import quantize_serving_params
        t = time.time()
        params = quantize_serving_params(
            params, bits=4 if args.quant == "int4" else 8,
            delete_source=True)
        jax.block_until_ready(jax.tree.leaves(params)[:1])
        log(f"quantize({args.quant}) {time.time()-t:.1f}s")
    svc.params = params

    srv = make_server(svc, port=0, model_name=f"bench-{args.mode}")
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/v1/generate"
    import urllib.request

    def post(body, timeout=1200):
        req = urllib.request.Request(
            url, json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:   # surface the server error
            raise RuntimeError(
                f"HTTP {e.code}: {e.read()[:500]!r}") from None

    prompts = [
        "what is shown in the image",
        "describe the scene in detail please",
        "how many objects are there",
        "is there a person in this picture",
    ]
    if args.mixed_prompts:
        # short / medium / long buckets (word-level tokenizer: words ≈
        # tokens); long stays under --max-prompt with the image tokens
        filler = ("the scene contains several regions of interest and "
                  "context that may matter for the answer ")
        prompts = ([p for p in prompts]
                   + [p + ". " + filler * 4 for p in prompts]
                   + [p + ". " + filler * 16 for p in prompts])
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (480, 640, 3), np.uint8)
    import base64
    img_body = {"image_b64": base64.b64encode(img.tobytes()).decode(),
                "image_shape": list(img.shape)}

    # warm: pay every compile before the measured window
    t = time.time()
    post({"prompt": prompts[0], **img_body})
    post({"prompt": prompts[1]})
    log(f"warm (compiles) {time.time()-t:.1f}s")

    if args.mode == "sessions":
        # multi-turn conversations: same workload with and without
        # session KV reuse; turn>=2 latency compares extend-only
        # prefill against full-history re-prefill
        turns = max(2, args.turns)
        n_sess = max(1, args.requests // turns)

        def run_convs(use_sessions, tag):
            rows = []        # (turn_idx, dt, reused)
            lk = threading.Lock()
            it2 = iter(range(n_sess))

            def sworker():
                while True:
                    with lk:
                        try:
                            s = next(it2)
                        except StopIteration:
                            return
                    hist = []
                    for ti in range(turns):
                        body = {"prompt":
                                f"{prompts[ti % len(prompts)]} v{ti}",
                                **img_body}
                        if hist:
                            body["history"] = hist
                        if use_sessions:
                            body["session"] = f"{tag}{s}"
                        t0 = time.perf_counter()
                        out = post(body)
                        dt = time.perf_counter() - t0
                        with lk:
                            rows.append((ti, dt,
                                         bool(out.get("session_reused"))))
                        # rebuild the answer from raw ids ("tN" words
                        # round-trip through RoundTripTokenizer for ANY
                        # id) — random-init weights can emit ids whose
                        # text decode drops them, which would break the
                        # cached-prefix match this mode measures
                        ans = " ".join(f"t{t}" for t in out["ids"])
                        hist = hist + [body["prompt"], ans]

            ths = [threading.Thread(target=sworker)
                   for _ in range(min(args.concurrency, n_sess))]
            t0 = time.perf_counter()
            for th in ths:
                th.start()
            for th in ths:
                th.join()
            return rows, time.perf_counter() - t0

        reuse_rows, reuse_wall = run_convs(True, "r")
        full_rows, full_wall = run_convs(False, "f")

        def p50(xs):
            xs = sorted(xs)
            return round(xs[len(xs) // 2], 3) if xs else None

        reuse_lat = [dt for ti, dt, _ in reuse_rows if ti > 0]
        full_lat = [dt for ti, dt, _ in full_rows if ti > 0]
        hits = sum(r for ti, _, r in reuse_rows if ti > 0)
        result = {
            "metric": "serve_sessions_turn_latency_speedup",
            "value": round(p50(full_lat) / p50(reuse_lat), 3)
            if reuse_lat and full_lat else 0.0,
            "unit": "x (p50 turn>=2, full-prefill / session-extend)",
            "mode": "sessions",
            "sessions": n_sess,
            "turns": turns,
            "session_hits": hits,
            "session_hit_rate": round(hits / max(len(reuse_lat), 1), 3),
            "turn_latency_p50_reuse_s": p50(reuse_lat),
            "turn_latency_p50_full_s": p50(full_lat),
            "wall_reuse_s": round(reuse_wall, 2),
            "wall_full_s": round(full_wall, 2),
            # device-side admission cost per turn>=2: a full re-prefill
            # runs the whole padded prompt (image tokens + history)
            # through the LLM; a session hit runs one session_chunk
            # extend window. On the relay-attached chip both are small
            # vs per-turn scheduling overhead, so the wall-clock
            # speedup understates the on-device saving.
            "admission_tokens_full_prefill": args.max_prompt,
            "admission_tokens_session_extend": 64,
            "max_new_tokens": args.max_new_tokens,
            "quant": args.quant if not args.tiny else "",
            "device": jax.devices()[0].platform,
        }
        print(json.dumps(result), flush=True)
        with open("bench_serve.json", "w") as f:
            json.dump(result, f)
        srv.shutdown()
        svc.close()
        return

    use_stream = args.stream and args.mode in ("slots",)

    def post_stream(body, timeout=1200):
        """SSE request; returns (ttft_s, total_s, n_deltas)."""
        req = urllib.request.Request(
            url, json.dumps(dict(body, stream=True)).encode(),
            headers={"Content-Type": "application/json"})
        t0 = time.perf_counter()
        t_first = None
        n_deltas = 0
        with urllib.request.urlopen(req, timeout=timeout) as r:
            for line in r:
                if not line.startswith(b"data: "):
                    continue
                payload = line[6:].strip()
                if payload == b"[DONE]":
                    break
                frame = json.loads(payload)
                if "error" in frame:
                    raise RuntimeError(frame["error"])
                if t_first is None:
                    t_first = time.perf_counter()
                n_deltas += 1
        return (t_first - t0 if t_first else None,
                time.perf_counter() - t0, n_deltas)

    def pct(xs, q):
        xs = sorted(xs)
        return round(xs[min(len(xs) - 1, int(len(xs) * q))], 4) \
            if xs else None

    def run_window(conc):
        lat, ttfts, tpots, tokens = [], [], [], []
        errs = [0]
        lock = threading.Lock()
        reqs = [{"prompt": prompts[i % len(prompts)],
                 **(img_body if i % 2 == 0 else {})}
                for i in range(args.requests)]
        it = iter(range(args.requests))

        def worker():
            while True:
                with lock:
                    try:
                        i = next(it)
                    except StopIteration:
                        return
                t0 = time.perf_counter()
                try:
                    if use_stream:
                        ttft, dt, n_tok = post_stream(reqs[i])
                        with lock:
                            lat.append(dt)
                            tokens.append(n_tok)
                            if ttft is not None:
                                ttfts.append(ttft)
                                if n_tok > 1:
                                    tpots.append((dt - ttft)
                                                 / (n_tok - 1))
                    else:
                        out = post(reqs[i])
                        dt = time.perf_counter() - t0
                        with lock:
                            lat.append(dt)
                            tokens.append(out["num_tokens"])
                except Exception as e:          # noqa: BLE001
                    log(f"request {i} failed: {e}")
                    with lock:
                        errs[0] += 1

        t_run = time.perf_counter()
        threads = [threading.Thread(target=worker)
                   for _ in range(conc)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t_run
        n = len(lat)
        win = {
            "concurrency": conc,
            "requests": n,
            "errors": errs[0],
            "req_per_sec": round(n / wall, 3) if wall > 0 else 0.0,
            "wall_s": round(wall, 2),
            "agg_tok_s": round(sum(tokens) / wall, 2)
            if wall > 0 else 0.0,
            "latency_p50_s": pct(lat, 0.50),
            "latency_p95_s": pct(lat, 0.95),
        }
        if ttfts:
            win["ttft_p50_s"] = pct(ttfts, 0.50)
            win["ttft_p95_s"] = pct(ttfts, 0.95)
        if tpots:
            win["per_token_p50_s"] = pct(tpots, 0.50)
            win["per_token_p95_s"] = pct(tpots, 0.95)
        log(f"conc={conc}: {win}")
        return win

    windows = [run_window(c) for c in concurrency_levels]
    best = max(windows, key=lambda w: w["req_per_sec"])
    result = {
        "metric": f"serve_{args.mode}_requests_per_sec",
        "value": best["req_per_sec"],
        "unit": "req/s",
        "mode": args.mode,
        "quant": args.quant if not args.tiny else "",
        "kv_quant": args.kv_quant if not args.tiny else "",
        "prefill_chunk": args.prefill_chunk,
        "decode_span": args.decode_span,
        "stream": use_stream,
        "mixed_prompts": args.mixed_prompts,
        "max_new_tokens": args.max_new_tokens,
        "windows": windows,
        **{k: v for k, v in best.items() if k != "concurrency"},
        "concurrency": best["concurrency"],
        "device": jax.devices()[0].platform,
    }
    print(json.dumps(result), flush=True)
    with open("bench_serve.json", "w") as f:
        json.dump(result, f)
    srv.shutdown()
    svc.close()


if __name__ == "__main__":
    main()
