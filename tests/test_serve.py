"""HTTP serving front-end: ChatService + /v1/generate end-to-end.

Tiny random-init model + mock tokenizer; the server must answer health
checks, generate text for prompts with and without an image, and reject
malformed requests — all over a real socket."""

import base64
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.mock_tokenizer import MockTokenizer
from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.serve import ChatService, make_server


@pytest.fixture(scope="module")
def server():
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    svc = ChatService.__new__(ChatService)
    # build through __init__ but with f32 + tiny budgets
    svc.__init__(cfg, None, tok, image_size=cfg.vis_encoder.image_size,
                 max_new_tokens=8, max_prompt=128, dtype=jnp.float32)
    # random-init params shaped by a probe prompt (smoke serving without
    # a checkpoint, same idiom as cli smoke runs)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [svc.tid.imp] * img_len + [5, 6]], jnp.int32)
    svc.params = svc.core.init(
        jax.random.PRNGKey(0), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), svc.tid)["params"]

    srv = make_server(svc, port=0, model_name="tiny-test")
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, obj, timeout=240):
    req = urllib.request.Request(
        url, json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["ok"] is True
    assert body["model"] == "tiny-test"
    assert body["devices"]


def test_generate_with_image(server):
    img = np.random.RandomState(0).randint(
        0, 255, (64, 48, 3), np.uint8)
    code, body = _post(server + "/v1/generate", {
        "prompt": "describe the image",
        "image_b64": base64.b64encode(img.tobytes()).decode(),
        "image_shape": list(img.shape),
    })
    assert code == 200, body
    assert isinstance(body["text"], str)
    assert body["num_tokens"] >= 1
    assert body["latency_s"] > 0


def test_generate_text_only_and_deterministic(server):
    code1, b1 = _post(server + "/v1/generate", {"prompt": "hello there"})
    code2, b2 = _post(server + "/v1/generate", {"prompt": "hello there"})
    assert code1 == code2 == 200
    assert b1["text"] == b2["text"]        # greedy decode is deterministic


def test_bad_request(server):
    code, body = _post(server + "/v1/generate", {"image_b64": "xx"})
    assert code == 400
    assert "error" in body


def test_unknown_route(server):
    code, body = _post(server + "/v1/nope", {"prompt": "x"})
    assert code == 404


@pytest.fixture(scope="module")
def batched_server():
    """Same tiny model but max_batch=3 with a generous window so three
    concurrent requests coalesce into ONE [3]-vectorized generate."""
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    svc = ChatService(cfg, None, tok,
                      image_size=cfg.vis_encoder.image_size,
                      max_new_tokens=8, max_prompt=128,
                      max_batch=3, batch_window_ms=400.0,
                      dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [svc.tid.imp] * img_len + [5, 6]], jnp.int32)
    svc.params = svc.core.init(
        jax.random.PRNGKey(0), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), svc.tid)["params"]

    srv = make_server(svc, port=0, model_name="tiny-batched")
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{port}", svc
    srv.shutdown()


def test_microbatched_concurrent_requests(batched_server):
    """Three different prompts posted concurrently must each get the
    same answer they get when asked alone (micro-batching is invisible
    to clients)."""
    url, svc = batched_server
    img = np.random.RandomState(1).randint(0, 255, (40, 56, 3), np.uint8)
    reqs = [
        {"prompt": "what color is the sky"},
        {"prompt": "count the objects please",
         "image_b64": base64.b64encode(img.tobytes()).decode(),
         "image_shape": list(img.shape)},
        {"prompt": "hi"},
    ]
    # solo answers first (batch of one + dead rows)
    solo = [_post(url + "/v1/generate", r) for r in reqs]
    assert all(c == 200 for c, _ in solo), solo

    results = [None] * len(reqs)

    def fire(i):
        results[i] = _post(url + "/v1/generate", reqs[i])

    threads = [threading.Thread(target=fire, args=(i,))
               for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, ((sc, sb), r) in enumerate(zip(solo, results)):
        assert r is not None, f"request {i} hung"
        c, b = r
        assert c == 200, b
        assert b["text"] == sb["text"], f"request {i} answer changed"
        assert b["num_tokens"] == sb["num_tokens"]


def test_batched_service_single_request_ok(batched_server):
    """A lone request on a max_batch=3 service (two dead rows) still
    answers, after at most the batch window of extra latency."""
    url, _ = batched_server
    code, body = _post(url + "/v1/generate", {"prompt": "solo request"})
    assert code == 200, body
    assert isinstance(body["text"], str)


def test_speculative_service_matches_plain(server):
    """--spec-k latency mode: a speculative ChatService with the SAME
    params must return byte-identical answers to the plain service."""
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    plain = ChatService(cfg, None, tok,
                        image_size=cfg.vis_encoder.image_size,
                        max_new_tokens=8, max_prompt=128,
                        dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [plain.tid.imp] * img_len + [5, 6]],
                      jnp.int32)
    plain.params = plain.core.init(
        jax.random.PRNGKey(7), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), plain.tid)["params"]
    spec = ChatService(cfg, plain.params, tok,
                       image_size=cfg.vis_encoder.image_size,
                       max_new_tokens=8, max_prompt=128, spec_k=3,
                       dtype=jnp.float32)
    img = np.random.RandomState(2).randint(0, 255, (40, 56, 3), np.uint8)
    for req in ({"prompt": "what is shown here"},
                {"prompt": "look closely", "image": img}):
        kw = dict(prompt=req["prompt"], image=req.get("image"))
        a = plain.generate(**kw)
        b = spec.generate(**kw)
        assert a["text"] == b["text"]
        assert a["num_tokens"] == b["num_tokens"]


def test_spec_k_with_batching_rejected():
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    with pytest.raises(ValueError, match="mutually exclusive"):
        ChatService(cfg, None, MockTokenizer(),
                    image_size=cfg.vis_encoder.image_size,
                    max_batch=2, spec_k=3, dtype=jnp.float32)


def test_continuous_batching_service_matches_plain():
    """--slots continuous batching over a real socket: concurrent
    requests (joining mid-decode of one another) must each get the
    answer the plain bs=1 service gives them."""
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    plain = ChatService(cfg, None, tok,
                        image_size=cfg.vis_encoder.image_size,
                        max_new_tokens=8, max_prompt=128,
                        dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [plain.tid.imp] * img_len + [5, 6]],
                      jnp.int32)
    plain.params = plain.core.init(
        jax.random.PRNGKey(3), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), plain.tid)["params"]
    cont = ChatService(cfg, plain.params, tok,
                       image_size=cfg.vis_encoder.image_size,
                       max_new_tokens=8, max_prompt=128, slots=2,
                       dtype=jnp.float32)
    srv = make_server(cont, port=0, model_name="tiny-cb")
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    try:
        img = np.random.RandomState(5).randint(0, 255, (40, 56, 3),
                                               np.uint8)
        reqs = [
            {"prompt": "first question"},
            {"prompt": "second question about the image",
             "image_b64": base64.b64encode(img.tobytes()).decode(),
             "image_shape": list(img.shape)},
            {"prompt": "third one"},
        ]
        want = [plain.generate(r["prompt"],
                               img if "image_b64" in r else None)
                for r in reqs]
        results = [None] * len(reqs)

        def fire(i):
            results[i] = _post(url + "/v1/generate", reqs[i])

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i, (w, r) in enumerate(zip(want, results)):
            assert r is not None, f"request {i} hung"
            c, b = r
            assert c == 200, b
            assert b["text"] == w["text"], f"request {i} answer changed"
    finally:
        srv.shutdown()


def test_slots_with_other_modes_rejected():
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    with pytest.raises(ValueError, match="continuous batching"):
        ChatService(cfg, None, MockTokenizer(),
                    image_size=cfg.vis_encoder.image_size,
                    max_batch=2, slots=2, dtype=jnp.float32)


def test_chunked_prefill_service_matches_plain():
    """--slots + --prefill-chunk: admissions run in prompt chunks with
    decode interleaved; answers still match the plain service."""
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    plain = ChatService(cfg, None, tok,
                        image_size=cfg.vis_encoder.image_size,
                        max_new_tokens=8, max_prompt=96,
                        dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [plain.tid.imp] * img_len + [5, 6]],
                      jnp.int32)
    plain.params = plain.core.init(
        jax.random.PRNGKey(9), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), plain.tid)["params"]
    chunked = ChatService(cfg, plain.params, tok,
                          image_size=cfg.vis_encoder.image_size,
                          max_new_tokens=8, max_prompt=96, slots=2,
                          prefill_chunk=32, dtype=jnp.float32)
    img = np.random.RandomState(6).randint(0, 255, (48, 40, 3), np.uint8)
    reqs = [("tell me a story", None), ("what is here", img),
            ("short", None)]
    want = [plain.generate(p, i) for p, i in reqs]
    results = [None] * len(reqs)

    def fire(i):
        p, im = reqs[i]
        results[i] = chunked.generate(p, im)

    threads = [threading.Thread(target=fire, args=(i,))
               for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, (w, r) in enumerate(zip(want, results)):
        assert r is not None, f"request {i} hung"
        assert r["text"] == w["text"], f"request {i} answer changed"


def test_streaming_sse_matches_nonstream():
    """"stream": true on a --slots server: SSE deltas concatenate to
    the non-streaming answer; non-slots servers reject streaming."""
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    svc = ChatService(cfg, None, tok,
                      image_size=cfg.vis_encoder.image_size,
                      max_new_tokens=8, max_prompt=128, slots=2,
                      dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [svc.tid.imp] * img_len + [5, 6]],
                      jnp.int32)
    svc.params = svc.core.init(
        jax.random.PRNGKey(11), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), svc.tid)["params"]
    srv = make_server(svc, port=0, model_name="tiny-sse")
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    try:
        code, plain = _post(url + "/v1/generate",
                            {"prompt": "stream this"})
        assert code == 200

        req = urllib.request.Request(
            url + "/v1/generate",
            json.dumps({"prompt": "stream this",
                        "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        deltas = []
        with urllib.request.urlopen(req, timeout=240) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            for line in r:
                line = line.decode().strip()
                if not line.startswith("data: "):
                    continue
                payload = line[len("data: "):]
                if payload == "[DONE]":
                    break
                obj = json.loads(payload)
                assert "error" not in obj, obj
                deltas.append(obj["delta"])
        assert len(deltas) >= 1
        assert "".join(deltas).strip() == plain["text"]
    finally:
        srv.shutdown()


def test_multiturn_history(server):
    """history turns render through the conversation template: the
    answer to a follow-up must equal a fresh request whose prompt was
    built with the same history (determinism), and malformed history
    is a 400."""
    first = _post(server + "/v1/generate", {"prompt": "hello there"})
    assert first[0] == 200
    follow = {"prompt": "and a follow up",
              "history": ["hello there", first[1]["text"]]}
    a = _post(server + "/v1/generate", follow)
    b = _post(server + "/v1/generate", follow)
    assert a[0] == 200 and b[0] == 200
    assert a[1]["text"] == b[1]["text"]
    # dict form equals list form
    c = _post(server + "/v1/generate", {
        "prompt": "and a follow up",
        "history": [{"role": "user", "content": "hello there"},
                    {"role": "assistant", "content": first[1]["text"]}]})
    assert c[0] == 200 and c[1]["text"] == a[1]["text"]

    code, body = _post(server + "/v1/generate", {
        "prompt": "x", "history": [{"role": "assistant", "content": "y"}]})
    assert code == 400 and "alternate" in body["error"]
    code, body = _post(server + "/v1/generate", {
        "prompt": "x", "history": ["only a user turn"]})
    assert code == 400


def test_serve_with_real_subword_tokenizer():
    """End-to-end serving on the REAL trained subword tokenizer fixture
    (tests/fixtures/tiny_tokenizer) instead of the char-level mock:
    prompt templating, <image> expansion, decode, and stop-string
    trimming all cross real merge boundaries."""
    import os
    from transformers import PreTrainedTokenizerFast
    from visionllm_tpu.constants import DEFAULT_TOKENS

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "tiny_tokenizer")
    tok = PreTrainedTokenizerFast.from_pretrained(fixture)
    tok.pad_token = tok.unk_token
    tok.add_tokens(list(DEFAULT_TOKENS.values()), special_tokens=True)

    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    svc = ChatService(cfg, None, tok,
                      image_size=cfg.vis_encoder.image_size,
                      max_new_tokens=6, max_prompt=700, slots=2,
                      dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [svc.tid.imp] * img_len + [5, 6]],
                      jnp.int32)
    svc.params = svc.core.init(
        jax.random.PRNGKey(21), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), svc.tid)["params"]
    img = np.random.RandomState(8).randint(0, 255, (40, 56, 3), np.uint8)
    out1 = svc.generate("what do you see in the picture", img)
    out2 = svc.generate("what do you see in the picture", img)
    assert isinstance(out1["text"], str)
    assert out1["text"] == out2["text"]      # deterministic greedy
    assert out1["num_tokens"] >= 1


def test_metrics_endpoint(server):
    _post(server + "/v1/generate", {"prompt": "count me"})
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["requests_total"] >= 1
    assert m["tokens_generated_total"] >= 1
    assert m["latency_avg_s"] > 0
    assert m["mode"] == "batch1"


def test_sampling_service():
    """--sampling server: temperature 0 equals the greedy service, a
    fixed seed is deterministic, and a non-sampling server rejects
    temperature > 0."""
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    plain = ChatService(cfg, None, tok,
                        image_size=cfg.vis_encoder.image_size,
                        max_new_tokens=8, max_prompt=128,
                        dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [plain.tid.imp] * img_len + [5, 6]],
                      jnp.int32)
    plain.params = plain.core.init(
        jax.random.PRNGKey(13), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), plain.tid)["params"]
    samp = ChatService(cfg, plain.params, tok,
                       image_size=cfg.vis_encoder.image_size,
                       max_new_tokens=8, max_prompt=128, sampling=True,
                       dtype=jnp.float32)
    g = plain.generate("the same question")
    s0 = samp.generate("the same question", temperature=0.0)
    assert s0["text"] == g["text"]
    a = samp.generate("the same question", temperature=1.5, seed=7)
    b = samp.generate("the same question", temperature=1.5, seed=7)
    assert a["text"] == b["text"]
    with pytest.raises(ValueError, match="sampling"):
        plain.generate("x", temperature=0.9)


def test_logprobs_in_response(server):
    code, body = _post(server + "/v1/generate",
                       {"prompt": "score this", "logprobs": True})
    assert code == 200, body
    lps = body["logprobs"]
    assert len(lps) == body["num_tokens"]
    assert all(isinstance(x, float) and x <= 0.0 for x in lps)
    code2, body2 = _post(server + "/v1/generate", {"prompt": "score this"})
    assert code2 == 200 and "logprobs" not in body2


def test_slot_sampling_service():
    """--slots --sampling: temperature-0 requests match the greedy
    slot service; hot requests still answer; logprobs come back."""
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    greedy = ChatService(cfg, None, tok,
                         image_size=cfg.vis_encoder.image_size,
                         max_new_tokens=8, max_prompt=128, slots=2,
                         dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [greedy.tid.imp] * img_len + [5, 6]],
                      jnp.int32)
    greedy.params = greedy.core.init(
        jax.random.PRNGKey(17), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), greedy.tid)["params"]
    samp = ChatService(cfg, greedy.params, tok,
                       image_size=cfg.vis_encoder.image_size,
                       max_new_tokens=8, max_prompt=128, slots=2,
                       sampling=True, dtype=jnp.float32)
    g = greedy.generate("slot question", logprobs=True)
    s0 = samp.generate("slot question", temperature=0.0, logprobs=True)
    assert s0["text"] == g["text"]
    assert len(g["logprobs"]) == g["num_tokens"]
    assert all(x <= 0.0 for x in g["logprobs"])
    hot = samp.generate("slot question", temperature=2.0)
    assert isinstance(hot["text"], str)


def test_stream_validation_is_a_real_400():
    """Malformed streaming requests (bad history, temperature without
    --sampling) must fail with HTTP 400 BEFORE any SSE bytes."""
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    svc = ChatService(cfg, None, tok,
                      image_size=cfg.vis_encoder.image_size,
                      max_new_tokens=6, max_prompt=128, slots=2,
                      dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [svc.tid.imp] * img_len + [5]], jnp.int32)
    svc.params = svc.core.init(
        jax.random.PRNGKey(23), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), svc.tid)["params"]
    srv = make_server(svc, port=0, model_name="tiny-sse400")
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    try:
        code, body = _post(url + "/v1/generate", {
            "prompt": "x", "stream": True, "temperature": 1.5})
        assert code == 400 and "sampling" in body["error"]
        code, body = _post(url + "/v1/generate", {
            "prompt": "x", "stream": True,
            "history": [{"role": "assistant", "content": "y"}]})
        assert code == 400
    finally:
        srv.shutdown()


def test_overload_sheds_with_503():
    """A full admission queue must answer 503 rather than queueing
    unboundedly."""
    from visionllm_tpu.serve import Overloaded

    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    svc = ChatService(cfg, None, tok,
                      image_size=cfg.vis_encoder.image_size,
                      max_new_tokens=6, max_prompt=128, max_queue=1,
                      dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [svc.tid.imp] * img_len + [5]], jnp.int32)
    svc.params = svc.core.init(
        jax.random.PRNGKey(29), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), svc.tid)["params"]
    # first request compiles (slow) and occupies the dispatcher; fill
    # the 1-deep queue behind it, then the next submit must shed
    ok = {"n": 0}

    def fire():
        try:
            svc.generate("hold the line")
            ok["n"] += 1
        except Overloaded:
            pass

    threads = [threading.Thread(target=fire) for _ in range(6)]
    shed = 0
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    # at least one must succeed; with a 1-deep queue and 6 concurrent
    # submissions during a multi-second compile, at least one sheds
    assert ok["n"] >= 1
    assert ok["n"] < 6


def test_spec_auto_disable_on_low_acceptance():
    """VERDICT r4: a spec service whose measured tokens-per-window sits
    below break-even must fall back to the plain decode loop — and keep
    answering identically."""
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    svc = ChatService(cfg, None, tok,
                      image_size=cfg.vis_encoder.image_size,
                      max_new_tokens=8, max_prompt=128, spec_k=3,
                      dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [svc.tid.imp] * img_len + [5, 6]],
                      jnp.int32)
    svc.params = svc.core.init(
        jax.random.PRNGKey(7), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), svc.tid)["params"]
    # force the trip: any real acceptance is below an impossible
    # break-even once the window minimum is met
    svc.SPEC_MIN_WINDOWS = 1
    svc.SPEC_BREAK_EVEN = 99.0
    a = svc.generate("what is shown here")
    assert svc._spec_disabled
    assert svc.spec_k == 0
    m = svc.metrics()
    assert m["spec_disabled"] is True
    assert m["spec_windows_total"] >= 1
    assert m["spec_tokens_per_window"] >= 0
    # the plain loop (compiled lazily on the swap) answers identically
    b = svc.generate("what is shown here")
    assert a["text"] == b["text"]


def test_decode_span_service_matches_plain():
    """--decode-span 3: multi-token device ticks through the full HTTP
    service (2D frame dispatch) — answers must equal the plain bs=1
    service, concurrent requests included."""
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    plain = ChatService(cfg, None, tok,
                        image_size=cfg.vis_encoder.image_size,
                        max_new_tokens=8, max_prompt=128,
                        dtype=jnp.float32)
    size = cfg.vis_encoder.image_size
    img_len = (size // 14) ** 2
    ids = jnp.asarray([[1] + [plain.tid.imp] * img_len + [5, 6]],
                      jnp.int32)
    plain.params = plain.core.init(
        jax.random.PRNGKey(3), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), plain.tid)["params"]
    cont = ChatService(cfg, plain.params, tok,
                       image_size=cfg.vis_encoder.image_size,
                       max_new_tokens=8, max_prompt=128, slots=2,
                       decode_span=3, dtype=jnp.float32)
    srv = make_server(cont, port=0, model_name="tiny-span")
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    try:
        img = np.random.RandomState(5).randint(0, 255, (40, 56, 3),
                                               np.uint8)
        reqs = [
            {"prompt": "first question"},
            {"prompt": "second question about the image",
             "image_b64": base64.b64encode(img.tobytes()).decode(),
             "image_shape": list(img.shape)},
            {"prompt": "third one"},
        ]
        want = [plain.generate(r["prompt"],
                               img if "image_b64" in r else None)
                for r in reqs]
        results = [None] * len(reqs)

        def fire(i):
            results[i] = _post(url + "/v1/generate", reqs[i])

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i, (w, r) in enumerate(zip(want, results)):
            assert r is not None, f"request {i} hung"
            c, b = r
            assert c == 200, b
            assert b["text"] == w["text"], f"request {i} answer changed"
    finally:
        srv.shutdown()
