"""HTTP serving front-end for the composite model.

The reference ships no demo/serving layer at all (its README stops at
offline eval scripts); production deployment needs one, so this module
provides a minimal dependency-free server over the jitted generation
loop:

  * `ChatService` — owns (config, params, tokenizer, generate_fn) and
    turns one (prompt, image) request into decoded text. The underlying
    decode is the emb-countdown while_loop of `generation.py`, compiled
    once; every request after the first reuses the same executable
    (static [1, max_prompt] / [1, H, W, 3] shapes — requests are padded
    to the compiled prompt length, the TPU program never recompiles).
  * `serve()` — stdlib ThreadingHTTPServer. Requests serialize through
    a lock: one chip, one decode stream (the reference likewise pins
    generation to bs=1 — visionllmv2/eval/vqa/evaluate_vqa.py).

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
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from visionllm_tpu.constants import DEFAULT_TOKENS


class ChatService:
    """One loaded model + tokenizer; thread-safe greedy generation."""

    def __init__(self, cfg, params, tokenizer, *, image_size: int = 336,
                 conv_version: str = "vicuna_v1",
                 max_new_tokens: int = 256, max_prompt: int = 1024,
                 dtype=None):
        import jax.numpy as jnp

        from visionllm_tpu.generation import build_generate_fn
        from visionllm_tpu.models.visionllm import (SpecialTokenIds,
                                                    VisionLLM)

        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.conv_version = conv_version
        self.max_prompt = max_prompt
        self.img_len = (image_size // 14) ** 2
        self.tid = SpecialTokenIds.from_tokenizer(tokenizer)
        self.core = VisionLLM(cfg, dtype=dtype or jnp.bfloat16)
        self.generate_fn = build_generate_fn(
            self.core, self.tid, max_new_tokens=max_new_tokens,
            max_len=max_prompt + max_new_tokens + 8)
        self._lock = threading.Lock()

    def generate(self, prompt: str, image: Optional[np.ndarray] = None,
                 max_new_tokens: Optional[int] = None) -> dict:
        import jax.numpy as jnp

        from visionllm_tpu.data.conversation import get_conv_template
        from visionllm_tpu.data.mm_utils import (clip_preprocess,
                                                 expand_image_tokens,
                                                 find_stop,
                                                 tokenizer_image_token)

        q = prompt if image is None else "<image>\n" + prompt
        conv = get_conv_template(self.conv_version)
        conv.append_message(conv.roles[0], q)
        conv.append_message(conv.roles[1], None)
        ids = tokenizer_image_token(conv.get_prompt(), self.tokenizer)
        if image is not None:
            imp_id = self.tokenizer.convert_tokens_to_ids(
                DEFAULT_TOKENS["imp"])
            ids = expand_image_tokens(ids, self.img_len, imp_id)
            img = clip_preprocess(image, self.image_size, "pad")[None]
        else:
            # blank tile: the compiled program always takes an image
            # input; without <im_patch> tokens it never attends to it
            img = np.zeros((1, self.image_size, self.image_size, 3),
                           np.float32)
        ids = np.asarray(ids)[-self.max_prompt:]
        t0 = time.perf_counter()
        with self._lock:
            out = self.generate_fn(self.params, jnp.asarray(ids)[None],
                                   jnp.asarray(img, jnp.float32))
            n = int(out["num_generated"])
            tokens = np.asarray(out["out_tokens"][0, :n])
        latency = time.perf_counter() - t0
        if max_new_tokens is not None:
            tokens = tokens[:max_new_tokens]
        text = self.tokenizer.decode(tokens, skip_special_tokens=True)
        stop = conv.sep2 or conv.sep
        cut = find_stop(text, [stop])
        if cut is not None:
            text = text[:cut]
        return {"text": text.strip(), "num_tokens": int(len(tokens)),
                "latency_s": round(latency, 4)}


class _Handler(BaseHTTPRequestHandler):
    service: ChatService = None     # set by serve()
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
        else:
            self._reply(404, {"error": "not found"})

    def do_POST(self):
        if self.path != "/v1/generate":
            self._reply(404, {"error": "not found"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            prompt = req["prompt"]
            image = None
            if req.get("image_b64"):
                raw = base64.b64decode(req["image_b64"])
                shape = tuple(req["image_shape"])
                image = np.frombuffer(raw, np.uint8).reshape(shape)
            out = self.service.generate(
                prompt, image, max_new_tokens=req.get("max_new_tokens"))
            self._reply(200, out)
        except (KeyError, ValueError, TypeError) as e:
            self._reply(400, {"error": f"bad request: {e}"})
        except Exception as e:                          # noqa: BLE001
            self._reply(500, {"error": str(e)[:500]})


def make_server(service: ChatService, host: str = "127.0.0.1",
                port: int = 8000, model_name: str = "visionllm_tpu"
                ) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server — tests drive this."""
    handler = type("Handler", (_Handler,),
                   {"service": service, "model_name": model_name})
    return ThreadingHTTPServer((host, port), handler)


def serve(service: ChatService, host: str = "0.0.0.0", port: int = 8000,
          model_name: str = "visionllm_tpu") -> None:
    srv = make_server(service, host, port, model_name)
    print(f"serving {model_name} on http://{host}:{port} "
          f"(POST /v1/generate, GET /healthz)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
