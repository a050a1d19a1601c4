"""Latency metrics: prefill TTFT and steady-state decode throughput.

BASELINE.md names p50 decode TTFT as a tracked metric; the reference
publishes none. Measurements use the relay-aware fit so the numbers are
device time, not tunnel round trips.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.models.llama import KVCache
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM
from visionllm_tpu.utils.profiling import fit_device_time


def measure_latency(
    model: VisionLLM,
    params,
    tid: SpecialTokenIds,
    *,
    prompt_len: int = 592,
    image_size: Optional[int] = None,
    max_len: int = 1024,
) -> Dict[str, float]:
    """Returns {"ttft_s": prefill latency (vision encode + LLM prefill +
    first logits), "decode_tok_s": steady-state decode tokens/sec}."""
    cfg = model.cfg
    size = image_size or cfg.vis_encoder.image_size
    img_len = cfg.vis_encoder.num_patches
    ids = ([1] + [tid.imp] * img_len
           + list(range(10, 10 + max(1, prompt_len - img_len - 1))))
    ids = ids[:prompt_len]
    input_ids = jnp.asarray([ids], jnp.int32)
    images = jnp.ones((1, size, size, 3), jnp.bfloat16) * 0.1

    def prefill(p, i, im, eps):
        out = model.apply({"params": p}, i, im + eps.astype(im.dtype), tid)
        return out["logits"][:, -1]

    ttft = fit_device_time(prefill, params, input_ids, images,
                           n_lo=2, n_hi=10)

    cache = KVCache.create(cfg.llm, 1, max_len, dtype=jnp.bfloat16)
    out = model.apply({"params": params}, input_ids, images, tid,
                      cache=cache, compute_logits=False)
    cache = out["cache"]
    embed = jnp.zeros((1, 1, cfg.llm.hidden_size), jnp.bfloat16)
    pos = jnp.full((1, 1), prompt_len, jnp.int32)

    def step(p, cache_in, embed_in, eps):
        o = model.apply({"params": p}, embed_in + eps.astype(embed_in.dtype),
                        pos, cache_in, method=VisionLLM.llm_step)
        return o["logits"][:, -1]

    t_dec = fit_device_time(step, params, cache, embed, n_lo=8, n_hi=72)
    return {"ttft_s": float(ttft), "decode_tok_s": float(1.0 / t_dec)}
