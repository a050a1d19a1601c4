"""End-to-end benchmark: VQA+det single-image pipeline, images/sec/chip.

Measures the production inference path — CLIP-ViT-L/336 vision encode →
VL bridge → LLM prefill ([EMB] routing) → grounding-dino detection
(6-enc/6-dec, 900 queries) — on the default JAX device (the real TPU
chip under the driver). LLM depth is reduced (see _bench_config) so the
bench stays fast and parameter init fits comfortably; the per-layer cost
of the LLM is measured separately and scaled to 32 layers in the
reported number, so the metric tracks the real 7B-architecture latency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against bench_baseline.json (written on first run)
so round-over-round improvements are visible.
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    from visionllm_tpu.config import (GDinoConfig, LLMConfig,
                                      VisionEncoderConfig, VisionLLMConfig)
    from visionllm_tpu.models.composite import VisionLLMWithTools
    from visionllm_tpu.models.visionllm import SpecialTokenIds

    LLM_LAYERS_BENCH = 4
    LLM_LAYERS_REAL = 32
    DET_SIZE = 512

    cfg = VisionLLMConfig(
        vis_encoder=VisionEncoderConfig(),              # full CLIP-L/336
        llm=LLMConfig(vocab_size=32096, num_layers=LLM_LAYERS_BENCH),
        vl_bridge_type="mlp2x_gelu",
        use_gdino=True,
        gdino=GDinoConfig(),                            # full 6+6, 900 q
    )
    tid = SpecialTokenIds.synthetic()
    model = VisionLLMWithTools(cfg, dtype=jnp.bfloat16)

    img_len = cfg.vis_encoder.num_patches               # 576
    ids = ([1, 10, 11] + [tid.imp] * img_len + [12]
           + [tid.det] + [tid.emb + i for i in range(cfg.num_embs)] + [2])
    input_ids = jnp.asarray([ids], dtype=jnp.int32)
    size = cfg.vis_encoder.image_size
    images = jnp.ones((1, size, size, 3), jnp.bfloat16) * 0.1
    images_aug = jnp.ones((1, DET_SIZE, DET_SIZE, 3), jnp.bfloat16) * 0.1

    init = jax.jit(lambda r: model.init(
        r, input_ids, images, images_aug, tid,
        method=VisionLLMWithTools.infer_det))
    params = init(jax.random.PRNGKey(0))["params"]

    fwd = jax.jit(lambda p, i, im, ia: model.apply(
        {"params": p}, i, im, ia, tid,
        method=VisionLLMWithTools.infer_det))

    out = fwd(params, input_ids, images, images_aug)    # compile
    jax.block_until_ready(out)

    def timed(fn, iters=20):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    t_e2e = timed(lambda: fwd(params, input_ids, images, images_aug))

    # isolate LLM per-layer cost to extrapolate to the 32-layer model
    llm_fwd = jax.jit(lambda p: model.apply(
        {"params": p}, input_ids, images, tid,
        method=lambda m, i, im, t: m.core(i, im, t, compute_logits=False)
    )["hidden"])
    out = llm_fwd(params)
    jax.block_until_ready(out)
    t_core = timed(lambda: llm_fwd(params))

    # core = vision + bridge + LLM(bench layers); per-layer LLM cost is
    # bounded by t_core / bench_layers (vision tower amortizes to ~0)
    t_llm_extra = (t_core / LLM_LAYERS_BENCH) * (
        LLM_LAYERS_REAL - LLM_LAYERS_BENCH)
    t_full = t_e2e + t_llm_extra
    images_per_sec = 1.0 / t_full

    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)["value"]
    else:
        base = images_per_sec
        with open(baseline_path, "w") as f:
            json.dump({"metric": "vqa_det_e2e_images_per_sec_chip",
                       "value": base}, f)

    print(json.dumps({
        "metric": "vqa_det_e2e_images_per_sec_chip",
        "value": round(images_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / base, 3),
    }))


if __name__ == "__main__":
    main()
