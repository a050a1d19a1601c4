"""Bisect the e2e bs1→bs4 throughput regression (bench.py value_bs4).

bench.py r03 measured the full VQA+det pipeline at 11.75 im/s bs1 but
10.42 im/s bs4 — batching LOST throughput. This tool times the two
pipeline halves separately at each batch size with the chained-slope
method (same as bench.py):

  core   — CLIP-ViT-L/336 encode + bridge + 32-layer prefill
           (compute_logits=False), the MXU-bound half
  gdino  — Swin-T + 6+6 deformable encoder/decoder + mask FPN at
           512 px on random text queries, the gather-heavy half
  e2e    — infer_det (both halves + [EMB] extraction), sanity check
           that the stages sum

Run: python tools/profile_e2e_batch.py [--stages core,gdino,e2e]
                                       [--bs 1,4] [--det 512]
Prints one JSON line with {stage}_bs{B}_ms and scaling ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(f"[e2e_batch] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="core,gdino,e2e")
    ap.add_argument("--bs", default="1,4")
    ap.add_argument("--det", type=int, default=512)
    ap.add_argument("--n-lo", type=int, default=2)
    ap.add_argument("--n-hi", type=int, default=10)
    args = ap.parse_args()
    stages = args.stages.split(",")
    sizes = [int(b) for b in args.bs.split(",")]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from visionllm_tpu.config import (GDinoConfig, LLMConfig,
                                      VisionEncoderConfig,
                                      VisionLLMConfig)
    from visionllm_tpu.models.composite import VisionLLMWithTools
    from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM

    cfg = VisionLLMConfig(
        vis_encoder=VisionEncoderConfig(),
        llm=LLMConfig(vocab_size=32096, num_layers=32),
        vl_bridge_type="mlp2x_gelu",
        use_gdino=True,
        gdino=GDinoConfig(),
    )
    tid = SpecialTokenIds.synthetic()
    model = VisionLLMWithTools(cfg, dtype=jnp.bfloat16)
    result = {"unit": "ms", "det": args.det,
              "device": jax.devices()[0].platform}

    img_len = cfg.vis_encoder.num_patches
    ids1 = ([1, 10, 11] + [tid.imp] * img_len + [12]
            + [tid.det] + [tid.emb + i for i in range(cfg.num_embs)]
            + [2])
    size = cfg.vis_encoder.image_size
    rng = jax.random.PRNGKey(7)

    def init(r):
        input_ids = jnp.asarray([ids1], jnp.int32)
        images = 0.3 * jax.random.normal(r, (1, size, size, 3),
                                         jnp.bfloat16)
        aug = 0.3 * jax.random.normal(r, (1, args.det, args.det, 3),
                                      jnp.bfloat16)
        p = model.init(r, input_ids, images, aug, tid,
                       method=VisionLLMWithTools.infer_det)["params"]
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    # Layout negotiation (same dance as bench.py): compile the e2e
    # program against ABSTRACT params with AUTO layouts, then init the
    # 13.5 GB tree DIRECTLY into the layout that program wants. A
    # default-layout init OOMs the 16 GB chip: the program relayouts the
    # [32,4096,4096] q/k/v scan stacks with 1 GB HLO-temp copies
    # (observed: 16.07G used, +333 MB over capacity).
    from jax.experimental.layout import Format, Layout
    auto = lambda tree: jax.tree.map(            # noqa: E731
        lambda _: Format(Layout.AUTO), tree)
    p_abs = jax.eval_shape(init, jax.random.PRNGKey(0))

    def _e2e_probe(c, ex):
        p, ii, im, au = ex
        out = model.apply({"params": p}, ii, im, au, tid,
                          method=VisionLLMWithTools.infer_det)
        return out["pred_boxes"][:, :8, 0]

    probe_args = (p_abs,
                  jnp.zeros((1, len(ids1)), jnp.int32),
                  jnp.zeros((1, size, size, 3), jnp.bfloat16),
                  jnp.zeros((1, args.det, args.det, 3), jnp.bfloat16))
    t = time.time()
    probe = jax.jit(lambda c, ex: _e2e_probe(c, ex),
                    in_shardings=(auto(0), auto(probe_args)))
    # input_formats = (args_formats, kwargs_formats); args are (c, ex),
    # ex = (params, ids, images, aug)
    fmt_params = probe.lower(jnp.float32(0), probe_args) \
        .compile().input_formats[0][1][0]
    log(f"layout probe compile {time.time()-t:.1f}s")
    t = time.time()
    params = jax.jit(init, out_shardings=fmt_params)(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"init (layout-negotiated) {time.time()-t:.1f}s")

    def chained(fn, extra):
        def run(n, c0, extra):
            def body(state):
                i, c = state
                out = fn(c, extra)
                return i + 1, jnp.sum(out).astype(jnp.float32) * 1e-12
            return jax.lax.while_loop(lambda s: s[0] < n, body,
                                      (jnp.int32(0), c0))[1]
        # pin `extra`'s layout to the live arrays' (params are already
        # in the negotiated layout; no entry copies)
        fmt = jax.tree.map(lambda x: x.format, extra)
        return jax.jit(run, in_shardings=(None, None, fmt))

    def slope(name, fn, extra):
        run = chained(fn, extra)
        t = time.time()
        float(run(jnp.int32(1), jnp.float32(0), extra))
        log(f"{name}: compile+first {time.time()-t:.1f}s")
        times = {}
        for n in (args.n_lo, args.n_hi):
            best = None
            for _ in range(2):
                t = time.time()
                float(run(jnp.int32(n), jnp.float32(0), extra))
                dt = time.time() - t
                best = dt if best is None else min(best, dt)
            times[n] = best
        ms = ((times[args.n_hi] - times[args.n_lo])
              / (args.n_hi - args.n_lo) * 1e3)
        result[name] = round(ms, 2)
        log(f"{name}: {ms:.2f} ms")
        return ms

    for B in sizes:
        input_ids = jnp.tile(jnp.asarray([ids1], jnp.int32), (B, 1))
        images = 0.3 * jax.random.normal(rng, (B, size, size, 3),
                                         jnp.bfloat16)
        aug = 0.3 * jax.random.normal(rng, (B, args.det, args.det, 3),
                                      jnp.bfloat16)

        # params ride through `extra`, NOT a closure — closed-over
        # device arrays are embedded as HLO constants (a 433 MB capture
        # blew the relay request limit in an earlier profiler)
        if "core" in stages:
            def core_fn(c, ex):
                p, im, ii = ex
                out = model.apply(
                    {"params": p}, ii,
                    im * (1 + c * jnp.bfloat16(1e-8)), tid,
                    compute_logits=False,
                    method=lambda m, i, img, t, **kw: m.core(
                        i, img, t, **kw))
                return out["hidden"][:, -1, :8]
            slope(f"core_bs{B}", core_fn, (params, images, input_ids))

        if "gdino" in stages:
            # gdino wants [B, P, num_embs, text_dim] + [B, P] mask
            tq = 0.02 * jax.random.normal(
                rng, (B, 1, cfg.num_embs, cfg.llm.hidden_size),
                jnp.bfloat16)
            tq_mask = jnp.ones((B, 1), bool)

            def gdino_fn(c, ex):
                p, au, q, qm = ex
                out = model.apply(
                    {"params": p},
                    au * (1 + c * jnp.bfloat16(1e-8)), q, qm,
                    method=lambda m, a, b, d: m.gdino(a, b, d))
                return out["pred_boxes"][:, :8, 0]
            slope(f"gdino_bs{B}", gdino_fn, (params, aug, tq, tq_mask))

        if "e2e" in stages:
            def e2e_fn(c, ex):
                p, ii, im, au = ex
                out = model.apply(
                    {"params": p}, ii,
                    im * (1 + c * jnp.bfloat16(1e-8)), au, tid,
                    method=VisionLLMWithTools.infer_det)
                return out["pred_boxes"][:, :8, 0]
            slope(f"e2e_bs{B}", e2e_fn, (params, input_ids, images, aug))

    for st in stages:
        lo, hi = f"{st}_bs{sizes[0]}", f"{st}_bs{sizes[-1]}"
        if lo in result and hi in result and result[lo]:
            result[f"{st}_scaling"] = round(
                result[hi] / (result[lo] * sizes[-1] / sizes[0]), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
