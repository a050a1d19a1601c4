"""Bisect the gdino bs1→bs4 superlinear scaling (profile_e2e_batch
measured 23.75 → 145.85 ms, 1.54× per image; the core scales at 0.96).

Times the det branch's candidate hot spots on the chip at each batch:

  msda_enc — ms_deform_attn at the 512px ENCODER shape
             (S=Q=5440, H=8, D=32, L=4, P=4) — the self-attn gather
  msda_dec — decoder shape (Q=1024)
  swin     — Swin-T backbone forward at 512px
  gdino    — the full GroundingDino module (sanity vs e2e profiler)

Run: python tools/profile_gdino_batch.py [--bs 1,4] [--det 512]
                                         [--stages msda_enc,...]
Prints one JSON line {stage}_bs{B}_ms + per-image scaling ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(m):
    print(f"[gdino_batch] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", default="1,4")
    ap.add_argument("--det", type=int, default=512)
    ap.add_argument("--stages", default="msda_enc,msda_dec,swin,gdino")
    ap.add_argument("--n-lo", type=int, default=2)
    ap.add_argument("--n-hi", type=int, default=10)
    args = ap.parse_args()
    sizes = [int(b) for b in args.bs.split(",")]
    stages = args.stages.split(",")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visionllm_tpu.config import GDinoConfig
    from visionllm_tpu.models.grounding_dino.model import GroundingDino
    from visionllm_tpu.ops.ms_deform_attn import ms_deform_attn

    cfg = GDinoConfig()
    result = {"unit": "ms", "det": args.det,
              "device": jax.devices()[0].platform}
    rng = jax.random.PRNGKey(0)

    H, D, P = cfg.num_heads, cfg.d_model // cfg.num_heads, 4
    s0 = args.det // 8
    shapes = tuple((s0 // (1 << i), s0 // (1 << i)) for i in range(4))
    S = sum(h * w for h, w in shapes)

    def chained(fn):
        def run(n, c0, extra):
            def body(st):
                i, c = st
                out = fn(c, extra)
                return i + 1, jnp.sum(out).astype(jnp.float32) * 1e-12
            return jax.lax.while_loop(lambda s: s[0] < n, body,
                                      (jnp.int32(0), c0))[1]
        return jax.jit(run)

    def slope(name, fn, extra):
        run = chained(fn)
        t = time.time()
        float(run(jnp.int32(1), jnp.float32(0), extra))
        log(f"{name}: compile+first {time.time()-t:.1f}s")
        times = {}
        for n in (args.n_lo, args.n_hi):
            best = 1e9
            for _ in range(2):
                t = time.time()
                float(run(jnp.int32(n), jnp.float32(0), extra))
                best = min(best, time.time() - t)
            times[n] = best
        ms = ((times[args.n_hi] - times[args.n_lo])
              / (args.n_hi - args.n_lo) * 1e3)
        result[name] = round(ms, 2)
        log(f"{name}: {ms:.2f} ms")

    def msda_inputs(B, Q):
        ks = jax.random.split(rng, 3)
        value = 0.1 * jax.random.normal(ks[0], (B, S, H, D),
                                        jnp.bfloat16)
        loc = jax.random.uniform(ks[1], (B, Q, H, 4, P, 2))
        attw = jax.nn.softmax(
            jax.random.normal(ks[2], (B, Q, H, 4 * P)), axis=-1
        ).reshape(B, Q, H, 4, P)
        return value, loc, attw

    for B in sizes:
        if "msda_enc" in stages:
            v, lo, aw = msda_inputs(B, S)

            def f(c, ex):
                v, lo, aw = ex
                return ms_deform_attn(
                    v * (1 + c * jnp.bfloat16(1e-8)), shapes, lo, aw
                )[:, :8, :8]
            slope(f"msda_enc_bs{B}", f, (v, lo, aw))

        if "msda_dec" in stages:
            v, lo, aw = msda_inputs(B, 1024)

            def f(c, ex):
                v, lo, aw = ex
                return ms_deform_attn(
                    v * (1 + c * jnp.bfloat16(1e-8)), shapes, lo, aw
                )[:, :8, :8]
            slope(f"msda_dec_bs{B}", f, (v, lo, aw))

        if "swin" in stages or "gdino" in stages:
            model = GroundingDino(cfg, jnp.bfloat16)
            img = 0.3 * jax.random.normal(
                rng, (B, args.det, args.det, 3), jnp.bfloat16)
            tq = 0.02 * jax.random.normal(
                rng, (B, 1, 4, 4096), jnp.bfloat16)
            tqm = jnp.ones((B, 1), bool)
            if B == sizes[0]:
                params = model.init(rng, img[:1], tq[:1], tqm[:1]
                                    )["params"]
                params = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x, params)

            if "swin" in stages:
                def f(c, ex):
                    p, im = ex
                    feats = model.apply(
                        {"params": p}, im * (1 + c * jnp.bfloat16(1e-8)),
                        method=lambda m, x: m.backbone(x))
                    return feats[-1][:, :2, :2, :8]
                slope(f"swin_bs{B}", f, (params, img))

            if "gdino" in stages:
                def f(c, ex):
                    p, im, q, qm = ex
                    out = model.apply(
                        {"params": p},
                        im * (1 + c * jnp.bfloat16(1e-8)), q, qm)
                    return out["pred_boxes"][:, :8, 0]
                slope(f"gdino_bs{B}", f, (params, img, tq, tqm))

    for st in stages:
        lo, hi = f"{st}_bs{sizes[0]}", f"{st}_bs{sizes[-1]}"
        if lo in result and hi in result and result[lo]:
            result[f"{st}_scaling"] = round(
                result[hi] / (result[lo] * sizes[-1] / sizes[0]), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
