"""Which TPU primitive scales superlinearly from bs1 to bs4?

profile_gdino_batch measured EVERY det-branch stage superlinear
(msda 1.92x, swin 1.76x, decoder 1.76x per image) while the ViT+LLM
core is linear (0.96x). This times bare primitives at det-branch
shapes to find the systemic cause:

  matmul — [B,5440,256] @ [256,256] x16 chain (token matmul)
  conv   — [B,128,128,96] 3x3 same conv x16 chain (Swin-ish)
  gather — 174k-row take from a [B*8*5440, 128] table x16
  attn   — windowed attention [B*121, 8, 49, 49] style x16

Run: python tools/profile_batch_primitives.py [--bs 1,4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(m):
    print(f"[prim] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", default="1,4")
    ap.add_argument("--reps", type=int, default=64)
    args = ap.parse_args()
    sizes = [int(b) for b in args.bs.split(",")]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = jax.random.PRNGKey(0)
    R = args.reps
    result = {"unit": "ms", "device": jax.devices()[0].platform}

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
        for n in (4, 44):
            best = 1e9
            for _ in range(2):
                t = time.time()
                float(run(jnp.int32(n), jnp.float32(0), extra))
                best = min(best, time.time() - t)
            times[n] = best
        ms = (times[44] - times[4]) / 40 * 1e3
        result[name] = round(ms, 3)
        log(f"{name}: {ms:.3f} ms")

    for B in sizes:
        x_tok = 0.1 * jax.random.normal(rng, (B, 5440, 256),
                                        jnp.bfloat16)
        w_tok = 0.05 * jax.random.normal(rng, (R, 256, 256),
                                         jnp.bfloat16)

        def f_mm(c, ex):
            x, w = ex
            h = (x * (1 + c * 1e-8)).astype(x.dtype)

            def body(hc, wi):
                return jnp.tanh(hc @ wi), ()
            return jax.lax.scan(body, h, w)[0][:, :8, :8]
        slope(f"matmul_bs{B}", f_mm, (x_tok, w_tok))

        x_im = 0.1 * jax.random.normal(rng, (B, 128, 128, 96),
                                       jnp.bfloat16)
        w_c = 0.05 * jax.random.normal(rng, (R, 3, 3, 96, 96),
                                       jnp.bfloat16)

        def f_conv(c, ex):
            x, w = ex
            h = (x * (1 + c * 1e-8)).astype(x.dtype)

            def body(hc, wi):
                y = jax.lax.conv_general_dilated(
                    hc, wi, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.tanh(y), ()
            return jax.lax.scan(body, h, w)[0][:, :2, :2, :8]
        slope(f"conv_bs{B}", f_conv, (x_im, w_c))

        tbl = 0.1 * jax.random.normal(rng, (B * 8 * 5440, 128),
                                      jnp.bfloat16)
        idx = jax.random.randint(rng, (B * 8 * 4 * 5440,), 0,
                                 B * 8 * 5440)

        def f_gather(c, ex):
            t, ix = ex
            t = (t * (1 + c * 1e-8)).astype(t.dtype)

            def body(acc, _):
                rows = jnp.take(t, ix, axis=0)
                return acc + rows[:8, :8].astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.zeros((8, 8), jnp.float32),
                                jnp.arange(R))[0]
        slope(f"gather_bs{B}", f_gather, (tbl, idx))

        xw = 0.1 * jax.random.normal(rng, (B * 121, 49, 256),
                                     jnp.bfloat16)

        def f_attn(c, ex):
            (x,) = ex
            h = (x * (1 + c * 1e-8)).astype(x.dtype)

            def body(hc, _):
                q = hc.reshape(-1, 49, 8, 32).transpose(0, 2, 1, 3)
                s = jnp.einsum("whqd,whkd->whqk", q, q) * 0.17
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("whqk,whkd->whqd", p, q)
                return (o.transpose(0, 2, 1, 3).reshape(-1, 49, 256)
                        + hc), ()
            return jax.lax.scan(body, h, jnp.arange(R))[0][:8, :8, :8]
        slope(f"attn_bs{B}", f_attn, (xw,))

    for st in ("matmul", "conv", "gather", "attn"):
        lo, hi = f"{st}_bs{sizes[0]}", f"{st}_bs{sizes[-1]}"
        if lo in result and result.get(lo):
            result[f"{st}_scaling"] = round(
                result[hi] / (result[lo] * sizes[-1] / sizes[0]), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
