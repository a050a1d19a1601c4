"""Decode-shape int4 matmul strategy shootout (verdict r3 #4).

The Pallas w4g128 kernel (ops/quant4.py) measured 0.21-0.23 HBM util
in rounds 3-4 — int4 decode SLOWER than int8 (54.9 vs 76.0 tok/s).
Hypothesis: hand-unpacking nibbles on the VPU loses to XLA's native
int4 operand handling, the same way the int8 path wins by letting XLA
fuse the int8->bf16 convert into the dot's operand load (ops/quant.py).

Times a decode-shaped scanned layer stack x[B,in] @ W[L,in,out] for:

  bf16      — dense baseline (2 B/param)
  int8      — fused-convert dot, per-out-channel scale (current int8)
  int4_chan — native jnp.int4 stack, fused-convert dot, per-channel
  int4_g128 — native jnp.int4, grouped einsum bng,ngo->bno with
              per-(group,out) scales on the f32 partials (w4g128
              numerics, same spec as ops/quant4.pack_int4)
  int4_pallas — the current ops/quant4.py kernel on its packed bytes

Run ON the chip:  python tools/int4_experiments.py [--L 16] [--B 16]
Prints one JSON line: per-variant ms/step + effective GB/s + util.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

HBM_GBS = 819.0    # v5e


def log(m):
    print(f"[int4x] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=16)
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--cin", type=int, default=4096)
    ap.add_argument("--cout", type=int, default=11008)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--variants", default="bf16,int8,int4_chan,"
                                          "int4_g128,int4_pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    L, B, cin, cout, G = args.L, args.B, args.cin, args.cout, args.g
    ng = cin // G
    rng = np.random.RandomState(0)
    w_np = (rng.randn(L, cin, cout) * 0.02).astype(np.float32)
    x0 = jnp.asarray(rng.randn(B, cin) * 0.3, jnp.bfloat16)

    # --- quantized forms (built on host/np to keep HBM small) --------
    def chan_q(bits):
        q = 127 if bits == 8 else 7
        amax = np.abs(w_np).max(axis=1, keepdims=True)      # [L,1,out]
        s = np.maximum(amax / q, 1e-8)
        wq = np.clip(np.round(w_np / s), -q - 1, q)
        return wq, s[:, 0, :].astype(np.float32)            # [L,out]

    def group_q():
        g = w_np.reshape(L, ng, G, cout)
        amax = np.abs(g).max(axis=2)                        # [L,ng,out]
        s = np.maximum(amax / 7.0, 1e-8)
        wq = np.clip(np.round(g / s[:, :, None, :]), -8, 7)
        return wq.reshape(L, cin, cout), s.astype(np.float32)

    devs = jax.devices()
    log(f"device: {devs[0].platform} x{len(devs)}")

    variants = {}

    if "bf16" in args.variants and L * cin * cout * 2 < 6e9:
        wb = jax.device_put(jnp.asarray(w_np, jnp.bfloat16))

        def f_bf16(x):
            def body(c, w):
                y = jax.lax.dot(c, w)
                return (0.1 * jnp.tanh(y[:, :cin])).astype(c.dtype), ()
            return jax.lax.scan(body, x, wb)[0]
        variants["bf16"] = (f_bf16, L * cin * cout * 2)

    if "int8" in args.variants:
        wq, s = chan_q(8)
        w8 = jax.device_put(jnp.asarray(wq, jnp.int8))
        s8 = jax.device_put(jnp.asarray(s, jnp.bfloat16))

        def f_int8(x):
            def body(c, ws):
                w, sc = ws
                y = jax.lax.dot(c, w.astype(c.dtype)) * sc[None]
                return (0.1 * jnp.tanh(y[:, :cin])).astype(c.dtype), ()
            return jax.lax.scan(body, x, (w8, s8))[0]
        variants["int8"] = (f_int8, L * cin * cout * 1)

    if "int4_chan" in args.variants:
        wq, s = chan_q(4)
        # jnp.asarray(np, int4) hits a jit recursion bug in jax 0.9;
        # route through int8 + an astype under jit
        to4 = jax.jit(lambda v: v.astype(jnp.int4))
        w4 = to4(jnp.asarray(wq.astype(np.int8)))
        s4 = jax.device_put(jnp.asarray(s, jnp.bfloat16))

        def f_int4c(x):
            def body(c, ws):
                w, sc = ws
                y = jax.lax.dot(c, w.astype(c.dtype)) * sc[None]
                return (0.1 * jnp.tanh(y[:, :cin])).astype(c.dtype), ()
            return jax.lax.scan(body, x, (w4, s4))[0]
        variants["int4_chan"] = (f_int4c, L * cin * cout // 2)

    if "int4_g128" in args.variants:
        wq, s = group_q()
        to4 = jax.jit(lambda v: v.astype(jnp.int4))
        w4g = to4(jnp.asarray(
            wq.reshape(L, ng, G, cout).astype(np.int8)))
        s4g = jax.device_put(jnp.asarray(s, jnp.bfloat16))  # [L,ng,out]

        def f_int4g(x):
            def body(c, ws):
                w, sc = ws                    # [ng,G,out] int4, [ng,out]
                xg = c.reshape(B, ng, G)
                p = jnp.einsum("bng,ngo->bno", xg, w.astype(c.dtype),
                               preferred_element_type=jnp.float32)
                y = jnp.sum(p * sc.astype(jnp.float32)[None], axis=1)
                return (0.1 * jnp.tanh(y[:, :cin])
                        ).astype(c.dtype), ()
            return jax.lax.scan(body, x, (w4g, s4g))[0]
        variants["int4_g128"] = (
            f_int4g, L * (cin * cout // 2 + ng * cout * 2))

    if "int4_pallas" in args.variants:
        from visionllm_tpu.ops.quant4 import int4_matmul, pack_int4
        wp, sp = jax.jit(pack_int4)(jnp.asarray(w_np, jnp.float32))
        wp = jax.device_put(wp)
        sp = jax.device_put(sp)

        def f_int4p(x):
            def body(c, ws):
                w, sc = ws
                y = int4_matmul(c, w, sc)
                return (0.1 * jnp.tanh(y[:, :cin])).astype(c.dtype), ()
            return jax.lax.scan(body, x, (wp, sp))[0]
        variants["int4_pallas"] = (
            f_int4p, L * (cin * cout // 2 + ng * cout * 2))

    result = {"L": L, "B": B, "cin": cin, "cout": cout,
              "device": devs[0].platform}
    for name, (fn, bytes_w) in variants.items():
        def chained(n, x, f=fn):
            def body(s):
                i, c = s
                return i + 1, f(c)
            return jax.lax.while_loop(
                lambda s: s[0] < n, body, (jnp.int32(0), x))[1]
        run = jax.jit(chained, static_argnums=())
        t = time.time()
        jax.block_until_ready(run(jnp.int32(1), x0))
        log(f"{name}: compile+first {time.time()-t:.1f}s")
        times = {}
        for n in (4, 24):
            best = 1e9
            for _ in range(3):
                t = time.time()
                jax.block_until_ready(run(jnp.int32(n), x0))
                best = min(best, time.time() - t)
            times[n] = best
        ms = (times[24] - times[4]) / 20 * 1e3
        gbs = bytes_w / (ms * 1e-3) / 1e9
        result[name] = {"ms": round(ms, 3), "gb_s": round(gbs, 1),
                        "hbm_util": round(gbs / HBM_GBS, 3)}
        log(f"{name}: {ms:.3f} ms  {gbs:.0f} GB/s "
            f"(util {gbs / HBM_GBS:.3f})")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
