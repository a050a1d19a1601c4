"""Decode-shape matmul microbench: bf16 vs int8 vs int4 on the chip.

Times single-token (B=1..8) matmuls at 7B-decoder shapes — the op
decode streams per token — with the chained-slope method. Answers one
question: does the int4 Pallas kernel beat the int8 XLA convert+dot
per BYTE (it must be ~2x int8 tok/s to justify --quant int4 as a perf
feature; round-3 shipped the opposite, VERDICT item 4).

Run: python tools/bench_quant_micro.py [--b 1] [--shape 4096x11008]
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
    print(f"[qmicro] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--n-lo", type=int, default=8)
    ap.add_argument("--n-hi", type=int, default=72)
    ap.add_argument("--shapes", type=str, default="4096x4096,4096x11008")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from visionllm_tpu.ops.quant import quantize_int8
    from visionllm_tpu.ops.quant4 import int4_matmul, pack_int4

    result = {"unit": "us/call", "b": args.b,
              "device": jax.devices()[0].platform}

    def chained(fn):
        def run(n, c0, extra):
            def body(state):
                i, c = state
                out = fn(c, extra)
                return i + 1, jnp.sum(out).astype(jnp.float32) * 1e-12
            return jax.lax.while_loop(lambda s: s[0] < n, body,
                                      (jnp.int32(0), c0))[1]
        return jax.jit(run)

    def slope(name, fn, extra):
        run = chained(fn)
        float(run(jnp.int32(1), jnp.float32(0), extra))
        lo = hi = None
        for n in (args.n_lo, args.n_hi):
            ts = []
            for _ in range(2):
                t = time.time()
                float(run(jnp.int32(n), jnp.float32(0), extra))
                ts.append(time.time() - t)
            lo, hi = (min(ts), hi) if n == args.n_lo else (lo, min(ts))
        us = (hi - lo) / (args.n_hi - args.n_lo) * 1e6
        result[name] = round(us, 1)
        log(f"{name}: {us:.1f} us")
        return us

    rng = np.random.default_rng(0)
    for shp in args.shapes.split(","):
        cin, cout = (int(v) for v in shp.split("x"))
        w = jnp.asarray(rng.normal(0, 0.02, (cin, cout)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1, (args.b, cin)), jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        wq8, s8 = quantize_int8(w)
        wq8, s8 = jax.device_put(wq8), jax.device_put(s8)
        wp4, s4 = pack_int4(w)
        wp4, s4 = jax.device_put(wp4), jax.device_put(s4)
        del w

        tag = f"{cin}x{cout}"
        t_bf16 = slope(f"bf16_{tag}", lambda c, ex: jnp.dot(
            x * (1 + c * 1e-20), ex,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16), wb)
        t_i8 = slope(f"int8_{tag}", lambda c, ex: (jnp.dot(
            x * (1 + c * 1e-20), ex[0].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
            * ex[1].astype(jnp.float32)).astype(jnp.bfloat16), (wq8, s8))
        t_i4 = slope(f"int4_{tag}", lambda c, ex: int4_matmul(
            (x * (1 + c * 1e-20)), ex[0], ex[1]), (wp4, s4))
        hbm = {"bf16": 2.0, "int8": 1.0, "int4": 0.5}
        bw = 819e9
        for nm, t_us in (("bf16", t_bf16), ("int8", t_i8), ("int4", t_i4)):
            ideal = cin * cout * hbm[nm] / bw * 1e6
            result[f"{nm}_{tag}_hbm_util"] = round(ideal / t_us, 3)
        result[f"int4_vs_int8_{tag}"] = round(t_i8 / t_i4, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
