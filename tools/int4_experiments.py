"""Decode-shape int4 matmul strategy shootout (verdict r3 #4).

The Pallas w4g128 kernel (ops/quant4.py) measured 0.21-0.23 HBM util
in rounds 3-4 — int4 decode SLOWER than int8 (54.9 vs 76.0 tok/s).
Hypothesis: hand-unpacking nibbles on the VPU loses to XLA's native
int4 operand handling, the same way the int8 path wins by letting XLA
fuse the int8->bf16 convert into the dot's operand load (ops/quant.py).

Constraint discovered on the way: jax 0.9 cannot take a `jnp.int4`
array as a jit ARGUMENT (infinite device_put recursion) — int4 must
exist only INSIDE the program. So weights persist as split-half packed
int8 bytes (ops/quant4.pack_int4 layout) and every variant starts from
`lax.bitcast_convert_type(wp, int4)` -> [half, out, 2] (low nibble at
[..., 0], high at [..., 1] — little-endian nibble order, signed).

Variants (x [B, in] bf16; weights stream once per step):

  int8         — fused-convert dot, per-out-channel scale (baseline)
  i4_chan      — bitcast int4, TWO half dots, per-channel scale
  i4_g128      — bitcast int4, grouped einsum bng,ngo->bno with
                 per-(group,out) scales on f32 partials (w4g128
                 numerics == ops/quant4.int4_matmul_ref)
  i4_pallas    — the current ops/quant4.py Pallas kernel
  i4_shift     — plain-XLA shift unpack (int4_matmul_ref)

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
    ap.add_argument("--variants",
                    default="int8,i4_chan,i4_g128,i4_pallas,i4_shift")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visionllm_tpu.ops.quant4 import int4_matmul, int4_matmul_ref, \
        pack_int4

    L, B, cin, cout, G = args.L, args.B, args.cin, args.cout, args.g
    ng, half = cin // G, cin // 2
    ngh = ng // 2
    key = jax.random.PRNGKey(0)
    # ON-DEVICE init (device_put of GB-scale host arrays crawls through
    # the axon relay pipe); int4 never crosses the jit boundary
    w_master = jax.jit(lambda k: 0.02 * jax.random.normal(
        k, (L, cin, cout), jnp.bfloat16))(key)
    x0 = jax.jit(lambda k: 0.3 * jax.random.normal(
        k, (B, cin), jnp.bfloat16))(jax.random.fold_in(key, 1))
    wp, sp = jax.jit(pack_int4)(w_master.astype(jnp.float32))
    # wp int8 [L, half, out]; sp bf16 [L, ng, out]
    s_chan = jax.jit(lambda s: jnp.max(s, axis=1))(sp)   # [L, out] coarse

    log(f"device: {jax.devices()[0].platform}; wp {wp.shape} "
        f"{wp.nbytes/1e6:.0f} MB; sp {sp.nbytes/1e6:.0f} MB")

    def post(y, cin_):
        return (0.1 * jnp.tanh(y[:, :cin_])).astype(jnp.bfloat16)

    variants = {}

    if "int8" in args.variants:
        w8 = jax.jit(lambda w: jnp.clip(jnp.round(
            w.astype(jnp.float32) / jnp.maximum(jnp.max(jnp.abs(
                w.astype(jnp.float32)), axis=1, keepdims=True) / 127.0,
                1e-8)), -128, 127).astype(jnp.int8))(w_master)
        s8 = jax.jit(lambda w: (jnp.max(jnp.abs(w.astype(jnp.float32)),
                                        axis=1) / 127.0
                                ).astype(jnp.bfloat16))(w_master)

        def f_int8(x, ws):
            def body(c, w_sc):
                w, sc = w_sc
                y = jax.lax.dot(c, w.astype(c.dtype)) * sc[None]
                return post(y, cin), ()
            return jax.lax.scan(body, x, ws)[0]
        variants["int8"] = (f_int8, (w8, s8), L * cin * cout)

    bytes_i4 = L * (cin * cout // 2 + ng * cout * 2)

    if "i4_chan" in args.variants:
        def f_chan(x, ws):
            def body(c, w_sc):
                w, sc = w_sc                          # [half,out] i8
                n = jax.lax.bitcast_convert_type(w, jnp.int4)
                y = (jax.lax.dot(c[:, :half], n[..., 0].astype(c.dtype))
                     + jax.lax.dot(c[:, half:],
                                   n[..., 1].astype(c.dtype)))
                return post(y * sc[None], cin), ()
            return jax.lax.scan(body, x, ws)[0]
        variants["i4_chan"] = (f_chan, (wp, s_chan), bytes_i4)

    if "i4_g128" in args.variants:
        def f_g128(x, ws):
            def body(c, w_sc):
                w, sc = w_sc                # [half,out] i8, [ng,out] bf16
                n = jax.lax.bitcast_convert_type(w, jnp.int4)
                sf = sc.astype(jnp.float32)
                acc = None
                for k, x_off, s_off in ((0, 0, 0), (1, half, ngh)):
                    wg = n[..., k].reshape(ngh, G, cout).astype(c.dtype)
                    xg = c[:, x_off:x_off + half].reshape(B, ngh, G)
                    p = jnp.einsum("bng,ngo->bno", xg, wg,
                                   preferred_element_type=jnp.float32)
                    part = jnp.sum(
                        p * sf[s_off:s_off + ngh][None], axis=1)
                    acc = part if acc is None else acc + part
                return post(acc, cin), ()
            return jax.lax.scan(body, x, ws)[0]
        variants["i4_g128"] = (f_g128, (wp, sp), bytes_i4)

    if "i4_pallas" in args.variants:
        def f_pallas(x, ws):
            def body(c, w_sc):
                w, sc = w_sc
                return post(int4_matmul(c, w, sc), cin), ()
            return jax.lax.scan(body, x, ws)[0]
        variants["i4_pallas"] = (f_pallas, (wp, sp), bytes_i4)

    if "i4_shift" in args.variants:
        def f_shift(x, ws):
            def body(c, w_sc):
                w, sc = w_sc
                return post(int4_matmul_ref(c, w, sc), cin), ()
            return jax.lax.scan(body, x, ws)[0]
        variants["i4_shift"] = (f_shift, (wp, sp), bytes_i4)

    result = {"L": L, "B": B, "cin": cin, "cout": cout,
              "device": jax.devices()[0].platform}
    for name, (fn, ws, bytes_w) in variants.items():
        def chained(n, x, ws, f=fn):
            def body(s):
                i, c = s
                return i + 1, f(c, ws)
            return jax.lax.while_loop(
                lambda s: s[0] < n, body, (jnp.int32(0), x))[1]
        run = jax.jit(chained)
        t = time.time()
        jax.block_until_ready(run(jnp.int32(1), x0, ws))
        log(f"{name}: compile+first {time.time()-t:.1f}s")
        times = {}
        for n in (4, 24):
            best = 1e9
            for _ in range(3):
                t = time.time()
                jax.block_until_ready(run(jnp.int32(n), x0, ws))
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
