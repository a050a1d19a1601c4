"""Bisect ms_deform_attn_quad's bs1->bs4 superlinearity (1.92x/img).

profile_batch_primitives showed bare take/matmul/conv scale linearly;
the blow-up must be in the op's glue. Times the three phases of
ops/ms_deform_attn.ms_deform_attn_quad separately:

  quad   — quad-table build only (pad/concat 4x copy of value)
  prep   — sampling-loc -> (gidx, wcell) index/weight math only
           (the 6D transposes + per-level floor/clip chain)
  gather — per-level take + weighted reduce with PREcomputed
           gidx/wcell (the phase the primitives bench approximated)
  full   — ms_deform_attn_quad end-to-end (sanity: parts sum)

Encoder shape at 512 px: S=Q=5440, H=8, D=32, L=4, P=4.
Run: python tools/profile_msda_parts.py [--bs 1,4]
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
    print(f"[msda_parts] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", default="1,4")
    ap.add_argument("--det", type=int, default=512)
    args = ap.parse_args()
    sizes = [int(b) for b in args.bs.split(",")]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visionllm_tpu.ops.ms_deform_attn import (
        ms_deform_attn as msda_fn)

    H, D, P = 8, 32, 4
    s0 = args.det // 8
    shapes = tuple((s0 >> i, s0 >> i) for i in range(4))
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    rng = jax.random.PRNGKey(0)
    result = {"unit": "ms", "det": args.det, "S": S,
              "device": jax.devices()[0].platform}

    def chained(fn):
        def run(n, c0, extra):
            def body(st):
                i, c = st
                out = fn(c, extra)
                return i + 1, jnp.sum(out).astype(jnp.float32) * 1e-12
            return jax.lax.while_loop(lambda s: s[0] < n, body,
                                      (jnp.int32(0), c0))[1]
        return jax.jit(run)

    def slope(name, fn, extra, spans=(4, 24)):
        run = chained(fn)
        t = time.time()
        float(run(jnp.int32(1), jnp.float32(0), extra))
        log(f"{name}: compile+first {time.time()-t:.1f}s")
        times = {}
        for n in spans:
            best = 1e9
            for _ in range(2):
                t = time.time()
                float(run(jnp.int32(n), jnp.float32(0), extra))
                best = min(best, time.time() - t)
            times[n] = best
        ms = (times[spans[1]] - times[spans[0]]) / (
            spans[1] - spans[0]) * 1e3
        result[name] = round(ms, 3)
        log(f"{name}: {ms:.3f} ms")

    # reimplementation of the quad phases (kept in lockstep with
    # ops/ms_deform_attn.ms_deform_attn_quad — this is a profiling
    # tool, the op itself stays the source of truth)
    def build_quad(value):
        B = value.shape[0]
        v = value.transpose(0, 2, 1, 3).reshape(B * H, S, D)
        quads = []
        pos = 0
        for (h_l, w_l) in shapes:
            hw = h_l * w_l
            vl = v[:, pos:pos + hw]
            pad = jnp.pad(vl, ((0, 0), (0, w_l + 1), (0, 0)))
            quads.append(jnp.concatenate(
                [vl, pad[:, 1:hw + 1], pad[:, w_l:hw + w_l],
                 pad[:, w_l + 1:hw + w_l + 1]], axis=-1))
            pos += hw
        return jnp.concatenate(quads, axis=1).reshape(B * H * S, 4 * D)

    def build_prep(sampling_locations, attention_weights):
        B, Q = sampling_locations.shape[:2]
        sampling_locations = sampling_locations.astype(jnp.float32)
        attention_weights = attention_weights.astype(jnp.float32)
        loc = sampling_locations.transpose(0, 2, 3, 4, 1, 5)
        attw = attention_weights.transpose(0, 2, 3, 4, 1)
        offsets = []
        pos = 0
        for (h_l, w_l) in shapes:
            offsets.append(pos)
            pos += h_l * w_l
        gidx_l, wcell_l = [], []
        for lvl, (h_l, w_l) in enumerate(shapes):
            x = loc[:, :, lvl, :, :, 0] * w_l - 0.5
            y = loc[:, :, lvl, :, :, 1] * h_l - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            xs = jnp.clip(x0, 0, max(w_l - 2, 0))
            ys = jnp.clip(y0, 0, max(h_l - 2, 0))
            gidx_l.append((offsets[lvl] + ys * w_l + xs
                           ).astype(jnp.int32))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(
                x[..., None] - (xs[..., None] + jnp.arange(2.0))))
            wx = jnp.where((xs[..., None] + jnp.arange(2.0))
                           <= w_l - 1, wx, 0.0)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(
                y[..., None] - (ys[..., None] + jnp.arange(2.0))))
            wy = jnp.where((ys[..., None] + jnp.arange(2.0))
                           <= h_l - 1, wy, 0.0)
            cell = (wy[..., :, None] * wx[..., None, :]).reshape(
                *wx.shape[:-1], 4)
            wcell_l.append(cell * attw[:, :, lvl, :, :, None])
        gidx = jnp.stack(gidx_l, axis=2)
        wcell = jnp.stack(wcell_l, axis=2)
        head_off = (jnp.arange(B * H, dtype=jnp.int32) * S
                    ).reshape(B, H)
        return gidx + head_off[:, :, None, None, None], wcell

    def gather_reduce(quad, gidx, wcell):
        B = gidx.shape[0]
        Q = gidx.shape[-1]
        N_l = B * H * P * Q
        out = jnp.zeros((B, H, Q, D), jnp.float32)
        for lvl in range(L):
            rows = jnp.take(quad, gidx[:, :, lvl].reshape(-1), axis=0)
            rows = jax.lax.optimization_barrier(rows)
            w_l = wcell[:, :, lvl].reshape(N_l, 4, 1)
            out_l = (rows.reshape(N_l, 4, D).astype(jnp.float32)
                     * w_l).sum(1)
            out = out + out_l.reshape(B, H, P, Q, D).sum(2)
        return out.transpose(0, 2, 1, 3).reshape(B, Q, H * D)

    for B in sizes:
        Q = S
        ks = jax.random.split(rng, 3)
        value = 0.1 * jax.random.normal(ks[0], (B, S, H, D),
                                        jnp.bfloat16)
        locs = jax.random.uniform(ks[1], (B, Q, H, L, P, 2))
        attw = jax.nn.softmax(jax.random.normal(
            ks[2], (B, Q, H, L * P)), axis=-1).reshape(B, Q, H, L, P)

        def f_quad(c, ex):
            v, = ex
            q = build_quad((v * (1 + c * 1e-8)).astype(v.dtype))
            return q[:8, :8]
        slope(f"quad_bs{B}", f_quad, (value,))

        def f_prep(c, ex):
            lo, aw = ex
            g, w = build_prep(lo * (1 + c * 1e-8), aw)
            return w[:, :, 0, 0, :8, 0] + g[:, :, 0, 0, :8]
        slope(f"prep_bs{B}", f_prep, (locs, attw))

        quad_c = jax.jit(build_quad)(value)
        gidx_c, wcell_c = jax.jit(build_prep)(locs, attw)

        def f_gather(c, ex):
            qd, g, w = ex
            o = gather_reduce((qd * (1 + c * 1e-8)).astype(qd.dtype),
                              g, w)
            return o[:, :8, :8]
        slope(f"gather_bs{B}", f_gather, (quad_c, gidx_c, wcell_c))

        def f_full(c, ex):
            v, lo, aw = ex
            o = msda_fn(
                (v * (1 + c * 1e-8)).astype(v.dtype), shapes, lo, aw)
            return o[:, :8, :8]
        slope(f"full_bs{B}", f_full, (value, locs, attw))

    for st in ("quad", "prep", "gather", "full"):
        lo, hi = f"{st}_bs{sizes[0]}", f"{st}_bs{sizes[-1]}"
        if lo in result and result.get(lo):
            result[f"{st}_scaling"] = round(
                result[hi] / (result[lo] * sizes[-1] / sizes[0]), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
