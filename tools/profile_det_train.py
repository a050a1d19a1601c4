"""Bisection profiler for the det train step's time budget on the chip.

bench_train.py (512 px, 8 LLM layers) measures ~520 ms/step while the
vision+LLM trunk accounts for only ~60 ms at its known MFU — so ~460 ms
live somewhere in the gdino tool, its backward, or the Hungarian/mask
losses. The axon relay can't ship XLA device traces, so this bisects by
timing each component with the same chained-while-loop slope method
bench.py uses (two trip counts inside ONE jit → relay latency cancels).

Components timed (all at real gdino dims — d256, 6+6, 900 q, Swin-T,
CDN dn_number=100 — at --det-size px, bf16):
  swin_fwd / swin_bwd        backbone alone
  msda_fwd / msda_bwd        one encoder-shape deformable-attn op call
  gdino_fwd                  tool forward incl. CDN query build
  gdino_bwd                  value_and_grad of (det loss + dn loss)
  loss_fwd / loss_bwd        Hungarian + focal/L1/GIoU/mask-point losses
                             on FIXED forward outputs (7 matchings)
  loss_nomask_fwd            same without the mask terms (isolates the
                             full-mask einsum + point sampling cost)

Run: python tools/profile_det_train.py [--det-size 512] [--components a,b]
Prints one JSON line with milliseconds per component.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg):
    print(f"[profile] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--det-size", type=int, default=512)
    ap.add_argument("--n-lo", type=int, default=2)
    ap.add_argument("--n-hi", type=int, default=8)
    ap.add_argument("--components", type=str, default="")
    ap.add_argument("--remat", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from visionllm_tpu.config import GDinoConfig
    from visionllm_tpu.models.grounding_dino.model import GroundingDino
    from visionllm_tpu.models.swin import SwinBackbone, swin_tiny_config
    from visionllm_tpu.ops.ms_deform_attn import ms_deform_attn_quad
    from visionllm_tpu.train.cdn import dn_loss
    from visionllm_tpu.train.losses import detection_loss_with_aux

    result = {"det_size": args.det_size, "unit": "ms",
              "device": jax.devices()[0].platform}
    only = set(args.components.split(",")) if args.components else None

    def want(name):
        return only is None or name.split("_")[0] in only or name in only

    det = args.det_size
    cfg = GDinoConfig(remat=args.remat)
    B, N_t = 1, 20
    rng_np = np.random.default_rng(0)

    def chained(fn):
        # `extra` rides through jit as a real argument — big device
        # trees must NOT be closed over (closure capture embeds them as
        # HLO constants; the relay rejects >100 MB programs with a 413)
        def run(n, c0, extra):
            def body(state):
                i, c = state
                out = fn(c, extra)
                return i + 1, jnp.sum(out).astype(jnp.float32) * 1e-12
            return jax.lax.while_loop(lambda s: s[0] < n, body,
                                      (jnp.int32(0), c0))[1]
        return jax.jit(run)

    def slope(name, fn, extra=None):
        """fn: (scalar carry, extra pytree) -> array; slope-timed."""
        run = chained(fn)
        t = time.time()
        float(run(jnp.int32(1), jnp.float32(0), extra))
        log(f"{name}: compile+first {time.time()-t:.1f}s")
        lo = hi = None
        for n in (args.n_lo, args.n_hi):
            ts = []
            for _ in range(2):
                t = time.time()
                float(run(jnp.int32(n), jnp.float32(0), extra))
                ts.append(time.time() - t)
            if n == args.n_lo:
                lo = min(ts)
            else:
                hi = min(ts)
        ms = (hi - lo) / (args.n_hi - args.n_lo) * 1e3
        result[name] = round(ms, 2)
        log(f"{name}: {ms:.2f} ms")

    # ---------------- swin ------------------------------------------
    if want("swin_fwd") or want("swin_bwd"):
        swin = SwinBackbone(swin_tiny_config(), dtype=jnp.bfloat16)
        pixels = jnp.asarray(rng_np.standard_normal((B, det, det, 3)),
                             jnp.bfloat16)
        sp = jax.jit(swin.init)(jax.random.PRNGKey(0), pixels)["params"]
        sp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), sp)

        if want("swin_fwd"):
            def swin_fwd(c, sp):
                outs = swin.apply({"params": sp}, pixels * (1 + c * 1e-20))
                return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            slope("swin_fwd", swin_fwd, sp)

        if want("swin_bwd"):
            def swin_loss(p, c):
                outs = swin.apply({"params": p}, pixels * (1 + c * 1e-20))
                return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

            def swin_bwd(c, sp):
                l, g = jax.value_and_grad(swin_loss)(sp, c)
                return l + jax.tree.reduce(
                    lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0)
            slope("swin_bwd", swin_bwd, sp)

    # ---------------- msda op ----------------------------------------
    if any(want(x) for x in ("msda_fwd", "msda_bwd", "msda_bwd_v",
                             "msda_bwd_l", "msda_bwd_w", "msda_ref_bwd")):
        # encoder self-attn shapes at det px: S queries == S values
        shapes = tuple((det // s, det // s) for s in (8, 16, 32, 64))
        S = sum(h * w for h, w in shapes)
        H, D, L, P = 8, 32, 4, 4
        value = jnp.asarray(rng_np.standard_normal((B, S, H, D)),
                            jnp.bfloat16)
        loc = jnp.asarray(rng_np.uniform(0.05, 0.95, (B, S, H, L, P, 2)),
                          jnp.float32)
        attw = jax.nn.softmax(jnp.asarray(
            rng_np.standard_normal((B, S, H, L * P)), jnp.float32) * 0.1)
        attw = attw.reshape(B, S, H, L, P)
        result["msda_S"] = S

        if want("msda_fwd"):
            def msda_fwd(c, ex):
                v, l, w = ex
                return ms_deform_attn_quad(
                    v * (1 + c * 1e-20), shapes, l, w)
            slope("msda_fwd", msda_fwd, (value, loc, attw))

        def msda_loss(v, l, w, c, op=ms_deform_attn_quad):
            o = op(v * (1 + c * 1e-20), shapes, l, w)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def mk_bwd(argnums, op=ms_deform_attn_quad):
            def bwd(c, ex):
                v0, l0, w0 = ex
                l, g = jax.value_and_grad(
                    lambda v, lo, w, cc: msda_loss(v, lo, w, cc, op),
                    argnums=argnums)(v0, l0, w0, c)
                g = g if isinstance(g, tuple) else (g,)
                return l + sum(jnp.sum(x.astype(jnp.float32)) for x in g)
            return bwd

        VLW = (value, loc, attw)
        if want("msda_bwd"):
            slope("msda_bwd", mk_bwd((0, 1, 2)), VLW)
        # per-argument bisection: which cotangent path costs the 6x?
        if want("msda_bwd_v"):
            slope("msda_bwd_v", mk_bwd((0,)), VLW)  # scatter-add into value
        if want("msda_bwd_l"):
            slope("msda_bwd_l", mk_bwd((1,)), VLW)  # d(sampling locations)
        if want("msda_bwd_w"):
            slope("msda_bwd_w", mk_bwd((2,)), VLW)  # d(attention weights)
        if want("msda_ref_bwd"):
            from visionllm_tpu.ops.ms_deform_attn import (
                ms_deform_attn_reference)
            slope("msda_ref_bwd", mk_bwd((0, 1, 2),
                                         ms_deform_attn_reference), VLW)

    # ---------------- hungarian alone ---------------------------------
    if want("hungarian1") or want("hungarian7"):
        from visionllm_tpu.train.losses import hungarian_match
        cost1 = jnp.asarray(rng_np.standard_normal((B, 900, N_t)),
                            jnp.float32)
        cost7 = jnp.asarray(rng_np.standard_normal((7, B, 900, N_t)),
                            jnp.float32)
        if want("hungarian1"):
            def h1(c, cm):
                return hungarian_match(cm * (1 + c * 1e-20)).astype(
                    jnp.float32)
            slope("hungarian1", h1, cost1)
        if want("hungarian7"):
            def h7(c, cm):
                # all aux-layer matchings in ONE vmapped solve (lockstep
                # while_loops) instead of 7 serial solver calls
                flat = (cm * (1 + c * 1e-20)).reshape(7 * B, 900, N_t)
                return hungarian_match(flat).astype(jnp.float32)
            slope("hungarian7", h7, cost7)

    # ---------------- gdino + losses ---------------------------------
    need_gdino = any(want(x) for x in
                     ("gdino_fwd", "gdino_bwd", "loss_fwd", "loss_bwd",
                      "loss_nomask_fwd"))
    if need_gdino:
        model = GroundingDino(cfg, dtype=jnp.bfloat16)
        pixels = jnp.asarray(rng_np.standard_normal((B, det, det, 3)),
                             jnp.bfloat16)
        tq = jnp.asarray(rng_np.standard_normal((B, 6, 4, cfg.text_dim)),
                         jnp.bfloat16)
        tq_mask = jnp.ones((B, 6), bool)
        cxcy = rng_np.uniform(0.3, 0.7, (B, N_t, 2))
        wh = rng_np.uniform(0.05, 0.25, (B, N_t, 2))
        targets = {
            "labels": jnp.zeros((B, N_t), jnp.int32),
            "boxes": jnp.asarray(np.concatenate([cxcy, wh], -1),
                                 jnp.float32),
            "valid": jnp.ones((B, N_t), bool),
            "masks": jnp.ones((B, N_t, det // 4, det // 4), jnp.float32),
        }
        t = time.time()
        params = jax.jit(model.init)(
            jax.random.PRNGKey(1), pixels, tq, tq_mask, targets=targets,
            dn_rng=jax.random.PRNGKey(2))["params"]
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                              if a.dtype == jnp.float32 else a, params)
        jax.block_until_ready(params)
        log(f"gdino init {time.time()-t:.1f}s")

        # the composite wrapper builds this from the query-slot mask
        # (composite.py:_text_mask); the bare tool doesn't return it
        text_mask = jnp.pad(tq_mask, ((0, 0),
                                      (0, cfg.max_text_len - 6)))

        def fwd(p, c):
            return model.apply({"params": p}, pixels * (1 + c * 1e-20),
                               tq, tq_mask, targets=targets,
                               dn_rng=jax.random.PRNGKey(2))

        def full_loss(out, rng):
            det_outputs = {k: out[k] for k in
                           ("all_logits", "all_boxes", "all_masks",
                            "enc_logits", "enc_boxes") if k in out}
            det_outputs["text_mask"] = text_mask
            total, _ = detection_loss_with_aux(det_outputs, targets,
                                               cfg=cfg, rng=rng)
            if "dn_all_logits" in out and out.get("dn_targets") is not None:
                for lvl in range(out["dn_all_logits"].shape[0]):
                    d = dn_loss(out["dn_all_logits"][lvl],
                                out["dn_all_boxes"][lvl],
                                out["dn_targets"], cfg=cfg,
                                text_mask=text_mask)
                    total = total + sum(d.values())
            return total

        if want("gdino_fwd"):
            def gdino_fwd(c, p):
                out = fwd(p, c)
                return (jnp.sum(out["all_logits"]) + jnp.sum(out["all_boxes"])
                        + jnp.sum(out["all_masks"]) * 1e-6)
            slope("gdino_fwd", gdino_fwd, params)

        if want("gdino_bwd"):
            def gdino_loss(p, c):
                return full_loss(fwd(p, c), jax.random.PRNGKey(3))

            def gdino_bwd(c, p):
                l, g = jax.value_and_grad(gdino_loss)(p, c)
                return l + jax.tree.reduce(
                    lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0)
            slope("gdino_bwd", gdino_bwd, params)

        if want("loss_fwd") or want("loss_bwd") or want("loss_nomask_fwd"):
            out0 = jax.jit(fwd)(params, jnp.float32(0))
            keep = ("all_logits", "all_boxes", "all_masks", "enc_logits",
                    "enc_boxes", "dn_all_logits",
                    "dn_all_boxes", "dn_targets")
            out0 = {k: out0[k] for k in keep if out0.get(k) is not None}
            out0 = jax.tree.map(
                lambda a: a if a.dtype in (jnp.int32, bool)
                else a.astype(jnp.float32), out0)
            jax.block_until_ready(out0)

            if want("loss_fwd"):
                def loss_fwd(c, o0):
                    o = dict(o0)
                    o["all_logits"] = o["all_logits"] * (1 + c * 1e-20)
                    return full_loss(o, jax.random.PRNGKey(3))
                slope("loss_fwd", loss_fwd, out0)

            if want("loss_nomask_fwd"):
                def loss_nomask_fwd(c, o0):
                    o = {k: v for k, v in o0.items() if k != "all_masks"}
                    o["all_logits"] = o["all_logits"] * (1 + c * 1e-20)
                    return full_loss(o, jax.random.PRNGKey(3))
                slope("loss_nomask_fwd", loss_nomask_fwd, out0)

            if want("loss_bwd"):
                diff_keys = ("all_logits", "all_boxes", "all_masks",
                             "enc_logits", "enc_boxes")

                def loss_bwd(c, o0):
                    def loss_on(diffed, cc):
                        o = dict(o0)
                        o.update(diffed)
                        o["all_logits"] = o["all_logits"] * (1 + cc * 1e-20)
                        return full_loss(o, jax.random.PRNGKey(3))
                    diffed = {k: o0[k] for k in diff_keys}
                    l, g = jax.value_and_grad(loss_on)(diffed, c)
                    return l + jax.tree.reduce(
                        lambda a, x: a + jnp.sum(x), g, 0.0)
                slope("loss_bwd", loss_bwd, out0)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
