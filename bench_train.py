"""Training-step throughput on the real chip: det task at flagship dims.

Every perf artifact so far measures inference (bench.py e2e/TTFT/decode,
bench_serve.py, bench_internimage.py); this one measures the TRAINING
step — the reference's primary workload (HF Trainer + DeepSpeed,
train/train.py:271) — on the production code path:

  CLIP-ViT-L/336 (full 24 layers) -> mlp2x_gelu bridge -> LLaMA-width
  4096 decoder -> [EMB] text queries -> grounding-dino at REAL dims
  (d256, 6 enc + 6 dec, 900 queries, Swin-T, CDN) -> Hungarian losses
  -> backward -> AdamW update.

Freezing follows the reference's stage-1 recipe (vision encoder + LLM
frozen, gdino/bridge/embeddings trainable — train/train.py:533-558 via
our frozen-predicate optimizer masking); grads still flow THROUGH the
frozen LLM to the vision bridge, so the backward pass covers the whole
network. The LLM depth is configurable (default 8 of 32 layers): a 7B
full-grad train step cannot fit one 16 GB v5e chip — multi-chip FSDP
is exercised by `__graft_entry__.dryrun_multichip` — so this artifact
reports single-chip step time at the reduced depth HONESTLY
("llm_layers" in the JSON) plus an MFU lower bound computed from an
analytic fwd+bwd flop model of the vision+bridge+LLM trunk only
(gdino/backbone flops excluded, same convention as bench.py's
mfu_e2e_lower_bound).

Timing: the axon relay adds O(10 ms)+ per host round trip and
block_until_ready can return before device work completes, so steps are
chained inside ONE jit (lax.while_loop with a data dependency, runtime
trip count) and the per-step time is the slope between two trip counts.
The train state is donated on every call, so the params/optimizer tree
exists once; the output state of the warm-up call feeds the timed calls.

Run:  python bench_train.py [--llm-layers 8] [--det-size 512] [--bs 1]
Writes bench_train.json:
  {step_ms, images_per_sec_chip, llm_layers, params_b, trainable_b,
   mfu_train_lower_bound, device, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(msg):
    print(f"[bench_train] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--llm-layers", type=int, default=8)
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--n-lo", type=int, default=2)
    ap.add_argument("--n-hi", type=int, default=6)
    ap.add_argument("--remat", default="dots", choices=["", "dots", "full"])
    ap.add_argument("--grad-accum-ladder", type=str, default="",
                    help="comma list, e.g. 2,4,8: after the main "
                         "measurement, time an optax.MultiSteps train "
                         "step at each accumulation factor and report "
                         "micro-step_ms per rung")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: shrink every dim (validates the "
                         "script end-to-end, numbers meaningless)")
    args = ap.parse_args()

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_train.json")
    result = {"metric": "det_train_step_ms", "value": 0.0, "unit": "ms",
              "llm_layers": args.llm_layers, "det_size": args.det_size,
              "batch_size": args.bs, "remat": args.remat,
              "dtype": "bfloat16"}
    try:
        _run(args, result, out_path)
    except BaseException as e:                       # noqa: B036
        # emit-always contract (like bench.py): a mid-run crash after a
        # 100+s compile must still leave a JSON with the error recorded
        result["error"] = repr(e)[:500]
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        raise


def _run(args, result, out_path):
    import jax

    # persistent compile cache: the 640px det train step takes ~800 s to
    # compile; iterating on the bench without it is untenable. /tmp (not
    # the committed .jax_cache — TPU executables don't belong in git).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from visionllm_tpu.config import (GDinoConfig, LLMConfig,
                                      VisionEncoderConfig, VisionLLMConfig)
    from visionllm_tpu.models.composite import VisionLLMWithTools
    from visionllm_tpu.models.visionllm import SpecialTokenIds
    from visionllm_tpu.train.train_step import (OptimizerConfig, TrainState,
                                                build_optimizer,
                                                make_det_train_step,
                                                split_frozen)

    result["device"] = jax.devices()[0].platform
    t0 = time.time()

    if args.tiny:
        from visionllm_tpu.config import tiny_test_config
        cfg = tiny_test_config(use_unipose=False, use_sd=False,
                               use_ip2p=False, use_region_encoder=False)
        args.det_size = 32
        result["det_size"] = 32
        result["tiny"] = True
    else:
        cfg = VisionLLMConfig(
            vis_encoder=VisionEncoderConfig(),      # full CLIP-ViT-L/336
            llm=LLMConfig(vocab_size=32096, num_layers=args.llm_layers,
                          remat=args.remat),
            vl_bridge_type="mlp2x_gelu",
            use_gdino=True,
            # real dims, Swin-T, CDN; remat the 6+6 deformable stacks too —
            # at >=640 px their activations dominate the 16 GB chip
            gdino=GDinoConfig(remat=args.remat),
        )
        result["tiny"] = False
    # record the dims actually measured, not the CLI defaults (tiny mode
    # shrinks every dim)
    result["llm_layers"] = cfg.llm.num_layers
    result["llm_width"] = cfg.llm.hidden_size
    tid = SpecialTokenIds.synthetic()
    model = VisionLLMWithTools(cfg, dtype=jnp.bfloat16,
                               tool_dtype=jnp.bfloat16)

    B, det = args.bs, args.det_size
    img_len = cfg.vis_encoder.num_patches
    ids = ([1, 10, 11] + [tid.imp] * img_len + [12]
           + [tid.det] + [tid.emb + i for i in range(cfg.num_embs)] + [2])
    L = len(ids)
    input_ids = jnp.tile(jnp.asarray([ids], jnp.int32), (B, 1))
    N_t = 20                                        # targets per image
    rng_np = np.random.default_rng(0)
    cxcy = rng_np.uniform(0.3, 0.7, (B, N_t, 2))
    wh = rng_np.uniform(0.05, 0.25, (B, N_t, 2))
    batch = {
        "input_ids": input_ids,
        "labels": jnp.where(input_ids >= 10, input_ids, -100),
        "attn_mask": jnp.ones((B, L), jnp.int32),
        # constant images zero out every LayerNorm variance and blow up
        # the backward (see __graft_entry__) — use random pixels
        "images": 0.5 * jax.random.normal(
            jax.random.PRNGKey(2),
            (B, cfg.vis_encoder.image_size, cfg.vis_encoder.image_size, 3),
            jnp.bfloat16),
        "images_aug": 0.5 * jax.random.normal(
            jax.random.PRNGKey(3), (B, det, det, 3), jnp.bfloat16),
        "targets": {
            "labels": jnp.zeros((B, N_t), jnp.int32),
            "boxes": jnp.asarray(np.concatenate([cxcy, wh], -1),
                                 jnp.float32),
            "valid": jnp.ones((B, N_t), bool),
            "masks": jnp.ones((B, N_t, det // 4, det // 4), jnp.float32),
        },
    }

    def frozen(path: str) -> bool:
        # reference stage-1: vision encoder + LLM frozen
        # (train/train.py:533-558)
        return path.startswith(("core/vis_encoder", "core/llm"))

    def init(r):
        p = model.init(r, batch, tid)["params"]

        # fp32 master weights for the TRAINABLE subtree (bf16 updates at
        # lr 2e-5 round to zero against ~0.02-magnitude params, and bf16
        # Adam moments are unstable); frozen params stay bf16 — flax
        # casts params to the module dtype at use, so compute is bf16
        # everywhere either way. Cost: ~0.5 GB for 0.09B trainables.
        def cast(path, a):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if a.dtype != jnp.float32:
                return a
            return a if not frozen(name) else a.astype(jnp.bfloat16)

        return jax.tree_util.tree_map_with_path(cast, p)

    t = time.time()
    params = jax.jit(init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    result["init_s"] = round(time.time() - t, 1)
    log(f"init {result['init_s']}s")

    def _count(tree, pred=lambda p: True):
        total = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if pred(name):
                total += int(np.prod(np.shape(leaf)))
        return total

    n_all = _count(params)
    n_frozen = _count(params, frozen)
    result["params_b"] = round(n_all / 1e9, 3)
    result["trainable_b"] = round((n_all - n_frozen) / 1e9, 3)

    # frozen-split mode: gradients/optimizer state exist only for the
    # trainable subtree; XLA prunes the frozen-only ViT backward
    # entirely (the reference's requires_grad=False memory semantics)
    train_tree, _ = split_frozen(params, frozen)
    tx = build_optimizer(OptimizerConfig(total_steps=1000), train_tree)
    # donate: params would otherwise stay alive as a second full copy of
    # the model (4.5 GB at 7B-width dims). `params` keeps aval metadata,
    # which is all _count/dense_flops need afterwards.
    state = jax.jit(lambda p: TrainState.create(p, tx, frozen=frozen),
                    donate_argnums=0)(params)
    jax.block_until_ready(state.opt_state)
    step = make_det_train_step(model, tx, tid, frozen=frozen)

    def chained(n, state, batch, rng):
        def cond(s):
            return s[0] < n

        def body(s):
            i, st, _ = s
            new_st, metrics = step(st, batch, jax.random.fold_in(rng, i))
            return (i + 1, new_st, metrics["loss"])

        _, final, loss = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), state,
                         jnp.zeros((), jnp.float32)))
        return final, loss

    jitted = jax.jit(chained, donate_argnums=(1,))

    t = time.time()
    state, loss = jitted(jnp.asarray(1), state, batch,
                         jax.random.PRNGKey(7))
    loss = float(loss)                              # forces the value
    result["compile_plus_first_step_s"] = round(time.time() - t, 1)
    result["loss"] = round(loss, 4)
    assert np.isfinite(loss), loss
    log(f"compile+first step {result['compile_plus_first_step_s']}s "
        f"loss={loss:.4f}")
    try:
        ms = jax.devices()[0].memory_stats() or {}
        result["hbm_peak_gb"] = round(
            ms.get("peak_bytes_in_use", 0) / 2**30, 2)
        log(f"hbm peak {result['hbm_peak_gb']} GiB")
    except Exception:   # noqa: BLE001 — relay may not expose stats
        pass

    times = {}
    for n in (args.n_lo, args.n_hi):
        t = time.time()
        state, loss = jitted(jnp.asarray(n), state, batch,
                             jax.random.PRNGKey(8 + n))
        float(loss)
        times[n] = time.time() - t
        log(f"chain({n}) {times[n]:.2f}s loss={float(loss):.4f}")
    step_s = (times[args.n_hi] - times[args.n_lo]) / (args.n_hi - args.n_lo)

    result["value"] = round(step_s * 1e3, 1)
    result["images_per_sec_chip"] = round(B / step_s, 3)

    # Analytic flop model of the trunk only (vision + bridge + LLM),
    # honest about what frozen-split actually computes per matmul
    # (fwd = 2pT): frozen ViT has NO backward (nothing trainable
    # upstream) -> 1x; frozen LLM needs input-cotangents dX to reach
    # the trainable bridge/gdino below, but no dW -> 2x; trainable
    # bridge does fwd+dX+dW -> 3x. gdino + Swin flops excluded ->
    # lower bound (bench.py convention).
    def dense_flops(tree_pred, tokens):
        return 2 * _count(params, tree_pred) * tokens

    f_vis = dense_flops(lambda p: p.startswith("core/vis_encoder"),
                        B * (img_len + 1))
    # embed_tokens is a gather, not a matmul — exclude it from the flop
    # numerator (same convention as bench.py's p_llm - p_emb)
    f_llm = dense_flops(lambda p: p.startswith("core/llm")
                        and "embed_tokens" not in p, B * L)
    f_bridge = dense_flops(lambda p: p.startswith("core/vl_bridge"),
                           B * img_len)
    # det-branch terms (previously excluded entirely, which understated
    # the bound by the whole tool): Swin consumes raw pixels with
    # nothing trainable upstream -> fwd only (published Swin-T cost,
    # rounded DOWN to 4.0 GFLOP @224^2, scaled by area); the gdino
    # encoder carries text-query gradients back to the bridge -> fwd+dX
    # (2x). Encoder per layer counts only the dominant dense matmuls —
    # deformable value+output projs (4*S*d^2), the fusion layer's
    # vision-side projections (4*S*d^2), and the FFN (4*S*d*dffn) —
    # omitting decoder, text stack, sampling-offset heads and the
    # gather itself, so the total stays a strict undercount.
    gd = cfg.gdino
    s0 = args.det_size // 8
    S_det = sum((s0 >> i) ** 2 for i in range(gd.num_feature_levels))
    d, dffn = gd.d_model, gd.ffn_dim
    f_gdino_enc = gd.encoder_layers * (
        8 * S_det * d * d + 4 * S_det * d * dffn)
    f_swin = 4.0e9 * (args.det_size / 224.0) ** 2
    flops = (1 * f_vis + 2 * f_llm + 3 * f_bridge
             + B * (1 * f_swin + 2 * f_gdino_enc))
    result["flop_model"] = ("fwd-only frozen ViT + Swin (1x), fwd+dX "
                            "frozen LLM + gdino encoder (2x), "
                            "fwd+dX+dW trainable bridge (3x); gdino "
                            "decoder/text-stack/gathers still excluded "
                            "(strict undercount)")
    peak = 197e12 if result["device"] == "tpu" else float("inf")
    result["mfu_train_lower_bound"] = round(flops / step_s / peak, 4)

    # ---------------- grad-accum ladder ------------------------------
    # every rung is a full recompile (optax.MultiSteps changes the
    # opt-state tree), so each reports its own micro-step time; the
    # interesting number is the overhead vs the plain step (the
    # accumulator add + the skipped optimizer update).
    if args.grad_accum_ladder:
        ladder = {}
        # the plain step's Adam moments stay resident otherwise and the
        # first rung OOMs before its own state even allocates
        for leaf in jax.tree.leaves(state.opt_state):
            if hasattr(leaf, "delete"):
                leaf.delete()
        params_live = state.params
        for k in [int(v) for v in args.grad_accum_ladder.split(",")]:
            try:
                tx_k = build_optimizer(
                    OptimizerConfig(total_steps=1000, grad_accum_steps=k),
                    train_tree)
                # donate: without it the create-jit CLONES the full
                # param tree (7.9 GB at 16 layers) next to the old one
                # — the observed accum-rung OOM. The state's params
                # leaf keeps the (aliased) tree alive for later rungs.
                state_k = jax.jit(
                    lambda p, t=tx_k: TrainState.create(p, t,
                                                        frozen=frozen),
                    donate_argnums=0)(params_live)
                params_live = state_k.params
                jax.block_until_ready(state_k.opt_state)
                step_k = make_det_train_step(model, tx_k, tid,
                                             frozen=frozen)

                def chained_k(n, st, batch, rng, _step=step_k):
                    def body(s):
                        i, st2, _ = s
                        new_st, m = _step(st2, batch,
                                          jax.random.fold_in(rng, i))
                        return (i + 1, new_st, m["loss"])
                    _, final, loss = jax.lax.while_loop(
                        lambda s: s[0] < n, body,
                        (jnp.zeros((), jnp.int32), st,
                         jnp.zeros((), jnp.float32)))
                    return final, loss

                jit_k = jax.jit(chained_k, donate_argnums=(1,))
                t = time.time()
                state_k, lk = jit_k(jnp.asarray(1), state_k, batch,
                                    jax.random.PRNGKey(7))
                float(lk)
                log(f"accum{k} compile+first {time.time()-t:.1f}s")
                tms = {}
                for n in (args.n_lo, args.n_hi):
                    t = time.time()
                    state_k, lk = jit_k(jnp.asarray(n), state_k, batch,
                                        jax.random.PRNGKey(8 + n))
                    float(lk)
                    tms[n] = time.time() - t
                micro_s = ((tms[args.n_hi] - tms[args.n_lo])
                           / (args.n_hi - args.n_lo))
                ladder[str(k)] = {
                    "micro_step_ms": round(micro_s * 1e3, 1),
                    "overhead_vs_plain": round(micro_s / step_s - 1, 3)}
                log(f"accum{k} micro-step {micro_s*1e3:.1f} ms "
                    f"({micro_s/step_s-1:+.1%} vs plain)")
                # every jit_k call donated the state, so the rung-entry
                # param buffers are dead — carry the FINAL state's
                params_live = state_k.params
                for leaf in jax.tree.leaves(state_k.opt_state):
                    if hasattr(leaf, "delete"):
                        leaf.delete()
            except Exception as e:                  # noqa: BLE001
                ladder[str(k)] = {"error": str(e)[:200]}
                log(f"accum{k} failed: {e}")
        result["grad_accum_ladder"] = ladder

    result["total_s"] = round(time.time() - t0, 1)

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
