"""Locate the non-finite gradient that NaNs the det train step.

bench_train at real dims (512/640 px) reports a FINITE first loss and
NaN from step 2 on — the classic signature of an inf/NaN gradient at
step 1: clip_by_global_norm sees norm=inf/nan and poisons every
parameter. This tool reproduces bench_train's exact setup, runs ONE
value_and_grad, and reports per-subtree gradient health (non-finite
counts, max |g|) plus each loss component, then applies one optimizer
update and re-evaluates the loss so the propagation is visible.

Run: python tools/debug_train_nan.py [--det 320] [--llm-layers 2]
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
    print(f"[nan_hunt] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--det", type=int, default=320)
    ap.add_argument("--llm-layers", type=int, default=2)
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--remat", default="dots")
    ap.add_argument("--depth", type=int, default=2,
                    help="subtree report depth")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from visionllm_tpu.config import (GDinoConfig, LLMConfig,
                                      VisionEncoderConfig,
                                      VisionLLMConfig)
    from visionllm_tpu.models.composite import VisionLLMWithTools
    from visionllm_tpu.models.visionllm import SpecialTokenIds
    from visionllm_tpu.train.losses import detection_loss_with_aux
    from visionllm_tpu.train.train_step import (OptimizerConfig,
                                                build_optimizer,
                                                merge_frozen,
                                                split_frozen)

    cfg = VisionLLMConfig(
        vis_encoder=VisionEncoderConfig(),
        llm=LLMConfig(vocab_size=32096, num_layers=args.llm_layers,
                      remat=args.remat),
        vl_bridge_type="mlp2x_gelu",
        use_gdino=True,
        gdino=GDinoConfig(remat=args.remat),
    )
    tid = SpecialTokenIds.synthetic()
    model = VisionLLMWithTools(cfg, dtype=jnp.bfloat16,
                               tool_dtype=jnp.bfloat16)

    B, det = args.bs, args.det
    img_len = cfg.vis_encoder.num_patches
    ids = ([1, 10, 11] + [tid.imp] * img_len + [12]
           + [tid.det] + [tid.emb + i for i in range(cfg.num_embs)] + [2])
    L = len(ids)
    input_ids = jnp.tile(jnp.asarray([ids], jnp.int32), (B, 1))
    N_t = 20
    rng_np = np.random.default_rng(0)
    cxcy = rng_np.uniform(0.3, 0.7, (B, N_t, 2))
    wh = rng_np.uniform(0.05, 0.25, (B, N_t, 2))
    batch = {
        "input_ids": input_ids,
        "labels": jnp.where(input_ids >= 10, input_ids, -100),
        "attn_mask": jnp.ones((B, L), jnp.int32),
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
        return path.startswith(("core/vis_encoder", "core/llm"))

    def init(r):
        p = model.init(r, batch, tid)["params"]

        def cast(path, a):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if a.dtype != jnp.float32:
                return a
            return a if not frozen(name) else a.astype(jnp.bfloat16)
        return jax.tree_util.tree_map_with_path(cast, p)

    t = time.time()
    params = jax.jit(init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"init {time.time()-t:.1f}s")

    gcfg = cfg.gdino

    # loss_fn == make_det_train_step's (train_step.py:212-244), inlined
    # so value_and_grad + metrics are exposed directly
    def loss_fn(params, batch, rng):
        rng_dn, rng_loss = jax.random.split(rng)
        out = model.apply({"params": params}, batch, tid, rng_dn,
                          method=VisionLLMWithTools.forward_det)
        det_o = out["det"]
        det_outputs = {k: det_o[k] for k in
                       ("all_logits", "all_boxes", "all_masks",
                        "enc_logits", "enc_boxes", "text_mask")}
        det_total, detail = detection_loss_with_aux(
            det_outputs, batch["targets"], cfg=gcfg, rng=rng_loss)
        if "dn_all_logits" in det_o and det_o.get("dn_targets") is not None:
            from visionllm_tpu.train.cdn import dn_loss
            n_lvl = det_o["dn_all_logits"].shape[0]
            for lvl in range(n_lvl):
                d = dn_loss(det_o["dn_all_logits"][lvl],
                            det_o["dn_all_boxes"][lvl],
                            det_o["dn_targets"], cfg=gcfg,
                            text_mask=det_o["text_mask"])
                for k, v in d.items():
                    detail[f"{k}_dn{lvl}"] = v
                    det_total = det_total + v
        loss = out["lm_loss"] + det_total
        detail["lm_loss"] = out["lm_loss"]
        detail["det_total"] = det_total
        return loss, detail

    train_p, frozen_p = split_frozen(params, frozen)

    def train_loss(tp, batch, rng):
        return loss_fn(merge_frozen(tp, frozen_p), batch, rng)

    t = time.time()
    (loss, detail), grads = jax.jit(
        jax.value_and_grad(train_loss, has_aux=True))(
            train_p, batch, jax.random.PRNGKey(7))
    jax.block_until_ready(grads)
    log(f"value_and_grad compile+run {time.time()-t:.1f}s "
        f"loss={float(loss):.4f}")

    bad_components = {k: float(v) for k, v in detail.items()
                      if not np.isfinite(float(v))}
    print("loss components (non-finite):",
          json.dumps(bad_components) if bad_components else "none")

    # per-subtree gradient health
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0, 0.0])   # n, n_bad, max_abs
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        key = "/".join(name.split("/")[:args.depth])
        a = np.asarray(leaf, np.float32)
        agg[key][0] += a.size
        agg[key][1] += int((~np.isfinite(a)).sum())
        finite = a[np.isfinite(a)]
        if finite.size:
            agg[key][2] = max(agg[key][2], float(np.abs(finite).max()))
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    print(f"{'subtree':55s} {'params':>10s} {'nonfinite':>10s} "
          f"{'max|g|':>12s}")
    for k, (n, bad, mx) in rows[:30]:
        flag = " <-- BAD" if bad else ""
        print(f"{k:55s} {n:10d} {bad:10d} {mx:12.4g}{flag}")

    total_bad = sum(v[1] for v in agg.values())
    print(f"total non-finite grad elements: {total_bad}")

    if total_bad == 0:
        # grads clean -> the optimizer update must be the culprit;
        # apply one AdamW step and re-evaluate
        import optax
        from visionllm_tpu.train.train_step import TrainState
        tx = build_optimizer(OptimizerConfig(total_steps=1000), train_p)
        opt_state = jax.jit(tx.init)(train_p)
        updates, _ = jax.jit(tx.update)(grads, opt_state, train_p)
        upd_bad = sum(int((~np.isfinite(np.asarray(u, np.float32))).sum())
                      for u in jax.tree.leaves(updates))
        print(f"update non-finite elements: {upd_bad}")
        new_p = optax.apply_updates(train_p, updates)
        (loss2, detail2), grads2 = jax.jit(
            jax.value_and_grad(train_loss, has_aux=True))(
                new_p, batch, jax.random.PRNGKey(8))
        print(f"loss after one update: {float(loss2):.4f}")
        bad2 = {k: float(v) for k, v in detail2.items()
                if not np.isfinite(float(v))}
        print("step-2 non-finite components:",
              json.dumps(bad2) if bad2 else "none")
        g2_bad = sum(int((~np.isfinite(np.asarray(g, np.float32))).sum())
                     for g in jax.tree.leaves(grads2))
        print(f"step-2 non-finite grad elements: {g2_bad}")


if __name__ == "__main__":
    main()
