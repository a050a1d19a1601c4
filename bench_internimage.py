"""InternImage-H full-scale compile + timing evidence on the real chip
(VERDICT r2 weak #6: the STATUS claim had no committed artifact).

Compiles the FULL InternImage-H backbone (1.07B params: channels 320,
depths 6/6/32/6, groups 10/20/40/80 — the 26B variant's det/pose
backbone, reference modeling_ov_grounding_dino_mask_dn.py:4636-5153)
in bf16, runs a warm forward at the given image size, and writes
bench_internimage.json: {device, params_b, compile_s, warm_forward_ms,
image_size, dtype}.

Run:  python bench_internimage.py [image_size]   (default 224)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main(image_size: int = 224):
    t0 = time.time()
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_internimage.json")
    result = {"metric": "internimage_h_warm_forward_ms", "value": 0.0,
              "unit": "ms", "image_size": image_size, "dtype": "bfloat16"}
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from visionllm_tpu.models.intern_image import (InternImage,
                                                       intern_image_h_config)
        result["device"] = jax.devices()[0].platform

        cfg = intern_image_h_config()
        model = InternImage(cfg, jnp.bfloat16)
        x = jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16)

        def init(r):
            p = model.init(r, x)["params"]
            return jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, p)

        t = time.time()
        params = jax.jit(init)(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        result["init_s"] = round(time.time() - t, 1)
        result["params_b"] = round(sum(
            int(np.prod(np.shape(l))) for l in jax.tree.leaves(params))
            / 1e9, 3)

        # block_until_ready through the axon relay returns before the
        # device work completes (measured ~1 ms for this 1.07B model —
        # below the 2.6 ms HBM read floor), so timing must force a
        # VALUE: chain n forwards inside one jit with a data dependency
        # (runtime n — one compile serves both trip counts) and take
        # the two-trip-count slope, which also cancels the relay's
        # per-call round trip.
        def chained(n, p, x):
            def cond(s):
                return s[0] < n

            def body(s):
                i, c = s
                feats = model.apply({"params": p},
                                    x + c.astype(x.dtype) * 1e-12)
                return i + 1, jnp.sum(
                    feats[-1].astype(jnp.float32)) * 1e-12

            return jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.float32(0)))[1]

        cfwd = jax.jit(chained)
        t = time.time()
        _ = float(cfwd(jnp.int32(1), params, x))
        result["compile_plus_first_call_s"] = round(time.time() - t, 1)

        def run(n):
            t = time.perf_counter()
            _ = float(cfwd(jnp.int32(n), params, x))
            return time.perf_counter() - t

        run(2)                                     # warm
        t_lo = min(run(2) for _ in range(2))
        t_hi = min(run(10) for _ in range(2))
        result["value"] = round((t_hi - t_lo) / 8 * 1e3, 2)
        result["warm_forward_ms"] = result["value"]
        result["single_call_time_to_value_ms"] = round(run(1) * 1e3, 2)
        feats = jax.eval_shape(
            lambda p, x: model.apply({"params": p}, x), params, x)
        result["feature_shapes"] = [list(f.shape) for f in feats]
        result["wall_s"] = round(time.time() - t0, 1)
    except Exception as e:                          # noqa: BLE001
        result["error"] = str(e)[:300]
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 224)
