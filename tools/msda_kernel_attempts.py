"""Deformable-attention Pallas kernel attempts — the runnable record
behind docs/DEFORMABLE_KERNEL.md (VERDICT r2 next-step #9).

The production op (ops/ms_deform_attn.py::ms_deform_attn_quad) runs at
7.0 ms bf16 per 800px encoder layer against a 3.6 ms pure-row-gather
floor. This script measures, on the real chip, the two remaining kernel
ideas the judge named, plus the baseline:

  A. Mosaic `dynamic_gather` beyond one vreg — minimal repro of the
     compile-time rejection (extent > 128 lanes), and the ≤128-lane
     case that works.
  B. Scalar-prefetch DMA-per-row gather kernel: grid over row blocks,
     each step issues RPB sliced HBM→VMEM DMAs at prefetched indices.
     Measures achievable rows/s vs XLA's row-gather engine.
  C. XLA `jnp.take` row gather baseline at the same shape.

Run: python tools/msda_kernel_attempts.py     (needs the TPU)
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

S = 16384          # source rows (≈ one 800px level)
N = 131072         # gathered rows (scaled-down: full op gathers 1.7M)
DQ = 128           # quad-row width (4·D at D=32), bf16


def attempt_a_dynamic_gather():
    """Mosaic dynamic_gather: works ≤128 lanes, rejected beyond."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(v_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(v_ref[:], i_ref[:], axis=1)

    for extent in (128, 256):
        v = jnp.arange(8 * extent, dtype=jnp.float32).reshape(8, extent)
        idx = jnp.broadcast_to(
            jnp.arange(extent, dtype=jnp.int32)[::-1], (8, extent))
        try:
            out = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, extent), jnp.float32),
            )(v, idx)
            ok = bool((np.asarray(out) == np.asarray(v[:, ::-1])).all())
            print(f"A: extent={extent}: compiled+ran, correct={ok}")
        except Exception as e:                      # noqa: BLE001
            print(f"A: extent={extent}: REJECTED: {str(e)[:160]}")


def attempt_b_dma_gather(rpb: int, n: int = N):
    """Scalar-prefetch DMA-per-row gather at RPB rows per grid step.

    OUTCOME (v5e, jax 0.9.0, 2026-08-17): semantics validate under
    interpret=True, but the REAL compile dies inside Mosaic lowering
    the dynamic `tpu.memref_slice` of the HBM operand
    (`table_ref.at[pl.ds(idx_ref[...], 1), :]`):

        'tpu.memref_slice'(<<UNKNOWN SSA VALUE>>, ...) :
        (memref<16384x128xbf16, ..., #tpu.memory_space<hbm>>, i32, i32)
        ... additional diagnostics were skipped.
        Please report a bug at: https://github.com/google/jax/issues

    i.e. dynamically-indexed HBM slices as DMA sources are not
    expressible in this toolchain. Even if they were, the arithmetic
    closes the door: ≥1 sequential grid-step round per RPB rows means
    1.7M/RPB steps; at RPB=64 and an optimistic 0.5 µs/step that is
    13 ms of pure step overhead — already 2× the 7.0 ms production op
    before any DMA latency."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(idx_ref, table_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        for r in range(rpb):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[i * rpb + r], 1), :],
                scratch.at[pl.ds(r, 1), :], sems.at[r]).start()
        for r in range(rpb):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[i * rpb + r], 1), :],
                scratch.at[pl.ds(r, 1), :], sems.at[r]).wait()
        out_ref[:] = scratch[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // rpb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],      # table in HBM
        out_specs=pl.BlockSpec((rpb, DQ), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((rpb, DQ), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((rpb,)),
        ],
    )
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((S, DQ)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, S, n), jnp.int32)

    fni = pl.pallas_call(
        kern, grid_spec=grid_spec, interpret=True,
        out_shape=jax.ShapeDtypeStruct((n, DQ), jnp.bfloat16))
    out = fni(idx, table)
    ok = bool((np.asarray(out)
               == np.asarray(table)[np.asarray(idx)]).all())
    print(f"B: rpb={rpb}: interpret-mode semantics correct={ok}")

    fn = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, DQ), jnp.bfloat16))
    t = time.time()
    jax.jit(fn).lower(idx, table).compile()
    print(f"B: rpb={rpb}: REAL compile OK in {time.time()-t:.1f}s")
    red = jax.jit(lambda i, t: jnp.sum(fn(i, t).astype(jnp.float32)))
    float(red(idx, table))
    ts = []
    for _ in range(4):
        t = time.perf_counter()
        float(red(idx, table))
        ts.append(time.perf_counter() - t)
    dt = min(ts)
    print(f"B: DMA gather rpb={rpb}: {dt*1e3:.2f} ms "
          f"({n/dt/1e6:.0f}M rows/s) [includes 1 relay trip]")
    return dt


def baseline_xla_take():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((S, DQ)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, S, N), jnp.int32)
    red = jax.jit(lambda i, t: jnp.sum(
        jnp.take(t, i, axis=0).astype(jnp.float32)))
    float(red(idx, table))
    ts = []
    for _ in range(4):
        t = time.perf_counter()
        float(red(idx, table))
        ts.append(time.perf_counter() - t)
    dt = min(ts)
    print(f"C: XLA jnp.take row gather: {dt*1e3:.2f} ms "
          f"({N/dt/1e6:.0f}M rows/s) [includes 1 relay trip]")
    return dt


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    attempt_a_dynamic_gather()
    for rpb in (8, 64):
        try:
            attempt_b_dma_gather(rpb, n=8192)
        except Exception as e:                      # noqa: BLE001
            print(f"B: rpb={rpb} FAILED (see docstring — Mosaic cannot "
                  f"lower the dynamic HBM slice): {str(e)[:160]}")
    baseline_xla_take()
