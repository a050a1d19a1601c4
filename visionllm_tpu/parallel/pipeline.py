"""Pipeline parallelism over the scanned LLM layer stack ("pipe" axis).

The reference scales the LLM with DeepSpeed ZeRO only — no pipeline
(SURVEY.md §2.9). On TPU, PP is a natural third axis next to FSDP/TP
because our decoder stack is ALREADY a single `nn.scan` over stacked
[n_layers, ...] parameters (models/llama.py): sharding that leading
layer axis over a "pipe" mesh axis gives each chip a contiguous block
of layers with zero re-plumbing, and the GPipe microbatch schedule is a
`shard_map` whose only collective is one hop-to-neighbor `ppermute` per
step — pure ICI traffic, overlappable with the block compute.

Schedule (classic GPipe, S stages, M microbatches, T = M + S - 1 steps):

  step t: stage s computes microbatch (t - s) when 0 <= t - s < M,
  then hands its activation to stage s+1. Bubble fraction is
  (S - 1) / T; callers pick M >= 4 * S to amortize.

All stages run the same program every step (SPMD); out-of-window steps
compute on garbage registers and their outputs are masked out of the
bookkeeping, which costs the bubble but keeps shapes static and the
loop a plain `lax.fori_loop`.

`pipeline_llm_forward` reproduces `LlamaModel.__call__` (cache-less
prefill path) exactly — tests/test_pipeline_parallel.py checks logits
against the unsharded model."""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from visionllm_tpu.config import LLMConfig


def _gpipe(stage_fn, local_params, mb_inputs, axis_name: str):
    """Run the GPipe schedule inside shard_map.

    stage_fn(local_params, x, mb_index) -> y — applies this stage's
    layer block to one microbatch activation x [Bm, ...].
    mb_inputs: [M, Bm, ...] microbatched stage-0 inputs (replicated).
    Returns [M, Bm, ...] stage-(S-1) outputs, replicated over the axis.
    """
    S = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)
    M = mb_inputs.shape[0]

    def step(t, carry):
        x_reg, out_buf = carry
        mb_idx = jnp.clip(t - stage, 0, M - 1)
        x = jnp.where(stage == 0, mb_inputs[jnp.clip(t, 0, M - 1)], x_reg)
        y = stage_fn(local_params, x, mb_idx)
        # last stage commits microbatch t-(S-1) once it's real
        o_idx = t - (S - 1)
        ok = (stage == S - 1) & (o_idx >= 0) & (o_idx < M)
        o_idx = jnp.clip(o_idx, 0, M - 1)
        out_buf = out_buf.at[o_idx].set(
            jnp.where(ok, y, out_buf[o_idx]))
        # hand activations one stage forward (non-cyclic: stage 0's
        # register is refilled from mb_inputs, so the wrap value is dead)
        x_reg = jax.lax.ppermute(
            y, axis_name, [(j, j + 1) for j in range(S - 1)])
        return x_reg, out_buf

    x0 = jnp.zeros_like(mb_inputs[0])
    out0 = jnp.zeros_like(mb_inputs)
    _, out = jax.lax.fori_loop(0, M + S - 1, step, (x0, out0))
    # only the last stage holds real outputs — replicate over the ring
    out = jax.lax.psum(jnp.where(stage == S - 1, out, 0.0), axis_name)
    return out


def pipeline_llm_forward(
    cfg: LLMConfig,
    params: Any,                    # full LlamaModel params (stacked layers)
    inputs_embeds: jnp.ndarray,     # [B, L, hid]
    positions: jnp.ndarray,         # [B, L]
    mesh: Mesh,
    *,
    n_microbatch: int,
    axis_name: str = "pipe",
    dtype=jnp.float32,
    compute_logits: bool = True,
) -> jnp.ndarray:
    """Cache-less prefill through the decoder stack, layers sharded over
    `axis_name`, microbatched over the batch dim. Returns logits (or the
    post-norm hidden states when compute_logits=False), numerically equal
    to `LlamaModel.__call__`."""
    from visionllm_tpu.models.common import RMSNorm, rope_cos_sin
    from visionllm_tpu.models.llama import LlamaDecoderLayer

    B, L, _ = inputs_embeds.shape
    M = n_microbatch
    assert B % M == 0, (B, M)
    S = mesh.shape[axis_name]
    assert cfg.num_layers % S == 0, (cfg.num_layers, S)
    Bm = B // M

    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                            dtype=dtype)
    mb = inputs_embeds.reshape(M, Bm, L, -1)
    cos_mb = cos.reshape(M, Bm, *cos.shape[1:])
    sin_mb = sin.reshape(M, Bm, *sin.shape[1:])
    layer = LlamaDecoderLayer(cfg, dtype)

    def stage_fn(local_stacked, x, mb_idx):
        c, s = cos_mb[mb_idx], sin_mb[mb_idx]

        def one(h, layer_params):
            h, _ = layer.apply({"params": layer_params}, h, c, s,
                               None, 0, None, None)
            return h, None

        x, _ = jax.lax.scan(one, x, local_stacked)
        return x

    run = functools.partial(_gpipe, stage_fn, axis_name=axis_name)
    out = jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(axis_name), P()),   # layer stack sharded; mb replicated
        out_specs=P(),
        check_vma=False,
    )(params["layers"]["layer"], mb)

    hidden = out.reshape(B, L, -1)
    norm = RMSNorm(eps=cfg.rms_norm_eps, dtype=dtype, name="norm")
    hidden = norm.apply({"params": params["norm"]}, hidden)
    if not compute_logits:
        return hidden
    logits = hidden.astype(dtype) @ params["lm_head"]["kernel"].astype(dtype)
    return logits.astype(jnp.float32)
