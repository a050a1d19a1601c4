"""Int8 weight-only quantization for the serving path.

The reference has no quantized serving mode (inference =
``model.generate()`` in bf16, visionllmv2/model/modeling_visionllmv2.py);
this is a TPU-first extension: decode is HBM-bandwidth-bound (the whole
weight tree is streamed once per token), so storing the LLM matmul
weights as int8 + per-output-channel bf16 scales halves the bytes per
token and — on a v5e where decode sits at ~75% of the 819 GB/s HBM peak
— nearly doubles decode throughput at unchanged batch size.

TPU notes
---------
* weight-only (w8a16): activations stay bf16, the int8 kernel is
  converted to bf16 *inside* the matmul fusion (XLA fuses the
  elementwise ``convert`` into the dot's operand load, so the dequant
  costs no extra HBM round trip). The MXU runs the dot in bf16 —
  numerics match a bf16 matmul against the dequantized weights exactly.
* scales are per-output-channel symmetric (``max(|W[:, o]|)/127``),
  folded into the *output*: ``y = (x @ Wq) * s`` ≡ ``x @ (Wq * s)``.
  No zero points: LLM matmul weights are symmetric around 0, and a
  zero-point would force an extra correction term per row.
* quantization of a converted checkpoint tree happens leaf-by-leaf on
  device (`quantize_llm_params`), deleting each bf16 leaf after its
  int8 replacement is built, so peak HBM is the bf16 tree + one layer
  stack — a 7B tree quantizes in-place on a 16 GB chip.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# LLM projection kernels eligible for int8 storage. Embedding lookups are
# a single-row gather (no bandwidth win) and stay bf16.
_PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
               "up_proj", "down_proj", "lm_head")


def quantize_int8(w: jnp.ndarray, axis: int = -2):
    """Symmetric per-output-channel int8 quantization.

    ``axis`` is the contraction (in-features) axis that the scale
    reduces over; for a flax Dense kernel ``[in, out]`` (or a scanned
    stack ``[n_layers, in, out]``) that is ``-2``.

    Returns ``(wq int8, scale)`` with ``scale`` shaped like ``w`` minus
    the reduced axis, such that ``wq * scale ≈ w``.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis)
    # round the scale to its bf16 storage dtype BEFORE quantizing, so
    # wq*scale stays within half a quantization step of w
    scale = jnp.maximum(amax / 127.0, 1e-8).astype(jnp.bfloat16)
    wq = jnp.clip(
        jnp.round(w.astype(jnp.float32)
                  / jnp.expand_dims(scale.astype(jnp.float32), axis)),
        -127, 127).astype(jnp.int8)
    return wq, scale


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense(use_bias=False)`` with int8-stored weights.

    Params: ``kernel_q`` int8 ``[in, features]`` and ``scale`` bf16
    ``[features]`` (per-output-channel). Under ``nn.scan`` both gain the
    stacked leading axis automatically.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros,
            (in_features, self.features), jnp.int8)
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.bfloat16)
        y = jax.lax.dot_general(
            x.astype(self.dtype), kernel_q.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())))
        return y * scale.astype(self.dtype)


class Int8ActDense(nn.Module):
    """``nn.Dense`` with int8 weights AND dynamically-int8 activations.

    Same param tree as :class:`Int8Dense` (``kernel_q`` int8
    ``[in, features]``, ``scale`` bf16 ``[features]``), so a
    ``quantize_llm_params`` tree serves either mode — only the compute
    path differs: activations are quantized per row (symmetric, dynamic
    ``max|x|/127``) and the dot runs **int8×int8→int32**, which the TPU
    MXU executes at 2× the bf16 rate (v5e: 394 vs 197 TOP/s). Where
    weight-only int8 (``quant="int8"``) helps only bandwidth-bound
    decode, this accelerates the compute-bound PREFILL — the dominant
    term of e2e perception latency and TTFT.

    Numerics: the int32 accumulation is exact, so the only error is the
    input rounding (≤ half a step per operand: ``|Δx| ≤ sx/2``,
    ``|ΔW| ≤ sw/2``) — per-token dynamic scales keep relative error
    ~0.4% per element, in practice indistinguishable from bf16 serving
    for greedy decoding (tests: tests/test_quant.py w8a8 cases).

    The reference has no quantized path at all (bf16 ``generate()``,
    modeling_visionllmv2.py); this is a TPU-first serving extension
    (``LLMConfig.quant="w8a8"``, CLI ``--quant w8a8``).
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros,
            (in_features, self.features), jnp.int8)
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.bfloat16)
        # dynamic per-row activation quantization (fused elementwise:
        # one extra read of x, no HBM round trip for xq at prefill tile
        # sizes — XLA fuses quantize into the dot's operand load)
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        sx = jnp.maximum(amax / 127.0, 1e-8)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, kernel_q, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx * scale.astype(jnp.float32)
        return y.astype(self.dtype)


def quantize_kv(x: jnp.ndarray):
    """Per-(token, head) symmetric int8 quantization of a K or V block.

    ``x`` is ``[..., D]`` (head_dim last); the scale reduces over D only,
    so every cached token/head pair keeps its own dynamic range — RoPE'd
    keys vary in magnitude per position, a coarser scale would clip them.
    Returns ``(x_q int8, scale bf16[...])``.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8).astype(jnp.bfloat16)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32)
                  / scale[..., None].astype(jnp.float32)),
        -127, 127).astype(jnp.int8)
    return xq, scale


def int8_kv_attention(
    q: jnp.ndarray,          # [B, Lq, H, D]
    k_q: jnp.ndarray,        # [B, T, H_kv, D] int8
    k_s: jnp.ndarray,        # [B, T, H_kv] bf16
    v_q: jnp.ndarray,        # [B, T, H_kv, D] int8
    v_s: jnp.ndarray,        # [B, T, H_kv] bf16
    mask,                    # broadcastable to [B, H, Lq, T], True=attend
) -> jnp.ndarray:
    """Decode attention over an int8 KV cache without dequantizing it.

    The cache read is the bandwidth cost, so the int8 rows feed the dots
    directly (the int8→bf16 convert fuses into the matmul operand load)
    and the per-(token, head) scales fold into the SCORES: for keys,
    ``q·(k_q s_k) = (q·k_q) s_k`` scales the score matrix; for values,
    ``Σ_t p_t (v_q_t s_t) = Σ_t (p_t s_t) v_q_t`` scales the softmax
    weights before the PV matmul. Both are [B,H,Lq,T]-shaped elementwise
    ops — O(T) per query, never O(T·D).
    """
    B, Lq, H, D = q.shape
    H_kv = k_q.shape[2]
    if H_kv != H:  # GQA
        rep = H // H_kv
        k_q = jnp.repeat(k_q, rep, axis=2)
        v_q = jnp.repeat(v_q, rep, axis=2)
        k_s = jnp.repeat(k_s, rep, axis=2)
        v_s = jnp.repeat(v_s, rep, axis=2)
    scale = D ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_q.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * k_s.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, :]
    scores = scores * scale
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * v_s.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, :]
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype),
                     v_q.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _is_proj_kernel(path: tuple, leaf_name: str) -> bool:
    return leaf_name == "kernel" and any(
        p in _PROJ_NAMES for p in path)


@jax.jit
def _scale_pass(w):
    # fused convert→abs→reduce: never materializes an f32 copy of w
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    return jnp.maximum(amax / 127.0, 1e-8).astype(jnp.bfloat16)


@jax.jit
def _quant_pass(w, scale):
    # fused elementwise: reads w once, writes int8 directly
    s = jnp.expand_dims(scale.astype(jnp.float32), -2)
    return jnp.clip(jnp.round(w.astype(jnp.float32) / s),
                    -127, 127).astype(jnp.int8)


def quantize_llm_params(llm_params: dict, *, jit: bool = True,
                        delete_source: bool = False) -> dict:
    """Rewrite a bf16/f32 LlamaModel param tree for `quant="int8"`.

    Every ``{*_proj,lm_head}/kernel`` becomes ``{kernel_q, scale}``;
    everything else (embeddings, norms, LoRA adapters) passes through
    unchanged. Works on single kernels ``[in, out]`` and scanned stacks
    ``[n_layers, in, out]`` alike (scale reduces axis ``-2``).

    With ``jit=True`` each kernel runs two separately-jitted fully-fused
    passes (channel-max reduce, then elementwise round-to-int8), so no
    fp32 copy of a multi-GB kernel ever materializes in HBM.
    ``delete_source=True`` additionally deletes each source kernel's
    device buffer right after its int8 replacement exists — quantizing a
    13.5 GB bf16 tree in place peaks ~1 quantized-leaf above the source
    tree. The input tree must not be used afterwards.
    """
    if jit:
        def quant(w):
            scale = _scale_pass(w)
            return _quant_pass(w, scale), scale
    else:
        quant = quantize_int8

    def rewrite(tree: dict, path: tuple) -> dict:
        out = {}
        for name, sub in tree.items():
            if isinstance(sub, dict):
                out[name] = rewrite(sub, path + (name,))
            elif _is_proj_kernel(path, name):
                wq, scale = quant(sub)
                if delete_source:
                    jax.block_until_ready(wq)
                    try:
                        sub.delete()
                    except Exception:   # noqa: BLE001 — host arrays
                        pass
                out["kernel_q"] = wq
                out["scale"] = scale
            else:
                out[name] = sub
        return out

    return rewrite(llm_params, ())


def quantize_serving_params(params: dict, *, bits: int = 8,
                            **kw) -> dict:
    """`quantize_llm_params` (``bits=8``) or int4 packing (``bits=4``,
    ops/quant4.py) applied at whatever level the LLM lives: a composite
    tree (``core/llm``), a core tree (``llm``), or a bare LlamaModel
    tree. Returns a new top-level dict; non-LLM subtrees are shared by
    reference."""
    if bits == 4:
        from visionllm_tpu.ops.quant4 import quantize_llm_params_int4
        kw.pop("jit", None)
        quant = lambda t: quantize_llm_params_int4(t, **kw)
    else:
        quant = lambda t: quantize_llm_params(t, **kw)
    if "core" in params and "llm" in params["core"]:
        out = dict(params)
        core = dict(params["core"])
        core["llm"] = quant(params["core"]["llm"])
        out["core"] = core
        return out
    if "llm" in params:
        out = dict(params)
        out["llm"] = quant(params["llm"])
        return out
    return quant(params)
