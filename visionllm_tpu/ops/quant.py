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


def quantize_serving_params(params: dict, **kw) -> dict:
    """`quantize_llm_params` applied at whatever level the LLM lives:
    a composite tree (``core/llm``), a core tree (``llm``), or a bare
    LlamaModel tree. Returns a new top-level dict; non-LLM subtrees are
    shared by reference."""
    if "core" in params and "llm" in params["core"]:
        out = dict(params)
        core = dict(params["core"])
        core["llm"] = quantize_llm_params(params["core"]["llm"], **kw)
        out["core"] = core
        return out
    if "llm" in params:
        out = dict(params)
        out["llm"] = quantize_llm_params(params["llm"], **kw)
        return out
    return quantize_llm_params(params, **kw)
