"""PyTorch-checkpoint → JAX-pytree weight conversion.

Required for output parity with the released OpenGVLab/VisionLLMv2
checkpoint (SURVEY.md §5 checkpoint/resume). Works off a flat
state-dict-like mapping of numpy arrays, so it accepts either
torch.load results or safetensors slices without importing torch here.

Conventions:
  * torch nn.Linear weight [out, in]  →  flax Dense kernel [in, out]
  * per-layer weights are stacked on axis 0 for the nn.scan'd stacks
  * torch nn.Conv2d weight [O, I, kh, kw] → flax Conv kernel [kh, kw, I, O]
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import numpy as np

from visionllm_tpu.config import LLMConfig, VisionEncoderConfig

Array = np.ndarray


def _t(w: Array) -> Array:
    """Linear weight → Dense kernel."""
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w: Array) -> Array:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _stack(sd: Mapping[str, Array], fmt: str, n: int,
           transform: Callable[[Array], Array]) -> Array:
    return np.stack([transform(sd[fmt.format(i=i)]) for i in range(n)], 0)


def convert_llama(sd: Mapping[str, Array], cfg: LLMConfig,
                  prefix: str = "model.") -> Dict:
    """HF LlamaForCausalLM state dict → LlamaModel params.

    `prefix` is the submodule path holding the decoder ("model." for a
    bare LlamaForCausalLM; "llm.model." inside the composite checkpoint).
    """
    n = cfg.num_layers
    p = prefix
    layer = {}
    attn_names = {"q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
                  "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
                  "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
                  "down_proj": "mlp.down_proj"}
    for ours, theirs in attn_names.items():
        layer[ours] = {"kernel": _stack(
            sd, p + "layers.{i}." + theirs + ".weight", n, _t)}
    for norm in ("input_layernorm", "post_attention_layernorm"):
        layer[norm] = {"weight": _stack(
            sd, p + "layers.{i}." + norm + ".weight", n, np.asarray)}

    head_prefix = prefix.rsplit("model.", 1)[0]
    return {
        "embed_tokens": {"embedding": np.asarray(sd[p + "embed_tokens.weight"])},
        "layers": {"layer": layer},
        "norm": {"weight": np.asarray(sd[p + "norm.weight"])},
        "lm_head": {"kernel": _t(sd[head_prefix + "lm_head.weight"])},
    }


def convert_clip_vit(sd: Mapping[str, Array], cfg: VisionEncoderConfig,
                     prefix: str = "vision_model.") -> Dict:
    """HF CLIPVisionModel state dict → ClipVisionTower params."""
    n = cfg.num_layers
    p = prefix
    lp = p + "encoder.layers.{i}."

    def ln(fmt):
        return {"scale": _stack(sd, fmt + ".weight", n, np.asarray),
                "bias": _stack(sd, fmt + ".bias", n, np.asarray)}

    def dense(fmt):
        return {"kernel": _stack(sd, fmt + ".weight", n, _t),
                "bias": _stack(sd, fmt + ".bias", n, np.asarray)}

    layer = {
        "layer_norm1": ln(lp + "layer_norm1"),
        "layer_norm2": ln(lp + "layer_norm2"),
        "q_proj": dense(lp + "self_attn.q_proj"),
        "k_proj": dense(lp + "self_attn.k_proj"),
        "v_proj": dense(lp + "self_attn.v_proj"),
        "out_proj": dense(lp + "self_attn.out_proj"),
        "fc1": dense(lp + "mlp.fc1"),
        "fc2": dense(lp + "mlp.fc2"),
    }
    return {
        "patch_embedding": {"kernel": _conv(
            sd[p + "embeddings.patch_embedding.weight"])},
        "class_embedding": np.asarray(
            sd[p + "embeddings.class_embedding"]).reshape(1, 1, -1),
        "position_embedding": {"embedding": np.asarray(
            sd[p + "embeddings.position_embedding.weight"])},
        "pre_layrnorm": {"scale": np.asarray(sd[p + "pre_layrnorm.weight"]),
                         "bias": np.asarray(sd[p + "pre_layrnorm.bias"])},
        "layers": {"layer": layer},
    }


def convert_swin(sd: Mapping[str, Array], cfg, prefix: str = "") -> Dict:
    """HF SwinBackbone state dict → SwinBackbone params.

    `cfg` is a visionllm_tpu.models.swin.SwinConfig; HF stage names are
    stage1..stage4 for 0-based stage indices 0..3.
    """
    p = prefix
    out: Dict = {
        "patch_embed": {
            "kernel": _conv(sd[p + "embeddings.patch_embeddings.projection.weight"]),
            "bias": np.asarray(sd[p + "embeddings.patch_embeddings.projection.bias"]),
        },
        "patch_norm": {"scale": np.asarray(sd[p + "embeddings.norm.weight"]),
                       "bias": np.asarray(sd[p + "embeddings.norm.bias"])},
    }
    for s in range(cfg.num_stages):
        for b in range(cfg.depths[s]):
            lp = p + f"encoder.layers.{s}.blocks.{b}."
            blk = {
                "layernorm_before": {
                    "scale": np.asarray(sd[lp + "layernorm_before.weight"]),
                    "bias": np.asarray(sd[lp + "layernorm_before.bias"])},
                "layernorm_after": {
                    "scale": np.asarray(sd[lp + "layernorm_after.weight"]),
                    "bias": np.asarray(sd[lp + "layernorm_after.bias"])},
                "query": {"kernel": _t(sd[lp + "attention.self.query.weight"]),
                          "bias": np.asarray(sd[lp + "attention.self.query.bias"])},
                "key": {"kernel": _t(sd[lp + "attention.self.key.weight"]),
                        "bias": np.asarray(sd[lp + "attention.self.key.bias"])},
                "value": {"kernel": _t(sd[lp + "attention.self.value.weight"]),
                          "bias": np.asarray(sd[lp + "attention.self.value.bias"])},
                "proj": {"kernel": _t(sd[lp + "attention.output.dense.weight"]),
                         "bias": np.asarray(sd[lp + "attention.output.dense.bias"])},
                "fc1": {"kernel": _t(sd[lp + "intermediate.dense.weight"]),
                        "bias": np.asarray(sd[lp + "intermediate.dense.bias"])},
                "fc2": {"kernel": _t(sd[lp + "output.dense.weight"]),
                        "bias": np.asarray(sd[lp + "output.dense.bias"])},
                "relative_position_bias_table": np.asarray(
                    sd[lp + "attention.self.relative_position_bias_table"]),
            }
            out[f"stage{s}_block{b}"] = blk
        if s < cfg.num_stages - 1:
            dp = p + f"encoder.layers.{s}.downsample."
            out[f"downsample{s}"] = {
                "norm": {"scale": np.asarray(sd[dp + "norm.weight"]),
                         "bias": np.asarray(sd[dp + "norm.bias"])},
                "reduction": {"kernel": _t(sd[dp + "reduction.weight"])},
            }
    for s in cfg.out_stages:
        np_name = p + f"hidden_states_norms.stage{s + 1}."
        out[f"out_norm{s}"] = {"scale": np.asarray(sd[np_name + "weight"]),
                               "bias": np.asarray(sd[np_name + "bias"])}
    return out


def torch_state_dict_to_numpy(model) -> Dict[str, Array]:
    """Materialize a torch module's state dict as fp32 numpy."""
    return {k: v.detach().to("cpu").float().numpy()
            for k, v in model.state_dict().items()}
