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


def consume_tied_duplicates(sd: Mapping[str, Array], canonical: str,
                            alias_bases) -> None:
    """Read (and equality-check) tied-weight duplicate keys.

    With the share flags on (the reference defaults —
    configuration_grounding_dino.py:288 decoder_bbox_embed_share=True),
    the prediction heads are ONE module referenced from every
    ModuleList slot AND from submodule attribute aliases
    (modeling_ov_grounding_dino_mask_dn.py:2629-2635 builds bbox_embed
    as N references and assigns model.decoder.bbox_embed = bbox_embed),
    so torch .state_dict() serializes the same tensors under many key
    paths. Our tree keeps one copy; this consumes every alias and
    asserts it matches the canonical tensor, so a checkpoint trained
    with share=False cannot be silently collapsed. Checkpoints whose
    save path deduplicated the tied keys simply have no aliases here —
    a no-op.

    canonical: full prefix of the kept copy (e.g. "gdino.bbox_embed.0").
    alias_bases: prefixes whose ".<idx>" children are tied copies
    (e.g. ["gdino.bbox_embed", "gdino.model.decoder.bbox_embed"]).
    """
    keys = list(sd.keys())
    sufs = [k[len(canonical):] for k in keys
            if k.startswith(canonical + ".")]
    for base in alias_bases:
        pref = base + "."
        idxs = sorted({k[len(pref):].split(".", 1)[0]
                       for k in keys if k.startswith(pref)
                       and k[len(pref):].split(".", 1)[0].isdigit()})
        for i in idxs:
            full = f"{base}.{i}"
            if full == canonical:
                continue
            for s in sufs:
                if full + s not in sd:
                    continue
                dup = np.asarray(sd[full + s])
                ref = np.asarray(sd[canonical + s])
                if dup.shape != ref.shape or not np.array_equal(dup, ref):
                    raise ValueError(
                        f"{full + s} should be a tied copy of "
                        f"{canonical + s} (decoder_*_embed_share) but "
                        f"differs — the checkpoint was trained with "
                        f"unshared heads, which this tree does not "
                        f"represent")


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


# ---------------------------------------------------------------------------
# composite checkpoint assembly
# ---------------------------------------------------------------------------

def convert_vl_bridge(sd: Mapping[str, Array],
                      prefix: str = "vl_bridge.") -> Dict:
    """torch Sequential Linear/GELU bridge → VLBridge params (Dense
    modules named by their Sequential index — see models/vl_bridge.py)."""
    out: Dict = {}
    i = 0
    while f"{prefix}{i}.weight" in sd:
        w = sd[f"{prefix}{i}.weight"]
        entry = {}
        if w.ndim == 1:                    # LayerNorm (internvl_mlp)
            entry = {"scale": np.asarray(w),
                     "bias": np.asarray(sd[f"{prefix}{i}.bias"])}
        else:
            entry = {"kernel": _t(w)}
            if f"{prefix}{i}.bias" in sd:
                entry["bias"] = np.asarray(sd[f"{prefix}{i}.bias"])
        out[str(i)] = entry
        i += 1
        while (f"{prefix}{i}.weight" not in sd
               and i < 32):                # skip activation slots
            i += 1
    return out


def convert_region_encoder(sd: Mapping[str, Array],
                           prefix: str = "region_encoder.") -> Dict:
    """Reference RegionEncoder (region_encoder.py:68-146) → our
    RegionEncoder params (conv stem indices 0/1/3/4/6 + up_dim)."""
    p = prefix + "mask_embedding."

    def ln2d(idx):
        return {"weight": np.asarray(sd[p + f"{idx}.weight"]),
                "bias": np.asarray(sd[p + f"{idx}.bias"])}

    def conv(idx):
        return {"kernel": _conv(sd[p + f"{idx}.weight"]),
                "bias": np.asarray(sd[p + f"{idx}.bias"])}

    return {
        "stem_conv0": conv(0),
        "stem_norm0": ln2d(1),
        "stem_conv1": conv(3),
        "stem_norm1": ln2d(4),
        "stem_conv2": conv(6),
        "up_dim": {"kernel": _t(sd[prefix + "up_dim.weight"]),
                   "bias": np.asarray(sd[prefix + "up_dim.bias"])},
    }


def convert_composite_core(sd: Mapping[str, Array], cfg) -> Dict:
    """Released VisionLLMv2 checkpoint (flat HF state dict) → the `core`
    (VisionLLM) params subtree. cfg: VisionLLMConfig.

    Key prefixes in the reference checkpoint (modeling_visionllmv2.py
    attribute names): vis_encoder / vl_bridge / llm / emb_embeddings_* /
    region_encoder.
    """
    if cfg.vis_encoder.arch == "intern_vit":
        # InternVisionModel keeps embeddings/encoder at the top level
        # (no .vision_model wrapper like CLIPVisionModel)
        vis = convert_intern_vit(sd, cfg.vis_encoder,
                                 prefix="vis_encoder.")
    else:
        vis = convert_clip_vit(sd, cfg.vis_encoder,
                               prefix="vis_encoder.vision_model.")
    if cfg.llm.arch == "internlm2":
        llm = convert_internlm2(sd, cfg.llm, prefix="llm.model.")
    else:
        llm = convert_llama(sd, cfg.llm, prefix="llm.model.")
    out: Dict = {
        "vis_encoder": vis,
        "vl_bridge": convert_vl_bridge(sd),
        "llm": llm,
    }
    for name in ("emb_embeddings_det", "emb_embeddings_pose",
                 "emb_embeddings_gen", "emb_embeddings_edit"):
        key = f"{name}.weight"
        if key in sd:
            out[name] = np.asarray(sd[key])
    if cfg.use_region_encoder and "region_encoder.up_dim.weight" in sd:
        out["region_encoder"] = convert_region_encoder(sd)
    return out


def convert_internlm2(sd: Mapping[str, Array], cfg: LLMConfig,
                      prefix: str = "model.") -> Dict:
    """InternLM2ForCausalLM state dict → LlamaModel params.

    InternLM2 (visionllmv2/model/internlm2/modeling_internlm2.py) is a
    LLaMA-family decoder with GQA and a packed `wqkv` projection laid out
    per kv-head group as [q·ratio, k, v] (:344-357); module names differ
    (tok_embeddings/attention_norm/ffn_norm/w1/w2/w3/wo/output).
    """
    n = cfg.num_layers
    p = prefix
    h, h_kv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ratio = h // h_kv

    def unpack(which: str):
        outs = []
        for i in range(n):
            w = np.asarray(sd[p + f"layers.{i}.attention.wqkv.weight"])
            w = w.reshape(h_kv, ratio + 2, d, cfg.hidden_size)
            if which == "q":
                part = w[:, :ratio].reshape(h * d, cfg.hidden_size)
            elif which == "k":
                part = w[:, -2].reshape(h_kv * d, cfg.hidden_size)
            else:
                part = w[:, -1].reshape(h_kv * d, cfg.hidden_size)
            outs.append(_t(part))
        return np.stack(outs, 0)

    layer = {
        "q_proj": {"kernel": unpack("q")},
        "k_proj": {"kernel": unpack("k")},
        "v_proj": {"kernel": unpack("v")},
        "o_proj": {"kernel": _stack(
            sd, p + "layers.{i}.attention.wo.weight", n, _t)},
        "gate_proj": {"kernel": _stack(
            sd, p + "layers.{i}.feed_forward.w1.weight", n, _t)},
        "up_proj": {"kernel": _stack(
            sd, p + "layers.{i}.feed_forward.w3.weight", n, _t)},
        "down_proj": {"kernel": _stack(
            sd, p + "layers.{i}.feed_forward.w2.weight", n, _t)},
        "input_layernorm": {"weight": _stack(
            sd, p + "layers.{i}.attention_norm.weight", n, np.asarray)},
        "post_attention_layernorm": {"weight": _stack(
            sd, p + "layers.{i}.ffn_norm.weight", n, np.asarray)},
    }
    head_prefix = prefix.rsplit("model.", 1)[0]
    return {
        "embed_tokens": {"embedding": np.asarray(
            sd[p + "tok_embeddings.weight"])},
        "layers": {"layer": layer},
        "norm": {"weight": np.asarray(sd[p + "norm.weight"])},
        "lm_head": {"kernel": _t(sd[head_prefix + "output.weight"])},
    }


def convert_intern_vit(sd: Mapping[str, Array], cfg: VisionEncoderConfig,
                       prefix: str = "") -> Dict:
    """InternVisionModel state dict → InternVisionTower params."""
    n = cfg.num_layers
    p = prefix
    lp = p + "encoder.layers.{i}."

    def dense(fmt, bias=True):
        out = {"kernel": _stack(sd, fmt + ".weight", n, _t)}
        if bias and fmt.format(i=0) + ".bias" in sd:
            out["bias"] = _stack(sd, fmt + ".bias", n, np.asarray)
        return out

    def rms(fmt):
        return {"weight": _stack(sd, fmt + ".weight", n, np.asarray)}

    layer = {
        "norm1": rms(lp + "norm1"),
        "norm2": rms(lp + "norm2"),
        "qkv": dense(lp + "attn.qkv"),
        "proj": dense(lp + "attn.proj"),
        "fc1": dense(lp + "mlp.fc1"),
        "fc2": dense(lp + "mlp.fc2"),
        "ls1": _stack(sd, lp + "ls1", n, np.asarray),
        "ls2": _stack(sd, lp + "ls2", n, np.asarray),
    }
    if cfg.qk_normalization:
        layer["q_norm"] = rms(lp + "attn.q_norm")
        layer["k_norm"] = rms(lp + "attn.k_norm")
    return {
        "patch_embedding": {
            "kernel": _conv(sd[p + "embeddings.patch_embedding.weight"]),
            "bias": np.asarray(sd[p + "embeddings.patch_embedding.bias"])},
        "class_embedding": np.asarray(
            sd[p + "embeddings.class_embedding"]).reshape(1, 1, -1),
        "position_embedding": np.asarray(
            sd[p + "embeddings.position_embedding"]),
        "layers": {"layer": layer},
    }


def load_state_dict_files(path) -> Dict[str, Array]:
    """Load a checkpoint directory / file into one flat numpy dict.

    Handles HF sharded safetensors (model-*.safetensors + index),
    single safetensors files, and torch .bin/.pth files.
    """
    import glob
    import os
    sd: Dict[str, Array] = {}
    if os.path.isdir(path):
        files = (sorted(glob.glob(os.path.join(path, "*.safetensors")))
                 or sorted(glob.glob(os.path.join(path, "*.bin")))
                 or sorted(glob.glob(os.path.join(path, "*.pth"))))
    else:
        files = [path]
    for f in files:
        if f.endswith(".safetensors"):
            from safetensors.numpy import load_file
            sd.update(load_file(f))
        else:
            import torch
            raw = torch.load(f, map_location="cpu", weights_only=True)
            raw = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
            sd.update({k: v.float().numpy() for k, v in raw.items()})
    return sd


def convert_composite(sd: Mapping[str, Array], cfg) -> Dict:
    """Full released-checkpoint conversion: flat VisionLLMv2 state dict →
    VisionLLMWithTools params (core + gdino + unipose + sd + ip2p).
    cfg: VisionLLMConfig."""
    out: Dict = {"core": convert_composite_core(sd, cfg)}
    if cfg.use_gdino and any(k.startswith("gdino.") for k in sd):
        from visionllm_tpu.utils.convert_gdino import convert_gdino
        out["gdino"] = convert_gdino(sd, cfg.gdino, prefix="gdino.")
    if cfg.use_unipose and any(k.startswith("unipose.") for k in sd):
        from visionllm_tpu.utils.convert_unipose import convert_unipose
        out["unipose"] = convert_unipose(sd, cfg.unipose,
                                         prefix="unipose.")
    if cfg.use_sd and any(k.startswith("sd.") for k in sd):
        from visionllm_tpu.utils.convert_sd import convert_unet, convert_vae
        from visionllm_tpu.models.stable_diffusion.sd_head import (
            unet_cfg_for, vae_cfg_for)
        c = cfg.sd
        out["sd"] = {
            "unet": convert_unet(sd, unet_cfg_for(
                c.sample_size, c.in_channels, c.cross_attention_dim),
                prefix="sd.sd_unet."),
            "vae": convert_vae(sd, vae_cfg_for(c.sample_size),
                               prefix="sd.sd_vae."),
            "mapper": convert_llm2sd_mapper(sd, prefix="sd."),
        }
    if cfg.use_ip2p and any(k.startswith("ip2p.") for k in sd):
        from visionllm_tpu.utils.convert_sd import convert_unet, convert_vae
        from visionllm_tpu.models.stable_diffusion.sd_head import (
            unet_cfg_for, vae_cfg_for)
        c = cfg.ip2p
        out["ip2p"] = {
            "unet": convert_unet(sd, unet_cfg_for(
                c.sample_size, c.in_channels, c.cross_attention_dim),
                prefix="ip2p.sd_unet."),
            "vae": convert_vae(sd, vae_cfg_for(c.sample_size),
                               prefix="ip2p.sd_vae."),
            "mapper": convert_llm2sd_mapper(sd, prefix="ip2p."),
        }
    return out


def convert_llm2sd_mapper(sd: Mapping[str, Array],
                          prefix: str = "sd.") -> Dict:
    """emb_proj + llm2sd_mapper (torch nn.Transformer) → LLM2SDMapper
    params (modeling_sd.py:70-84 naming)."""
    p = prefix

    def lin(name):
        return {"kernel": _t(sd[name + ".weight"]),
                "bias": np.asarray(sd[name + ".bias"])}

    def ln(name):
        return {"scale": np.asarray(sd[name + ".weight"]),
                "bias": np.asarray(sd[name + ".bias"])}

    def mha(name):
        w = np.asarray(sd[name + ".in_proj_weight"])
        b = np.asarray(sd[name + ".in_proj_bias"])
        d = w.shape[0] // 3
        return {"q_proj": {"kernel": _t(w[:d]), "bias": b[:d]},
                "k_proj": {"kernel": _t(w[d:2 * d]), "bias": b[d:2 * d]},
                "v_proj": {"kernel": _t(w[2 * d:]), "bias": b[2 * d:]},
                "out_proj": lin(name + ".out_proj")}

    enc = p + "llm2sd_mapper.encoder.layers.0"
    dec = p + "llm2sd_mapper.decoder.layers.0"
    return {
        "emb_proj_0": lin(p + "emb_proj.0"),
        "emb_proj_2": lin(p + "emb_proj.2"),
        "mapper_queries": np.asarray(sd[p + "llm2sd_mapper_queries"]),
        "encoder_0": {"norm1": ln(enc + ".norm1"),
                      "self_attn": mha(enc + ".self_attn"),
                      "norm2": ln(enc + ".norm2"),
                      "linear1": lin(enc + ".linear1"),
                      "linear2": lin(enc + ".linear2")},
        "encoder_norm": ln(p + "llm2sd_mapper.encoder.norm"),
        "decoder_0": {"norm1": ln(dec + ".norm1"),
                      "self_attn": mha(dec + ".self_attn"),
                      "norm_mem": ln(dec + ".norm2"),
                      "cross_attn": mha(dec + ".multihead_attn"),
                      "norm2": ln(dec + ".norm3"),
                      "linear1": lin(dec + ".linear1"),
                      "linear2": lin(dec + ".linear2")},
        "decoder_norm": ln(p + "llm2sd_mapper.decoder.norm"),
    }
