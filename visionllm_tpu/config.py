"""Single dataclass config tree for the composite model.

Mirrors the fields of the reference's HF composition config
(visionllmv2/model/configuration_visionllmv2.py:24-112) but as one plain
dataclass tree — JSON-serializable, hashable where needed for jit static
args, with TPU-relevant additions (dtype policy, mesh axis names).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Tuple


@dataclass(frozen=True)
class VisionEncoderConfig:
    """CLIP-ViT-L/336 by default; InternViT-6B via qk_normalization=True."""

    arch: str = "clip_vit"            # "clip_vit" | "intern_vit"
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"    # CLIP uses quick_gelu; InternViT gelu
    # InternViT extras
    qk_normalization: bool = False
    use_ls: bool = False              # layer scale
    qkv_bias: bool = True
    # which hidden_states layer feeds the VL bridge (reference default -2)
    output_layer: int = -2

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclass(frozen=True)
class LLMConfig:
    """LLaMA-family decoder (Vicuna-7B default); InternLM2 via arch flag."""

    arch: str = "llama"               # "llama" | "internlm2"
    vocab_size: int = 32000           # grown when special tokens are added
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32            # GQA for internlm2-20b
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    # LoRA (reference wrap_llm_lora: r=32, alpha=64 on qkvo + MLP)
    lora_r: int = 0
    lora_alpha: float = 64.0
    # serving-only: "" (bf16) | "int8" | "w8a8" | "int4". int8/int4 are
    # weight-only quantized matmuls (ops/quant.py int8 per-out-channel;
    # ops/quant4.py w4g128 packed-nibble Pallas kernel) for bandwidth-
    # bound decode; w8a8 shares the int8 param tree but also quantizes
    # activations per token and runs int8×int8→int32 on the MXU at 2×
    # the bf16 rate — for compute-bound prefill/TTFT. Params from
    # quantize_serving_params (bits=8 for both int8 and w8a8).
    quant: str = ""
    # serving-only KV-cache storage: "" (model dtype) | "int8" —
    # per-(token, head)-scaled int8 cache, halves decode cache reads
    kv_quant: str = ""
    # training-time rematerialization of the scanned decoder layers:
    # "" (store all activations) | "dots" (save matmul outputs, the
    # usual TPU training compromise) | "full" (recompute everything in
    # the backward pass — activation memory drops from O(layers) to
    # O(1) layers, the standard trade for 4k-context training)
    remat: str = ""

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class GDinoConfig:
    """Open-vocabulary Grounding-DINO decoder (det/grd/seg).

    Defaults follow configuration_grounding_dino.py:243+ and the training
    overrides in train/train.py:417-436.
    """

    backbone: str = "swin_tiny"       # "swin_tiny" | "swin_large" | "intern_image_h"
    # optional kwargs overriding the named swin backbone's dims (e.g.
    # a micro swin for tests / parity fixtures); None → preset dims
    backbone_overrides: Optional[Mapping[str, Any]] = None
    d_model: int = 256
    num_queries: int = 900
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    num_feature_levels: int = 4
    num_points: int = 4               # deformable-attn points per level
    ffn_dim: int = 2048
    text_dim: int = 4096              # LLM hidden size feeding patch2query
    max_text_len: int = 256
    mask_dim: int = 256
    two_stage: bool = True
    # losses
    class_cost: float = 2.0
    bbox_cost: float = 5.0
    giou_cost: float = 2.0
    class_loss_coef: float = 2.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    mask_loss_coef: float = 5.0
    dice_loss_coef: float = 5.0
    focal_alpha: float = 0.25
    aux_loss: bool = True
    # contrastive denoising
    dn_number: int = 100
    label_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0
    # mask point-sampling (Mask2Former-style)
    num_mask_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    # rematerialize encoder/decoder layers in the backward pass
    # ("" off | "dots" keep matmul outputs | "full" recompute all);
    # trades ~1/3 more flops for O(layers) less activation memory —
    # needed to train at >=640 px on one 16 GB chip
    remat: str = ""


@dataclass(frozen=True)
class UniPoseConfig:
    """UniPose keypoint decoder."""

    backbone: str = "swin_tiny"
    d_model: int = 256
    num_queries: int = 900
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    num_feature_levels: int = 4
    num_points: int = 4
    ffn_dim: int = 2048
    text_dim: int = 4096
    num_box_decoder_layers: int = 2
    num_body_points: int = 68         # max keypoints per instance
    num_groups: int = 50              # pose groups after box->kpt expansion
    # vision sine-position-embedding temperature; the reference builds
    # PositionEmbeddingSineHW(temperatureH=pe_temperatureH, ...) with the
    # DINO-family default of 20 (modeling_unipose.py:4224-4233)
    pe_temperature: float = 20.0
    max_obj_patches: int = 100
    max_kpt_patches: int = 100
    # losses
    class_loss_coef: float = 2.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    keypoint_loss_coef: float = 10.0
    oks_loss_coef: float = 4.0
    focal_alpha: float = 0.25
    aux_loss: bool = True
    dn_number: int = 100


@dataclass(frozen=True)
class SDConfig:
    """Stable-Diffusion-1.5 generation head driven by [GEN] embeddings."""

    llm_hidden_size: int = 4096
    sd_hidden_size: int = 768         # CLIP text embedding dim of SD-1.5
    num_encoder_layers: int = 1
    num_decoder_layers: int = 1
    num_queries: int = 77
    num_embs_gen: int = 64
    caption_distill_weight: float = 0.1
    # UNet / VAE geometry (SD-1.5)
    sample_size: int = 64
    in_channels: int = 4
    cross_attention_dim: int = 768


@dataclass(frozen=True)
class IP2PConfig:
    """InstructPix2Pix editing head driven by [EDIT] embeddings."""

    llm_hidden_size: int = 4096
    sd_hidden_size: int = 768
    num_encoder_layers: int = 1
    num_decoder_layers: int = 1
    num_queries: int = 77
    num_embs_gen: int = 64
    # UNet input = concat(noisy latents, conditioning image latents)
    in_channels: int = 8
    sample_size: int = 64
    cross_attention_dim: int = 768
    cfg_drop_prob: float = 0.05


@dataclass(frozen=True)
class RegionEncoderConfig:
    hidden_dim: int = 256
    embed_dim: int = 1024             # ViT feature dim
    out_dim: int = 4096               # LLM dim
    patch_size: int = 14
    num_sample_points: int = 2304


@dataclass(frozen=True)
class VisionLLMConfig:
    """Top-level composition config (reference: VisionLLMv2Config)."""

    vis_encoder: VisionEncoderConfig = field(default_factory=VisionEncoderConfig)
    llm: LLMConfig = field(default_factory=LLMConfig)
    vl_bridge_type: str = "mlp2x_gelu"   # "linear" | "internvl_mlp" | "mlpNx_gelu"
    use_pixelshuffle: bool = False
    num_embs: int = 4
    num_embs_gen: int = 64
    use_region_encoder: bool = False
    region_encoder: Optional[RegionEncoderConfig] = None
    use_gdino: bool = False
    gdino: Optional[GDinoConfig] = None
    use_unipose: bool = False
    unipose: Optional[UniPoseConfig] = None
    use_sd: bool = False
    sd: Optional[SDConfig] = None
    use_ip2p: bool = False
    ip2p: Optional[IP2PConfig] = None
    # dtype policy: params kept fp32, compute in bf16 on TPU
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # routing: max [EMB] groups gathered per sample per tool
    max_num_patches: int = 100

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "VisionLLMConfig":
        raw = json.loads(text)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "VisionLLMConfig":
        def build(klass, val):
            return None if val is None else klass(**val)

        kwargs = dict(raw)
        kwargs["vis_encoder"] = build(VisionEncoderConfig, raw.get("vis_encoder")) or VisionEncoderConfig()
        kwargs["llm"] = build(LLMConfig, raw.get("llm")) or LLMConfig()
        kwargs["region_encoder"] = build(RegionEncoderConfig, raw.get("region_encoder"))
        kwargs["gdino"] = build(GDinoConfig, raw.get("gdino"))
        kwargs["unipose"] = build(UniPoseConfig, raw.get("unipose"))
        kwargs["sd"] = build(SDConfig, raw.get("sd"))
        kwargs["ip2p"] = build(IP2PConfig, raw.get("ip2p"))
        return cls(**kwargs)


def vllm_7b_config(**overrides: Any) -> VisionLLMConfig:
    """The 7B flagship: CLIP-ViT-L/336 + Vicuna-7B + all atom tools.

    Mirrors scripts/vllmv2_7b (anyres, mlp2x_gelu bridge, layer -2).
    """
    base = dict(
        vis_encoder=VisionEncoderConfig(),
        llm=LLMConfig(vocab_size=32096),  # 32000 + special tokens, padded to 32
        vl_bridge_type="mlp2x_gelu",
        use_gdino=True,
        gdino=GDinoConfig(),
        use_unipose=True,
        unipose=UniPoseConfig(),
        use_sd=True,
        sd=SDConfig(),
        use_ip2p=True,
        ip2p=IP2PConfig(),
        use_region_encoder=True,
        region_encoder=RegionEncoderConfig(),
    )
    base.update(overrides)
    return VisionLLMConfig(**base)


def vllm_26b_config(**overrides: Any) -> VisionLLMConfig:
    """The 26B variant: InternViT-6B/448 + InternLM2-20B, pixelshuffle,
    internvl_mlp bridge, InternImage-H det/pose backbones
    (scripts/vllmv2_26b/eval/dist_eval_det.sh diff vs 7b)."""
    base = dict(
        vis_encoder=VisionEncoderConfig(
            arch="intern_vit", image_size=448, patch_size=14,
            hidden_size=3200, intermediate_size=12800, num_layers=48,
            num_heads=25, layer_norm_eps=1e-6, hidden_act="gelu",
            qk_normalization=True, use_ls=True, qkv_bias=False,
            output_layer=-1),
        llm=LLMConfig(
            arch="internlm2", vocab_size=92576, hidden_size=6144,
            intermediate_size=16384, num_layers=48, num_heads=48,
            num_kv_heads=8, rope_theta=1000000.0,
            max_position_embeddings=32768),
        vl_bridge_type="internvl_mlp",
        use_pixelshuffle=True,
        use_gdino=True,
        gdino=GDinoConfig(backbone="intern_image_h", text_dim=6144),
        use_unipose=True,
        unipose=UniPoseConfig(backbone="intern_image_h", text_dim=6144),
        use_sd=True,
        sd=SDConfig(llm_hidden_size=6144),
        use_ip2p=True,
        ip2p=IP2PConfig(llm_hidden_size=6144),
        use_region_encoder=True,
        region_encoder=RegionEncoderConfig(embed_dim=3200, out_dim=6144),
    )
    base.update(overrides)
    return VisionLLMConfig(**base)


def tiny_test_config(**overrides: Any) -> VisionLLMConfig:
    """A minuscule config for unit tests: full routing, tiny dims."""
    base = dict(
        vis_encoder=VisionEncoderConfig(
            image_size=56, patch_size=14, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4),
        llm=LLMConfig(
            vocab_size=32096, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=4,
            max_position_embeddings=512),
        vl_bridge_type="mlp2x_gelu",
        use_gdino=True,
        gdino=GDinoConfig(
            d_model=32, num_queries=20, encoder_layers=1, decoder_layers=2,
            num_heads=4, ffn_dim=64, text_dim=64, mask_dim=32, dn_number=4,
            num_mask_points=64),
        use_unipose=True,
        unipose=UniPoseConfig(
            d_model=32, num_queries=20, encoder_layers=1, decoder_layers=3,
            num_heads=4, ffn_dim=64, text_dim=64, num_body_points=4,
            num_groups=5, max_obj_patches=8, max_kpt_patches=8),
        use_sd=True,
        sd=SDConfig(llm_hidden_size=64, sd_hidden_size=32, num_queries=7,
                    num_embs_gen=8, sample_size=16, cross_attention_dim=32),
        use_ip2p=True,
        ip2p=IP2PConfig(llm_hidden_size=64, sd_hidden_size=32, num_queries=7,
                        num_embs_gen=8, sample_size=16, cross_attention_dim=32),
        use_region_encoder=True,
        region_encoder=RegionEncoderConfig(
            hidden_dim=16, embed_dim=32, out_dim=64, patch_size=14,
            num_sample_points=32),
        num_embs_gen=8,
        max_num_patches=10,
    )
    base.update(overrides)
    return VisionLLMConfig(**base)
