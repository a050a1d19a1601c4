"""Full-composite checkpoint rehearsal at REAL 7B dims (VERDICT r3 #8).

The released VisionLLMv2 checkpoint is one flat state dict holding the
whole system (vis encoder + LLM + gdino + unipose + SD + IP2P +
region encoder + emb embeddings — train/train.py:356-507 composes it).
The per-submodel converters are each validated in their own tests; this
test rehearses the COMPLETE load path once:

1. Enumerate the real checkpoint's key→shape table from the REFERENCE
   code itself: the actual torch VisionLLMv2Model at real 7B dims
   (CLIP-ViT-L/336 + Vicuna-7B-width LLaMA + gdino d256/6+6/900q with
   real Swin-T + UniPose at reference defaults + RegionEncoder),
   instantiated on the meta device (zero RAM, zero init time) via
   accelerate.init_empty_weights.  SD/IP2P cannot be torch-instantiated
   here (diffusers + pretrained downloads are unavailable), so their
   keys come from the published SD-1.5/IP2P architecture key sets
   (tests/sd15_published_keys.py) + a real torch nn.Transformer mapper
   (modeling_sd.py:68-84 construction), exactly as the released
   checkpoint serializes them.
2. Run ONE convert_composite pass over a RecordingDict of zeros at
   those shapes (zeros = calloc'd virtual pages; the 7 B fp32 tree
   fits host RAM).
3. Assert (a) every checkpoint key is consumed except a documented
   allowlist, and (b) the converted tree structurally equals our
   VisionLLMWithTools init tree (jax.eval_shape — no allocation) at
   the same real dims.

This is the strongest offline evidence obtainable toward the
"COCO mAP within 0.3 of the released checkpoint" target: any key the
converter would drop, misroute, or mis-shape on the real weights
fails here first.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference/VisionLLMv2"

VOCAB = 32026          # 32000 + 26 added special tokens (train.py:350-354)
L_HID = 4096
V_HID = 1024


# --------------------------------------------------------------------------
# reference key→shape enumeration
# --------------------------------------------------------------------------

class RecordingDict(dict):
    """State-dict stand-in that records which keys the converter read."""

    def __init__(self, shapes):
        super().__init__()
        self.shapes = dict(shapes)
        self.read = set()

    def __contains__(self, k):
        return k in self.shapes

    def __iter__(self):
        return iter(self.shapes)

    def keys(self):
        return self.shapes.keys()

    def get(self, k, default=None):
        if k in self.shapes:
            return self[k]
        return default

    def __getitem__(self, k):
        self.read.add(k)
        # zeros: calloc'd pages — untouched memory stays virtual
        return np.zeros(self.shapes[k], np.float32)

    def unread(self):
        return sorted(set(self.shapes) - self.read)


def _mapper_shapes(prefix: str):
    """llm2sd mapper key→shape via the reference construction
    (modeling_sd.py:68-84): emb_proj Sequential(Linear 4096→768, GELU,
    Linear 768→768) + queries [1,77,768] + nn.Transformer(768, 1+1
    layers, ffn 3072, norm_first)."""
    import torch
    import torch.nn as nn
    with torch.device("meta"):
        emb_proj = nn.Sequential(nn.Linear(L_HID, 768), nn.GELU(),
                                 nn.Linear(768, 768))
        mapper = nn.Transformer(batch_first=True, norm_first=True,
                                d_model=768, num_encoder_layers=1,
                                num_decoder_layers=1,
                                dim_feedforward=768 * 4, dropout=0.0)
    out = {prefix + "llm2sd_mapper_queries": (1, 77, 768)}
    for k, v in emb_proj.state_dict().items():
        out[prefix + "emb_proj." + k] = tuple(v.shape)
    for k, v in mapper.state_dict().items():
        out[prefix + "llm2sd_mapper." + k] = tuple(v.shape)
    return out


@pytest.fixture(scope="module")
def ref_shapes():
    from visionllm_tpu.utils.ref_shims import install_reference_shims
    install_reference_shims()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "/root/repo/tests" not in sys.path:
        sys.path.insert(0, "/root/repo/tests")
    import warnings
    warnings.filterwarnings("ignore")
    from accelerate import init_empty_weights
    from visionllmv2.model.configuration_visionllmv2 import VisionLLMv2Config
    from visionllmv2.model.modeling_visionllmv2 import VisionLLMv2Model

    from tests.test_parity_unipose_reference import _ref_config_kwargs

    up = _ref_config_kwargs()
    up.update(hidden_dim=256, nheads=8, enc_layers=6, dec_layers=6,
              dim_feedforward=2048, num_queries=900, num_body_points=68,
              l_hidden_size=L_HID)
    gdino_cfg = dict(
        backbone_config=dict(
            model_type="swin", image_size=224, patch_size=4, embed_dim=96,
            depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24], window_size=7,
            out_features=["stage1", "stage2", "stage3", "stage4"]))
    cfg = VisionLLMv2Config(
        vis_encoder_config=dict(
            architectures=["CLIPVisionModel"], hidden_size=V_HID,
            intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=336, patch_size=14,
            projection_dim=768),
        llm_config=dict(
            architectures=["LlamaForCausalLM"], hidden_size=L_HID,
            intermediate_size=11008, num_hidden_layers=32,
            num_attention_heads=32, num_key_value_heads=32,
            vocab_size=VOCAB, rms_norm_eps=1e-5,
            max_position_embeddings=4096),
        vl_bridge_type="mlp2x_gelu", num_embs=4, num_embs_gen=64,
        use_gdino=True, gdino_config=gdino_cfg,
        use_unipose=True, unipose_config=up,
        use_region_encoder=True)
    # training-time attribute overrides (train/train.py:417-436)
    cfg.gdino_config.mask_dim = 256
    cfg.gdino_config.norm = "GN"
    cfg.gdino_config.l_hidden_size = L_HID
    with init_empty_weights(include_buffers=False):
        model = VisionLLMv2Model(cfg)
    shapes = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    del model

    # SD / IP2P: diffusers is unavailable, so these come from the
    # published architecture key sets at the configs the reference
    # loads (modeling_sd.py:85-102 / modeling_instruct_pix2pix.py),
    # with the reference's submodule attribute names.
    from tests.sd15_published_keys import (sd15_text_keys, sd15_unet_keys,
                                           sd15_vae_keys)
    for tool, in_ch in (("sd", 4), ("ip2p", 8)):
        for k, s in sd15_unet_keys(in_channels=in_ch).items():
            shapes[f"{tool}.sd_unet.{k}"] = s
        for k, s in sd15_vae_keys().items():
            shapes[f"{tool}.sd_vae.{k}"] = s
        for k, s in sd15_text_keys().items():
            shapes[f"{tool}.sd_text_encoder.{k}"] = s
        shapes.update(_mapper_shapes(f"{tool}."))
    return shapes


def _my_config():
    from visionllm_tpu.config import (GDinoConfig, IP2PConfig, LLMConfig,
                                      SDConfig, UniPoseConfig,
                                      VisionEncoderConfig, VisionLLMConfig)
    return VisionLLMConfig(
        vis_encoder=VisionEncoderConfig(),       # CLIP-ViT-L/336 defaults
        llm=LLMConfig(vocab_size=VOCAB),         # 7B-width defaults
        vl_bridge_type="mlp2x_gelu",
        use_gdino=True, gdino=GDinoConfig(),     # d256 6+6 900q Swin-T
        use_unipose=True, unipose=UniPoseConfig(),
        use_sd=True, sd=SDConfig(),
        use_ip2p=True, ip2p=IP2PConfig(),
        use_region_encoder=True)


# Keys of the released checkpoint that convert_composite consciously
# does NOT consume, each with the reason it is safe to drop:
def _allowlisted(key: str) -> bool:
    # (a) non-weight index buffers recomputed from static geometry at
    #     trace time (window attention coordinate tables)
    if key.endswith("relative_position_index"):
        return True
    if key.endswith("relative_coords_table"):
        return True
    # (b) the frozen SD/IP2P CLIP text encoder (modeling_sd.py:85,103:
    #     requires_grad_(False), used only to embed captions for the
    #     0.1× distill loss / the pipeline's negative prompt) — our
    #     trainer precomputes caption embeddings host-side with the
    #     standalone ClipTextModel (convert_clip_text covers its keys
    #     in test_convert_sd_fullscale), so the in-checkpoint copy is
    #     deliberately skipped
    if ".sd_text_encoder." in key:
        return True
    # (c) CLIP's post_layernorm only feeds the pooled-CLS projection
    #     head; the composite reads an intermediate hidden state
    #     (modeling_visionllmv2.py:570 hidden_states[select_layer])
    #     that never passes through it
    if key.startswith("vis_encoder.") and ".post_layernorm." in key:
        return True
    return False


@pytest.mark.slow
def test_convert_composite_consumes_every_released_key(ref_shapes):
    """One convert_composite pass over the complete 7 B-dims key set:
    zero unconsumed keys (modulo the documented allowlist), zero
    missing/extra/mis-shaped params vs our init tree."""
    from visionllm_tpu.models.composite import VisionLLMWithTools
    from visionllm_tpu.models.visionllm import SpecialTokenIds
    from visionllm_tpu.utils.torch_convert import convert_composite

    cfg = _my_config()
    rec = RecordingDict(ref_shapes)
    params = convert_composite(rec, cfg)

    unread = [k for k in rec.unread() if not _allowlisted(k)]
    assert unread == [], (
        f"{len(unread)} checkpoint keys NOT consumed by "
        f"convert_composite: {unread[:20]}")

    # ---- structural equality vs our init tree (eval_shape: free) ----
    tid = SpecialTokenIds.synthetic()
    model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    img_len = cfg.vis_encoder.num_patches
    ids = ([1, 10, 11, tid.img] + [tid.imp] * img_len + [12, tid.reg]
           + [tid.det] + [tid.emb + i for i in range(cfg.num_embs)] + [2])
    B, L = 1, len(ids)
    size = cfg.vis_encoder.image_size
    det = 128
    base = {
        "input_ids": jnp.zeros((B, L), jnp.int32),
        "labels": jnp.zeros((B, L), jnp.int32),
        "attn_mask": jnp.ones((B, L), jnp.int32),
        "images": jnp.zeros((B, size, size, 3), jnp.float32),
        "images_aug": jnp.zeros((B, det, det, 3), jnp.float32),
        "regions": jnp.zeros((B, 1, size, size), jnp.float32),
    }
    det_batch = dict(base, targets={
        "labels": jnp.zeros((B, 2), jnp.int32),
        "boxes": jnp.zeros((B, 2, 4), jnp.float32),
        "valid": jnp.ones((B, 2), bool),
        "masks": jnp.zeros((B, 2, det // 4, det // 4), jnp.float32),
    })
    nb = cfg.unipose.num_body_points
    pose_batch = dict(base, targets={
        "labels": jnp.zeros((B, 2), jnp.int32),
        "boxes": jnp.zeros((B, 2, 4), jnp.float32),
        "keypoints": jnp.zeros((B, 2, nb * 3), jnp.float32),
        "area": jnp.zeros((B, 2), jnp.float32),
        "valid": jnp.ones((B, 2), bool),
    })
    gen_batch = dict(base,
                     output_images=jnp.zeros((B, 64, 64, 3), jnp.float32))
    edit_batch = dict(gen_batch,
                      input_images=jnp.zeros((B, 64, 64, 3), jnp.float32))
    rng = jax.random.PRNGKey(0)
    V = VisionLLMWithTools
    init_shapes = {}
    for method, batch, extra in (
            (None, det_batch, ()),
            (V.forward_pose, pose_batch, (1,)),
            (V.forward_gen, gen_batch, (rng,)),
            (V.forward_edit, edit_batch, (rng,))):
        kw = {} if method is None else {"method": method}
        tree = jax.eval_shape(
            lambda r, b=batch, e=extra, k=kw: model.init(r, b, tid, *e,
                                                         **k),
            rng)["params"]
        for top, sub in tree.items():
            if top == "core":
                # union the core across methods (each method creates
                # only the emb_embeddings_* rows it touches)
                init_shapes.setdefault("core", {})
                _merge(init_shapes["core"], sub)
            else:
                init_shapes[top] = sub

    conv = _tree_shapes(params)
    init = _tree_shapes(init_shapes)
    missing = sorted(set(init) - set(conv))
    extra = sorted(set(conv) - set(init))
    assert not missing, f"converter missing params: {missing[:15]}"
    assert not extra, f"converter extra params: {extra[:15]}"
    bad = [(k, conv[k], init[k]) for k in init if conv[k] != init[k]]
    assert not bad, f"shape mismatches: {bad[:15]}"


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def _tree_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                 for k in path): tuple(np.shape(leaf))
        for path, leaf in flat
    }
