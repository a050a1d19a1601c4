"""26B-variant materialization at REAL dimensions (VERDICT r3 #7).

The reference's second flagship (scripts/vllmv2_26b/eval/dist_eval_det.sh:
InternViT-6B/448 + InternLM2-20B + pixelshuffle + internvl_mlp) had only
reduced-dims coverage. Two tests close that:

1. converter key-completeness at the REAL shapes: the actual torch
   InternViT-6B (hidden 3200, 48 layers, 25 heads, QK-norm) and
   InternLM2-20B (hidden 6144, 48 layers, GQA 48/8, packed wqkv,
   vocab 92544+26) trees enumerated from the reference code on the
   meta device, converted through convert_composite_core, compared
   against our init tree (jax.eval_shape).  The state-dict stand-in
   returns fp16 zeros so the 26B tree commits ~53 GB, within host RAM.

2. a REAL-dims sharded forward: the full 25.9B-param core
   (vis encoder + internvl_mlp bridge + LLM), bf16, FSDP-sharded over
   the 8-device CPU mesh, one short-sequence forward, finite logits.
   Parameters are materialized directly INTO their shards (jit with
   out_shardings) from cheap structured fills — full random init of
   26B values is hours on this 1-core host and adds nothing to what
   the test proves (the trees exist at real shape, the sharded program
   compiles, executes, and stays finite).

Both are minutes-long — slow-marked; run with `-m slow`.

Reference: modeling_internlm2.py:415-545 (GQA packed wqkv),
modeling_intern_vit.py:93-165 (QK-normalization), vllmv2_26b scripts.
"""

import gc
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference/VisionLLMv2"

V_HID, V_LAYERS, V_HEADS, V_FFN = 3200, 48, 25, 12800
L_HID, L_LAYERS, L_HEADS, L_KV, L_FFN = 6144, 48, 48, 8, 16384
VOCAB = 92544 + 26          # internlm2 vocab + the 26 added tokens
IMG, PATCH = 448, 14


def _tree_shapes(tree):
    """path -> shape for every leaf (works on arrays and ShapeDtypeStructs)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(str(getattr(p, "key", p)) for p in path):
            tuple(leaf.shape) for path, leaf in flat}


def _my_config():
    from visionllm_tpu.config import (LLMConfig, VisionEncoderConfig,
                                      VisionLLMConfig)
    return VisionLLMConfig(
        vis_encoder=VisionEncoderConfig(
            arch="intern_vit", image_size=IMG, patch_size=PATCH,
            hidden_size=V_HID, intermediate_size=V_FFN,
            num_layers=V_LAYERS, num_heads=V_HEADS, layer_norm_eps=1e-6,
            hidden_act="gelu", qk_normalization=True, use_ls=True,
            qkv_bias=False, output_layer=-1),
        llm=LLMConfig(arch="internlm2", vocab_size=VOCAB,
                      hidden_size=L_HID, intermediate_size=L_FFN,
                      num_layers=L_LAYERS, num_heads=L_HEADS,
                      num_kv_heads=L_KV),
        vl_bridge_type="internvl_mlp",
        use_pixelshuffle=True)


class _ZeroDict(dict):
    """Key→shape table that materializes fp16 zeros on read and records
    consumption (the 26B fp32 tree would not fit; fp16 halves it)."""

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

    def __getitem__(self, k):
        self.read.add(k)
        return np.zeros(self.shapes[k], np.float16)

    def unread(self):
        return sorted(set(self.shapes) - self.read)


@pytest.mark.slow
def test_26b_converter_completeness_at_real_dims():
    from visionllm_tpu.utils.ref_shims import install_reference_shims
    install_reference_shims()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import warnings
    warnings.filterwarnings("ignore")
    from accelerate import init_empty_weights
    from visionllmv2.model.configuration_visionllmv2 import VisionLLMv2Config
    from visionllmv2.model.modeling_visionllmv2 import VisionLLMv2Model

    cfg_ref = VisionLLMv2Config(
        vis_encoder_config=dict(
            architectures=["InternVisionModel"], hidden_size=V_HID,
            intermediate_size=V_FFN, num_hidden_layers=V_LAYERS,
            num_attention_heads=V_HEADS, image_size=IMG, patch_size=PATCH,
            qkv_bias=False, qk_normalization=True, use_flash_attn=False,
            initializer_factor=0.1, drop_path_rate=0.0),
        llm_config=dict(
            architectures=["InternLM2ForCausalLM"], hidden_size=L_HID,
            intermediate_size=L_FFN, num_hidden_layers=L_LAYERS,
            num_attention_heads=L_HEADS, num_key_value_heads=L_KV,
            vocab_size=VOCAB, rms_norm_eps=1e-5, bias=False,
            max_position_embeddings=4096, attn_implementation="eager"),
        vl_bridge_type="internvl_mlp", use_pixelshuffle=True,
        vis_output_layer=-1, num_embs=4, num_embs_gen=64)
    with init_empty_weights(include_buffers=False):
        ref = VisionLLMv2Model(cfg_ref)
    shapes = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    del ref
    gc.collect()
    n_params = sum(int(np.prod(s)) for s in shapes.values())
    assert n_params > 25.5e9, f"only {n_params/1e9:.1f}B params enumerated"

    from visionllm_tpu.models.visionllm import VisionLLM
    from visionllm_tpu.utils.torch_convert import convert_composite_core

    cfg = _my_config()
    sd = _ZeroDict(shapes)
    params = {"core": convert_composite_core(sd, cfg)}
    assert sd.unread() == [], f"unconsumed 26B keys: {sd.unread()[:15]}"

    # structural equality vs our init tree — eval_shape allocates nothing
    from visionllm_tpu.models.visionllm import SpecialTokenIds
    tid = SpecialTokenIds.synthetic()
    model = VisionLLM(cfg, dtype=jnp.float32)
    n_imp = cfg.vis_encoder.num_patches // 4      # pixelshuffle 0.5
    ids = jnp.zeros((1, n_imp + 8), jnp.int32)
    images = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    init_tree = jax.eval_shape(
        lambda r: model.init(r, ids, images, tid), jax.random.PRNGKey(0)
    )["params"]

    conv = _tree_shapes(params["core"])
    init = _tree_shapes(init_tree)
    missing = sorted(set(init) - set(conv))
    extra = sorted(set(conv) - set(init))
    assert not missing, f"converter missing params: {missing[:15]}"
    assert not extra, f"converter extra params: {extra[:15]}"
    bad = [(k, conv[k], init[k]) for k in init if conv[k] != init[k]]
    assert not bad, f"shape mismatches: {bad[:15]}"


@pytest.mark.slow
def test_26b_sharded_forward_at_real_dims():
    """Materialize the full 25.9B bf16 core FSDP-sharded over the
    8-device mesh and run one short-sequence forward."""
    from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM
    from visionllm_tpu.parallel.mesh import build_mesh, shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")

    cfg = _my_config()
    tid = SpecialTokenIds.synthetic()
    model = VisionLLM(cfg, dtype=jnp.bfloat16)
    n_imp = cfg.vis_encoder.num_patches // 4
    ids_l = [1, 10, 11, tid.img] + [tid.imp] * n_imp + [12, 13, 2]
    ids = jnp.asarray([ids_l], jnp.int32)
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(
        0.5 * rng_np.standard_normal((1, IMG, IMG, 3)), jnp.bfloat16)

    abstract = jax.eval_shape(
        lambda r: model.init(r, ids, images, tid), jax.random.PRNGKey(0)
    )["params"]
    mesh = build_mesh(n_data=4, n_model=2)
    shardings = shard_params(abstract, mesh)

    # structured fills, materialized directly into their FSDP shards:
    # norm/scale-like leaves → 1, biases → 0, everything else → a tiled
    # pseudo-noise block at ~N(0, 0.02) so activations keep non-trivial
    # statistics through every LayerNorm/RMSNorm (a constant fill would
    # zero the variance).
    base = jax.random.normal(jax.random.PRNGKey(7), (1 << 14,),
                             jnp.float32) * 0.02

    def _fill(path, leaf, sh):
        names = [str(getattr(p, "key", p)).lower() for p in path]
        flat = " ".join(names)
        shape, dtype = leaf.shape, leaf.dtype
        n = int(np.prod(shape)) if shape else 1

        def build(b):
            if "bias" in flat:
                return jnp.zeros(shape, dtype)
            if any(t in flat for t in ("norm", "scale", "ls1", "ls2",
                                       "weight")) and len(shape) <= 2:
                return jnp.ones(shape, dtype)
            reps = -(-n // b.shape[0])
            return jnp.tile(b, reps)[:n].reshape(shape).astype(dtype)

        return jax.jit(build, out_shardings=sh)(base)

    flat_p = jax.tree_util.tree_flatten_with_path(abstract)[0]
    flat_s = jax.tree_util.tree_leaves(shardings)
    leaves = [_fill(path, leaf, sh)
              for (path, leaf), sh in zip(flat_p, flat_s)]
    treedef = jax.tree_util.tree_structure(abstract)
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_params > 25.5e9, f"{n_params/1e9:.2f}B"

    def fwd(p, i, im):
        out = model.apply({"params": p}, i, im, tid, compute_logits=True)
        return out["logits"]

    with mesh:
        jitted = jax.jit(fwd)
        compiled = jitted.lower(params, ids, images).compile()
        logits = compiled(params, ids, images)
        logits = np.asarray(logits[:, -1, :], np.float32)
    assert np.isfinite(logits).all()
    print(f"26B sharded forward ok: {n_params/1e9:.2f}B params, "
          f"logits[-1] mean {logits.mean():.4f}")
