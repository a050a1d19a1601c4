"""Generation-loop parity vs the reference HF-generate flow.

The reference generates with HF `generate` + a custom
prepare_inputs_for_generation; when the prompt (or a sampled token)
carries a tool trigger, its forward splices the tool's [EMB] embeddings
into the input stream and the [EMB] hidden states become tool queries
(modeling_visionllmv2.py:426-555). Ours is an emb-countdown
lax.while_loop (generation.py). This test runs both greedy on the same
converted tiny model and checks:

- the sampled token sequences match exactly (ours with the forced [EMB]
  ids filtered out — the reference keeps them only in the KV cache);
- the [EMB] hidden states captured for the tool match numerically.

transformers >= 4.50 no longer mixes GenerationMixin into
PreTrainedModel, so the reference class gets it added here.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF_ROOT = "/root/reference/VisionLLMv2"

V_HID = 64
L_HID = 64
VOCAB = 32100
IMG = 32
PATCH = 8
MAX_NEW = 10


@pytest.fixture(scope="module")
def ref_model():
    from visionllm_tpu.utils.ref_shims import install_reference_shims
    install_reference_shims()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import warnings
    warnings.filterwarnings("ignore")
    import torch
    from transformers.generation import GenerationMixin
    from visionllmv2.model.configuration_visionllmv2 import VisionLLMv2Config
    from visionllmv2.model.modeling_visionllmv2 import VisionLLMv2Model

    class VisionLLMv2Gen(VisionLLMv2Model, GenerationMixin):
        # compat shim: the reference targets transformers ~4.31 where
        # generate passed past_key_values=None on the first step; 4.5x
        # passes an EMPTY DynamicCache, which its legacy
        # past_key_values[0][0].shape check cannot handle
        # (signature mirrors the original: generate() validates kwargs
        # against it, so `images` must appear explicitly)
        def forward(self, input_ids=None, inputs_embeds=None, labels=None,
                    attention_mask=None, images=None, regions=None,
                    past_key_values=None, **kwargs):
            if (past_key_values is not None
                    and past_key_values.get_seq_length() == 0):
                past_key_values = None
            return super().forward(
                input_ids=input_ids, inputs_embeds=inputs_embeds,
                labels=labels, attention_mask=attention_mask,
                images=images, regions=regions,
                past_key_values=past_key_values, **kwargs)

        def prepare_inputs_for_generation(self, input_ids,
                                          past_key_values=None, **kwargs):
            # same shim: `if past_key_values:` in the original is truthy
            # for 4.5x's empty layered cache and would slice the prompt
            if (past_key_values is not None
                    and past_key_values.get_seq_length() == 0):
                past_key_values = None
            return super().prepare_inputs_for_generation(
                input_ids, past_key_values=past_key_values, **kwargs)

    cfg = VisionLLMv2Config(
        vis_encoder_config=dict(
            architectures=["CLIPVisionModel"], hidden_size=V_HID,
            intermediate_size=2 * V_HID, num_hidden_layers=2,
            num_attention_heads=4, image_size=IMG, patch_size=PATCH,
            projection_dim=V_HID),
        llm_config=dict(
            architectures=["LlamaForCausalLM"], hidden_size=L_HID,
            intermediate_size=2 * L_HID, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            vocab_size=VOCAB, rms_norm_eps=1e-5,
            max_position_embeddings=4096),
        vl_bridge_type="mlp2x_gelu", num_embs=4, num_embs_gen=64,
        use_region_encoder=True)
    torch.manual_seed(0)
    model = VisionLLMv2Gen(cfg)
    model.eval()
    # a non-model-derived GenerationConfig: generate() otherwise probes
    # config._get_non_default_generation_parameters(), which tries to
    # build a default VisionLLMv2Config() — impossible (sub-configs are
    # mandatory)
    from transformers import GenerationConfig
    model.generation_config = GenerationConfig(
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    # generate() sizes the DynamicCache from config.get_text_config();
    # the composition config has no conventional text sub-config name,
    # so route it to the LLM config explicitly
    model.config.get_text_config = (
        lambda *a, **k: model.config.llm_config)

    from visionllm_tpu.models.visionllm import SpecialTokenIds
    tid = SpecialTokenIds.synthetic()
    model.pad_token_id = tid.pad
    model.img_token_id = tid.img
    model.imp_token_id = tid.imp
    model.reg_token_id = tid.reg
    model.emb_token_id = tid.emb
    model.det_tool_id = tid.det
    model.grd_tool_id = tid.grd
    model.seg_tool_id = tid.seg
    model.pose_tool_id = tid.pose
    model.gen_tool_id = tid.gen
    model.edit_tool_id = tid.edit
    return model, tid


def _my_config():
    from visionllm_tpu.config import (LLMConfig, RegionEncoderConfig,
                                      VisionEncoderConfig,
                                      VisionLLMConfig)
    return VisionLLMConfig(
        vis_encoder=VisionEncoderConfig(
            image_size=IMG, patch_size=PATCH, hidden_size=V_HID,
            intermediate_size=2 * V_HID, num_layers=2, num_heads=4),
        llm=LLMConfig(vocab_size=VOCAB, hidden_size=L_HID,
                      intermediate_size=2 * L_HID, num_layers=2,
                      num_heads=4, num_kv_heads=4),
        vl_bridge_type="mlp2x_gelu",
        use_region_encoder=True,
        region_encoder=RegionEncoderConfig(
            hidden_dim=256, embed_dim=V_HID, out_dim=L_HID,
            patch_size=PATCH))


@pytest.mark.slow
def test_generation_parity_vs_reference(ref_model):
    import torch
    ref, tid = ref_model
    cfg = _my_config()

    img_len = cfg.vis_encoder.num_patches
    # prompt ends with the [DET] trigger: the reference prefill splices
    # the 4 [EMB] rows right after it (gap_len=0 branch)
    prompt = ([1, 10, 11, tid.img] + [tid.imp] * img_len + [12, tid.det])
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)

    input_ids_t = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = ref.generate(
            input_ids=input_ids_t,
            attention_mask=torch.ones_like(input_ids_t),
            images=torch.from_numpy(images),
            max_new_tokens=MAX_NEW, do_sample=False, use_cache=True,
            pad_token_id=0, eos_token_id=2,
            output_hidden_states=True, return_dict_in_generate=True)
    ref_generated = out.sequences[0, len(prompt):].tolist()
    # prefill hidden states: [1, len(prompt)+4, C]; the [EMB] rows sit
    # right after the trigger (= last 4 positions of the prefill)
    prefill_h = out.hidden_states[0][-1][0]            # final layer
    ref_emb_hidden = prefill_h[len(prompt):len(prompt) + 4].numpy()

    # ours
    import jax
    from visionllm_tpu.generation import build_generate_fn
    from visionllm_tpu.models.visionllm import VisionLLM
    from visionllm_tpu.utils.torch_convert import convert_composite_core
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_composite_core(sd, cfg))

    model = VisionLLM(cfg, dtype=jnp.float32)
    gen = build_generate_fn(model, tid, max_new_tokens=MAX_NEW + 5,
                            eos_id=2, max_len=256)
    # prompt WITHOUT the trigger; teacher-force [DET] as the first token
    # (same semantics: the countdown splices the 4 [EMB] rows next)
    my_prompt = jnp.asarray([prompt[:-1]], jnp.int32)
    res = gen(params, my_prompt,
              jnp.asarray(images.transpose(0, 2, 3, 1)),
              first_token=jnp.asarray([tid.det], jnp.int32))
    toks = np.asarray(res["out_tokens"][0])
    hidden = np.asarray(res["out_hidden"][0])
    n = int(res["num_generated"])

    is_emb = (toks >= tid.emb) & (toks < tid.emb + cfg.num_embs)
    my_emb_hidden = hidden[:n][is_emb[:n]][:4]
    # drop the forced [DET]+[EMB]s: the reference sequence records only
    # sampled tokens
    my_sampled = [int(t) for i, t in enumerate(toks[:n])
                  if not is_emb[i]][1:]     # [0] is the forced [DET]
    my_sampled = my_sampled[:len(ref_generated)]

    print("ref:", ref_generated)
    print("ours:", my_sampled)
    assert my_sampled == ref_generated
    np.testing.assert_allclose(my_emb_hidden, ref_emb_hidden,
                               atol=2e-3, rtol=1e-2)


@pytest.mark.slow
def test_region_generation_parity_vs_reference(ref_model):
    """Region-prompted generation: the reference threads regions=
    through prepare_inputs_for_generation (modeling_visionllmv2.py:
    355-379, used by eval_region_caption_refcoco.py:176-179) so the
    RegionEncoder conditions the prefill. Ours passes regions into the
    prefill of the jitted decode loop — greedy tokens must match."""
    import torch
    ref, tid = ref_model
    cfg = _my_config()

    img_len = cfg.vis_encoder.num_patches
    # a region-caption style prompt: <image> patches + one <region> tag
    prompt = ([1, 10, 11, tid.img] + [tid.imp] * img_len
              + [12, 13, tid.reg, 14, 15])
    rng = np.random.default_rng(1)
    images = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    regions = np.zeros((1, IMG, IMG), np.float32)
    regions[0, 6:22, 4:30] = 1.0

    input_ids_t = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = ref.generate(
            input_ids=input_ids_t,
            attention_mask=torch.ones_like(input_ids_t),
            images=torch.from_numpy(images),
            regions=[torch.from_numpy(regions)],
            max_new_tokens=MAX_NEW, do_sample=False, use_cache=True,
            pad_token_id=0, eos_token_id=2,
            return_dict_in_generate=True)
    ref_generated = out.sequences[0, len(prompt):].tolist()

    import jax
    from visionllm_tpu.generation import build_generate_fn
    from visionllm_tpu.models.visionllm import VisionLLM
    from visionllm_tpu.utils.torch_convert import convert_composite_core
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_composite_core(sd, cfg))

    model = VisionLLM(cfg, dtype=jnp.float32)
    gen = build_generate_fn(model, tid, max_new_tokens=MAX_NEW,
                            eos_id=2, max_len=256)
    res = gen(params, jnp.asarray([prompt], jnp.int32),
              jnp.asarray(images.transpose(0, 2, 3, 1)),
              regions=jnp.asarray(regions)[None])
    n = int(res["num_generated"])
    toks = np.asarray(res["out_tokens"][0])
    is_emb = (toks >= tid.emb) & (toks < tid.emb + cfg.num_embs)
    my_sampled = [int(t) for i, t in enumerate(toks[:n]) if not is_emb[i]]
    my_sampled = my_sampled[:len(ref_generated)]

    print("ref:", ref_generated)
    print("ours:", my_sampled)
    assert my_sampled == ref_generated

    # and a DIFFERENT region must change the continuation's first
    # logits-driven choice at least with high probability — assert the
    # prefill conditioned on the region at all by comparing hidden[0]
    regions2 = np.zeros_like(regions)
    regions2[0, 0:6, 0:6] = 1.0
    res2 = gen(params, jnp.asarray([prompt], jnp.int32),
               jnp.asarray(images.transpose(0, 2, 3, 1)),
               regions=jnp.asarray(regions2)[None])
    assert not np.allclose(np.asarray(res["out_hidden"][0, 0]),
                           np.asarray(res2["out_hidden"][0, 0]))
