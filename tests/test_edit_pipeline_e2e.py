"""End-to-end [EDIT] pipeline (VERDICT r2 missing #5 / next-step #7):
prompt → jitted emb-countdown generation emits [EDIT] + num_embs_gen
forced [EMB] rows → their hidden states are extracted as edit
embeddings → InstructPix2Pix 3-way-CFG DDIM denoise → VAE decode.
Output must be finite and deterministic (same rng → identical image).

Reference flow: model.generate until [EDIT]+64 [EMB] emitted, then
ip2p.run(input_ids, hidden_states) (modeling_instruct_pix2pix.py:
226-231; SURVEY §3.5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu import constants as C
from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.generation import (build_generate_fn,
                                      extract_tool_queries_from_generation)
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM

CFG = tiny_test_config()
TID = SpecialTokenIds.synthetic()


@pytest.mark.slow
def test_edit_pipeline_generate_extract_denoise_decode():
    model = VisionLLMWithTools(CFG, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    img_len = CFG.vis_encoder.num_patches
    size = CFG.vis_encoder.image_size
    ids = jnp.asarray([[1, 10] + [TID.imp] * img_len + [11]], jnp.int32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32))
    # the image being edited (VAE input geometry, tiny dims)
    edit_src = jnp.asarray(
        rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))

    # full composite params: edit branch init creates core + ip2p
    batch = {
        "input_ids": ids,
        "labels": jnp.where(ids >= 10, ids, -100),
        "attn_mask": jnp.ones_like(ids),
        "images": images,
        "input_images": edit_src,
        "output_images": edit_src,
    }
    # forward_edit alone never traces the VAE decode path — touch it at
    # init so ip2p.generate finds its params
    s = CFG.ip2p.sample_size

    def init_method(m, batch, tid, rng):
        out = m.forward_edit(batch, tid, rng)
        m.ip2p.vae.decode(jnp.zeros((1, s, s, 4), jnp.float32))
        return out

    params = model.init(jax.random.PRNGKey(0), batch, TID,
                        jax.random.PRNGKey(1),
                        method=init_method)["params"]

    # 1) decode: teacher-force [EDIT]; the countdown machine must emit
    #    num_embs_gen repeated [EMB] ids (reference :434-435)
    core = VisionLLM(CFG, dtype=jnp.float32)
    gen = build_generate_fn(core, TID,
                            max_new_tokens=CFG.num_embs_gen + 3,
                            max_len=256)
    out = gen(params["core"], ids, images,
              first_token=jnp.asarray([TID.edit], jnp.int32))
    toks = np.asarray(out["out_tokens"][0])
    assert toks[0] == TID.edit
    np.testing.assert_array_equal(toks[1:1 + CFG.num_embs_gen],
                                  [TID.emb] * CFG.num_embs_gen)

    # 2) extract the edit embeddings from the recorded hidden states
    tools = extract_tool_queries_from_generation(
        CFG, TID, out["out_tokens"], out["out_hidden"])
    edit_tq, edit_mask = tools["edit"]
    assert bool(edit_mask[0, 0])
    embs = edit_tq[:, 0]                     # [1, num_embs_gen, C]
    assert embs.shape == (1, CFG.num_embs_gen, CFG.llm.hidden_size)
    assert np.abs(np.asarray(embs)).sum() > 0

    # 3) ip2p denoise + VAE decode (3-way CFG), twice with the same rng
    def edit_fn(m, e, src, r):
        return m.ip2p.generate(e.astype(m.tool_dtype), src, r,
                               num_inference_steps=2)

    img_a = model.apply({"params": params}, embs, edit_src,
                        jax.random.PRNGKey(7), method=edit_fn)
    img_b = model.apply({"params": params}, embs, edit_src,
                        jax.random.PRNGKey(7), method=edit_fn)
    assert img_a.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img_a)).all()
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
    # a different source image must change the edit output
    img_c = model.apply({"params": params}, embs, -edit_src,
                        jax.random.PRNGKey(7), method=edit_fn)
    assert not np.allclose(np.asarray(img_a), np.asarray(img_c))
