"""TP-sharded generation: the emb-countdown decode loop under a
{data, model} mesh — the serving configuration for 7B on v5e-8
(VERDICT r2 weak #4). Params are FSDP+TP sharded via MeshRules; XLA
propagates the shardings into the KV cache and emits the collectives.
Greedy tokens must match the unsharded run exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.generation import build_generate_fn
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM
from visionllm_tpu.parallel.mesh import build_mesh, shard_params

TID = SpecialTokenIds.synthetic()


@pytest.mark.slow
def test_tp_sharded_decode_matches_unsharded():
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    core = VisionLLM(cfg, dtype=jnp.float32)
    img_len = cfg.vis_encoder.num_patches
    size = cfg.vis_encoder.image_size
    ids = jnp.asarray([[1, 10] + [TID.imp] * img_len + [11, 12]],
                      jnp.int32)
    images = 0.5 * jax.random.normal(jax.random.PRNGKey(1),
                                     (1, size, size, 3), jnp.float32)
    params = core.init(jax.random.PRNGKey(0), ids, images, TID)["params"]
    gen = build_generate_fn(core, TID, max_new_tokens=10, max_len=128)

    ref = gen(params, ids, images)
    ref_toks = np.asarray(ref["out_tokens"][0])

    mesh = build_mesh(n_data=4, n_model=2)
    with mesh:
        sharded = jax.device_put(params, shard_params(params, mesh))
        out = gen(sharded, ids, images)
        jax.block_until_ready(out["out_tokens"])
    toks = np.asarray(out["out_tokens"][0])
    np.testing.assert_array_equal(toks, ref_toks)
    # hidden-state buffer (tool-query source) must agree numerically too
    np.testing.assert_allclose(np.asarray(out["out_hidden"]),
                               np.asarray(ref["out_hidden"]),
                               atol=1e-4, rtol=1e-4)

    # teacher-forced [DET]: the forced-[EMB] machine under TP
    out_det = gen(sharded, ids, images, jnp.asarray([TID.det], jnp.int32))
    toks_det = np.asarray(out_det["out_tokens"][0])
    assert toks_det[0] == TID.det
    np.testing.assert_array_equal(
        toks_det[1:1 + cfg.num_embs],
        [TID.emb + i for i in range(cfg.num_embs)])
