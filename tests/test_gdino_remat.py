"""GDinoConfig.remat rematerializes the encoder/decoder stacks without
changing numerics or parameter paths (needed to train det at >=640 px on
one 16 GB chip — see bench_train.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionllm_tpu.config import GDinoConfig
from visionllm_tpu.models.grounding_dino.model import GroundingDino

IMG = 64


def _cfg(remat=""):
    return GDinoConfig(
        d_model=32, num_queries=12, encoder_layers=2, decoder_layers=2,
        num_heads=4, ffn_dim=64, text_dim=48, mask_dim=32, dn_number=4,
        max_text_len=48, remat=remat,
        backbone_overrides={"patch_size": 4, "embed_dim": 8,
                            "depths": (1, 1, 1, 1),
                            "num_heads": (2, 2, 4, 4),
                            "window_size": 4})


def _inputs():
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.standard_normal((1, IMG, IMG, 3)), jnp.float32)
    tq = jnp.asarray(rng.standard_normal((1, 6, 4, 48)), jnp.float32)
    tq_mask = jnp.ones((1, 6), bool)
    targets = {
        "labels": jnp.zeros((1, 3), jnp.int32),
        "boxes": jnp.asarray([[[0.5, 0.5, 0.2, 0.2],
                               [0.3, 0.4, 0.1, 0.3],
                               [0.7, 0.6, 0.2, 0.1]]], jnp.float32),
        "valid": jnp.ones((1, 3), bool),
    }
    return pixels, tq, tq_mask, targets


@pytest.mark.parametrize("remat", ["dots", "full"])
def test_remat_matches_plain_loss_and_grads(remat):
    pixels, tq, tq_mask, targets = _inputs()

    def build(r):
        model = GroundingDino(_cfg(r))
        params = model.init(jax.random.PRNGKey(1), pixels, tq, tq_mask,
                            targets=targets,
                            dn_rng=jax.random.PRNGKey(2))["params"]

        def loss_fn(p):
            out = model.apply({"params": p}, pixels, tq, tq_mask,
                              targets=targets,
                              dn_rng=jax.random.PRNGKey(2))
            return (jnp.mean(out["all_logits"] ** 2)
                    + jnp.mean(out["all_boxes"] ** 2)
                    + jnp.mean(out["dn_all_boxes"] ** 2))

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        return params, loss, grads

    p0, l0, g0 = build("")
    p1, l1, g1 = build(remat)

    # identical param tree (paths AND values: remat preserves scope names
    # so converters keep working)
    flat0 = jax.tree_util.tree_leaves_with_path(p0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(p1))
    assert len(flat0) == len(flat1)
    for path, leaf in flat0:
        np.testing.assert_array_equal(leaf, flat1[path])

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g0),
                            jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=1e-6,
                                   err_msg=str(path))


def test_remat_field_roundtrips_in_config():
    cfg = _cfg("dots")
    d = dataclasses.asdict(cfg)
    assert d["remat"] == "dots"
    assert GDinoConfig(**d) == cfg
