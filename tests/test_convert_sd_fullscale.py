"""SD-1.5 / IP2P weight-path validation WITHOUT diffusers (VERDICT r2
missing #5): the converter must (a) consume EVERY key of the published
checkpoint key sets at the published shapes, and (b) produce a param
tree that structurally equals our flax models' init tree at the real
SD-1.5 dims — so a transposed conv kernel, missing layer, or misrouted
skip connection fails here instead of silently destroying [GEN]/[EDIT]
output on real weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.sd15_published_keys import (sd15_text_keys, sd15_unet_keys,
                                       sd15_vae_keys)


class RecordingDict(dict):
    """State-dict stand-in that records which keys the converter read."""

    def __init__(self, shapes):
        super().__init__()
        self.shapes = dict(shapes)
        self.read = set()

    def __contains__(self, k):
        return k in self.shapes

    def __getitem__(self, k):
        self.read.add(k)
        # zeros: calloc'd pages — the full UNet is ~860M params but
        # untouched memory stays virtual
        return np.zeros(self.shapes[k], np.float32)

    def unread(self):
        return sorted(set(self.shapes) - self.read)


def _tree_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                 for k in path): tuple(np.shape(leaf))
        for path, leaf in flat
    }


def _assert_same_tree(converted, init_shapes, tag):
    conv = _tree_shapes(converted)
    init = _tree_shapes(init_shapes)
    missing = sorted(set(init) - set(conv))
    extra = sorted(set(conv) - set(init))
    assert not missing, f"{tag}: converter missing params: {missing[:10]}"
    assert not extra, f"{tag}: converter extra params: {extra[:10]}"
    bad = [(k, conv[k], init[k]) for k in init if conv[k] != init[k]]
    assert not bad, f"{tag}: shape mismatches: {bad[:10]}"


@pytest.mark.slow
@pytest.mark.parametrize("in_channels", [4, 8])
def test_unet_converter_complete_at_sd15_dims(in_channels):
    """in_channels=4 → SD-1.5 UNet; 8 → the IP2P UNet (latent concat)."""
    from visionllm_tpu.models.stable_diffusion.unet import (UNet2DCondition,
                                                            UNetConfig)
    from visionllm_tpu.utils.convert_sd import convert_unet
    cfg = UNetConfig(in_channels=in_channels)
    sd = RecordingDict(sd15_unet_keys(in_channels=in_channels))
    params = convert_unet(sd, cfg)
    assert sd.unread() == [], f"unconsumed keys: {sd.unread()[:10]}"

    model = UNet2DCondition(cfg, dtype=jnp.float32)
    init_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, in_channels)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)))["params"]
    _assert_same_tree(params, init_shapes, f"unet(in={in_channels})")


@pytest.mark.slow
def test_vae_converter_complete_at_sd15_dims():
    from visionllm_tpu.models.stable_diffusion.vae import (AutoencoderKL,
                                                           VAEConfig)
    from visionllm_tpu.utils.convert_sd import convert_vae
    cfg = VAEConfig()
    sd = RecordingDict(sd15_vae_keys())
    params = convert_vae(sd, cfg)
    assert sd.unread() == [], f"unconsumed keys: {sd.unread()[:10]}"

    model = AutoencoderKL(cfg, dtype=jnp.float32)
    init_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jax.random.PRNGKey(1))["params"]
    _assert_same_tree(params, init_shapes, "vae")


@pytest.mark.slow
def test_clip_text_converter_complete_at_sd15_dims():
    from visionllm_tpu.models.stable_diffusion.clip_text import (
        ClipTextConfig, ClipTextModel)
    from visionllm_tpu.utils.convert_sd import convert_clip_text
    sd = RecordingDict(sd15_text_keys())
    params = convert_clip_text(sd)
    assert sd.unread() == [], f"unconsumed keys: {sd.unread()[:10]}"

    model = ClipTextModel(ClipTextConfig(), dtype=jnp.float32)
    init_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 77), jnp.int32))["params"]
    _assert_same_tree(params, init_shapes, "clip_text")
