"""convert_unet / convert_vae: structural round-trip (diffusers-named
synthetic state dict built from our params → converter → identical
forward)."""

import numpy as np

import jax
import jax.numpy as jnp

from visionllm_tpu.models.stable_diffusion.unet import (UNet2DCondition,
                                                        UNetConfig)
from visionllm_tpu.models.stable_diffusion.vae import AutoencoderKL, VAEConfig
from visionllm_tpu.utils.convert_sd import convert_unet, convert_vae

UCFG = UNetConfig(sample_size=8, in_channels=4, out_channels=4,
                  block_out_channels=(8, 16), layers_per_block=1,
                  cross_attention_dim=12, attention_head_dim=2,
                  norm_num_groups=4, cross_attn_blocks=(True, False))
VCFG = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                 norm_num_groups=4)


def _inv_leaf(tree, name, sd):
    """Invert one of our Dense/Conv/Norm param dicts into torch names."""
    if "kernel" in tree:
        k = np.asarray(tree["kernel"])
        if k.ndim == 4:
            sd[name + ".weight"] = np.ascontiguousarray(
                np.transpose(k, (3, 2, 0, 1)))
        else:
            sd[name + ".weight"] = np.ascontiguousarray(k.T)
        if "bias" in tree:
            sd[name + ".bias"] = np.asarray(tree["bias"])
    else:                                   # norm
        sd[name + ".weight"] = np.asarray(tree["scale"])
        sd[name + ".bias"] = np.asarray(tree["bias"])


def _inv_resnet(tree, p, sd, with_time=True):
    for ours, theirs in (("norm1", "norm1"), ("conv1", "conv1"),
                         ("norm2", "norm2"), ("conv2", "conv2")):
        _inv_leaf(tree[ours], f"{p}.{theirs}", sd)
    if with_time:
        _inv_leaf(tree["time_emb_proj"], p + ".time_emb_proj", sd)
    if "conv_shortcut" in tree:
        _inv_leaf(tree["conv_shortcut"], p + ".conv_shortcut", sd)


def _inv_attn(tree, p, sd):
    _inv_leaf(tree["norm"], p + ".norm", sd)
    _inv_leaf(tree["proj_in"], p + ".proj_in", sd)
    _inv_leaf(tree["proj_out"], p + ".proj_out", sd)
    b = tree["block_0"]
    bp = p + ".transformer_blocks.0"
    for n in ("norm1", "norm2", "norm3"):
        _inv_leaf(b[n], f"{bp}.{n}", sd)
    for a in ("attn1", "attn2"):
        for q in ("to_q", "to_k", "to_v"):
            _inv_leaf(b[a][q], f"{bp}.{a}.{q}", sd)
        _inv_leaf(b[a]["to_out"], f"{bp}.{a}.to_out.0", sd)
    _inv_leaf(b["ff_geglu"]["proj"], bp + ".ff.net.0.proj", sd)
    _inv_leaf(b["ff_out"], bp + ".ff.net.2", sd)


def test_unet_converter_roundtrip():
    model = UNet2DCondition(UCFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([5])
    ctx = jnp.asarray(rng.standard_normal((1, 7, 12)), jnp.float32)
    params = jax.device_get(model.init(jax.random.PRNGKey(0), x, t,
                                       ctx)["params"])
    want = model.apply({"params": params}, x, t, ctx)

    sd = {}
    _inv_leaf(params["conv_in"], "conv_in", sd)
    _inv_leaf(params["time_dense1"], "time_embedding.linear_1", sd)
    _inv_leaf(params["time_dense2"], "time_embedding.linear_2", sd)
    _inv_leaf(params["conv_norm_out"], "conv_norm_out", sd)
    _inv_leaf(params["conv_out"], "conv_out", sd)
    n = len(UCFG.block_out_channels)
    for i in range(n):
        for j in range(UCFG.layers_per_block):
            _inv_resnet(params[f"down_{i}_res_{j}"],
                        f"down_blocks.{i}.resnets.{j}", sd)
            if UCFG.cross_attn_blocks[i]:
                _inv_attn(params[f"down_{i}_attn_{j}"],
                          f"down_blocks.{i}.attentions.{j}", sd)
        if i < n - 1:
            _inv_leaf(params[f"down_{i}_downsample"],
                      f"down_blocks.{i}.downsamplers.0.conv", sd)
    _inv_resnet(params["mid_res_0"], "mid_block.resnets.0", sd)
    _inv_attn(params["mid_attn"], "mid_block.attentions.0", sd)
    _inv_resnet(params["mid_res_1"], "mid_block.resnets.1", sd)
    rev_cross = tuple(reversed(UCFG.cross_attn_blocks))
    for i in range(n):
        for j in range(UCFG.layers_per_block + 1):
            _inv_resnet(params[f"up_{i}_res_{j}"],
                        f"up_blocks.{i}.resnets.{j}", sd)
            if rev_cross[i]:
                _inv_attn(params[f"up_{i}_attn_{j}"],
                          f"up_blocks.{i}.attentions.{j}", sd)
        if i < n - 1:
            _inv_leaf(params[f"up_{i}_upsample"],
                      f"up_blocks.{i}.upsamplers.0.conv", sd)

    conv = jax.tree.map(jnp.asarray, convert_unet(sd, UCFG))
    got = model.apply({"params": conv}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_vae_converter_roundtrip():
    model = AutoencoderKL(VCFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    params = jax.device_get(model.init(jax.random.PRNGKey(0), x)["params"])
    want = model.apply({"params": params}, x)

    sd = {}
    n = len(VCFG.block_out_channels)
    enc = params["encoder"]
    _inv_leaf(enc["conv_in"], "encoder.conv_in", sd)
    _inv_leaf(enc["conv_norm_out"], "encoder.conv_norm_out", sd)
    _inv_leaf(enc["conv_out"], "encoder.conv_out", sd)
    for i in range(n):
        for j in range(VCFG.layers_per_block):
            _inv_resnet(enc[f"down_{i}_res_{j}"],
                        f"encoder.down_blocks.{i}.resnets.{j}", sd,
                        with_time=False)
        if i < n - 1:
            _inv_leaf(enc[f"down_{i}_downsample"],
                      f"encoder.down_blocks.{i}.downsamplers.0.conv", sd)
    for name, mp in (("mid_res_0", "encoder.mid_block.resnets.0"),
                     ("mid_res_1", "encoder.mid_block.resnets.1")):
        _inv_resnet(enc[name], mp, sd, with_time=False)
    ma = enc["mid_attn"]
    _inv_leaf(ma["group_norm"], "encoder.mid_block.attentions.0.group_norm",
              sd)
    for q in ("to_q", "to_k", "to_v"):
        _inv_leaf(ma[q], f"encoder.mid_block.attentions.0.{q}", sd)
    _inv_leaf(ma["to_out"], "encoder.mid_block.attentions.0.to_out.0", sd)

    dec = params["decoder"]
    _inv_leaf(dec["conv_in"], "decoder.conv_in", sd)
    _inv_leaf(dec["conv_norm_out"], "decoder.conv_norm_out", sd)
    _inv_leaf(dec["conv_out"], "decoder.conv_out", sd)
    for name, mp in (("mid_res_0", "decoder.mid_block.resnets.0"),
                     ("mid_res_1", "decoder.mid_block.resnets.1")):
        _inv_resnet(dec[name], mp, sd, with_time=False)
    ma = dec["mid_attn"]
    _inv_leaf(ma["group_norm"], "decoder.mid_block.attentions.0.group_norm",
              sd)
    for q in ("to_q", "to_k", "to_v"):
        _inv_leaf(ma[q], f"decoder.mid_block.attentions.0.{q}", sd)
    _inv_leaf(ma["to_out"], "decoder.mid_block.attentions.0.to_out.0", sd)
    for i in range(n):
        for j in range(VCFG.layers_per_block + 1):
            _inv_resnet(dec[f"up_{i}_res_{j}"],
                        f"decoder.up_blocks.{i}.resnets.{j}", sd,
                        with_time=False)
        if i < n - 1:
            _inv_leaf(dec[f"up_{i}_upsample"],
                      f"decoder.up_blocks.{i}.upsamplers.0.conv", sd)
    _inv_leaf(params["quant_conv"], "quant_conv", sd)
    _inv_leaf(params["post_quant_conv"], "post_quant_conv", sd)

    conv = jax.tree.map(jnp.asarray, convert_vae(sd, VCFG))
    got = model.apply({"params": conv}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
