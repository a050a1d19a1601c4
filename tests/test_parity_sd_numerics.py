"""Numerics oracle for the SD-1.5 / InstructPix2Pix weight path.

diffusers is not installed offline, so the reference UNet/VAE
(visionllmv2/model/stable_diffusion/modeling_sd.py:88-102 loads
diffusers' UNet2DConditionModel / AutoencoderKL) cannot be imported.
Instead this file carries an INDEPENDENT torch NCHW implementation of
those architectures, written directly from the published diffusers
SD-1.5 module tree, whose ``state_dict()`` keys are byte-identical to
the published checkpoint layout (down_blocks.N.resnets.M.norm1.weight,
...attentions.M.transformer_blocks.0.attn2.to_q.weight, etc. — the
same key set test_convert_sd_fullscale.py checks against). The torch
model is randomly initialized, its real state dict is pushed through
utils/convert_sd, and the flax NHWC models must reproduce the torch
forward numerically. A transposed-conv, GroupNorm-eps, skip-ordering,
or timestep-convention slip in either implementation breaks this test.

The CLIP text tower has a true in-environment oracle: HF transformers
ships CLIPTextModel (the exact class modeling_sd.py:88 loads), so it
is compared directly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from visionllm_tpu.models.stable_diffusion.unet import (
    UNet2DCondition, UNetConfig)
from visionllm_tpu.models.stable_diffusion.vae import AutoencoderKL, VAEConfig
from visionllm_tpu.utils.convert_sd import (
    convert_clip_text, convert_unet, convert_vae)

# --------------------------------------------------------------------------
# torch NCHW mini-diffusers (independent reference; diffusers key names)
# --------------------------------------------------------------------------


def t_timestep_embedding(timesteps, dim, flip_sin_to_cos=True, freq_shift=0):
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps.float()[:, None] * torch.exp(exponent)[None]
    sin, cos = torch.sin(emb), torch.cos(emb)
    if flip_sin_to_cos:
        return torch.cat([cos, sin], dim=-1)
    return torch.cat([sin, cos], dim=-1)


class TResnet(tnn.Module):
    def __init__(self, cin, cout, temb_dim, groups, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = tnn.Linear(temb_dim, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TAttention(tnn.Module):
    def __init__(self, dim, heads, context_dim=None):
        super().__init__()
        context_dim = context_dim or dim
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(context_dim, dim, bias=False)
        self.to_v = tnn.Linear(context_dim, dim, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(dim, dim))

    def forward(self, x, context=None):
        context = x if context is None else context
        B, L, D = x.shape
        hd = D // self.heads
        q = self.to_q(x).view(B, L, self.heads, hd)
        k = self.to_k(context).view(B, -1, self.heads, hd)
        v = self.to_v(context).view(B, -1, self.heads, hd)
        scores = torch.einsum("bqhd,bkhd->bhqk", q, k) * hd ** -0.5
        probs = scores.softmax(dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, D)
        return self.to_out(out)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TFeedForward(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = tnn.ModuleList(
            [TGEGLU(dim, dim * 4), tnn.Identity(), tnn.Linear(dim * 4, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TBasicBlock(tnn.Module):
    def __init__(self, dim, heads, context_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttention(dim, heads, context_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class TTransformer2D(tnn.Module):
    def __init__(self, dim, heads, context_dim, groups):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = tnn.Conv2d(dim, dim, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicBlock(dim, heads, context_dim)])
        self.proj_out = tnn.Conv2d(dim, dim, 1)

    def forward(self, x, context):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.transformer_blocks[0](h, context)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return res + self.proj_out(h)


class TDownsample(tnn.Module):
    def __init__(self, ch, pad=1):
        super().__init__()
        self.pad = pad
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=pad)

    def forward(self, x):
        if self.pad == 0:  # VAE: asymmetric (0,1,0,1) pad
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TUpsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _Blk(tnn.Module):
    """Carrier for resnets/attentions/downsamplers/upsamplers lists."""


class TTimeEmbedding(tnn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = tnn.Linear(cin, dim)
        self.linear_2 = tnn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TUNet(tnn.Module):
    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4
        g = cfg.norm_num_groups
        heads, xdim = cfg.attention_head_dim, cfg.cross_attention_dim
        self.conv_in = tnn.Conv2d(cfg.in_channels, ch0, 3, padding=1)
        self.time_embedding = TTimeEmbedding(ch0, temb_dim)

        self.down_blocks = tnn.ModuleList()
        skip_chs = [ch0]
        ch = ch0
        for i, cout in enumerate(cfg.block_out_channels):
            blk = _Blk()
            blk.resnets = tnn.ModuleList()
            if cfg.cross_attn_blocks[i]:
                blk.attentions = tnn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(TResnet(ch, cout, temb_dim, g))
                ch = cout
                if cfg.cross_attn_blocks[i]:
                    blk.attentions.append(
                        TTransformer2D(cout, heads, xdim, g))
                skip_chs.append(ch)
            if i < len(cfg.block_out_channels) - 1:
                blk.downsamplers = tnn.ModuleList([TDownsample(cout)])
                skip_chs.append(ch)
            self.down_blocks.append(blk)

        cmid = cfg.block_out_channels[-1]
        self.mid_block = _Blk()
        self.mid_block.resnets = tnn.ModuleList(
            [TResnet(cmid, cmid, temb_dim, g),
             TResnet(cmid, cmid, temb_dim, g)])
        self.mid_block.attentions = tnn.ModuleList(
            [TTransformer2D(cmid, heads, xdim, g)])

        self.up_blocks = tnn.ModuleList()
        rev = tuple(reversed(cfg.block_out_channels))
        rev_cross = tuple(reversed(cfg.cross_attn_blocks))
        for i, cout in enumerate(rev):
            blk = _Blk()
            blk.resnets = tnn.ModuleList()
            if rev_cross[i]:
                blk.attentions = tnn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                cin = ch + skip_chs.pop()
                blk.resnets.append(TResnet(cin, cout, temb_dim, g))
                ch = cout
                if rev_cross[i]:
                    blk.attentions.append(
                        TTransformer2D(cout, heads, xdim, g))
            if i < len(rev) - 1:
                blk.upsamplers = tnn.ModuleList([TUpsample(cout)])
            self.up_blocks.append(blk)

        self.conv_norm_out = tnn.GroupNorm(g, ch0, eps=1e-5)
        self.conv_out = tnn.Conv2d(ch0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, context):
        cfg = self.cfg
        temb = self.time_embedding(t_timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos,
            cfg.freq_shift))
        h = self.conv_in(sample)
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if cfg.cross_attn_blocks[i]:
                    h = blk.attentions[j](h, context)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)
        rev_cross = tuple(reversed(cfg.cross_attn_blocks))
        for i, blk in enumerate(self.up_blocks):
            for j, res in enumerate(blk.resnets):
                h = res(torch.cat([h, skips.pop()], dim=1), temb)
                if rev_cross[i]:
                    h = blk.attentions[j](h, context)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVaeAttention(tnn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.Sequential(tnn.Linear(ch, ch))

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        probs = (torch.einsum("bqc,bkc->bqk", q, k) * C ** -0.5).softmax(-1)
        out = self.to_out(torch.einsum("bqk,bkc->bqc", probs, v))
        return x + out.reshape(B, H, W, C).permute(0, 3, 1, 2)


class TVaeEncoder(tnn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        g = cfg.norm_num_groups
        chans = cfg.block_out_channels
        self.conv_in = tnn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.down_blocks = tnn.ModuleList()
        ch = chans[0]
        for i, cout in enumerate(chans):
            blk = _Blk()
            blk.resnets = tnn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(TResnet(ch, cout, 0, g, eps=1e-6))
                ch = cout
            if i < len(chans) - 1:
                blk.downsamplers = tnn.ModuleList([TDownsample(cout, pad=0)])
            self.down_blocks.append(blk)
        self.mid_block = _Blk()
        self.mid_block.resnets = tnn.ModuleList(
            [TResnet(ch, ch, 0, g, eps=1e-6), TResnet(ch, ch, 0, g, eps=1e-6)])
        self.mid_block.attentions = tnn.ModuleList([TVaeAttention(ch, g)])
        self.conv_norm_out = tnn.GroupNorm(g, ch, eps=1e-6)
        self.conv_out = tnn.Conv2d(ch, 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVaeDecoder(tnn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        g = cfg.norm_num_groups
        rev = tuple(reversed(cfg.block_out_channels))
        ch = rev[0]
        self.conv_in = tnn.Conv2d(cfg.latent_channels, ch, 3, padding=1)
        self.mid_block = _Blk()
        self.mid_block.resnets = tnn.ModuleList(
            [TResnet(ch, ch, 0, g, eps=1e-6), TResnet(ch, ch, 0, g, eps=1e-6)])
        self.mid_block.attentions = tnn.ModuleList([TVaeAttention(ch, g)])
        self.up_blocks = tnn.ModuleList()
        for i, cout in enumerate(rev):
            blk = _Blk()
            blk.resnets = tnn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(TResnet(ch, cout, 0, g, eps=1e-6))
                ch = cout
            if i < len(rev) - 1:
                blk.upsamplers = tnn.ModuleList([TUpsample(cout)])
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(g, ch, eps=1e-6)
        self.conv_out = tnn.Conv2d(ch, cfg.in_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        for blk in self.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVae(tnn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.encoder = TVaeEncoder(cfg)
        self.decoder = TVaeDecoder(cfg)
        self.quant_conv = tnn.Conv2d(
            2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
        self.post_quant_conv = tnn.Conv2d(
            cfg.latent_channels, cfg.latent_channels, 1)


# --------------------------------------------------------------------------
# comparisons
# --------------------------------------------------------------------------


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _run_unet_parity(cfg, H, ctx_len, atol):
    torch.manual_seed(0)
    tmodel = TUNet(cfg).eval()
    sd = _np_sd(tmodel)
    params = convert_unet(sd, cfg)

    rng = np.random.default_rng(0)
    sample = rng.standard_normal(
        (2, cfg.in_channels, H, H), dtype=np.float32)
    ts = np.array([7.0, 421.0], dtype=np.float32)
    ctx = rng.standard_normal(
        (2, ctx_len, cfg.cross_attention_dim), dtype=np.float32)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(sample), torch.from_numpy(ts),
                     torch.from_numpy(ctx)).numpy()

    model = UNet2DCondition(cfg, dtype=jnp.float32)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(sample.transpose(0, 2, 3, 1)),
                      jnp.asarray(ts), jnp.asarray(ctx))
    np.testing.assert_allclose(_nchw(out), ref, atol=atol, rtol=1e-3)


def test_unet_parity_tiny_ip2p_channels():
    cfg = UNetConfig(in_channels=8, out_channels=4,
                     block_out_channels=(8, 16, 16),
                     cross_attn_blocks=(True, True, False),
                     layers_per_block=2, attention_head_dim=2,
                     cross_attention_dim=12, norm_num_groups=4)
    _run_unet_parity(cfg, H=16, ctx_len=7, atol=1e-4)


@pytest.mark.slow
def test_unet_parity_sd15_dims():
    """Real SD-1.5 channel/head/group config (reduced spatial size)."""
    cfg = UNetConfig()  # (320, 640, 1280, 1280), 8 heads, xdim 768
    _run_unet_parity(cfg, H=16, ctx_len=77, atol=5e-4)


def _run_vae_parity(cfg, H, atol):
    torch.manual_seed(1)
    tmodel = TVae(cfg).eval()
    sd = _np_sd(tmodel)
    params = convert_vae(sd, cfg)

    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, cfg.in_channels, H, H), dtype=np.float32)
    f = 2 ** (len(cfg.block_out_channels) - 1)
    lat = rng.standard_normal(
        (1, cfg.latent_channels, H // f, H // f), dtype=np.float32)

    with torch.no_grad():
        ref_moments = tmodel.quant_conv(tmodel.encoder(
            torch.from_numpy(img))).numpy()
        ref_img = tmodel.decoder(tmodel.post_quant_conv(
            torch.from_numpy(lat))).numpy()

    model = AutoencoderKL(cfg, dtype=jnp.float32)
    jparams = {"params": jax.tree.map(jnp.asarray, params)}
    moments = model.apply(jparams, jnp.asarray(img.transpose(0, 2, 3, 1)),
                          method=lambda m, x: m.quant_conv(m.encoder(x)))
    dec = model.apply(jparams, jnp.asarray(lat.transpose(0, 2, 3, 1)),
                      method=lambda m, z: m.decoder(m.post_quant_conv(z)))
    np.testing.assert_allclose(_nchw(moments), ref_moments,
                               atol=atol, rtol=1e-3)
    np.testing.assert_allclose(_nchw(dec), ref_img, atol=atol, rtol=1e-3)


def test_vae_parity_tiny():
    cfg = VAEConfig(block_out_channels=(8, 16, 16), norm_num_groups=4)
    _run_vae_parity(cfg, H=16, atol=1e-4)


@pytest.mark.slow
def test_vae_parity_sd15_dims():
    """Real SD-1.5 VAE channels (128, 256, 512, 512) at 32px input."""
    _run_vae_parity(VAEConfig(), H=32, atol=5e-4)


def test_clip_text_parity_vs_hf():
    """True oracle: transformers ships the exact CLIPTextModel class the
    reference loads (modeling_sd.py:88)."""
    from transformers import CLIPTextConfig, CLIPTextModel

    from visionllm_tpu.models.stable_diffusion.clip_text import (
        ClipTextConfig, ClipTextModel)

    hf_cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu")
    torch.manual_seed(2)
    hf = CLIPTextModel(hf_cfg).eval()
    ids = np.array([[5, 9, 3, 1, 0, 2, 7, 7], [1, 2, 3, 4, 5, 6, 7, 8]],
                   dtype=np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))
                 ).last_hidden_state.numpy()

    params = convert_clip_text(_np_sd(hf))
    cfg = ClipTextConfig(vocab_size=100, hidden_size=64,
                         intermediate_size=128, num_layers=2, num_heads=4,
                         max_position_embeddings=16)
    out = ClipTextModel(cfg, dtype=jnp.float32).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)
