"""The published SD-1.5 / InstructPix2Pix checkpoint key sets
(state-dict name → torch shape), enumerated from the public diffusers
architecture definitions at the exact configs the reference loads
(modeling_sd.py:88-102 loads "runwayml/stable-diffusion-v1-5";
modeling_instruct_pix2pix.py loads "timbrooks/instruct-pix2pix"):

* UNet2DConditionModel — block_out_channels (320, 640, 1280, 1280),
  layers_per_block 2, cross_attention_dim 768, down types 3×CrossAttn +
  Down, up types Up + 3×CrossAttn, use_linear_projection False (conv
  1×1 proj_in/out). IP2P differs only in conv_in: 8 input channels
  (noisy latents ⊕ image latents).
* AutoencoderKL — block_out_channels (128, 256, 512, 512),
  layers_per_block 2, latent_channels 4.
* CLIPTextModel (openai/clip-vit-large-patch14) — 12 layers, hidden
  768, intermediate 3072, vocab 49408, 77 positions.

Offline substitute for reading the safetensors headers: the key names
and shapes below are fully determined by those public configs, so a
converter that consumes every key at the right shape will consume the
real checkpoints too.
"""

from typing import Dict, Tuple

Shape = Tuple[int, ...]

BLOCKS = (320, 640, 1280, 1280)
TEMB = 1280
CTX = 768


def _norm(d, name, c):
    d[name + ".weight"] = (c,)
    d[name + ".bias"] = (c,)


def _conv(d, name, out, inp, k=3):
    d[name + ".weight"] = (out, inp, k, k)
    d[name + ".bias"] = (out,)


def _lin(d, name, out, inp, bias=True):
    d[name + ".weight"] = (out, inp)
    if bias:
        d[name + ".bias"] = (out,)


def _resnet(d, p, inp, out, temb=TEMB):
    _norm(d, p + ".norm1", inp)
    _conv(d, p + ".conv1", out, inp)
    _lin(d, p + ".time_emb_proj", out, temb)
    _norm(d, p + ".norm2", out)
    _conv(d, p + ".conv2", out, out)
    if inp != out:
        _conv(d, p + ".conv_shortcut", out, inp, k=1)


def _attn(d, p, c):
    _norm(d, p + ".norm", c)
    _conv(d, p + ".proj_in", c, c, k=1)
    b = p + ".transformer_blocks.0"
    _norm(d, b + ".norm1", c)
    _lin(d, b + ".attn1.to_q", c, c, bias=False)
    _lin(d, b + ".attn1.to_k", c, c, bias=False)
    _lin(d, b + ".attn1.to_v", c, c, bias=False)
    _lin(d, b + ".attn1.to_out.0", c, c)
    _norm(d, b + ".norm2", c)
    _lin(d, b + ".attn2.to_q", c, c, bias=False)
    _lin(d, b + ".attn2.to_k", c, CTX, bias=False)
    _lin(d, b + ".attn2.to_v", c, CTX, bias=False)
    _lin(d, b + ".attn2.to_out.0", c, c)
    _norm(d, b + ".norm3", c)
    _lin(d, b + ".ff.net.0.proj", 8 * c, c)
    _lin(d, b + ".ff.net.2", c, 4 * c)
    _conv(d, p + ".proj_out", c, c, k=1)


def sd15_unet_keys(in_channels: int = 4) -> Dict[str, Shape]:
    d: Dict[str, Shape] = {}
    _conv(d, "conv_in", BLOCKS[0], in_channels)
    _lin(d, "time_embedding.linear_1", TEMB, BLOCKS[0])
    _lin(d, "time_embedding.linear_2", TEMB, TEMB)
    # down path: 3 cross-attn blocks + 1 plain
    for i, out in enumerate(BLOCKS):
        for j in range(2):
            inp = out if j else (BLOCKS[i - 1] if i else BLOCKS[0])
            _resnet(d, f"down_blocks.{i}.resnets.{j}", inp, out)
            if i < 3:
                _attn(d, f"down_blocks.{i}.attentions.{j}", out)
        if i < 3:
            _conv(d, f"down_blocks.{i}.downsamplers.0.conv", out, out)
    _resnet(d, "mid_block.resnets.0", BLOCKS[-1], BLOCKS[-1])
    _attn(d, "mid_block.attentions.0", BLOCKS[-1])
    _resnet(d, "mid_block.resnets.1", BLOCKS[-1], BLOCKS[-1])
    # up path: plain + 3 cross-attn (diffusers skip-channel arithmetic)
    rev = tuple(reversed(BLOCKS))                    # (1280,1280,640,320)
    for i, out in enumerate(rev):
        prev = rev[i - 1] if i else BLOCKS[-1]
        skip_in = rev[min(i + 1, 3)]
        for j in range(3):
            res_in = prev if j == 0 else out
            skip = skip_in if j == 2 else out
            _resnet(d, f"up_blocks.{i}.resnets.{j}", res_in + skip, out)
            if i > 0:
                _attn(d, f"up_blocks.{i}.attentions.{j}", out)
        if i < 3:
            _conv(d, f"up_blocks.{i}.upsamplers.0.conv", out, out)
    _norm(d, "conv_norm_out", BLOCKS[0])
    _conv(d, "conv_out", 4, BLOCKS[0])
    return d


VAE_BLOCKS = (128, 256, 512, 512)


def _vae_resnet(d, p, inp, out):
    _norm(d, p + ".norm1", inp)
    _conv(d, p + ".conv1", out, inp)
    _norm(d, p + ".norm2", out)
    _conv(d, p + ".conv2", out, out)
    if inp != out:
        _conv(d, p + ".conv_shortcut", out, inp, k=1)


def _vae_attn(d, p, c):
    _norm(d, p + ".group_norm", c)
    for q in ("to_q", "to_k", "to_v"):
        _lin(d, f"{p}.{q}", c, c)
    _lin(d, p + ".to_out.0", c, c)


def sd15_vae_keys() -> Dict[str, Shape]:
    d: Dict[str, Shape] = {}
    _conv(d, "encoder.conv_in", VAE_BLOCKS[0], 3)
    for i, out in enumerate(VAE_BLOCKS):
        for j in range(2):
            inp = out if j else (VAE_BLOCKS[i - 1] if i else VAE_BLOCKS[0])
            _vae_resnet(d, f"encoder.down_blocks.{i}.resnets.{j}", inp, out)
        if i < 3:
            _conv(d, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                  out, out)
    c = VAE_BLOCKS[-1]
    _vae_resnet(d, "encoder.mid_block.resnets.0", c, c)
    _vae_attn(d, "encoder.mid_block.attentions.0", c)
    _vae_resnet(d, "encoder.mid_block.resnets.1", c, c)
    _norm(d, "encoder.conv_norm_out", c)
    _conv(d, "encoder.conv_out", 8, c)

    _conv(d, "decoder.conv_in", c, 4)
    _vae_resnet(d, "decoder.mid_block.resnets.0", c, c)
    _vae_attn(d, "decoder.mid_block.attentions.0", c)
    _vae_resnet(d, "decoder.mid_block.resnets.1", c, c)
    rev = tuple(reversed(VAE_BLOCKS))                # (512,512,256,128)
    for i, out in enumerate(rev):
        prev = rev[i - 1] if i else c
        for j in range(3):
            inp = prev if j == 0 else out
            _vae_resnet(d, f"decoder.up_blocks.{i}.resnets.{j}", inp, out)
        if i < 3:
            _conv(d, f"decoder.up_blocks.{i}.upsamplers.0.conv", out, out)
    _norm(d, "decoder.conv_norm_out", VAE_BLOCKS[0])
    _conv(d, "decoder.conv_out", 3, VAE_BLOCKS[0])
    _conv(d, "quant_conv", 8, 8, k=1)
    _conv(d, "post_quant_conv", 4, 4, k=1)
    return d


def sd15_text_keys() -> Dict[str, Shape]:
    d: Dict[str, Shape] = {}
    p = "text_model."
    d[p + "embeddings.token_embedding.weight"] = (49408, 768)
    d[p + "embeddings.position_embedding.weight"] = (77, 768)
    for i in range(12):
        lp = p + f"encoder.layers.{i}."
        _norm(d, lp + "layer_norm1", 768)
        _norm(d, lp + "layer_norm2", 768)
        for q in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _lin(d, lp + "self_attn." + q, 768, 768)
        _lin(d, lp + "mlp.fc1", 3072, 768)
        _lin(d, lp + "mlp.fc2", 768, 3072)
    _norm(d, p + "final_layer_norm", 768)
    return d
