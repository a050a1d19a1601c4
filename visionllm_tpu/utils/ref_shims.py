"""Shims that let the reference's torch modules import WITHOUT their
heavy native dependencies, so parity tests can run the actual reference
forward on CPU as a numerics oracle.

The reference model files import detectron2 / fvcore / timm / mmcv /
mmdet, but only use a handful of small, well-specified utilities from
each (modeling_ov_grounding_dino_mask_dn.py:25-26,56-63). Re-implementing
those shims (standard definitions, written from their public contracts)
lets `import visionllmv2.model.grounding_dino...` succeed with torch-CPU
only. Nothing here touches the compute path being tested — the shims
cover layer *constructors* (Conv2d-with-norm, DropPath, init helpers)
and logging/registry plumbing.

Usage (tests):
    from visionllm_tpu.utils.ref_shims import install_reference_shims
    install_reference_shims()
    sys.path.insert(0, "/root/reference/VisionLLMv2")
    from visionllmv2.model.grounding_dino...
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as nn


def _make_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    # transformers probes importlib.util.find_spec on arbitrary packages;
    # a None __spec__ makes that raise, so give the stub a real-looking one
    import importlib.machinery
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


class Conv2d(nn.Conv2d):
    """detectron2.layers.Conv2d: nn.Conv2d + optional norm/activation
    applied after the convolution."""

    def __init__(self, *args, **kwargs):
        norm = kwargs.pop("norm", None)
        activation = kwargs.pop("activation", None)
        super().__init__(*args, **kwargs)
        self.norm = norm
        self.activation = activation

    def forward(self, x):
        x = super().forward(x)
        if self.norm is not None:
            x = self.norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class ShapeSpec:
    def __init__(self, channels=None, height=None, width=None,
                 stride=None):
        self.channels = channels
        self.height = height
        self.width = width
        self.stride = stride


def get_norm(norm, out_channels):
    if norm is None or norm == "":
        return None
    if isinstance(norm, str):
        return {
            "BN": lambda c: nn.BatchNorm2d(c),
            "GN": lambda c: nn.GroupNorm(32, c),
            "LN": lambda c: nn.GroupNorm(1, c),
        }[norm](out_channels)
    return norm(out_channels)


def c2_xavier_fill(module: nn.Module) -> None:
    nn.init.kaiming_uniform_(module.weight, a=1)
    if module.bias is not None:
        nn.init.constant_(module.bias, 0)


def c2_msra_fill(module: nn.Module) -> None:
    nn.init.kaiming_normal_(module.weight, mode="fan_out",
                            nonlinearity="relu")
    if module.bias is not None:
        nn.init.constant_(module.bias, 0)


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


class DropPath(nn.Module):
    """timm stochastic depth; identity in eval mode."""

    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = float(drop_prob or 0.0)

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        return x * mask / keep


def to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


def _constant_init(module, val, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.constant_(module.weight, val)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def _trunc_normal_init(module, mean=0, std=1, a=-2, b=2, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        trunc_normal_(module.weight, mean, std, a, b)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


class _Registry:
    def __init__(self):
        self._map = {}

    def register_module(self, *a, **k):
        def deco(cls):
            self._map[cls.__name__] = cls
            return cls
        if a and callable(a[0]):
            return deco(a[0])
        return deco

    def get(self, name):
        return self._map.get(name)


def install_reference_shims() -> None:
    """Register stub modules for detectron2 / fvcore / timm / mmcv /
    mmdet in sys.modules (no-ops if real packages are present)."""
    if "detectron2" not in sys.modules:
        d2 = _make_module("detectron2")
        layers = _make_module("detectron2.layers")
        layers.Conv2d = Conv2d
        layers.ShapeSpec = ShapeSpec
        layers.get_norm = get_norm
        d2.layers = layers

    if "fvcore" not in sys.modules:
        fv = _make_module("fvcore")
        fnn = _make_module("fvcore.nn")
        wi = _make_module("fvcore.nn.weight_init")
        wi.c2_xavier_fill = c2_xavier_fill
        wi.c2_msra_fill = c2_msra_fill
        fnn.weight_init = wi
        fv.nn = fnn

    if "timm" not in sys.modules:
        timm = _make_module("timm")
        models = _make_module("timm.models")
        layers = _make_module("timm.models.layers")
        layers.trunc_normal_ = trunc_normal_
        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        models.layers = layers
        timm.models = models

    if "mmcv" not in sys.modules:
        mmcv = _make_module("mmcv")
        runner = _make_module("mmcv.runner")
        runner._load_checkpoint = lambda *a, **k: {}
        cnn = _make_module("mmcv.cnn")
        cnn.constant_init = _constant_init
        cnn.trunc_normal_init = _trunc_normal_init
        mmcv.runner = runner
        mmcv.cnn = cnn

    # modern transformers removed deformable_detr.load_custom (the CUDA
    # kernel JIT loader the reference imports at :72); on CPU the model
    # uses the pure-torch fallback, so a raising stub is faithful
    try:
        import transformers.models.deformable_detr.load_custom  # noqa
    except ImportError:
        name = "transformers.models.deformable_detr.load_custom"
        mod = _make_module(name)

        def load_cuda_kernels():
            raise ImportError("CUDA kernels unavailable (CPU shim)")

        mod.load_cuda_kernels = load_cuda_kernels
        import transformers.models.deformable_detr as _dd
        _dd.load_custom = mod

    if "torchvision" not in sys.modules:
        tv = _make_module("torchvision")
        tv.__version__ = "0.20.0"    # parsed by misc.py version probes
        ops = _make_module("torchvision.ops")
        boxes = _make_module("torchvision.ops.boxes")

        def nms(*a, **k):
            raise NotImplementedError("torchvision.nms shim (CPU parity "
                                      "tests never reach the NMS path)")

        def box_area(b):
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

        boxes.nms = nms
        boxes.box_area = box_area
        ops.boxes = boxes
        models = _make_module("torchvision.models")
        mutils = _make_module("torchvision.models._utils")

        class IntermediateLayerGetter:      # resnet-only path, unused
            def __init__(self, *a, **k):
                raise NotImplementedError("resnet backbone shim")

        mutils.IntermediateLayerGetter = IntermediateLayerGetter
        models._utils = mutils
        tv.ops = ops
        tv.models = models

    if "MultiScaleDeformableAttention" not in sys.modules:
        # The reference's compiled CUDA extension
        # (unipose/ops/functions/ms_deform_attn_func.py:18). Forward
        # semantics re-composed with torch.grid_sample (bilinear, zeros
        # padding, align_corners=False) — the same independent oracle
        # our op tests use (tests/test_ms_deform_attn.py:torch_oracle).
        msda = _make_module("MultiScaleDeformableAttention")

        def ms_deform_attn_forward(value, spatial_shapes,
                                   level_start_index, sampling_locations,
                                   attention_weights, im2col_step):
            import torch.nn.functional as F
            B, S, H, D = value.shape
            _, Q, _, L, P, _ = sampling_locations.shape
            shapes = [(int(h), int(w)) for h, w in spatial_shapes]
            values = value.split([h * w for h, w in shapes], dim=1)
            grids = 2 * sampling_locations - 1
            samples = []
            for lvl, (h, w) in enumerate(shapes):
                v = (values[lvl].flatten(2).transpose(1, 2)
                     .reshape(B * H, D, h, w))
                g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).flatten(0, 1)
                samples.append(F.grid_sample(
                    v, g, mode="bilinear", padding_mode="zeros",
                    align_corners=False))               # [B*H, D, Q, P]
            attw = (attention_weights.transpose(1, 2)
                    .reshape(B * H, 1, Q, L * P))
            out = (torch.stack(samples, dim=-2).flatten(-2) * attw).sum(-1)
            return out.view(B, H * D, Q).transpose(1, 2).contiguous()

        msda.ms_deform_attn_forward = ms_deform_attn_forward

        def ms_deform_attn_backward(*a, **k):
            raise NotImplementedError("forward-only CPU shim")

        msda.ms_deform_attn_backward = ms_deform_attn_backward

    if "diffusers" not in sys.modules:
        # names imported at module top by modeling_sd.py:8 /
        # modeling_instruct_pix2pix.py:8; only instantiated when
        # use_gen/use_edit is on, which the parity fixtures keep off
        df = _make_module("diffusers")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise NotImplementedError("diffusers shim")

            @classmethod
            def from_pretrained(cls, *a, **k):
                raise NotImplementedError("diffusers shim")

        for name in ("StableDiffusionPipeline", "AutoencoderKL",
                     "UNet2DConditionModel", "DDPMScheduler",
                     "StableDiffusionInstructPix2PixPipeline"):
            setattr(df, name, type(name, (_Unavailable,), {}))

    if "mmdet" not in sys.modules:
        mmdet = _make_module("mmdet")
        utils = _make_module("mmdet.utils")
        import logging
        utils.get_root_logger = lambda *a, **k: logging.getLogger(
            "mmdet-shim")
        models = _make_module("mmdet.models")
        builder = _make_module("mmdet.models.builder")
        builder.BACKBONES = _Registry()
        models.builder = builder
        mmdet.utils = utils
        mmdet.models = models
