"""Checkpointing: orbax round trip + npz round trip + converter parity
for the VL bridge and region-encoder stems vs torch modules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.utils.checkpoint import (latest_step, load_params_npz,
                                            restore_checkpoint,
                                            save_checkpoint,
                                            save_params_npz)

torch = pytest.importorskip("torch")


def _tree():
    return {"a": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
            "b": jnp.ones((4,), jnp.float32)}


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    d = str(tmp_path / "ckpt")
    state = _tree()
    save_checkpoint(d, 3, state)
    save_checkpoint(d, 7, jax.tree.map(lambda x: x * 2, state))
    assert latest_step(d) == 7
    restored = restore_checkpoint(d, jax.tree.map(np.zeros_like, state))
    np.testing.assert_array_equal(np.asarray(restored["a"]["kernel"]),
                                  np.asarray(state["a"]["kernel"]) * 2)


def test_npz_roundtrip(tmp_path):
    p = str(tmp_path / "p.npz")
    state = _tree()
    save_params_npz(p, state)
    back = load_params_npz(p)
    np.testing.assert_array_equal(back["a"]["kernel"],
                                  np.asarray(state["a"]["kernel"]))
    np.testing.assert_array_equal(back["b"], np.asarray(state["b"]))


def test_vl_bridge_converter_parity():
    """mlp2x_gelu bridge built as the reference does
    (modeling_visionllmv2.py:159-190: Sequential(Linear, GELU, Linear))."""
    import torch.nn as tnn

    from visionllm_tpu.models.vl_bridge import VLBridge
    from visionllm_tpu.utils.torch_convert import (convert_vl_bridge,
                                                   torch_state_dict_to_numpy)

    torch.manual_seed(0)
    bridge = tnn.Sequential(tnn.Linear(16, 24), tnn.GELU(),
                            tnn.Linear(24, 24))
    sd = {f"vl_bridge.{k}": v for k, v in
          torch_state_dict_to_numpy(bridge).items()}
    params = convert_vl_bridge(sd)
    model = VLBridge("mlp2x_gelu", 24, dtype=jnp.float32)
    x = np.random.default_rng(0).standard_normal((2, 5, 16)).astype(
        np.float32)
    with torch.no_grad():
        want = bridge(torch.from_numpy(x)).numpy()
    got = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_region_encoder_stem_converter_parity():
    """Conv stem parity vs the reference's mask_embedding Sequential
    (region_encoder.py:77-85)."""
    import torch.nn as tnn

    from visionllm_tpu.models.region_encoder import LayerNorm2d

    class TorchLN2d(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.weight = tnn.Parameter(torch.ones(c))
            self.bias = tnn.Parameter(torch.zeros(c))
            self.eps = 1e-6

        def forward(self, x):
            u = x.mean(1, keepdim=True)
            s = (x - u).pow(2).mean(1, keepdim=True)
            x = (x - u) / torch.sqrt(s + self.eps)
            return self.weight[:, None, None] * x + self.bias[:, None, None]

    torch.manual_seed(0)
    hd, ed = 8, 12
    k = 7
    stem = tnn.Sequential(
        tnn.Conv2d(4, hd // 4, kernel_size=k, stride=k),
        TorchLN2d(hd // 4), tnn.GELU(),
        tnn.Conv2d(hd // 4, hd, kernel_size=2, stride=2),
        TorchLN2d(hd), tnn.GELU(),
        tnn.Conv2d(hd, ed, kernel_size=1))
    with torch.no_grad():
        for m in stem:
            if isinstance(m, (tnn.Conv2d, TorchLN2d)):
                for p in m.parameters():
                    p.copy_(torch.randn_like(p) * 0.1)

    from visionllm_tpu.utils.torch_convert import (convert_region_encoder,
                                                   torch_state_dict_to_numpy)
    sd = {f"region_encoder.mask_embedding.{n}": v for n, v in
          torch_state_dict_to_numpy(stem).items()}
    sd["region_encoder.up_dim.weight"] = np.zeros((4, ed), np.float32)
    sd["region_encoder.up_dim.bias"] = np.zeros((4,), np.float32)
    params = convert_region_encoder(sd)

    x = np.random.default_rng(0).standard_normal((1, 28, 28, 4)).astype(
        np.float32)
    with torch.no_grad():
        want = stem(torch.from_numpy(x).permute(0, 3, 1, 2)
                    ).permute(0, 2, 3, 1).numpy()

    # run the stem ops directly with converted params
    import flax.linen as nn
    h = nn.Conv(hd // 4, (k, k), strides=(k, k), dtype=jnp.float32).apply(
        {"params": params["stem_conv0"]}, jnp.asarray(x))
    h = LayerNorm2d().apply({"params": params["stem_norm0"]}, h)
    h = nn.gelu(h, approximate=False)
    h = nn.Conv(hd, (2, 2), strides=(2, 2), dtype=jnp.float32).apply(
        {"params": params["stem_conv1"]}, h)
    h = LayerNorm2d().apply({"params": params["stem_norm1"]}, h)
    h = nn.gelu(h, approximate=False)
    h = nn.Conv(ed, (1, 1), dtype=jnp.float32).apply(
        {"params": params["stem_conv2"]}, h)
    np.testing.assert_allclose(np.asarray(h), want, rtol=1e-4, atol=1e-5)
