"""[GEN]/[EDIT] heads: mapper parity vs torch nn.Transformer, schedule
parity vs diffusers' formula, and end-to-end train-loss/generate shapes
on the tiny geometry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import IP2PConfig, SDConfig
from visionllm_tpu.models.stable_diffusion import (
    DiffusionSchedule, InstructPix2PixWithLLMEmb, LLM2SDMapper,
    StableDiffusionWithLLMEmb)
from visionllm_tpu.models.stable_diffusion.scheduler import add_noise

torch = pytest.importorskip("torch")


def test_mapper_parity_vs_torch_transformer():
    """LLM2SDMapper must reproduce emb_proj + nn.Transformer(norm_first)
    from modeling_sd.py:70-84."""
    import torch.nn as tnn

    D, llm_dim, nq = 32, 48, 7
    torch.manual_seed(0)
    torch.set_num_threads(1)
    emb_proj = tnn.Sequential(tnn.Linear(llm_dim, D), tnn.GELU(),
                              tnn.Linear(D, D))
    queries = torch.randn(1, nq, D)
    tr = tnn.Transformer(batch_first=True, norm_first=True, d_model=D,
                         num_encoder_layers=1, num_decoder_layers=1,
                         dim_feedforward=D * 4, dropout=0.0).eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, llm_dim)).astype(np.float32)
    with torch.no_grad():
        want = tr(src=emb_proj(torch.from_numpy(x)),
                  tgt=queries.repeat(2, 1, 1)).numpy()

    # convert weights
    def t(w):
        return np.ascontiguousarray(w.detach().numpy().T)

    def mha(m):
        D_ = m.embed_dim
        w = m.in_proj_weight.detach().numpy()
        b = m.in_proj_bias.detach().numpy()
        return {
            "q_proj": {"kernel": np.ascontiguousarray(w[:D_].T),
                       "bias": b[:D_]},
            "k_proj": {"kernel": np.ascontiguousarray(w[D_:2 * D_].T),
                       "bias": b[D_:2 * D_]},
            "v_proj": {"kernel": np.ascontiguousarray(w[2 * D_:].T),
                       "bias": b[2 * D_:]},
            "out_proj": {"kernel": t(m.out_proj.weight),
                         "bias": m.out_proj.bias.detach().numpy()},
        }

    def ln(m):
        return {"scale": m.weight.detach().numpy(),
                "bias": m.bias.detach().numpy()}

    def lin(m):
        return {"kernel": t(m.weight), "bias": m.bias.detach().numpy()}

    enc = tr.encoder.layers[0]
    dec = tr.decoder.layers[0]
    params = {
        "emb_proj_0": lin(emb_proj[0]),
        "emb_proj_2": lin(emb_proj[2]),
        "mapper_queries": queries.detach().numpy(),
        "encoder_0": {
            "norm1": ln(enc.norm1), "self_attn": mha(enc.self_attn),
            "norm2": ln(enc.norm2), "linear1": lin(enc.linear1),
            "linear2": lin(enc.linear2)},
        "encoder_norm": ln(tr.encoder.norm),
        "decoder_0": {
            "norm1": ln(dec.norm1), "self_attn": mha(dec.self_attn),
            "norm_mem": ln(dec.norm2), "cross_attn": mha(dec.multihead_attn),
            "norm2": ln(dec.norm3), "linear1": lin(dec.linear1),
            "linear2": lin(dec.linear2)},
        "decoder_norm": ln(tr.decoder.norm),
    }
    model = LLM2SDMapper(llm_dim, D, nq, dtype=jnp.float32)
    got = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_add_noise_matches_formula():
    sched = DiffusionSchedule()
    ac = sched.alphas_cumprod()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    n = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    t = np.asarray([0, 999])
    got = add_noise(sched, jnp.asarray(x), jnp.asarray(n), jnp.asarray(t))
    want = (np.sqrt(ac[t])[:, None, None, None] * x
            + np.sqrt(1 - ac[t])[:, None, None, None] * n)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


CFG_SD = SDConfig(llm_hidden_size=48, sd_hidden_size=32, num_queries=7,
                  num_embs_gen=8, sample_size=16, cross_attention_dim=32)
CFG_IP2P = IP2PConfig(llm_hidden_size=48, sd_hidden_size=32, num_queries=7,
                      num_embs_gen=8, sample_size=16, cross_attention_dim=32)


def test_sd_head_train_and_generate():
    model = StableDiffusionWithLLMEmb(CFG_SD, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    embs = jnp.asarray(rng.standard_normal((2, 8, 48), dtype=np.float32))
    imgs = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), embs, imgs,
                        jax.random.PRNGKey(1))["params"]
    out = model.apply({"params": params}, embs, imgs, jax.random.PRNGKey(2))
    assert np.isfinite(float(out["loss"]))

    gen = model.apply({"params": params}, embs, jax.random.PRNGKey(3),
                      num_inference_steps=3,
                      method=StableDiffusionWithLLMEmb.generate)
    assert gen.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(gen)).all()


def test_ip2p_head_train_and_generate():
    model = InstructPix2PixWithLLMEmb(CFG_IP2P, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    embs = jnp.asarray(rng.standard_normal((2, 8, 48), dtype=np.float32))
    src = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    dst = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), embs, src, dst,
                        jax.random.PRNGKey(1))["params"]
    out = model.apply({"params": params}, embs, src, dst,
                      jax.random.PRNGKey(2))
    assert np.isfinite(float(out["loss"]))

    gen = model.apply({"params": params}, embs, src, jax.random.PRNGKey(3),
                      num_inference_steps=2,
                      method=InstructPix2PixWithLLMEmb.generate)
    assert gen.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(gen)).all()


def test_ddim_final_step_recovers_x0():
    """Regression (advisor, round 1): the last DDIM step has prev_t < 0
    and must read the appended final-alpha 1.0 slot — the raw negative
    index read alphas_cumprod[T-step] ~ 0.006 and returned noise. With
    an oracle eps predictor, the loop must reconstruct x0 exactly."""
    from visionllm_tpu.models.stable_diffusion.scheduler import (
        DiffusionSchedule, ddim_sample_loop)
    sched = DiffusionSchedule()
    ac = sched.alphas_cumprod()
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    steps = 50
    t_start = (steps - 1) * (sched.num_train_timesteps // steps)  # 980
    x_t = (np.sqrt(ac[t_start]) * x0
           + np.sqrt(1 - ac[t_start]) * eps).astype(np.float32)

    out = ddim_sample_loop(
        lambda lat, t: jnp.asarray(eps), sched, jnp.asarray(x_t),
        num_inference_steps=steps)
    np.testing.assert_allclose(np.asarray(out), x0, rtol=2e-3, atol=2e-3)
