"""CDN query construction invariants + dn loss behavior."""

import numpy as np

import jax
import jax.numpy as jnp

from visionllm_tpu.config import GDinoConfig
from visionllm_tpu.train.cdn import build_cdn_queries, cdn_groups, dn_loss


def _targets(B=2, N=4):
    rng = np.random.default_rng(0)
    boxes = np.stack([
        np.stack([np.full(4, 0.5), np.full(4, 0.5),
                  rng.uniform(0.1, 0.3, 4), rng.uniform(0.1, 0.3, 4)],
                 axis=-1) for _ in range(B)])
    return {
        "labels": jnp.asarray(rng.integers(0, 3, (B, N)), jnp.int32),
        "boxes": jnp.asarray(boxes, jnp.float32),
        "valid": jnp.asarray([[True, True, False, False]] * B),
    }


def test_build_cdn_shapes_and_mask():
    B, N, P, C, Q = 2, 4, 5, 16, 10
    tq = jnp.asarray(np.random.default_rng(1).standard_normal((B, P, C)),
                     jnp.float32)
    tq_mask = jnp.ones((B, P), bool)
    targets = _targets(B, N)
    dn, dn_tgt = build_cdn_queries(
        jax.random.PRNGKey(0), targets, tq, tq_mask, dn_number=8,
        num_queries=Q)
    G = cdn_groups(8, N)
    pad = G * 2 * N
    assert dn["query_label"].shape == (B, pad, C)
    assert dn["query_bbox"].shape == (B, pad, 4)
    assert dn["attn_mask"].shape == (B, pad + Q, pad + Q)
    m = np.asarray(dn["attn_mask"][0])
    # matching queries cannot see dn block
    assert m[pad:, :pad].all()
    # matching queries see each other... except blocked invalid cols
    assert not m[pad:, pad:].any()
    if G > 1:
        # first group cannot see second group
        assert m[0, 2 * N].item() is True or m[0, 2 * N] == True  # noqa
    # positives occupy the first N slots of each group
    assert bool(dn_tgt["is_positive"][0, 0]) is True
    assert bool(dn_tgt["is_positive"][0, N]) is False
    # noisy boxes stay in [0, 1] after sigmoid
    assert np.all(np.asarray(jax.nn.sigmoid(dn["query_bbox"])) >= 0)
    assert np.all(np.asarray(jax.nn.sigmoid(dn["query_bbox"])) <= 1)


def test_dn_loss_prefers_correct_predictions():
    cfg = GDinoConfig(d_model=16)
    B, N, P = 1, 2, 4
    G = cdn_groups(cfg.dn_number, N)
    pad = G * 2 * N
    T = 6
    targets = {
        "labels": jnp.asarray([[1, 2]], jnp.int32),
        "boxes": jnp.asarray([[[0.5, 0.5, 0.2, 0.2],
                               [0.3, 0.3, 0.1, 0.1]]], jnp.float32),
        "valid": jnp.asarray([[True, True]]),
    }
    tq = jnp.zeros((B, P, 16))
    dn, dn_tgt = build_cdn_queries(jax.random.PRNGKey(0), targets, tq,
                                   jnp.ones((B, P), bool),
                                   dn_number=cfg.dn_number, num_queries=5)

    # perfect predictions: logits +10 at own label for positives, -10
    # elsewhere; boxes equal to gt
    lab = np.asarray(dn_tgt["labels"][0])
    pos = np.asarray(dn_tgt["is_positive"][0])
    good_logits = np.full((B, pad, T), -10.0, np.float32)
    for i in range(pad):
        if pos[i]:
            good_logits[0, i, lab[i]] = 10.0
    good_boxes = np.asarray(dn_tgt["boxes"])
    good = dn_loss(jnp.asarray(good_logits), jnp.asarray(good_boxes),
                   dn_tgt, cfg=cfg)
    bad = dn_loss(jnp.zeros((B, pad, T)),
                  jnp.full((B, pad, 4), 0.9), dn_tgt, cfg=cfg)
    assert sum(good.values()) < sum(bad.values())
    assert float(good["dn_loss_bbox"]) < 1e-6


def test_label_noise_samples_only_valid_slots():
    """Jittered dn queries must embed valid text-query slots only
    (advisor finding: randint over all P slots could embed padding
    rows). Valid slots are a compacted prefix of length n_valid; the
    padding rows carry a sentinel that must never appear in the dn
    query embeddings."""
    B, N, P, C, Q = 2, 4, 8, 16, 10
    n_valid = 3
    tq = np.random.default_rng(1).standard_normal((B, P, C))
    tq[:, n_valid:, :] = 1e6                 # sentinel padding rows
    tq = jnp.asarray(tq, jnp.float32)
    tq_mask = jnp.asarray(
        [[True] * n_valid + [False] * (P - n_valid)] * B)
    targets = _targets(B, N)
    # force every label to flip so all replacement draws are exercised
    dn, dn_targets = build_cdn_queries(
        jax.random.PRNGKey(0), targets, tq, tq_mask,
        dn_number=8, label_noise_ratio=2.0, num_queries=Q)
    q = np.abs(np.asarray(dn["query_label"]))
    assert q.max() < 1e5, q.max()
