"""Pose eval: OKS matrix math, OKS-mAP perfect/wrong cases, PCK."""

import numpy as np

from visionllm_tpu.eval.eval_pose import (OksMAPEvaluator, oks_matrix, pck,
                                          post_process_pose)
from visionllm_tpu.train.pose_losses import pose_sigmas


def _kpts(xy, vis=1.0, K=17):
    k = np.zeros((K, 3))
    k[:, :2] = xy
    k[:, 2] = vis
    return k


def test_oks_matrix_perfect():
    K = 17
    sig = pose_sigmas(K)
    g = np.stack([_kpts([100, 100], K=K)])
    d = np.stack([_kpts([100, 100], K=K)])
    m = oks_matrix(d, g, np.asarray([500.0]), sig)
    np.testing.assert_allclose(m, 1.0, atol=1e-9)
    d2 = np.stack([_kpts([500, 500], K=K)])
    assert oks_matrix(d2, g, np.asarray([500.0]), sig).max() < 1e-6


def test_oks_map_perfect_and_miss():
    K = 17
    ev = OksMAPEvaluator(K)
    gt = {"keypoints": np.stack([_kpts([50, 60], K=K)]),
          "areas": np.asarray([400.0])}
    det = {"scores": np.asarray([0.9]),
           "keypoints": np.stack([_kpts([50, 60], K=K)])}
    ev.update(det, gt)
    res = ev.summarize()
    assert abs(res["AP"] - 1.0) < 1e-6

    ev2 = OksMAPEvaluator(K)
    det_bad = {"scores": np.asarray([0.9]),
               "keypoints": np.stack([_kpts([500, 500], K=K)])}
    ev2.update(det_bad, gt)
    assert ev2.summarize()["AP"] < 1e-6


def test_pck():
    g = _kpts([10, 10])
    d_close = _kpts([11, 11])
    d_far = _kpts([50, 50])
    box = np.asarray([0, 0, 40, 40])
    assert pck([d_close], [g], [box]) == 1.0
    assert pck([d_far], [g], [box]) == 0.0


def test_post_process_pose():
    G, P, K = 5, 3, 4
    logits = np.full((G, P), -5.0)
    logits[2, 1] = 5.0
    boxes = np.tile([0.5, 0.5, 0.2, 0.2], (G, 1))
    kpts = np.zeros((G, 3 * K))
    kpts[2, :2 * K] = 0.25
    kpts[2, 2 * K:] = 1.0
    out = post_process_pose(logits, boxes, kpts, (100, 200), topk=2)
    assert out["labels"][0] == 1
    np.testing.assert_allclose(out["keypoints"][0, 0],
                               [0.25 * 200, 0.25 * 100, 1.0])
    np.testing.assert_allclose(out["boxes"][0],
                               [0.4 * 200, 0.4 * 100, 0.6 * 200, 0.6 * 100])
