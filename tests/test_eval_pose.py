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


def test_evaluate_pose_smoke(tmp_path):
    """End-to-end pose eval on a synthetic keypoints dataset with the
    tiny model: finite OKS mAP comes out."""
    import json
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from tests.mock_tokenizer import MockTokenizer
    from visionllm_tpu.config import tiny_test_config
    from visionllm_tpu.data.pose_dataset import CocoPoseDataset
    from visionllm_tpu.eval.eval_pose import evaluate_pose
    from visionllm_tpu.models.composite import VisionLLMWithTools
    from visionllm_tpu.models.visionllm import SpecialTokenIds

    from visionllm_tpu.config import tiny_test_config as _tt
    d = tmp_path
    imgs, anns = [], []
    K = _tt().unipose.num_body_points
    for i in range(2):
        name = f"img{i}.jpg"
        Image.new("RGB", (64, 48), (100, 100, 50)).save(d / name)
        imgs.append({"id": i, "file_name": name, "width": 64, "height": 48})
        kp = []
        for k in range(K):
            kp += [10 + k, 12 + (k % 5), 2]
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [5, 5, 30, 30], "area": 900, "iscrowd": 0,
                     "keypoints": kp, "num_keypoints": K})
    with open(d / "ann.json", "w") as f:
        json.dump({"images": imgs, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)

    cfg = tiny_test_config()
    tid = SpecialTokenIds.synthetic()
    tok = MockTokenizer()
    ds = CocoPoseDataset(str(d / "ann.json"), str(d), tok, test_mode=True,
                         num_body_points=cfg.unipose.num_body_points,
                         image_size=cfg.vis_encoder.image_size,
                         test_scale=(48, 64), buckets=((64, 64),),
                         keypoint_names=[f"kp{j}" for j in range(
                             cfg.unipose.num_body_points)])
    model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    s = ds[0]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(s["input_ids"])[None],
        jnp.asarray(s["image"])[None],
        jnp.asarray(s["image_aug"])[None], tid, 1,
        method=VisionLLMWithTools.infer_pose)["params"]
    # batch_size=2 with limit=1 exercises the padded-tail batch path
    res = evaluate_pose(model, params, ds, tid, limit=1, topk=3,
                        batch_size=2)
    assert "AP" in res
