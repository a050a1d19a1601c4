"""CocoMAPEvaluator: hand-checkable mAP cases + postprocess topk."""

import numpy as np

import jax.numpy as jnp

from visionllm_tpu.eval.coco_eval import CocoMAPEvaluator, box_iou_xyxy
from visionllm_tpu.eval.postprocess import post_process_det


def _det(scores, labels, boxes):
    return {"scores": np.asarray(scores, np.float32),
            "labels": np.asarray(labels),
            "boxes": np.asarray(boxes, np.float32)}


def _gt(labels, boxes):
    return {"labels": np.asarray(labels),
            "boxes": np.asarray(boxes, np.float32)}


def test_perfect_predictions():
    ev = CocoMAPEvaluator(num_classes=2)
    boxes = [[0, 0, 40, 40], [50, 50, 90, 100]]
    ev.update(_det([0.9, 0.8], [0, 1], boxes), _gt([0, 1], boxes))
    res = ev.summarize()
    assert abs(res["mAP"] - 1.0) < 1e-6
    assert abs(res["mAP_50"] - 1.0) < 1e-6


def test_all_wrong():
    ev = CocoMAPEvaluator(num_classes=1)
    ev.update(_det([0.9], [0], [[0, 0, 10, 10]]),
              _gt([0], [[50, 50, 90, 90]]))
    res = ev.summarize()
    assert res["mAP"] < 1e-6


def test_half_recall():
    # one perfect detection, one missed gt → AP = 0.5 at every IoU thr
    ev = CocoMAPEvaluator(num_classes=1)
    ev.update(_det([0.9], [0], [[0, 0, 40, 40]]),
              _gt([0, 0], [[0, 0, 40, 40], [60, 60, 90, 90]]))
    res = ev.summarize()
    # 101-pt interpolation: precision 1 up to recall 0.5 → AP ≈ 0.5
    assert abs(res["mAP"] - 0.5) < 0.02


def test_false_positive_penalty():
    # perfect det + one high-score FP above it → precision at recall 1.0
    # is 0.5 for first match... AP < 1
    ev = CocoMAPEvaluator(num_classes=1)
    ev.update(
        _det([0.95, 0.9], [0, 0], [[100, 100, 140, 140], [0, 0, 40, 40]]),
        _gt([0], [[0, 0, 40, 40]]))
    res = ev.summarize()
    assert 0.4 < res["mAP"] < 0.6


def test_iou_localization_threshold():
    # IoU ≈ 0.6 box: counts at thr .5/.55/.6 only → mAP ≈ 3/10
    gt_box = [0, 0, 100, 100]
    det_box = [0, 0, 100, 60.5]          # IoU = 60.5%
    ev = CocoMAPEvaluator(num_classes=1)
    ev.update(_det([0.9], [0], [det_box]), _gt([0], [gt_box]))
    res = ev.summarize()
    assert abs(res["mAP"] - 0.3) < 0.02
    assert abs(res["mAP_50"] - 1.0) < 1e-6


def test_crowd_gt_not_counted():
    ev = CocoMAPEvaluator(num_classes=1)
    gt = {"labels": np.asarray([0, 0]),
          "boxes": np.asarray([[0, 0, 40, 40], [60, 60, 90, 90]],
                              np.float32),
          "iscrowd": np.asarray([0, 1])}
    ev.update(_det([0.9], [0], [[0, 0, 40, 40]]), gt)
    res = ev.summarize()
    # crowd gt is ignored → full recall on the single real gt
    assert abs(res["mAP"] - 1.0) < 1e-6


def test_box_iou_crowd():
    d = np.asarray([[0, 0, 10, 10]], np.float32)
    g = np.asarray([[0, 0, 100, 100]], np.float32)
    assert abs(box_iou_xyxy(d, g)[0, 0] - 0.01) < 1e-6
    assert abs(box_iou_xyxy(d, g, [1])[0, 0] - 1.0) < 1e-6


def test_post_process_det_topk():
    B, Q, K = 1, 5, 3
    logits = jnp.full((B, Q, K), -10.0)
    logits = logits.at[0, 2, 1].set(5.0)
    logits = logits.at[0, 4, 0].set(3.0)
    boxes = jnp.zeros((B, Q, 4)).at[0, 2].set(
        jnp.asarray([0.5, 0.5, 0.2, 0.2]))
    out = post_process_det(logits, boxes, num_classes=K, topk=4)
    assert int(out["labels"][0, 0]) == 1
    assert int(out["query_idx"][0, 0]) == 2
    assert int(out["labels"][0, 1]) == 0
    np.testing.assert_allclose(
        np.asarray(out["boxes"][0, 0]), [0.4, 0.4, 0.6, 0.6], atol=1e-6)
