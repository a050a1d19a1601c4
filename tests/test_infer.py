"""Predictor (single-image perception inference) smoke + invariants.

The Predictor must produce the same device results as the eval runners
on the same pixels/prompts — it is the demo-style front door over the
identical infer fns. Checked: det top-k agrees with the dataset-driven
eval path on a synthetic image, boxes come back in original pixels,
threshold filters monotonically, grd returns one box, pose returns
[N, K, 3] keypoints inside the image.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.mock_tokenizer import MockTokenizer
from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.infer import Predictor
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.models.visionllm import SpecialTokenIds


from visionllm_tpu.utils.checkpoint import merge_param_trees as _merge


@pytest.fixture(scope="module")
def pred():
    cfg = tiny_test_config(use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    p = Predictor(cfg, None, tok, dtype=jnp.float32,
                  test_scale=(48, 64), buckets=((64, 64),))
    p.model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                                 tool_dtype=jnp.float32)
    img = np.random.RandomState(0).randint(0, 255, (48, 64, 3), np.uint8)
    arr = p._prepare(img, "<image>\nq", "a")
    det_p = p.model.init(
        jax.random.PRNGKey(0), arr["input_ids"], arr["image"],
        arr["image_aug"], p.tid, pixel_mask=arr["pixel_mask"],
        method=VisionLLMWithTools.infer_det)["params"]
    pose_p = p.model.init(
        jax.random.PRNGKey(0), arr["input_ids"], arr["image"],
        arr["image_aug"], p.tid, 1, pixel_mask=arr["pixel_mask"],
        method=VisionLLMWithTools.infer_pose)["params"]
    p.params = _merge(jax.device_get(det_p), jax.device_get(pose_p))
    return p, img


def test_detect_shapes_and_pixels(pred):
    p, img = pred
    out = p.detect(img, ["cat", "dog"], threshold=0.0, topk=10)
    n = len(out["scores"])
    assert n == 10
    assert out["boxes"].shape == (n, 4)
    assert set(np.unique(out["labels"])) <= {0, 1}
    assert all(c in ("cat", "dog") for c in out["class_names"])
    # boxes in original-image pixel range (norm coords × (w=64, h=48))
    assert np.all(out["boxes"][:, [0, 2]] <= 64 + 1e-3)
    assert np.all(out["boxes"][:, [1, 3]] <= 48 + 1e-3)
    assert np.isfinite(out["scores"]).all()


def test_detect_threshold_monotonic(pred):
    p, img = pred
    lo = p.detect(img, ["cat", "dog"], threshold=0.0, topk=10)
    mid = float(np.median(lo["scores"]))
    hi = p.detect(img, ["cat", "dog"], threshold=mid, topk=10)
    assert len(hi["scores"]) <= len(lo["scores"])
    assert np.all(hi["scores"] >= mid)


def test_detect_masks(pred):
    p, img = pred
    out = p.detect(img, ["cat"], threshold=0.0, topk=4, with_mask=True)
    assert len(out["masks"]) == len(out["scores"])
    assert out["masks"][0].shape == img.shape[:2]
    assert out["masks"][0].dtype == bool


def test_detect_matches_eval_runner(pred):
    """Same pixels + same prompt ⇒ Predictor det == eval-path det."""
    from visionllm_tpu.data import templates as T
    from visionllm_tpu.eval.eval_det import make_det_infer_fn

    p, img = pred
    names = ["cat", "dog"]
    q = "<image>\n" + T.DET_QUESTIONS[0].replace(
        "<class>", ", ".join(names))
    blk = T.det_answer_tokens(p.num_embs)
    a = T.DET_YES[0].replace("<class>", (blk + ", ").join(names) + blk)
    arr = p._prepare(img, q, a)
    ref = jax.device_get(make_det_infer_fn(p.model, p.tid, 2, topk=10)(
        p.params, arr["input_ids"], arr["image"], arr["image_aug"],
        arr["pixel_mask"]))
    out = p.detect(img, names, threshold=0.0, topk=10)
    np.testing.assert_allclose(out["scores"],
                               np.asarray(ref["scores"][0]), rtol=1e-5)


def test_ground(pred):
    p, img = pred
    out = p.ground(img, "the red thing", with_mask=True)
    assert out["box"].shape == (4,)
    assert 0.0 <= out["score"] <= 1.0
    assert out["mask"].shape == img.shape[:2]


def test_pose(pred):
    p, img = pred
    names = ["nose", "left eye", "right eye", "left ear"]  # K=4 (tiny)
    out = p.pose(img, keypoint_names=names, threshold=0.0, topk=5)
    n = len(out["scores"])
    assert n == 5
    assert out["keypoints"].shape == (n, 4, 3)
    assert out["boxes"].shape == (n, 4)
    assert np.isfinite(out["keypoints"]).all()
    # keypoint xy normalized coords scaled to the original image
    assert np.all(out["keypoints"][:, :, 0] <= 64 + 1e-3)
    assert np.all(out["keypoints"][:, :, 1] <= 48 + 1e-3)


def test_bad_image_rejected(pred):
    p, _ = pred
    with pytest.raises(ValueError, match="H, W, 3"):
        p.detect(np.zeros((4, 4), np.uint8), ["x"])
