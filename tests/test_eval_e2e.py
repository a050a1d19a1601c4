"""End-to-end det evaluation smoke: synthetic COCO → tiny composite
model → post-processing → mAP numbers come out finite."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.mock_tokenizer import MockTokenizer
from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.data.det_dataset import CocoDetDataset
from visionllm_tpu.eval.eval_det import evaluate_det
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.models.visionllm import SpecialTokenIds


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("coco_eval")
    from PIL import Image
    imgs, anns = [], []
    for i in range(2):
        name = f"img{i}.jpg"
        Image.new("RGB", (64, 48), (120, 100, 50)).save(d / name)
        imgs.append({"id": i, "file_name": name, "width": 64, "height": 48})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [5, 5, 20, 15], "area": 300, "iscrowd": 0})
    with open(d / "ann.json", "w") as f:
        json.dump({"images": imgs, "annotations": anns,
                   "categories": [{"id": 1, "name": "cat"},
                                  {"id": 2, "name": "dog"}]}, f)
    return d


def test_evaluate_det_smoke(coco_dir):
    cfg = tiny_test_config()
    tok = MockTokenizer()
    tid = SpecialTokenIds.synthetic()
    ds = CocoDetDataset(
        str(coco_dir / "ann.json"), str(coco_dir), tok, test_mode=True,
        image_size=cfg.vis_encoder.image_size,
        test_scale=(48, 64), buckets=((64, 64),))

    model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                               tool_dtype=jnp.float32)
    s = ds[0]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(s["input_ids"])[None],
        jnp.asarray(s["image"])[None],
        jnp.asarray(s["image_aug"])[None], tid,
        method=VisionLLMWithTools.infer_det)["params"]

    # batch_size=2: one full batch (2 imgs) — the padded-tail path is
    # covered by the pose smoke; a bs=8 program octuples compile time
    res = evaluate_det(model, params, ds, tid, with_mask=True, topk=10,
                       batch_size=2,
                       progress=False)
    assert "bbox_mAP" in res and "segm_mAP" in res
    # untrained model: mAP is a finite number (almost surely ~0)
    assert np.isfinite(res["bbox_mAP"])
