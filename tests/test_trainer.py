"""Trainer loop smoke: tiny model + synthetic det dataset → a few real
optimizer steps on the CPU mesh, metrics logged, checkpoint written and
resumable."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from tests.mock_tokenizer import MockTokenizer
from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.models.visionllm import SpecialTokenIds
from visionllm_tpu.train.runner import TrainConfig, Trainer
from visionllm_tpu.train.train_step import OptimizerConfig
from visionllm_tpu.utils.checkpoint import latest_step


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("coco_train")
    from PIL import Image
    imgs, anns = [], []
    for i in range(8):
        name = f"img{i}.jpg"
        Image.new("RGB", (64, 48), (100, 100, 50)).save(d / name)
        imgs.append({"id": i, "file_name": name, "width": 64, "height": 48})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [5, 5, 20, 15], "area": 300, "iscrowd": 0})
    with open(d / "ann.json", "w") as f:
        json.dump({"images": imgs, "annotations": anns,
                   "categories": [{"id": 1, "name": "cat"},
                                  {"id": 2, "name": "dog"}]}, f)
    return d


@pytest.mark.slow
def test_trainer_two_steps(coco_dir, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    cfg = tiny_test_config()
    tc = TrainConfig(
        output_dir=str(tmp_path / "out"), batch_size=2, total_steps=2,
        log_every=1, save_every=10, n_model=2,
        optimizer=OptimizerConfig(learning_rate=1e-4, total_steps=10))
    tok = MockTokenizer()
    trainer = Trainer(cfg, tc, SpecialTokenIds.synthetic(),
                      dtype=jnp.float32, tool_dtype=jnp.float32)
    ds_cfgs = [{
        "type": "coco_det", "ann_file": str(coco_dir / "ann.json"),
        "img_prefix": str(coco_dir),
        "image_size": cfg.vis_encoder.image_size,
        "max_gt_per_img": 4,
        "train_scales": [(48, 64)], "buckets": ((64, 64),),
    }]
    state = trainer.train(ds_cfgs, tok, max_steps=2)
    assert int(state.step) == 2
    # metrics + checkpoint exist
    metrics = [json.loads(l) for l in open(
        os.path.join(tc.output_dir, "metrics.jsonl"))]
    assert len(metrics) >= 1
    assert np.isfinite(metrics[-1]["loss"])
    ckpt_dir = os.path.join(tc.output_dir, "checkpoints")
    assert latest_step(ckpt_dir) == 2
