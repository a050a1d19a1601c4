"""Region-prompted generation + the region-eval family (caption /
recognition / classification / VCR) on synthetic fixtures.

Reference protocols: eval/eval_region_caption_refcoco.py,
eval_region_recognition.py, eval_region_classification.py,
eval_region_caption_vcr.py.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.mock_tokenizer import MockTokenizer
from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.eval import region_eval as RE
from visionllm_tpu.generation import build_generate_fn
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM

CFG = tiny_test_config()
TID = SpecialTokenIds.synthetic()
SIZE = CFG.vis_encoder.image_size


@pytest.fixture(scope="module")
def setup():
    model = VisionLLM(CFG, dtype=jnp.float32)
    tok = MockTokenizer()
    img_len = CFG.vis_encoder.num_patches
    ids = [1] + [TID.imp] * img_len + [TID.reg, 7]
    input_ids = jnp.asarray([ids], jnp.int32)
    images = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    regions = jnp.zeros((1, 1, SIZE, SIZE), jnp.float32
                        ).at[:, :, 8:30, 4:40].set(1.0)
    params = model.init(jax.random.PRNGKey(0), input_ids, images, TID,
                        regions=regions)["params"]
    return model, tok, params, input_ids, images, regions


def test_generate_accepts_regions_and_conditions_on_them(setup):
    """regions= must reach the prefill: a different region mask changes
    the prefill logits and hence generally the decoded tokens' hidden
    states (reference threads regions through
    prepare_inputs_for_generation, modeling_visionllmv2.py:355-379)."""
    model, tok, params, input_ids, images, regions = setup
    gen = build_generate_fn(model, TID, max_new_tokens=4, max_len=128)
    out_a = gen(params, input_ids, images, regions=regions)
    regions_b = jnp.zeros_like(regions).at[:, :, 0:8, 0:8].set(1.0)
    out_b = gen(params, input_ids, images, regions=regions_b)
    assert out_a["out_tokens"].shape == (1, 4)
    # hidden states at step 0 reflect the prefill → must differ
    assert not np.allclose(np.asarray(out_a["out_hidden"][0, 0]),
                           np.asarray(out_b["out_hidden"][0, 0]))
    # and no-regions still works (plumbing is optional)
    out_c = gen(params, input_ids, images)
    assert int(out_c["num_generated"]) >= 1


def _write_png(path, h=48, w=64):
    from PIL import Image
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(path)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    root = tmp_path_factory.mktemp("region_fixtures")
    _write_png(root / "img1.png")
    _write_png(root / "img2.png")

    # COCO-caption format (refcocog_val_coco_format-style)
    cap = {
        "images": [{"id": 1, "file_name": "img1.png", "height": 48,
                    "width": 64},
                   {"id": 2, "file_name": "img2.png", "height": 48,
                    "width": 64}],
        "annotations": [
            {"id": 1, "image_id": 1, "bbox": [4, 4, 20, 16],
             "caption": "a red block"},
            {"id": 2, "image_id": 2, "bbox": [10, 8, 30, 24],
             "caption": "the left cat"},
        ],
    }
    with open(root / "cap.json", "w") as f:
        json.dump(cap, f)

    # COCO-instances format for recognition
    rec = {
        "images": cap["images"],
        "categories": [{"id": 1, "name": "cat"}, {"id": 7, "name": "dog"}],
        "annotations": [
            {"id": 1, "image_id": 1, "bbox": [4, 4, 20, 16],
             "category_id": 1},
            {"id": 2, "image_id": 2, "bbox": [10, 8, 30, 24],
             "category_id": 7},
        ],
    }
    with open(root / "rec.json", "w") as f:
        json.dump(rec, f)

    # Osprey category-val format for classification
    cls = [{
        "id": 1, "file_name": "img1.png", "height": 48, "width": 64,
        "categories": ["cat", "table_top"],
        "annotations": [{"bbox": [4, 4, 20, 16]},
                        {"bbox": [1, 1, 10, 10]}],
    }]
    with open(root / "cls.json", "w") as f:
        json.dump(cls, f)

    # VCR jsonl (boxes normalized xyxy)
    with open(root / "vcr.jsonl", "w") as f:
        for opt, cat in (("A", "Q->A"), ("B", "QA->R")):
            f.write(json.dumps({
                "image": "img1.png",
                "boxes": [[0.1, 0.1, 0.5, 0.6], [0.4, 0.2, 0.9, 0.8]],
                "conversations": [
                    {"from": "human",
                     "value": "<image>\nWhat are <regions> doing? "
                              "A. sitting B. running. Answer with the "
                              "option's letter."}],
                "correct_option": opt, "category": cat}) + "\n")
    return root


def test_loaders(fixtures):
    cap = RE.load_region_caption(str(fixtures / "cap.json"),
                                 str(fixtures))
    assert len(cap) == 2 and cap[0]["captions"] == ["a red block"]
    assert "region" in cap[0]["question"]
    assert "<region>" in cap[0]["question"]

    rec = RE.load_region_recognition(str(fixtures / "rec.json"),
                                     str(fixtures), vocab="coco")
    assert rec[0]["label"] == "cat" and rec[1]["label"] == "dog"
    assert rec[0]["label_names"] == ["cat", "dog"]
    assert "COCO-80" in rec[0]["question"]

    cls = RE.load_region_classification(str(fixtures / "cls.json"),
                                        str(fixtures))
    assert len(cls) == 2 and cls[1]["category"] == "table top"

    vcr = RE.load_vcr(str(fixtures / "vcr.jsonl"), str(fixtures))
    assert len(vcr) == 2 and vcr[0]["boxes"].shape == (2, 4)
    assert vcr[0]["question"].count("<region>") == 2


def test_run_region_eval_all_tasks(setup, fixtures):
    model, tok, params, *_ = setup
    gen = build_generate_fn(model, TID, max_new_tokens=6, max_len=256)
    for task, ann in (("region-caption", "cap.json"),
                      ("region-recognition", "rec.json"),
                      ("region-classification", "cls.json"),
                      ("vcr", "vcr.jsonl")):
        loader, _, _ = RE.TASKS[task]
        rows = loader(str(fixtures / ann), str(fixtures))
        res = RE.run_region_eval(task, gen, params, tok, rows,
                                 image_size=SIZE)
        assert res, task
        for k, v in res.items():
            if k == "predictions":
                continue
            assert np.isfinite(v), (task, k, v)


def test_scorers_exact_values():
    # recognition: OOV prediction counts as wrong, in-vocab exact match
    rows = [
        {"prediction": "cat", "label": "cat",
         "label_names": ["cat", "dog"], "str2idx": {"cat": 1, "dog": 7},
         "bbox": [0, 0, 1, 1], "image_id": 1},
        {"prediction": "zebra", "label": "dog",
         "label_names": ["cat", "dog"], "str2idx": {"cat": 1, "dog": 7},
         "bbox": [0, 0, 1, 1], "image_id": 2},
    ]
    out = RE.score_region_recognition(rows)
    assert out["accuracy"] == 0.5
    assert len(out["predictions"]) == 1   # only the in-vocab prediction

    # semantic IoU (eval_region_classification.py:61-64)
    assert RE.semantic_iou("red fire truck", "fire truck") == 2 / 3
    assert RE.bow_cosine("cat", "cat") == pytest.approx(1.0)

    # vcr per-category split
    rows = [{"prediction": "a", "answer": "A", "category": "Q->A"},
            {"prediction": "b", "answer": "C", "category": "QA->R"}]
    out = RE.score_vcr(rows)
    assert out["accuracy/Q->A"] == 1.0
    assert out["accuracy/QA->R"] == 0.0
    assert out["accuracy"] == 0.5

    # caption: perfect matches → positive CIDEr/BLEU (two docs — with a
    # 1-document corpus every idf is log(1)=0 and CIDEr degenerates to 0)
    out = RE.score_region_caption(
        [{"prediction": "a red block on the table",
          "captions": ["a red block on the table"]},
         {"prediction": "the left cat sleeping on a couch",
          "captions": ["the left cat sleeping on a couch"]}])
    assert out["CIDEr"] > 0 and out["Bleu_4"] > 0.99
