"""CLI smoke for the generate-based eval subcommands added in round 3:
eval-vqa --benchmark caption, and eval-region (the reference's
eval_image_caption.py / eval_region_*.py script family)."""

import json

import numpy as np
import pytest

from visionllm_tpu.cli import main


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("cli_eval")
    rng = np.random.RandomState(0)
    for name in ("a.png", "b.png"):
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)
                        ).save(root / name)
    # karpathy-style caption annotation
    with open(root / "cap.json", "w") as f:
        json.dump([{"image": "a.png", "caption": ["a test image"]},
                   {"image": "b.png", "caption": ["another test image"]}],
                  f)
    # osprey classification annotation
    with open(root / "cls.json", "w") as f:
        json.dump([{"id": 1, "file_name": "a.png", "height": 48,
                    "width": 64, "categories": ["cat"],
                    "annotations": [{"bbox": [4, 4, 20, 16]}]}], f)
    return root


def test_cli_eval_caption(fixtures, capsys):
    main(["eval-vqa", "--benchmark", "caption", "--tiny",
          "--data", str(fixtures / "cap.json"),
          "--imgs", str(fixtures), "--max-new-tokens", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "CIDEr" in out and "Bleu_4" in out
    assert np.isfinite(out["CIDEr"])


def test_cli_eval_region_classification(fixtures, capsys):
    main(["eval-region", "--task", "region-classification", "--tiny",
          "--ann", str(fixtures / "cls.json"),
          "--imgs", str(fixtures), "--max-new-tokens", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "semantic_iou" in out and "semantic_similarity" in out
