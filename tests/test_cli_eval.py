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


# ---- scheduler-env distributed autodetection (dist_utils.py:33-104) ----

def test_dist_kwargs_slurm():
    from visionllm_tpu.cli import dist_kwargs_from_env
    kw = dist_kwargs_from_env({
        "SLURM_PROCID": "3", "SLURM_NTASKS": "8",
        "SLURM_NODELIST": "tpu-host-[12-15,20],aux-1"})
    assert kw == dict(coordinator_address="tpu-host-12:29500",
                      num_processes=8, process_id=3)
    kw = dist_kwargs_from_env({
        "SLURM_PROCID": "0", "SLURM_NTASKS": "2",
        "SLURM_NODELIST": "nodeA,nodeB", "MASTER_PORT": "12345"})
    assert kw["coordinator_address"] == "nodeA:12345"
    # explicit MASTER_ADDR wins over nodelist parsing
    kw = dist_kwargs_from_env({
        "SLURM_PROCID": "1", "SLURM_NTASKS": "2",
        "SLURM_NODELIST": "nodeA,nodeB", "MASTER_ADDR": "10.0.0.1"})
    assert kw["coordinator_address"] == "10.0.0.1:29500"


def test_dist_kwargs_mpi_and_torchrun():
    import pytest

    from visionllm_tpu.cli import dist_kwargs_from_env
    kw = dist_kwargs_from_env({
        "OMPI_COMM_WORLD_RANK": "1", "OMPI_COMM_WORLD_SIZE": "4",
        "MASTER_ADDR": "head0"})
    assert kw == dict(coordinator_address="head0:29500",
                      num_processes=4, process_id=1)
    with pytest.raises(KeyError):  # reference raises too (dist_utils.py:61)
        dist_kwargs_from_env({"OMPI_COMM_WORLD_RANK": "0",
                              "OMPI_COMM_WORLD_SIZE": "2"})
    kw = dist_kwargs_from_env({
        "RANK": "2", "WORLD_SIZE": "4", "MASTER_ADDR": "h",
        "MASTER_PORT": "29501"})
    assert kw == dict(coordinator_address="h:29501",
                      num_processes=4, process_id=2)
    # no scheduler env -> TPU-pod autodetect ({} -> initialize())
    assert dist_kwargs_from_env({"PATH": "/usr/bin"}) == {}
