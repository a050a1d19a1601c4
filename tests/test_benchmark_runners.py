"""Benchmark runners: real file-format loaders + metric plumbing
(reference: visionllmv2/eval/{vqa,mme,pope,mmbench,seed,scienceqa}).

Loaders are exercised on fixture files in each benchmark's REAL format;
scoring is exercised on stubbed predictions; one end-to-end CLI run
drives the tiny model's jitted decode loop over a 2-question POPE
fixture.
"""

import base64
import io
import json
import os

import numpy as np
import pytest

from visionllm_tpu.eval import benchmarks as B
from visionllm_tpu.eval import runners as R


@pytest.fixture(scope="module")
def bench_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bench")
    from PIL import Image
    img = Image.new("RGB", (48, 32), (120, 90, 60))
    img.save(d / "img0.jpg")

    # MME: root/<category>.txt + images/<category>/
    mme = d / "mme"
    (mme / "images" / "color").mkdir(parents=True)
    img.save(mme / "images" / "color" / "img0.jpg")
    (mme / "color.txt").write_text(
        "img0.jpg\tIs the car red in the image? Please answer yes or "
        "no.\tYes\n"
        "img0.jpg\tIs the car blue in the image? Please answer yes or "
        "no.\tNo\n")

    # POPE jsonl
    (d / "pope.jsonl").write_text("\n".join(
        json.dumps({"image": "img0.jpg",
                    "text": f"Is there a {o} in the image?",
                    "label": l})
        for o, l in (("dog", "yes"), ("surfboard", "no"))))

    # MMBench tsv (base64 image)
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    (d / "mmbench.tsv").write_text(
        "index\tquestion\thint\tA\tB\tC\tD\tanswer\timage\n"
        f"0\tWhat color?\t\tred\tgreen\tblue\tyellow\tC\t{b64}\n")

    # SEED jsonl
    (d / "seed.jsonl").write_text(json.dumps({
        "image": "img0.jpg",
        "text": "What is shown?\nA. cat\nB. dog\nC. wall\nD. sky",
        "answer": "C"}) + "\n")

    # ScienceQA jsonl
    (d / "sqa.jsonl").write_text(json.dumps({
        "image": "img0.jpg", "hint": "Look closely.",
        "question": "Which is a color?",
        "choices": ["rock", "brown"], "answer": 1}) + "\n")

    # MM-Vet json
    (d / "mmvet.json").write_text(json.dumps({
        "v1_0": {"imagename": "img0.jpg",
                 "question": "What is here?", "answer": "a wall"}}))

    # VQAv2-style jsonl
    (d / "vqa.jsonl").write_text(json.dumps({
        "image": "img0.jpg", "question": "What color is the wall?",
        "question_id": 7,
        "answer": ["brown"] * 6 + ["tan"] * 4}) + "\n")
    return d


def test_loaders_parse_real_formats(bench_dir):
    rows = R.load_mme(str(bench_dir / "mme"))
    assert len(rows) == 2
    assert rows[0]["category"] == "color"
    assert rows[0]["answer"] == "Yes"
    assert os.path.exists(rows[0]["image_path"])

    rows = R.load_pope(str(bench_dir / "pope.jsonl"), str(bench_dir))
    assert len(rows) == 2 and rows[1]["answer"] == "no"

    rows = R.load_mmbench(str(bench_dir / "mmbench.tsv"))
    assert rows[0]["answer"] == "C"
    assert "A. red" in rows[0]["question"]
    assert "option's letter" in rows[0]["question"]

    rows = R.load_seed(str(bench_dir / "seed.jsonl"), str(bench_dir))
    assert rows[0]["answer"] == "C"

    rows = R.load_scienceqa(str(bench_dir / "sqa.jsonl"),
                            str(bench_dir))
    assert rows[0]["answer"] == "B"          # index 1 → letter B
    assert "A. rock" in rows[0]["question"]

    rows = R.load_mmvet(str(bench_dir / "mmvet.json"), str(bench_dir))
    assert rows[0]["id"] == "v1_0"

    rows = R.load_vqa_jsonl(str(bench_dir / "vqa.jsonl"),
                            str(bench_dir))
    assert rows[0]["answers"] == ["brown"] * 6 + ["tan"] * 4


def test_scoring_from_stub_predictions(bench_dir):
    # MME: one right (yes/Yes), one wrong → acc 0.5, acc+ 0
    rows = R.load_mme(str(bench_dir / "mme"))
    rows[0]["prediction"] = "Yes, it is."
    rows[1]["prediction"] = "Yes."
    s = R.score_rows("mme", rows)
    assert s["acc"] == 0.5 and s["acc_plus"] == 0.0

    # POPE
    rows = R.load_pope(str(bench_dir / "pope.jsonl"))
    rows[0]["prediction"] = "yes"
    rows[1]["prediction"] = "no"
    s = R.score_rows("pope", rows)
    assert s["accuracy"] == 1.0 and s["f1"] == 1.0

    # MMBench choice extraction from free text
    rows = R.load_mmbench(str(bench_dir / "mmbench.tsv"))
    rows[0]["prediction"] = "The answer is C."
    assert R.score_rows("mmbench", rows)["accuracy"] == 1.0
    rows[0]["prediction"] = "It looks blue to me."   # text containment
    assert R.score_rows("mmbench", rows)["accuracy"] == 1.0
    rows[0]["prediction"] = "red"
    assert R.score_rows("mmbench", rows)["accuracy"] == 0.0

    # VQAv2 multi-annotator metric: 'brown' matches 6 → min(6/3,1)=1
    rows = R.load_vqa_jsonl(str(bench_dir / "vqa.jsonl"))
    rows[0]["prediction"] = "brown"
    assert R.score_rows("vqav2_val", rows)["vqa_accuracy"] == 1.0
    rows[0]["prediction"] = "tan"                    # 4 → min(4/3,1)=1
    assert R.score_rows("vqav2_val", rows)["vqa_accuracy"] == 1.0


def test_anls_and_relaxed_metrics():
    rows = [{"prediction": "21%", "answer": "20%"}]
    assert B.relaxed_accuracy(rows) == 1.0           # within 5%
    rows = [{"prediction": "25%", "answer": "20%"}]
    assert B.relaxed_accuracy(rows) == 0.0
    rows = [{"prediction": "hello", "answer": "hello"}]
    assert B.anls(rows) == 1.0
    rows = [{"prediction": "help", "answer": "hello"}]
    # lev(help,hello)=2, nl=2/5 → 0.6 ≥ 0.5 threshold
    assert abs(B.anls(rows) - 0.6) < 1e-6
    rows = [{"prediction": "xyz", "answer": "hello"}]
    assert B.anls(rows) == 0.0


@pytest.mark.slow
def test_cli_eval_vqa_pope_tiny(bench_dir, capsys):
    """End-to-end: tiny model + jitted decode loop over the POPE
    fixture produces a metric dict."""
    from visionllm_tpu.cli import main
    main(["eval-vqa", "--benchmark", "pope",
          "--data", str(bench_dir / "pope.jsonl"),
          "--imgs", str(bench_dir), "--tiny", "--limit", "2"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert set(res) >= {"accuracy", "precision", "recall", "f1"}
