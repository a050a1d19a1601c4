"""Benchmark metric helpers: parsing + scoring edge cases."""

from visionllm_tpu.eval.benchmarks import (choice_accuracy, extract_choice,
                                           mme_scores, normalize_answer,
                                           parse_yes_no, pope_scores,
                                           vqa_accuracy)


def test_normalize():
    assert normalize_answer("The cat!") == "cat"
    assert normalize_answer("A  dog.") == "dog"


def test_vqa_accuracy():
    rows = [{"prediction": "blue", "answers": ["blue"] * 4 + ["red"] * 6},
            {"prediction": "red", "answer": "red"},
            {"prediction": "green", "answer": "red"}]
    acc = vqa_accuracy(rows)
    assert abs(acc - (1.0 + 1.0 + 0.0) / 3) < 1e-9


def test_yes_no_parse():
    assert parse_yes_no("Yes, it is.") == "yes"
    assert parse_yes_no("no") == "no"
    assert parse_yes_no("I think yes") == "yes"
    assert parse_yes_no("maybe") == "other"


def test_mme():
    rows = [{"image_id": 1, "answer": "yes", "prediction": "Yes"},
            {"image_id": 1, "answer": "no", "prediction": "No"},
            {"image_id": 2, "answer": "yes", "prediction": "No"},
            {"image_id": 2, "answer": "no", "prediction": "No"}]
    s = mme_scores(rows)
    assert abs(s["acc"] - 0.75) < 1e-9
    assert abs(s["acc_plus"] - 0.5) < 1e-9


def test_pope():
    rows = [{"answer": "yes", "prediction": "yes"},
            {"answer": "no", "prediction": "yes"},
            {"answer": "no", "prediction": "no"}]
    s = pope_scores(rows)
    assert abs(s["accuracy"] - 2 / 3) < 1e-9
    assert abs(s["precision"] - 0.5) < 1e-9
    assert abs(s["recall"] - 1.0) < 1e-9


def test_choice_extraction():
    opts = ["a red ball", "a blue cube", "a green cone"]
    assert extract_choice("B", opts) == "B"
    assert extract_choice("(C) a green cone", opts) == "C"
    assert extract_choice("The answer is B.", opts) == "B"
    assert extract_choice("It's a blue cube", opts) == "B"
    rows = [{"prediction": "A", "options": opts, "answer": "a"},
            {"prediction": "a green cone", "options": opts, "answer": "C"}]
    assert choice_accuracy(rows) == 1.0


def test_cider_and_bleu():
    from visionllm_tpu.eval.caption import CiderD, bleu4
    cands = ["a cat sits on the mat", "a dog runs in the park"]
    refs = [["a cat sits on the mat", "the cat is on a mat"],
            ["a dog runs in the park", "a dog running through a park"]]
    cider = CiderD().compute(cands, refs)
    assert cider > 3.0                 # perfect first refs → high score
    wrong = ["completely unrelated words here", "nothing matches at all"]
    assert CiderD().compute(wrong, refs) < cider * 0.2
    assert bleu4(cands, refs) > 0.9
    assert bleu4(wrong, refs) < 0.1
