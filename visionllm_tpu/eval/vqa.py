"""Generate-based VQA / captioning / region-caption evaluation harness.

Behavioral reference: visionllmv2/eval/vqa/evaluate_vqa.py (build
vicuna_v1 prompt with <im_patch>×576, greedy model.generate with
keyword stopping, bs=1) plus the simple accuracy/containment metrics the
per-benchmark runners apply. The decode loop itself is the jitted
emb-countdown state machine in visionllm_tpu/generation.py.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from visionllm_tpu.constants import DEFAULT_TOKENS
from visionllm_tpu.data.conversation import get_conv_template
from visionllm_tpu.data.mm_utils import (clip_preprocess, find_stop,
                                         tokenizer_image_token)


def build_vqa_prompt(question: str, conv_version: str = "vicuna_v1",
                     single_word: bool = False) -> str:
    """'<image>\\nQ ...' → full conversation prompt ending at ASSISTANT:."""
    q = "<image>\n" + question
    if single_word:
        q += "\nAnswer the question using a single word or phrase."
    conv = get_conv_template(conv_version)
    conv.append_message(conv.roles[0], q)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def prompt_to_ids(prompt: str, tokenizer, img_len: int,
                  im_patch_id: int) -> np.ndarray:
    from visionllm_tpu.data.mm_utils import expand_image_tokens
    ids = tokenizer_image_token(prompt, tokenizer)
    return expand_image_tokens(ids, img_len, im_patch_id)


def run_vqa(
    generate_fn: Callable,        # from generation.build_generate_fn
    params,
    tokenizer,
    questions: Sequence[Dict],    # {"image": np.uint8 HWC, "question": str,
                                  #  "answer": str (optional)}
    *,
    image_size: int = 336,
    conv_version: str = "vicuna_v1",
    single_word: bool = True,
) -> List[Dict]:
    """Greedy-decode each question; returns rows with predicted text."""
    import jax.numpy as jnp
    img_len = (image_size // 14) ** 2
    imp_id = tokenizer.convert_tokens_to_ids(DEFAULT_TOKENS["imp"])
    conv = get_conv_template(conv_version)
    stop_strs = [conv.sep2 or conv.sep]

    rows = []
    for q in questions:
        prompt = build_vqa_prompt(q["question"], conv_version, single_word)
        ids = prompt_to_ids(prompt, tokenizer, img_len, imp_id)
        image = clip_preprocess(q["image"], image_size, "pad")[None]
        out = generate_fn(params, jnp.asarray(ids)[None],
                          jnp.asarray(image, jnp.float32))
        n = int(out["num_generated"])
        tokens = np.asarray(out["out_tokens"][0, :n])
        text = tokenizer.decode(tokens, skip_special_tokens=True)
        cut = find_stop(text, stop_strs)
        if cut is not None:
            text = text[:cut]
        rows.append({**{k: v for k, v in q.items() if k != "image"},
                     "prediction": text.strip()})
    return rows


def exact_match_accuracy(rows: Sequence[Dict]) -> float:
    hits = [r["prediction"].lower() == str(r.get("answer", "")).lower()
            for r in rows if "answer" in r]
    return float(np.mean(hits)) if hits else float("nan")


def containment_accuracy(rows: Sequence[Dict]) -> float:
    """VQA-style 'answer appears in prediction' metric (used by several
    reference runners for open-ended answers)."""
    hits = [str(r.get("answer", "")).lower() in r["prediction"].lower()
            for r in rows if "answer" in r]
    return float(np.mean(hits)) if hits else float("nan")
