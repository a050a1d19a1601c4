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


def _eos_or_default(tokenizer) -> int:
    """eos token id, defaulting to 2 only when the tokenizer has NONE
    (a plain `or 2` would remap a legitimate id of 0)."""
    eos = getattr(tokenizer, "eos_token_id", None)
    return 2 if eos is None else int(eos)


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
    batch_size: int = 1,
) -> List[Dict]:
    """Greedy-decode each question; returns rows with predicted text.

    ``batch_size > 1`` vectorizes the decode: prompts are LEFT-padded
    to one compiled length under an attention mask and images ride
    per-sample ``[B, 1, S, S, 3]`` tile stacks, so batched answers are
    token-identical to bs=1 (tests/test_generation_batched.py) at ~B×
    the decode throughput (decode is HBM-bound on the weights). The
    reference pins generation to bs=1 (evaluate_vqa.py:531)."""
    import jax.numpy as jnp
    img_len = (image_size // 14) ** 2
    imp_id = tokenizer.convert_tokens_to_ids(DEFAULT_TOKENS["imp"])
    conv = get_conv_template(conv_version)
    stop_strs = [conv.sep2 or conv.sep]
    eos_id = _eos_or_default(tokenizer)

    def finish(q, tokens):
        text = tokenizer.decode(tokens, skip_special_tokens=True)
        cut = find_stop(text, stop_strs)
        if cut is not None:
            text = text[:cut]
        return {**{k: v for k, v in q.items() if k != "image"},
                "prediction": text.strip()}

    rows = []
    if batch_size <= 1:
        for q in questions:
            prompt = build_vqa_prompt(q["question"], conv_version,
                                      single_word)
            ids = prompt_to_ids(prompt, tokenizer, img_len, imp_id)
            image = clip_preprocess(q["image"], image_size, "pad")[None]
            out = generate_fn(params, jnp.asarray(ids)[None],
                              jnp.asarray(image, jnp.float32))
            n = int(out["num_generated"])
            rows.append(finish(q, np.asarray(out["out_tokens"][0, :n])))
        return rows

    encoded = []
    for q in questions:
        prompt = build_vqa_prompt(q["question"], conv_version,
                                  single_word)
        encoded.append(prompt_to_ids(prompt, tokenizer, img_len, imp_id))
    L = max(len(e) for e in encoded)
    B = batch_size
    for start in range(0, len(questions), B):
        group = list(range(start, min(start + B, len(questions))))
        ids = np.zeros((B, L), np.int32)
        mask = np.zeros((B, L), bool)
        imgs = np.zeros((B, 1, image_size, image_size, 3), np.float32)
        live = np.zeros((B,), bool)
        for j, qi in enumerate(group):
            e = encoded[qi]
            ids[j, L - len(e):] = e
            mask[j, L - len(e):] = True
            imgs[j, 0] = clip_preprocess(questions[qi]["image"],
                                         image_size, "pad")
            live[j] = True
        out = generate_fn(params, jnp.asarray(ids), jnp.asarray(imgs),
                          attn_mask=jnp.asarray(mask),
                          live=jnp.asarray(live))
        n = int(out["num_generated"])
        toks = np.asarray(out["out_tokens"][:, :n])
        for j, qi in enumerate(group):
            row = toks[j]
            ends = np.nonzero(row == eos_id)[0]
            if ends.size:
                row = row[:ends[0] + 1]
            rows.append(finish(questions[qi], row))
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
