"""Region-prompted generation evals: region caption (VG / RefCOCOg /
VCR), region recognition (COCO / LVIS vocab) and region classification
(Osprey LVIS/PACO).

Behavioral references:
* eval/eval_region_caption_refcoco.py — REFG_QUESTIONS[0] prompt with
  '<reg>region<region></reg>', greedy generate(max_new_tokens=64,
  regions=...), lowercase + strip trailing '.', COCOEvalCap scoring
  (datasets/vg.py:409-460). Our offline metrics: CIDEr-D + BLEU-4
  (eval/caption.py).
* eval/eval_region_caption_vg.py — same with datasets/vg.py
  FINAL_QUESTIONS[0].
* eval/eval_region_caption_vcr.py — multi-region multiple-choice rows
  {conversations, boxes (normalized xyxy), correct_option, category};
  max_new_tokens=1; accuracy split by category (:236, :282-287).
* eval/eval_region_recognition.py — COCO_QUESTIONS[0]/LVIS_QUESTIONS[0]
  prompt, max_new_tokens=5; predictions outside the label vocabulary
  count as wrong; accuracy + COCO-format detections (score 1.0) for mAP
  (:328-383).
* eval/eval_region_classification.py — Osprey rows, template
  'What is the category of <regions>? Using only one word or phrase.',
  max_new_tokens=5; metrics Semantic Similarity (SBERT cosine — offline
  here we substitute a bag-of-words cosine, documented below) and
  Semantic IoU (word-set IoU, :61-64).

All loops are host-side; the device work is the jitted emb-countdown
decode (generation.build_generate_fn) with `regions` conditioning the
prefill through the RegionEncoder.
"""

from __future__ import annotations

import json
import math
import os
import re
from collections import Counter, defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from visionllm_tpu.constants import DEFAULT_TOKENS
from visionllm_tpu.data.conversation import get_conv_template
from visionllm_tpu.data.mm_utils import (clip_preprocess, expand2square,
                                         find_stop, resize_image,
                                         tokenizer_image_token)
from visionllm_tpu.data.region_dataset import region_mask_from_ann
from visionllm_tpu.eval.caption import CiderD, bleu4

# datasets/refcoco.py:35 == datasets/vg.py:32 (FINAL_QUESTIONS[0] is the
# same string) — both eval scripts use index 0
REFG_QUESTION = ("Can you provide me with a brief description of "
                 "<spi_descript> in the picture?")
# datasets/v3det.py:39 / datasets/lvis.py:27
COCO_RECOG_QUESTION = (
    "Whis is the object category of <regions>? Answer with the category "
    "name from COCO-80, and use single word or phrase.")
LVIS_RECOG_QUESTION = (
    "Whis is the object category of <regions>? Answer with the category "
    "name from LVIS-1203, and use single word or phrase.")
# eval/eval_region_classification.py:101
OSPREY_CLS_QUESTION = ("What is the category of <regions>? Using only "
                       "one word or phrase.")


def region_str(n: int = 1, named: bool = True) -> str:
    """'<reg>region1<region></reg>, ...' (caption eval uses the unnumbered
    '<reg>region<region></reg>' — eval_region_caption_refcoco.py:74)."""
    parts = [DEFAULT_TOKENS["sor"] + (f"region{i + 1}" if named
                                      else "region")
             + DEFAULT_TOKENS["reg"] + DEFAULT_TOKENS["eor"]
             for i in range(n)]
    return ", ".join(parts)


def boxes_to_masks(boxes: np.ndarray, h: int, w: int) -> np.ndarray:
    """xyxy boxes [N, 4] → binary masks [N, h, w] (reference
    datasets/utils.py boxes_to_masks)."""
    masks = np.zeros((len(boxes), h, w), np.float32)
    for i, (x0, y0, x1, y1) in enumerate(boxes):
        masks[i, int(y0):int(math.ceil(y1)), int(x0):int(math.ceil(x1))] = 1
    return masks


def _clip_region_masks(masks: np.ndarray, image_size: int,
                       aspect: str = "pad") -> np.ndarray:
    """[R, H, W] original-geometry masks → CLIP input geometry."""
    out = []
    for m in masks:
        m255 = (m[..., None] * 255).astype(np.uint8)
        if aspect == "pad":
            m255 = expand2square(m255, (0,))
        out.append((resize_image(m255[..., 0], (image_size, image_size),
                                 "nearest") > 127).astype(np.float32))
    return np.stack(out) if out else np.zeros(
        (0, image_size, image_size), np.float32)


def _prompt_ids(question: str, tokenizer, image_size: int,
                conv_version: str) -> np.ndarray:
    from visionllm_tpu.data.mm_utils import expand_image_tokens
    conv = get_conv_template(conv_version)
    conv.append_message(conv.roles[0], "<image>\n" + question)
    conv.append_message(conv.roles[1], None)
    ids = tokenizer_image_token(conv.get_prompt(), tokenizer)
    imp_id = tokenizer.convert_tokens_to_ids(DEFAULT_TOKENS["imp"])
    return expand_image_tokens(ids, (image_size // 14) ** 2, imp_id)


def run_region_generate(
    generate_fn: Callable,
    params,
    tokenizer,
    rows: Sequence[Dict],      # {"image": HWC uint8, "masks": [R, H, W],
                               #  "question": str (region strs inlined), ...}
    *,
    image_size: int = 336,
    conv_version: str = "vicuna_v1",
) -> List[Dict]:
    """Greedy-decode each region-prompted row; adds row["prediction"]
    (lowercased, trailing '.' stripped — the reference's normalization,
    eval_region_caption_refcoco.py:199-202)."""
    import jax.numpy as jnp
    conv = get_conv_template(conv_version)
    stop_strs = [conv.sep2 or conv.sep]
    out_rows = []
    for r in rows:
        ids = _prompt_ids(r["question"], tokenizer, image_size,
                          conv_version)
        image = clip_preprocess(r["image"], image_size, "pad")[None]
        regions = _clip_region_masks(np.asarray(r["masks"]), image_size)
        out = generate_fn(params, jnp.asarray(ids)[None],
                          jnp.asarray(image, jnp.float32),
                          regions=jnp.asarray(regions)[None])
        n = int(out["num_generated"])
        text = tokenizer.decode(np.asarray(out["out_tokens"][0, :n]),
                                skip_special_tokens=True)
        cut = find_stop(text, stop_strs)
        if cut is not None:
            text = text[:cut]
        text = text.strip().lower()
        if text.endswith("."):
            text = text[:-1]
        out_rows.append({**{k: v for k, v in r.items()
                            if k not in ("image", "masks")},
                         "prediction": text})
    return out_rows


# ---------------------------------------------------------------- loaders

def load_region_caption(ann_file: str, img_prefix: str, *,
                        test_format: str = "bbox",
                        limit: Optional[int] = None) -> List[Dict]:
    """COCO-caption-format json (the reference's
    refcocog_val_coco_format.json / VG equivalent): images + annotations
    carrying bbox/segmentation AND the gt caption(s). One row per
    annotated region; references grouped per region."""
    with open(ann_file) as f:
        data = json.load(f)
    imgs = {im["id"]: im for im in data["images"]}
    by_region: Dict[Tuple, Dict] = {}
    for ann in data["annotations"]:
        key = (ann["image_id"], tuple(ann.get("bbox", ())))
        row = by_region.setdefault(key, {
            "image_id": ann["image_id"],
            "file_name": imgs[ann["image_id"]]["file_name"],
            "height": imgs[ann["image_id"]]["height"],
            "width": imgs[ann["image_id"]]["width"],
            "ann": {k: ann.get(k) for k in ("bbox", "segmentation")},
            "captions": [],
        })
        if ann.get("caption"):
            row["captions"].append(ann["caption"])
    rows = []
    for row in by_region.values():
        h, w = row["height"], row["width"]
        if test_format == "mask" and row["ann"].get("segmentation"):
            mask = region_mask_from_ann(row["ann"], h, w)
        else:
            mask = region_mask_from_ann(
                {"bbox": row["ann"]["bbox"]}, h, w)
        rows.append({
            "image_path": os.path.join(img_prefix, row["file_name"]),
            "mask": mask.astype(np.float32),
            "question": REFG_QUESTION.replace(
                "<spi_descript>", region_str(1, named=False)),
            "captions": row["captions"],
            "image_id": row["image_id"],
        })
        if limit and len(rows) >= limit:
            break
    return rows


def load_region_recognition(ann_file: str, img_prefix: str, *,
                            vocab: str = "coco",
                            test_format: str = "bbox",
                            limit: Optional[int] = None) -> List[Dict]:
    """COCO-instances-format json; one row per annotation with the gt
    category name (reference eval_region_recognition.py:58-110)."""
    with open(ann_file) as f:
        data = json.load(f)
    imgs = {im["id"]: im for im in data["images"]}
    cats = {c["id"]: c["name"].lower().replace("_", " ")
            for c in data["categories"]}
    label_names = sorted(set(cats.values()))
    str2idx = {}
    for c in data["categories"]:
        str2idx[c["name"].lower().replace("_", " ")] = c["id"]
    q = (COCO_RECOG_QUESTION if vocab == "coco"
         else LVIS_RECOG_QUESTION).replace("<regions>", region_str(1))
    rows = []
    for ann in data["annotations"]:
        im = imgs[ann["image_id"]]
        h, w = im["height"], im["width"]
        ann_for_mask = (ann if test_format == "mask"
                        else {"bbox": ann["bbox"]})
        rows.append({
            "image_path": os.path.join(img_prefix, im["file_name"]),
            "mask": region_mask_from_ann(ann_for_mask, h, w
                                         ).astype(np.float32),
            "question": q,
            "label": cats[ann["category_id"]],
            "bbox": list(ann["bbox"]),
            "image_id": ann["image_id"],
            "label_names": label_names,
            "str2idx": str2idx,
        })
        if limit and len(rows) >= limit:
            break
    return rows


def load_region_classification(ann_file: str, img_prefix: str, *,
                               test_format: str = "bbox",
                               limit: Optional[int] = None) -> List[Dict]:
    """Osprey category-val format: list of image dicts with aligned
    'categories' and 'annotations' (eval_region_classification.py:68-88)."""
    with open(ann_file) as f:
        images = json.load(f)
    q = OSPREY_CLS_QUESTION.replace("<regions>", region_str(1))
    rows = []
    for image in images:
        for cat, ann in zip(image["categories"], image["annotations"]):
            category = cat.replace("_", " ").replace(":", " ")
            ann_for_mask = (ann if test_format == "mask"
                            else {"bbox": ann["bbox"]})
            rows.append({
                "image_path": os.path.join(img_prefix,
                                           image["file_name"]),
                "mask": region_mask_from_ann(
                    ann_for_mask, image["height"], image["width"]
                ).astype(np.float32),
                "question": q,
                "category": category,
                "image_id": image["id"],
            })
            if limit and len(rows) >= limit:
                return rows
    return rows


def load_vcr(ann_file: str, img_prefix: str, *,
             limit: Optional[int] = None) -> List[Dict]:
    """VCR jsonl rows {image, boxes (normalized xyxy), conversations,
    correct_option, category} — multi-region multiple choice
    (eval_region_caption_vcr.py:45-110)."""
    rows = []
    with open(ann_file) as f:
        for line in f:
            d = json.loads(line)
            q = d["conversations"][0]["value"].replace(
                "<regions>", region_str(len(d["boxes"])))
            q = q.replace("<image>\n", "").replace("<image>", "")
            rows.append({
                "image_path": os.path.join(img_prefix, d["image"]),
                "boxes": np.asarray(d["boxes"], np.float32),
                "question": q,
                "answer": str(d["correct_option"]).strip(),
                "category": d.get("category", "Q->A"),
            })
            if limit and len(rows) >= limit:
                break
    return rows


def materialize(rows: Sequence[Dict], image_size: int = 336) -> List[Dict]:
    """Resolve image paths → arrays and masks/boxes → the [R, H, W]
    masks run_region_generate consumes."""
    from PIL import Image
    out = []
    for r in rows:
        r = dict(r)
        img = np.asarray(Image.open(r.pop("image_path")).convert("RGB"))
        r["image"] = img
        if "boxes" in r:   # VCR: normalized boxes → masks at CLIP size
            boxes = r.pop("boxes") * image_size
            r["masks"] = boxes_to_masks(boxes, image_size, image_size)
        else:
            r["masks"] = r.pop("mask")[None]
        out.append(r)
    return out


# ---------------------------------------------------------------- scoring

def _words(s: str) -> List[str]:
    s = re.sub(r"([.,'!?\"()*#:;])", "", s.lower()
               ).replace("-", " ").replace("/", " ").replace("_", " ")
    return s.split()


def semantic_iou(pred: str, target: str) -> float:
    """Word-set IoU (eval_region_classification.py:61-64)."""
    p, t = set(_words(pred)), set(_words(target))
    return len(p & t) / max(len(p | t), 1)


def bow_cosine(pred: str, target: str) -> float:
    """Bag-of-words cosine similarity — offline stand-in for the
    reference's SBERT sentence similarity (SentenceTransformer is
    unavailable without downloaded weights; same 0-100 scale)."""
    p, t = Counter(_words(pred)), Counter(_words(target))
    num = sum(p[w] * t[w] for w in p)
    den = (math.sqrt(sum(v * v for v in p.values()))
           * math.sqrt(sum(v * v for v in t.values())))
    return num / den if den else 0.0


def score_region_caption(rows: Sequence[Dict]) -> Dict[str, float]:
    cands = [r["prediction"] for r in rows]
    refs = [[c.lower() for c in r["captions"]] or [""] for r in rows]
    return {"CIDEr": CiderD().compute(cands, refs),
            "Bleu_4": bleu4(cands, refs)}


def score_region_recognition(rows: Sequence[Dict]) -> Dict[str, float]:
    """Accuracy; out-of-vocabulary predictions count as wrong (reference
    :339-342). Also returns COCO-format detections under "predictions"
    (score 1.0) so callers can run box mAP like the reference does."""
    hits, preds = [], []
    for r in rows:
        p = r["prediction"]
        if p not in r["label_names"]:
            hits.append(False)
            continue
        hits.append(p == r["label"])
        preds.append({"image_id": r["image_id"],
                      "category_id": r["str2idx"][p],
                      "bbox": r["bbox"], "score": 1.0})
    return {"accuracy": float(np.mean(hits)) if hits else 0.0,
            "predictions": preds}


def score_region_classification(rows: Sequence[Dict]) -> Dict[str, float]:
    sims, ious = [], []
    for r in rows:
        p = r["prediction"]
        if ":" in p:
            p = p.split(":")[1]
        p = p.replace(".", " ").replace(":", " ").replace(",", " ")
        sims.append(bow_cosine(p, r["category"]) * 100)
        ious.append(semantic_iou(p.lower(), r["category"].lower()) * 100)
    return {"semantic_similarity": float(np.mean(sims)) if sims else 0.0,
            "semantic_iou": float(np.mean(ious)) if ious else 0.0}


def score_vcr(rows: Sequence[Dict]) -> Dict[str, float]:
    """Per-category accuracy (Q->A, QA->R) + overall
    (eval_region_caption_vcr.py:282-292)."""
    by_cat: Dict[str, List[bool]] = defaultdict(list)
    for r in rows:
        pred = r["prediction"].strip().upper()[:1]
        by_cat[r["category"]].append(pred == r["answer"].upper())
    out = {f"accuracy/{k}": float(np.mean(v)) for k, v in by_cat.items()}
    out["accuracy"] = float(np.mean([h for v in by_cat.values()
                                     for h in v])) if by_cat else 0.0
    return out


# ---------------------------------------------------------------- runner

TASKS = {
    # name → (loader, scorer, max_new_tokens per the reference scripts)
    "region-caption": (load_region_caption, score_region_caption, 64),
    "region-recognition": (load_region_recognition,
                           score_region_recognition, 5),
    "region-classification": (load_region_classification,
                              score_region_classification, 5),
    "vcr": (load_vcr, score_vcr, 1),
}


def run_region_eval(
    task: str,
    generate_fn: Callable,
    params,
    tokenizer,
    rows: Sequence[Dict],
    *,
    image_size: int = 336,
    conv_version: str = "vicuna_v1",
) -> Dict[str, float]:
    """rows from the task's load_* function (paths unmaterialized)."""
    _, scorer, _ = TASKS[task]
    rows = materialize(rows, image_size)
    preds = run_region_generate(generate_fn, params, tokenizer, rows,
                                image_size=image_size,
                                conv_version=conv_version)
    return scorer(preds)
