"""Region-level understanding datasets (caption / recognition / VQA).

Behavioral reference: visionllmv2/datasets/{vg.py, refcoco.py, osprey.py,
v3det.py, lvis.py, vcr_vqa.py} — samples carry a `<region>` visual
prompt (mask rendered from a gt box or segmentation) consumed by the
RegionEncoder; the conversation asks about that region and the answer is
free text (caption / class name / VQA answer).
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List

import numpy as np

from visionllm_tpu.data.build import register_dataset
from visionllm_tpu.data.coco import decode_segmentation
from visionllm_tpu.data.mm_utils import (clip_preprocess, expand2square,
                                         resize_image)
from visionllm_tpu.data.preprocess import preprocess, preprocess_multimodal

REGION_CAPTION_QUESTIONS = [
    "Please describe the region <reg>region1<region></reg> in the image.",
    "What can you see in <reg>region1<region></reg>?",
    "Give a short description of <reg>region1<region></reg>.",
]
REGION_RECOGNITION_QUESTIONS = [
    "What category best describes the region <reg>region1<region></reg>?",
    "Identify the object in <reg>region1<region></reg>.",
]


def region_mask_from_ann(ann: Dict, h: int, w: int) -> np.ndarray:
    if ann.get("segmentation"):
        return decode_segmentation(ann["segmentation"], h, w)
    x, y, bw, bh = ann["bbox"]
    m = np.zeros((h, w), np.uint8)
    m[int(y):int(y + bh) + 1, int(x):int(x + bw) + 1] = 1
    return m


@register_dataset("region_caption")
class RegionCaptionDataset:
    """json rows: {"image", "bbox" or "segmentation", "caption"} (VG-style
    region descriptions)."""

    task = "region_refer"
    dataset_name = "region_caption"

    def __init__(self, ann_file: str, img_prefix: str, tokenizer, *,
                 mode: str = "caption",      # "caption" | "recognition"
                 image_size: int = 336, image_aspect_ratio: str = "pad",
                 conv_version: str = "vicuna_v1",
                 model_max_length: int = 4096, seed: int = 0,
                 test_mode: bool = False, **_):
        with open(ann_file) as f:
            self.rows = ([json.loads(l) for l in f]
                         if ann_file.endswith(".jsonl") else json.load(f))
        self.img_prefix = img_prefix
        self.tokenizer = tokenizer
        self.mode = mode
        self.image_size = image_size
        self.image_aspect_ratio = image_aspect_ratio
        self.conv_version = conv_version
        self.model_max_length = model_max_length
        self.test_mode = test_mode
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx: int) -> Dict:
        row = self.rows[idx]
        from PIL import Image
        img = np.asarray(Image.open(os.path.join(
            self.img_prefix, row["image"])).convert("RGB"))
        h, w = img.shape[:2]
        mask = region_mask_from_ann(row, h, w)

        bank = (REGION_CAPTION_QUESTIONS if self.mode == "caption"
                else REGION_RECOGNITION_QUESTIONS)
        q_t = bank[0] if self.test_mode else self.rng.choice(bank)
        answer = row.get("caption") or row.get("category", "")
        conversations = [
            {"from": "human", "value": "<image>\n" + q_t},
            {"from": "gpt", "value": answer},
        ]
        tok = preprocess(
            preprocess_multimodal([conversations]), self.tokenizer,
            version=self.conv_version, has_image=True,
            image_token_len=(self.image_size // 14) ** 2,
            model_max_length=self.model_max_length)

        # the region mask at CLIP input resolution ('pad' geometry)
        m255 = expand2square((mask[..., None] * 255).astype(np.uint8),
                             (0,))[..., 0]
        clip_region = (resize_image(
            m255, (self.image_size, self.image_size), "nearest")
            > 127).astype(np.float32)

        return {
            "input_ids": tok["input_ids"][0],
            "labels": tok["labels"][0],
            "image": clip_preprocess(img, self.image_size,
                                     self.image_aspect_ratio
                                     ).astype(np.float32),
            "regions": clip_region[None],
            "num_regions": 1,
            "answer": answer,
            "img_metas": {"task": self.task,
                          "dataset_name": self.dataset_name},
        }
