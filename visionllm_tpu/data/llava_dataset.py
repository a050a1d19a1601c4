"""LLaVA-style chat/VQA dataset (json/jsonl conversations + images).

Behavioral reference: visionllmv2/datasets/llava_data.py:60-182
(LazySupervisedDataset): lazy json rows, retry-on-error, pad/anyres
image preprocessing, preprocess_v1 label masking.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional

import numpy as np

from visionllm_tpu.data.mm_utils import clip_preprocess, dynamic_preprocess
from visionllm_tpu.data.build import register_dataset
from visionllm_tpu.data.preprocess import preprocess, preprocess_multimodal


@register_dataset("llava")
class LlavaChatDataset:
    task = "chat"

    def __init__(
        self,
        ann_file: str,
        image_folder: str,
        tokenizer,
        *,
        image_size: int = 336,
        image_aspect_ratio: str = "pad",
        image_max_tile: int = 6,
        use_pixelshuffle: bool = False,
        conv_version: str = "vicuna_v1",
        model_max_length: int = 4096,
        seed: int = 0,
    ):
        if ann_file.endswith(".jsonl"):
            with open(ann_file) as f:
                self.rows = [json.loads(l) for l in f]
        else:
            with open(ann_file) as f:
                self.rows = json.load(f)
        self.image_folder = image_folder
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.image_aspect_ratio = image_aspect_ratio
        self.image_max_tile = image_max_tile
        self.use_pixelshuffle = use_pixelshuffle
        self.conv_version = conv_version
        self.model_max_length = model_max_length
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, idx: int) -> Dict:
        # retry a random sample on any per-sample failure (reference
        # llava_data.py:111-181 — data-level fault tolerance)
        for _ in range(10):
            try:
                return self._get(idx)
            except Exception:
                idx = self.rng.randrange(len(self.rows))
        return self._get(idx)

    def _get(self, idx: int) -> Dict:
        row = self.rows[idx]
        conversations = row["conversations"]
        has_image = "image" in row

        image = None
        image_token_len: object = 0
        if has_image:
            from PIL import Image
            img = np.asarray(Image.open(os.path.join(
                self.image_folder, row["image"])).convert("RGB"))
            tok_len = (self.image_size // 14) ** 2
            if self.use_pixelshuffle:
                tok_len //= 4
            if self.image_aspect_ratio == "anyres":
                tiles = dynamic_preprocess(
                    img, image_size=self.image_size,
                    max_num=self.image_max_tile)
                image = np.stack([
                    clip_preprocess(t, self.image_size, mode="resize")
                    for t in tiles])
                image_token_len = tok_len * len(tiles)
            else:
                image = clip_preprocess(img, self.image_size,
                                        self.image_aspect_ratio)[None]
                image_token_len = tok_len

        tok = preprocess(
            preprocess_multimodal([list(conversations)]), self.tokenizer,
            version=self.conv_version, has_image=has_image,
            image_token_len=image_token_len,
            model_max_length=self.model_max_length)
        out = {
            "input_ids": tok["input_ids"][0],
            "labels": tok["labels"][0],
            "img_metas": {"task": self.task, "dataset_name": "llava"},
        }
        if image is not None:
            out["image"] = image.astype(np.float32)
        return out
