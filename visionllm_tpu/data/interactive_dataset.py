"""Interactive (visual-prompt) detection dataset.

Behavioral reference: visionllmv2/datasets/coco_interactive.py — the
question names regions via "<reg>region1<region></reg>, ..." visual
prompts rendered by the ShapeSampler; the answer emits one
"[DET][EMB]..[EMB4]" block per region; the RegionEncoder consumes the
(image, prompt-mask) pairs at the <region> token positions.
"""

from __future__ import annotations

import os
import random
from typing import Dict

import numpy as np

from visionllm_tpu.data import templates as T
from visionllm_tpu.data.build import register_dataset
from visionllm_tpu.data.coco import CocoIndex
from visionllm_tpu.data.mm_utils import clip_preprocess
from visionllm_tpu.data.preprocess import preprocess, preprocess_multimodal
from visionllm_tpu.data.transforms import (det_test_transform,
                                           det_train_transform)
from visionllm_tpu.data.visual_sampler import ShapeSampler
from visionllm_tpu.ops.box_ops import box_xyxy_to_cxcywh_np

INTERACTIVE_QUESTIONS = [
    "Please detect the objects indicated by the given regions: <regions>.",
    "Find the objects marked by <regions> in the image.",
    "Locate the objects corresponding to the visual prompts <regions>.",
]
INTERACTIVE_YES = [
    "Sure, here are the results: <regions>.",
    "Certainly, the results for <regions> are shown.",
]


@register_dataset("coco_interactive")
class CocoInteractiveDataset:
    task = "interactive"
    dataset_name = "coco_interactive"

    def __init__(self, ann_file: str, img_prefix: str, tokenizer, *,
                 test_mode: bool = False, max_regions: int = 8,
                 num_embs: int = 4, image_size: int = 336,
                 image_aspect_ratio: str = "pad",
                 conv_version: str = "vicuna_v1",
                 model_max_length: int = 4096, seed: int = 0,
                 test_scale=None, buckets=None):
        self.coco = CocoIndex(ann_file, filter_empty=True)
        self.img_prefix = img_prefix
        self.tokenizer = tokenizer
        self.test_mode = test_mode
        self.max_regions = max_regions
        self.num_embs = num_embs
        self.image_size = image_size
        self.image_aspect_ratio = image_aspect_ratio
        self.conv_version = conv_version
        self.model_max_length = model_max_length
        from visionllm_tpu.data import transforms as _tf
        self.test_scale = test_scale or _tf.TEST_SCALE
        self.buckets = buckets or _tf.DEFAULT_BUCKETS
        self.rng = random.Random(seed)
        self.sampler = ShapeSampler(seed=seed)

    def __len__(self):
        return len(self.coco)

    def __getitem__(self, idx: int) -> Dict:
        ann = self.coco.load_anns(idx, with_mask=True)
        from PIL import Image
        img = np.asarray(Image.open(os.path.join(
            self.img_prefix, ann["file_name"])).convert("RGB"))
        n = min(len(ann["labels"]), self.max_regions)
        if n == 0:
            n = 0
        regions = np.stack([self.sampler(m) for m in ann["masks"][:n]]) \
            if n else np.zeros((0, *img.shape[:2]), np.uint8)

        sample = {"image": img, "boxes": ann["boxes"][:n],
                  "labels": np.arange(n, dtype=np.int32)}
        if self.test_mode:
            sample = det_test_transform(sample, self.test_scale,
                                        self.buckets)
        else:
            sample = det_train_transform(sample, self.rng)

        reg_strs = [f"<reg>region{i + 1}<region></reg>" for i in range(n)]
        q_t = (INTERACTIVE_QUESTIONS[0] if self.test_mode
               else self.rng.choice(INTERACTIVE_QUESTIONS))
        a_t = (INTERACTIVE_YES[0] if self.test_mode
               else self.rng.choice(INTERACTIVE_YES))
        blk = T.det_answer_tokens(self.num_embs)
        question = "<image>\n" + q_t.replace("<regions>",
                                             ", ".join(reg_strs))
        answer = a_t.replace(
            "<regions>", ", ".join(f"region{i + 1}{blk}"
                                   for i in range(n)))
        tok = preprocess(
            preprocess_multimodal([[
                {"from": "human", "value": question},
                {"from": "gpt", "value": answer}]]),
            self.tokenizer, version=self.conv_version, has_image=True,
            image_token_len=(self.image_size // 14) ** 2,
            model_max_length=self.model_max_length)

        # region prompt masks at the CLIP input resolution
        clip_regions = np.zeros(
            (self.max_regions, self.image_size, self.image_size),
            np.float32)
        from visionllm_tpu.data.mm_utils import expand2square, resize_image
        for i in range(n):
            m = expand2square(regions[i][..., None] * 255,
                              (0,))[..., 0]
            clip_regions[i] = resize_image(
                m, (self.image_size, self.image_size), "nearest") > 127

        out = {
            "input_ids": tok["input_ids"][0],
            "labels": tok["labels"][0],
            "image": clip_preprocess(img, self.image_size,
                                     self.image_aspect_ratio
                                     ).astype(np.float32),
            "image_aug": sample["image"].astype(np.float32),
            "pixel_mask": sample["pixel_mask"],
            "regions": clip_regions,
            "num_regions": n,
            "img_metas": {
                "task": self.task, "dataset_name": self.dataset_name,
                "id2index": {i: i for i in range(n)},
                "image_id": ann["image_id"],
                "ori_shape": (ann["height"], ann["width"]),
                "img_shape": sample["img_shape"],
            },
        }
        if not self.test_mode:
            hh, ww = sample["img_shape"]
            boxes = sample["boxes"].reshape(-1, 4)
            m = min(len(boxes), self.max_regions)
            tgt_boxes = np.zeros((self.max_regions, 4), np.float32)
            tgt_boxes[:m] = (box_xyxy_to_cxcywh_np(boxes[:m])
                             / np.asarray([ww, hh, ww, hh], np.float32))
            tgt_labels = np.zeros((self.max_regions,), np.int32)
            tgt_labels[:m] = sample["labels"][:m]
            valid = np.zeros((self.max_regions,), bool)
            valid[:m] = True
            out["targets"] = {"labels": tgt_labels, "boxes": tgt_boxes,
                              "valid": valid}
        return out
