"""In-context (multi-image) datasets: ic_text and ic_mask.

Behavioral reference: visionllmv2/datasets/mmic_text.py (multi-image
text QA — each conversation interleaves several <image> placeholders)
and mmic_mask.py (in-context segmentation: reference image + region →
"[DET][EMB..]" on the query image; num_splits plumbed through the
collator and model, collator.py:327-356 / modeling_visionllmv2.py:625-663).

TPU-first: images are padded to a fixed tiles-per-sample T (extra tiles
zeroed; their <im_patch> tokens are simply absent from the prompt so the
scatter consumes only real tiles — scatter order is flattened (sample,
tile)).
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List

import numpy as np

from visionllm_tpu.data import templates as T
from visionllm_tpu.data.build import register_dataset
from visionllm_tpu.data.mm_utils import clip_preprocess
from visionllm_tpu.data.preprocess import preprocess, preprocess_multimodal


@register_dataset("mmic_text")
class MMICTextDataset:
    """json rows: {"images": [paths], "conversations": [...]} with one
    <image> per image in the human turns."""

    task = "ic_text"
    dataset_name = "mmic_text"

    def __init__(self, ann_file: str, image_folder: str, tokenizer, *,
                 max_images: int = 4, image_size: int = 336,
                 conv_version: str = "vicuna_v1",
                 model_max_length: int = 4096, seed: int = 0, **_):
        with open(ann_file) as f:
            self.rows = ([json.loads(l) for l in f]
                         if ann_file.endswith(".jsonl") else json.load(f))
        self.image_folder = image_folder
        self.tokenizer = tokenizer
        self.max_images = max_images
        self.image_size = image_size
        self.conv_version = conv_version
        self.model_max_length = model_max_length

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx: int) -> Dict:
        row = self.rows[idx]
        from PIL import Image
        paths = row["images"][:self.max_images]
        imgs = [np.asarray(Image.open(os.path.join(
            self.image_folder, p)).convert("RGB")) for p in paths]
        tok_len = (self.image_size // 14) ** 2
        tok = preprocess(
            preprocess_multimodal([list(row["conversations"])]),
            self.tokenizer, version=self.conv_version, has_image=True,
            image_token_len=[tok_len] * len(imgs),
            model_max_length=self.model_max_length)
        tiles = np.zeros((self.max_images, self.image_size,
                          self.image_size, 3), np.float32)
        for i, im in enumerate(imgs):
            tiles[i] = clip_preprocess(im, self.image_size, "pad")
        return {
            "input_ids": tok["input_ids"][0],
            "labels": tok["labels"][0],
            "image": tiles,                    # [T, H, W, 3]
            "num_images": len(imgs),
            "img_metas": {"task": self.task,
                          "dataset_name": self.dataset_name},
        }


IC_MASK_QUESTIONS = [
    "Given the example region <reg>region1<region></reg> in the first "
    "image, find the corresponding objects in the second image.",
    "The first image marks <reg>region1<region></reg>. Detect the same "
    "kind of object in the second image.",
]
IC_MASK_YES = [
    "Sure, here are the corresponding objects: <blk>.",
    "Certainly, the matching objects are <blk>.",
]


@register_dataset("mmic_mask")
class MMICMaskDataset:
    """json rows: {"support_image", "support_bbox"/"support_segmentation",
    "query_image", "query_boxes": [[x,y,w,h]...]} — in-context det/seg."""

    task = "ic_mask"
    dataset_name = "mmic_mask"

    def __init__(self, ann_file: str, image_folder: str, tokenizer, *,
                 num_embs: int = 4, max_gt_per_img: int = 8,
                 image_size: int = 336, conv_version: str = "vicuna_v1",
                 model_max_length: int = 4096, seed: int = 0,
                 test_mode: bool = False, train_scales=None, buckets=None,
                 **_):
        with open(ann_file) as f:
            self.rows = ([json.loads(l) for l in f]
                         if ann_file.endswith(".jsonl") else json.load(f))
        self.image_folder = image_folder
        self.tokenizer = tokenizer
        self.num_embs = num_embs
        self.max_gt = max_gt_per_img
        self.image_size = image_size
        self.conv_version = conv_version
        self.model_max_length = model_max_length
        self.test_mode = test_mode
        from visionllm_tpu.data import transforms as _tf
        self.train_scales = train_scales or _tf.TRAIN_SCALES
        self.buckets = buckets or _tf.DEFAULT_BUCKETS
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx: int) -> Dict:
        from PIL import Image
        from visionllm_tpu.data.region_dataset import region_mask_from_ann
        from visionllm_tpu.data.transforms import (det_test_transform,
                                                   det_train_transform)
        from visionllm_tpu.data.mm_utils import expand2square, resize_image
        from visionllm_tpu.ops.box_ops import box_xyxy_to_cxcywh_np

        row = self.rows[idx]
        sup = np.asarray(Image.open(os.path.join(
            self.image_folder, row["support_image"])).convert("RGB"))
        qry = np.asarray(Image.open(os.path.join(
            self.image_folder, row["query_image"])).convert("RGB"))
        sup_mask = region_mask_from_ann(
            {"bbox": row.get("support_bbox"),
             "segmentation": row.get("support_segmentation")},
            sup.shape[0], sup.shape[1])

        boxes = np.asarray([[x, y, x + w, y + h]
                            for x, y, w, h in row["query_boxes"]],
                           np.float32)
        sample = {"image": qry, "boxes": boxes,
                  "labels": np.zeros(len(boxes), np.int32)}
        if self.test_mode:
            sample = det_test_transform(sample)
            q_t, a_t = IC_MASK_QUESTIONS[0], IC_MASK_YES[0]
        else:
            sample = det_train_transform(sample, self.rng,
                                         self.train_scales, self.buckets)
            q_t = self.rng.choice(IC_MASK_QUESTIONS)
            a_t = self.rng.choice(IC_MASK_YES)

        blk = T.det_answer_tokens(self.num_embs)
        conversations = [
            {"from": "human", "value": "<image>\n<image>\n" + q_t},
            {"from": "gpt", "value": a_t.replace("<blk>", blk)},
        ]
        tok = preprocess(
            preprocess_multimodal([conversations]), self.tokenizer,
            version=self.conv_version, has_image=True,
            image_token_len=(self.image_size // 14) ** 2,
            model_max_length=self.model_max_length)

        tiles = np.stack([
            clip_preprocess(sup, self.image_size, "pad"),
            clip_preprocess(qry, self.image_size, "pad")]).astype(np.float32)
        m255 = expand2square((sup_mask[..., None] * 255).astype(np.uint8),
                             (0,))[..., 0]
        clip_region = (resize_image(
            m255, (self.image_size, self.image_size), "nearest")
            > 127).astype(np.float32)

        hh, ww = sample["img_shape"]
        n = min(len(sample["boxes"]), self.max_gt)
        tgt_boxes = np.zeros((self.max_gt, 4), np.float32)
        if n:
            tgt_boxes[:n] = (box_xyxy_to_cxcywh_np(sample["boxes"][:n])
                             / np.asarray([ww, hh, ww, hh], np.float32))
        valid = np.zeros((self.max_gt,), bool)
        valid[:n] = True
        return {
            "input_ids": tok["input_ids"][0],
            "labels": tok["labels"][0],
            "image": tiles,                  # [2, H, W, 3]
            "image_aug": sample["image"].astype(np.float32),
            "pixel_mask": sample["pixel_mask"],
            "regions": clip_region[None],
            "num_regions": 1,
            "targets": {"labels": np.zeros((self.max_gt,), np.int32),
                        "boxes": tgt_boxes, "valid": valid},
            "img_metas": {"task": self.task,
                          "dataset_name": self.dataset_name,
                          "id2index": {0: 0},
                          "img_shape": sample["img_shape"]},
        }
