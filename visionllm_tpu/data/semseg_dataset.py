"""Semantic segmentation dataset (ADE20K-style).

Behavioral reference: visionllmv2/datasets/ade20k_llava.py — semantic
segmentation as per-class mask queries: the conversation lists the
class vocabulary with one "[SEG][EMB]..[EMB4]" block per class; targets
are one binary mask per class present in the label map.

Annotation format: json rows {"image": path, "label": path} where label
is a PNG of class ids (255 = ignore), plus a class-name list.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List

import numpy as np

from visionllm_tpu.data import templates as T
from visionllm_tpu.data.build import register_dataset
from visionllm_tpu.data.mm_utils import clip_preprocess, resize_image
from visionllm_tpu.data.preprocess import preprocess, preprocess_multimodal
from visionllm_tpu.data.transforms import (det_test_transform,
                                           det_train_transform)


def seg_answer_tokens(num_embs: int) -> str:
    if num_embs == 1:
        return "[SEG][EMB]"
    return "[SEG][EMB]" + "".join(f"[EMB{i}]" for i in range(2, num_embs + 1))


@register_dataset("semseg")
class SemSegDataset:
    task = "semseg"
    dataset_name = "ade20k"

    def __init__(self, ann_file: str, img_prefix: str, tokenizer, *,
                 class_names: List[str], test_mode: bool = False,
                 max_classes_per_sample: int = 32, num_embs: int = 4,
                 image_size: int = 336, image_aspect_ratio: str = "pad",
                 conv_version: str = "vicuna_v1",
                 model_max_length: int = 4096, seed: int = 0,
                 test_scale=None, train_scales=None, buckets=None, **_):
        with open(ann_file) as f:
            self.rows = ([json.loads(l) for l in f]
                         if ann_file.endswith(".jsonl") else json.load(f))
        self.img_prefix = img_prefix
        self.tokenizer = tokenizer
        self.class_names = list(class_names)
        self.test_mode = test_mode
        self.max_classes = max_classes_per_sample
        self.num_embs = num_embs
        self.image_size = image_size
        self.image_aspect_ratio = image_aspect_ratio
        self.conv_version = conv_version
        self.model_max_length = model_max_length
        from visionllm_tpu.data import transforms as _tf
        self.test_scale = test_scale or _tf.TEST_SCALE
        self.train_scales = train_scales or _tf.TRAIN_SCALES
        self.buckets = buckets or _tf.DEFAULT_BUCKETS
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx: int) -> Dict:
        from PIL import Image
        row = self.rows[idx]
        img = np.asarray(Image.open(os.path.join(
            self.img_prefix, row["image"])).convert("RGB"))
        label = np.asarray(Image.open(os.path.join(
            self.img_prefix, row["label"])))

        present = sorted(int(c) for c in np.unique(label)
                         if c != 255 and c < len(self.class_names))
        if self.test_mode:
            class_ids = list(range(len(self.class_names)))[:self.max_classes]
        else:
            neg = [c for c in range(len(self.class_names))
                   if c not in present]
            self.rng.shuffle(neg)
            class_ids = (present + neg)[:self.max_classes]
            self.rng.shuffle(class_ids)

        masks = np.stack([(label == c).astype(np.uint8)
                          for c in class_ids]) if class_ids else \
            np.zeros((0, *label.shape), np.uint8)
        # boxes = tight boxes around each class mask (degenerate masks
        # keep a unit box; loss masks them via valid)
        boxes = []
        valid_cls = []
        for m in masks:
            ys, xs = np.nonzero(m)
            if len(ys):
                boxes.append([xs.min(), ys.min(), xs.max() + 1,
                              ys.max() + 1])
                valid_cls.append(True)
            else:
                boxes.append([0, 0, 1, 1])
                valid_cls.append(False)
        sample = {"image": img,
                  "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
                  "labels": np.arange(len(class_ids), dtype=np.int32),
                  "masks": masks}
        if self.test_mode:
            sample = det_test_transform(sample, self.test_scale,
                                        self.buckets)
            q_t, a_t = T.DET_QUESTIONS[0], T.DET_YES[0]
        else:
            sample = det_train_transform(sample, self.rng,
                                         self.train_scales, self.buckets)
            q_t = self.rng.choice(T.DET_QUESTIONS)
            a_t = self.rng.choice(T.DET_YES)

        names = [self.class_names[c] for c in class_ids]
        blk = seg_answer_tokens(self.num_embs)
        question = "<image>\n" + q_t.replace("<class>", ", ".join(names))
        answer = a_t.replace("<class>", (blk + ", ").join(names) + blk)
        tok = preprocess(
            preprocess_multimodal([[
                {"from": "human", "value": question},
                {"from": "gpt", "value": answer}]]),
            self.tokenizer, version=self.conv_version, has_image=True,
            image_token_len=(self.image_size // 14) ** 2,
            model_max_length=self.model_max_length)

        out = {
            "input_ids": tok["input_ids"][0],
            "labels": tok["labels"][0],
            "image": clip_preprocess(img, self.image_size,
                                     self.image_aspect_ratio
                                     ).astype(np.float32),
            "image_aug": sample["image"].astype(np.float32),
            "pixel_mask": sample["pixel_mask"],
            "img_metas": {
                "task": self.task, "dataset_name": self.dataset_name,
                "id2index": {c: i for i, c in enumerate(class_ids)},
                "class_ids": class_ids,
                "ori_shape": label.shape[:2],
                "img_shape": sample["img_shape"],
            },
        }
        if not self.test_mode:
            K = self.max_classes
            hh, ww = sample["img_shape"]
            mh, mw = sample["image"].shape[:2]
            n = len(class_ids)
            from visionllm_tpu.ops.box_ops import box_xyxy_to_cxcywh_np
            tgt_boxes = np.zeros((K, 4), np.float32)
            tgt_masks = np.zeros((K, mh // 4, mw // 4), np.float32)
            if n:
                tgt_boxes[:n] = (box_xyxy_to_cxcywh_np(sample["boxes"][:n])
                                 / np.asarray([ww, hh, ww, hh], np.float32))
                for i in range(n):
                    tgt_masks[i] = (resize_image(
                        sample["masks"][i] * 255,
                        (mh // 4, mw // 4), "bilinear") > 127)
            v = np.zeros((K,), bool)
            v[:n] = np.asarray(valid_cls[:n]) if n else v[:n]
            out["targets"] = {
                "labels": np.arange(K, dtype=np.int32),
                "boxes": tgt_boxes,
                "masks": tgt_masks,
                "valid": v,
            }
        return out
