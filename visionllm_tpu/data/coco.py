"""Minimal COCO-format annotation store (torch/mmdet/pycocotools-free).

Replaces the mmdet CocoDataset plumbing the reference builds on
(visionllmv2/datasets/coco_llava.py:68 subclasses mmdet CocoDataset):
JSON index, per-image annotation lookup, polygon/RLE mask decoding.
RLE codecs live in ops/rle.py (native C++ with numpy fallback).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


class CocoIndex:
    """Parsed COCO annotation file with contiguous category mapping
    (mmdet convention: cat ids → 0..K-1 in category order)."""

    def __init__(self, ann_file: str,
                 filter_empty: bool = False):
        with open(ann_file) as f:
            raw = json.load(f)
        self.images = {img["id"]: img for img in raw.get("images", [])}
        self.categories = sorted(raw.get("categories", []),
                                 key=lambda c: c["id"])
        self.cat2label = {c["id"]: i for i, c in enumerate(self.categories)}
        self.class_names = [c["name"] for c in self.categories]
        self.anns_by_image: Dict[int, List[dict]] = {
            i: [] for i in self.images}
        for ann in raw.get("annotations", []):
            if ann["image_id"] in self.anns_by_image:
                self.anns_by_image[ann["image_id"]].append(ann)
        ids = sorted(self.images)
        if filter_empty:
            ids = [i for i in ids if any(
                not a.get("iscrowd", 0) for a in self.anns_by_image[i])]
        self.img_ids = ids

    def __len__(self) -> int:
        return len(self.img_ids)

    def image_info(self, idx: int) -> dict:
        return self.images[self.img_ids[idx]]

    def load_anns(self, idx: int, with_mask: bool = False) -> dict:
        """Return labels [N], boxes xyxy [N, 4] float32, optional masks
        [N, H, W] uint8 (crowd annotations skipped, mmdet-style)."""
        info = self.image_info(idx)
        h, w = info["height"], info["width"]
        labels, boxes, masks = [], [], []
        for ann in self.anns_by_image[self.img_ids[idx]]:
            if ann.get("iscrowd", 0):
                continue
            x, y, bw, bh = ann["bbox"]
            if bw <= 1 or bh <= 1:
                continue
            labels.append(self.cat2label[ann["category_id"]])
            boxes.append([x, y, x + bw, y + bh])
            if with_mask:
                masks.append(decode_segmentation(ann.get("segmentation"),
                                                 h, w))
        out = {
            "labels": np.asarray(labels, np.int32),
            "boxes": (np.asarray(boxes, np.float32).reshape(-1, 4)),
            "height": h, "width": w,
            "file_name": info["file_name"],
            "image_id": self.img_ids[idx],
        }
        if with_mask:
            out["masks"] = (np.stack(masks) if masks
                            else np.zeros((0, h, w), np.uint8))
        return out


def rasterize_polygons(polys: Sequence[Sequence[float]], h: int,
                       w: int) -> np.ndarray:
    """Polygon list → binary mask via PIL (same rasterization family as
    pycocotools frPyObjects → decode)."""
    from PIL import Image, ImageDraw
    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for poly in polys:
        pts = [(poly[i], poly[i + 1]) for i in range(0, len(poly) - 1, 2)]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.asarray(img, np.uint8)


def decode_segmentation(seg, h: int, w: int) -> np.ndarray:
    """Polygon / RLE / compressed-RLE segmentation → [H, W] uint8."""
    if seg is None:
        return np.zeros((h, w), np.uint8)
    if isinstance(seg, list):
        return rasterize_polygons(seg, h, w)
    from visionllm_tpu.ops.rle import rle_decode
    counts = seg["counts"]
    if isinstance(counts, list):            # uncompressed RLE
        m = np.zeros(h * w, np.uint8)
        pos, val = 0, 0
        for c in counts:
            m[pos:pos + c] = val
            pos += c
            val = 1 - val
        return m.reshape(w, h).T            # column-major
    return rle_decode(counts, h, w)
