"""COCO-keypoints pose dataset.

Behavioral reference: visionllmv2/datasets/coco_pose_llava.py /
unikpt_llava.py:231-299 — two-part answer: "[DET][EMB]..[EMB4]" for the
object class, then one "[POSE][EMB]..[EMB4]" block per keypoint class;
keypoints stored "xyxy..vv" normalized; kpt_id2index records the
(train-time shuffled) keypoint-class → answer-slot order.
"""

from __future__ import annotations

import random
from typing import Dict, List

import numpy as np

from visionllm_tpu.data import templates as T
from visionllm_tpu.data.build import register_dataset
from visionllm_tpu.data.coco import CocoIndex
from visionllm_tpu.data.mm_utils import clip_preprocess
from visionllm_tpu.data.preprocess import preprocess, preprocess_multimodal
from visionllm_tpu.data.transforms import (det_test_transform,
                                           det_train_transform)
from visionllm_tpu.ops.box_ops import box_xyxy_to_cxcywh_np

COCO_KEYPOINT_NAMES = [
    "nose", "left eye", "right eye", "left ear", "right ear",
    "left shoulder", "right shoulder", "left elbow", "right elbow",
    "left wrist", "right wrist", "left hip", "right hip", "left knee",
    "right knee", "left ankle", "right ankle"]


@register_dataset("coco_pose")
class CocoPoseDataset:
    task = "pose"
    dataset_name = "coco_pose"

    def __init__(self, ann_file: str, img_prefix: str, tokenizer, *,
                 test_mode: bool = False, num_embs: int = 4,
                 num_body_points: int = 68, max_gt_per_img: int = 20,
                 image_size: int = 336, image_aspect_ratio: str = "pad",
                 conv_version: str = "vicuna_v1",
                 model_max_length: int = 4096, seed: int = 0,
                 test_scale=None, buckets=None,
                 keypoint_names: List[str] = None):
        self.coco = CocoIndex(ann_file, filter_empty=not test_mode)
        self.img_prefix = img_prefix
        self.tokenizer = tokenizer
        self.test_mode = test_mode
        self.num_embs = num_embs
        self.nb = num_body_points
        self.max_gt = max_gt_per_img
        self.image_size = image_size
        self.image_aspect_ratio = image_aspect_ratio
        self.conv_version = conv_version
        self.model_max_length = model_max_length
        self.kpt_names = keypoint_names or COCO_KEYPOINT_NAMES
        from visionllm_tpu.data import transforms as _tf
        self.test_scale = test_scale or _tf.TEST_SCALE
        self.buckets = buckets or _tf.DEFAULT_BUCKETS
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.coco)

    def _keypoints(self, idx: int):
        """per-instance raw keypoints [N, K, 3] pixel xyv."""
        anns = [a for a in self.coco.anns_by_image[self.coco.img_ids[idx]]
                if not a.get("iscrowd", 0) and a.get("num_keypoints", 0) > 0]
        K = len(self.kpt_names)
        kps, boxes = [], []
        for a in anns:
            kp = np.asarray(a["keypoints"], np.float32).reshape(K, 3)
            kps.append(kp)
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
        if not kps:
            return (np.zeros((0, K, 3), np.float32),
                    np.zeros((0, 4), np.float32))
        return np.stack(kps), np.asarray(boxes, np.float32)

    def _sample_kpt_classes(self, K: int) -> List[int]:
        """Train-time keypoint-class order for the answer slots. Base:
        all classes, shuffled. UniKPT additionally truncates to a random
        subset >= 1 (unikpt_llava.py:248-257)."""
        order = list(range(K))
        self.rng.shuffle(order)
        return order

    def __getitem__(self, idx: int) -> Dict:
        info = self.coco.image_info(idx)
        from PIL import Image
        import os
        img = np.asarray(Image.open(os.path.join(
            self.img_prefix, info["file_name"])).convert("RGB"))
        kps, boxes = self._keypoints(idx)
        N, K = kps.shape[:2]

        sample = {"image": img, "boxes": boxes,
                  "labels": np.zeros(N, np.int32),
                  "keypoints": kps}
        if self.test_mode:
            sample0 = det_test_transform(
                {k: v for k, v in sample.items() if k != "keypoints"},
                self.test_scale, self.buckets)
            q_det, a_det = T.DET_QUESTIONS[0], T.DET_YES[0]
            q_pose, a_pose = T.POSE_QUESTIONS[0], T.POSE_ANS[0]
            kpt_order = list(range(K))
        else:
            sample0 = det_train_transform(
                {k: v for k, v in sample.items() if k != "keypoints"},
                self.rng)
            q_det = self.rng.choice(T.DET_QUESTIONS)
            a_det = self.rng.choice(T.DET_YES)
            q_pose = self.rng.choice(T.POSE_QUESTIONS)
            a_pose = self.rng.choice(T.POSE_ANS)
            kpt_order = self._sample_kpt_classes(K)

        obj_cls = "person"
        det_blk = T.det_answer_tokens(self.num_embs)
        pose_blk = T.pose_answer_tokens(self.num_embs)
        kpt_list = [self.kpt_names[i] for i in kpt_order]
        q = ("<image>\n" + q_det.replace("<class>", obj_cls) + " "
             + q_pose.replace("<class>", ", ".join(kpt_list)))
        a = (a_det.replace("<class>", obj_cls + det_blk) + " "
             + a_pose.replace("<class>",
                              (pose_blk + ", ").join(kpt_list) + pose_blk))
        conversations = [{"from": "human", "value": q},
                         {"from": "gpt", "value": a}]
        tok = preprocess(
            preprocess_multimodal([conversations]), self.tokenizer,
            version=self.conv_version, has_image=True,
            image_token_len=(self.image_size // 14) ** 2,
            model_max_length=self.model_max_length)

        out = {
            "input_ids": tok["input_ids"][0],
            "labels": tok["labels"][0],
            "image": clip_preprocess(img, self.image_size,
                                     self.image_aspect_ratio
                                     ).astype(np.float32),
            "image_aug": sample0["image"].astype(np.float32),
            "pixel_mask": sample0["pixel_mask"],
            "img_metas": {
                "task": self.task, "dataset_name": self.dataset_name,
                "id2index": {0: 0},
                # kpt answer slot s holds keypoint class kpt_order[s]
                "kpt_id2index": {int(c): s
                                 for s, c in enumerate(kpt_order)},
                "image_id": self.coco.img_ids[idx],
                "ori_shape": (info["height"], info["width"]),
                "img_shape": sample0["img_shape"],
            },
        }
        if not self.test_mode:
            hh, ww = sample0["img_shape"]
            fh = hh / img.shape[0]
            fw = ww / img.shape[1]
            n = min(N, self.max_gt)
            nb = self.nb
            tgt_boxes = np.zeros((self.max_gt, 4), np.float32)
            tgt_kpts = np.zeros((self.max_gt, 3 * nb), np.float32)
            area = np.full((self.max_gt,), 1e-3, np.float32)
            valid = np.zeros((self.max_gt,), bool)
            if n:
                b = boxes[:n] * np.asarray([fw, fh, fw, fh], np.float32)
                tgt_boxes[:n] = (box_xyxy_to_cxcywh_np(b)
                                 / np.asarray([ww, hh, ww, hh], np.float32))
                # answer-slot order: xy normalized; zero-pad beyond K
                xy = kps[:n, :, :2] * np.asarray([[[fw / ww, fh / hh]]])
                v = (kps[:n, :, 2] > 0).astype(np.float32)
                S = len(kpt_order)            # may be a subset (unikpt)
                xy_s = xy[:, kpt_order]       # reorder to answer slots
                v_s = v[:, kpt_order]
                tgt_kpts[:n, :2 * S] = xy_s.reshape(n, 2 * S)
                tgt_kpts[:n, 2 * nb:2 * nb + S] = v_s
                wh = tgt_boxes[:n, 2:4]
                area[:n] = np.maximum(wh[:, 0] * wh[:, 1], 1e-4)
                valid[:n] = True
            out["targets"] = {
                "labels": np.zeros((self.max_gt,), np.int32),
                "boxes": tgt_boxes,
                "keypoints": tgt_kpts,
                "area": area,
                "valid": valid,
            }
        return out


CROWDPOSE_KEYPOINT_NAMES = [
    # crowdpose_llava.py:104-119 (continuous order)
    "left shoulder", "right shoulder", "left elbow", "right elbow",
    "left wrist", "right wrist", "left hip", "right hip",
    "left knee", "right knee", "left ankle", "right ankle",
    "head", "neck"]


@register_dataset("crowdpose")
class CrowdPoseDataset(CocoPoseDataset):
    """CrowdPose keypoints (behavioral reference:
    datasets/crowdpose_llava.py — 14 keypoint classes, person-only
    objects; same two-part [DET]/[POSE] answer and kpt_id2index
    shuffling machinery as CocoPoseDataset)."""

    dataset_name = "crowdpose"

    def __init__(self, *args, **kw):
        kw.setdefault("keypoint_names", CROWDPOSE_KEYPOINT_NAMES)
        super().__init__(*args, **kw)


@register_dataset("unikpt")
class UniKPTDataset(CocoPoseDataset):
    """UniKPT multi-species keypoints (behavioral reference:
    datasets/unikpt_llava.py): keypoint class names come from the
    annotation file's categories[...]["keypoints"] (clean-stringed,
    :176-182), and train-time answers cover a RANDOM SUBSET (>=1) of
    the shuffled keypoint classes (:248-257) — the kpt_id2index mapping
    then records which original class each answer slot holds, which is
    what the pose eval uses to unshuffle predictions."""

    dataset_name = "unikpt"

    def __init__(self, ann_file, *args, **kw):
        if "keypoint_names" not in kw:
            import json as _json
            with open(ann_file) as f:
                cats = _json.load(f).get("categories", [])
            kpt_lists = [c.get("keypoints", []) for c in cats]
            if kpt_lists:
                assert all(k == kpt_lists[0] for k in kpt_lists[1:]), (
                    "unikpt requires identical keypoint lists per category"
                    " (unikpt_llava.py:177-179)")
                kw["keypoint_names"] = [
                    k.strip().lower().replace("_", " ")
                    for k in kpt_lists[0]]
        super().__init__(ann_file, *args, **kw)

    def _sample_kpt_classes(self, K):
        order = list(range(K))
        self.rng.shuffle(order)
        n = self.rng.randint(1, K)
        return order[:n]
