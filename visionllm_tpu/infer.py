"""Single-image perception inference (`Predictor`).

The reference exposes perception only through COCO-format eval scripts
(SURVEY §1: no demo/serving layer — "Add Hugging Face Demo" is an
unchecked README item); a user who wants boxes for one image has to
fake a dataset. This module packages the same device-side inference
(composite prefill → [EMB] routing → tool head → top-k) behind a
direct API:

    p = Predictor(cfg, params, tokenizer)
    dets = p.detect(image, ["person", "dog"])          # boxes/scores
    box  = p.ground(image, "the dog on the left")      # one box
    kpts = p.pose(image)                               # COCO keypoints

Prompt construction mirrors the datasets' test-mode prompts exactly
(behavioral reference: datasets/coco_llava.py test prompts for det,
refcoco_llava.py for grd, unikpt_llava.py:231-299 for pose), so a
converted reference checkpoint sees the same token stream it was
trained on. Images take the same DETR test transform (resize keep-ratio
to 800/1333, normalize, bucket-pad) and CLIP preprocess as eval.

TPU notes: one jitted program per (task, bucket, prompt-length bucket);
prompt ids are right-padded to a 32 multiple so recompiles are rare
(causal attention — pads sit after the answer blocks and cannot affect
the [EMB] positions read by the tool heads). Results come back in
original-image pixel coordinates.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.data import templates as T
from visionllm_tpu.data.mm_utils import clip_preprocess
from visionllm_tpu.data.preprocess import preprocess, preprocess_multimodal
from visionllm_tpu.data.transforms import (DEFAULT_BUCKETS, TEST_SCALE,
                                           det_test_transform)
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.models.visionllm import SpecialTokenIds

COCO_KEYPOINT_NAMES = [
    "nose", "left eye", "right eye", "left ear", "right ear",
    "left shoulder", "right shoulder", "left elbow", "right elbow",
    "left wrist", "right wrist", "left hip", "right hip", "left knee",
    "right knee", "left ankle", "right ankle",
]


class Predictor:
    """Direct perception inference on numpy images.

    Args:
      cfg: VisionLLMConfig (needs the gdino tool for detect/ground and
        the unipose tool for pose).
      params: parameter tree for ``VisionLLMWithTools`` (e.g. from
        ``utils.torch_convert.convert_composite`` on a released
        checkpoint).
      tokenizer: tokenizer with the 26 special tokens added.
    """

    def __init__(self, cfg, params, tokenizer, *, dtype=jnp.bfloat16,
                 conv_version: str = "v1", num_embs: int = 4,
                 test_scale=TEST_SCALE, buckets=DEFAULT_BUCKETS,
                 model_max_length: int = 4096):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.model = VisionLLMWithTools(cfg, dtype=dtype)
        self.tid = SpecialTokenIds.from_tokenizer(tokenizer)
        self.conv_version = conv_version
        self.num_embs = num_embs
        self.test_scale = test_scale
        self.buckets = buckets
        self.model_max_length = model_max_length
        self.image_size = cfg.vis_encoder.image_size
        self._fns: Dict[tuple, object] = {}

    # ---- shared preprocessing ---------------------------------------

    def _prepare(self, image: np.ndarray, question: str, answer: str):
        """Image transforms + test-prompt tokenization → device arrays."""
        image = np.asarray(image)
        if image.ndim != 3 or image.shape[2] != 3:
            raise ValueError(f"expected [H, W, 3] image, got {image.shape}")
        ori_shape = image.shape[:2]
        sample = det_test_transform(
            {"image": image.astype(np.float32),
             "boxes": np.zeros((0, 4), np.float32),
             "labels": np.zeros((0,), np.int32)},
            self.test_scale, self.buckets)
        clip_img = clip_preprocess(image, self.image_size)

        conversations = [{"from": "human", "value": question},
                         {"from": "gpt", "value": answer}]
        tok = preprocess(
            preprocess_multimodal([conversations]), self.tokenizer,
            version=self.conv_version, has_image=True,
            image_token_len=(self.image_size // 14) ** 2,
            model_max_length=self.model_max_length)
        ids = np.asarray(tok["input_ids"][0], np.int32)
        # right-pad to a 32 multiple: fewer jit retraces across prompt
        # lengths; pads follow the answer blocks, so under causal
        # attention the [EMB] positions the tool heads read are
        # unaffected
        pad = (-len(ids)) % 32
        if pad:
            pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
            ids = np.concatenate([ids, np.full(pad, pad_id, np.int32)])
        return {
            "input_ids": jnp.asarray(ids)[None],
            "image": jnp.asarray(clip_img.astype(np.float32))[None],
            "image_aug": jnp.asarray(sample["image"].astype(np.float32))[None],
            "pixel_mask": jnp.asarray(sample["pixel_mask"])[None],
            "ori_shape": ori_shape,
            "img_shape": sample["img_shape"],
        }

    # ---- detection ---------------------------------------------------

    def _det_fn(self, num_classes: int, topk: int):
        key = ("det", num_classes, topk)
        if key not in self._fns:
            from visionllm_tpu.eval.eval_det import make_det_infer_fn
            self._fns[key] = make_det_infer_fn(
                self.model, self.tid, num_classes, topk)
        return self._fns[key]

    def detect(self, image: np.ndarray, class_names: Sequence[str], *,
               threshold: float = 0.3, topk: int = 100,
               with_mask: bool = False) -> Dict[str, np.ndarray]:
        """Open-vocabulary detection: top-k boxes over the class list.

        Returns {"boxes" [N,4] xyxy pixels, "scores" [N], "labels" [N]
        (indices into class_names), "class_names" [N]}, plus "masks"
        (list of [H,W] bool at the original resolution) if requested.
        """
        from visionllm_tpu.eval.postprocess import (post_process_masks_np,
                                                    scale_boxes_np)
        class_names = list(class_names)
        q = "<image>\n" + T.DET_QUESTIONS[0].replace(
            "<class>", ", ".join(class_names))
        blk = T.det_answer_tokens(self.num_embs)
        a = T.DET_YES[0].replace(
            "<class>", (blk + ", ").join(class_names) + blk)
        arr = self._prepare(image, q, a)
        out = jax.device_get(self._det_fn(len(class_names), topk)(
            self.params, arr["input_ids"], arr["image"],
            arr["image_aug"], arr["pixel_mask"]))
        scores = np.asarray(out["scores"][0])
        keep = scores >= threshold
        labels = np.asarray(out["labels"][0])[keep]
        res = {
            "scores": scores[keep],
            "labels": labels,
            "boxes": scale_boxes_np(np.asarray(out["boxes"][0])[keep],
                                    arr["ori_shape"]),
            "class_names": [class_names[int(l)] for l in labels],
        }
        if with_mask:
            res["masks"] = list(post_process_masks_np(
                np.asarray(out["mask_logits"][0])[keep],
                arr["img_shape"], arr["ori_shape"]))
        return res

    # ---- referring-expression grounding -------------------------------

    def ground(self, image: np.ndarray, expression: str, *,
               with_mask: bool = False) -> Dict[str, np.ndarray]:
        """One box (top-scoring query) for a referring expression."""
        from visionllm_tpu.eval.postprocess import (post_process_masks_np,
                                                    scale_boxes_np)
        key = ("grd",)
        if key not in self._fns:
            from visionllm_tpu.eval.eval_grd import make_grd_infer_fn
            self._fns[key] = make_grd_infer_fn(self.model, self.tid)
        q = "<image>\n" + T.GRD_QUESTIONS[0].replace(
            "<expression>", expression)
        a = T.GRD_YES[0].replace(
            "<expression>", T.grd_answer_tokens(self.num_embs))
        arr = self._prepare(image, q, a)
        out = jax.device_get(self._fns[key](
            self.params, arr["input_ids"], arr["image"],
            arr["image_aug"], arr["pixel_mask"]))
        res = {
            "box": scale_boxes_np(np.asarray(out["box"]),
                                  arr["ori_shape"])[0],
            "score": float(out["score"][0]),
        }
        if with_mask:
            res["mask"] = post_process_masks_np(
                np.asarray(out["mask_logits"]),
                arr["img_shape"], arr["ori_shape"])[0]
        return res

    # ---- pose ----------------------------------------------------------

    def pose(self, image: np.ndarray, *,
             keypoint_names: Optional[Sequence[str]] = None,
             instance_class: str = "person", threshold: float = 0.3,
             topk: int = 20) -> Dict[str, np.ndarray]:
        """Keypoint detection (UniPose head): instances + keypoints.

        Returns {"scores" [N], "boxes" [N,4] xyxy pixels,
        "keypoints" [N,K,3] (x, y, score) pixels,
        "keypoint_names" [K]} for instances above `threshold`.
        """
        from visionllm_tpu.eval.eval_pose import post_process_pose
        kpt_names = list(keypoint_names or COCO_KEYPOINT_NAMES)
        key = ("pose",)
        if key not in self._fns:
            def fn(p, ids, im, ia, pm):
                return self.model.apply(
                    {"params": p}, ids, im, ia, self.tid, 1,
                    pixel_mask=pm,
                    method=VisionLLMWithTools.infer_pose)
            self._fns[key] = jax.jit(fn)
        det_blk = T.det_answer_tokens(self.num_embs)
        pose_blk = T.pose_answer_tokens(self.num_embs)
        q = ("<image>\n"
             + T.DET_QUESTIONS[0].replace("<class>", instance_class)
             + " " + T.POSE_QUESTIONS[0].replace(
                 "<class>", ", ".join(kpt_names)))
        a = (T.DET_YES[0].replace("<class>", instance_class + det_blk)
             + " " + T.POSE_ANS[0].replace(
                 "<class>", (pose_blk + ", ").join(kpt_names) + pose_blk))
        arr = self._prepare(image, q, a)
        out = jax.device_get(self._fns[key](
            self.params, arr["input_ids"], arr["image"],
            arr["image_aug"], arr["pixel_mask"]))
        det = post_process_pose(
            np.asarray(out["pred_logits"][0]),
            np.asarray(out["pred_boxes"][0]),
            np.asarray(out["pred_keypoints"][0]),
            arr["ori_shape"], topk=topk)
        keep = det["scores"] >= threshold
        return {
            "scores": det["scores"][keep],
            "boxes": det["boxes"][keep],
            "keypoints": det["keypoints"][keep][:, :len(kpt_names)],
            "keypoint_names": kpt_names,
        }
