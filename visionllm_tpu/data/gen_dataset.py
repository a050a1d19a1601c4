"""Text-to-image ([GEN]) and editing ([EDIT]) datasets.

Behavioral reference: visionllmv2/datasets/text2img.py (caption →
"[GEN]" + 64×"[EMB]" answer, output image 512², :113) and ip2p.py
(instruction + input image → "[EDIT]" + 64×"[EMB]", input/output image
pair, :123). Images are normalized to [-1, 1] for the VAE.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict

import numpy as np

from visionllm_tpu.data import templates as T
from visionllm_tpu.data.build import register_dataset
from visionllm_tpu.data.mm_utils import resize_image
from visionllm_tpu.data.preprocess import preprocess, preprocess_multimodal

GEN_QUESTIONS = [
    "Can you generate an image of <caption>?",
    "Please create an image: <caption>.",
    "Draw this for me: <caption>.",
    "I'd like a picture of <caption>.",
]
GEN_ANS = [
    "Sure, here it is: <gen>.",
    "Of course: <gen>.",
    "Here is the generated image: <gen>.",
]
EDIT_QUESTIONS = [
    "<instruction>",
    "Please edit the image: <instruction>.",
    "Apply this edit: <instruction>.",
]
EDIT_ANS = [
    "Sure, here is the edited image: <gen>.",
    "Done: <gen>.",
]


def _to_vae(img: np.ndarray, size: int) -> np.ndarray:
    x = resize_image(img, (size, size)).astype(np.float32)
    return x / 127.5 - 1.0


@register_dataset("text2img")
class Text2ImgDataset:
    task = "t2i"
    dataset_name = "text2img"

    def __init__(self, ann_file: str, img_prefix: str, tokenizer, *,
                 num_embs_gen: int = 64, output_size: int = 512,
                 conv_version: str = "vicuna_v1",
                 model_max_length: int = 4096, seed: int = 0, **_):
        with open(ann_file) as f:
            self.rows = ([json.loads(l) for l in f]
                         if ann_file.endswith(".jsonl") else json.load(f))
        self.img_prefix = img_prefix
        self.tokenizer = tokenizer
        self.num_embs_gen = num_embs_gen
        self.output_size = output_size
        self.conv_version = conv_version
        self.model_max_length = model_max_length
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx: int) -> Dict:
        row = self.rows[idx]
        caption = row["caption"]
        from PIL import Image
        img = np.asarray(Image.open(os.path.join(
            self.img_prefix, row["image"])).convert("RGB"))
        q = self.rng.choice(GEN_QUESTIONS).replace("<caption>", caption)
        a = self.rng.choice(GEN_ANS).replace(
            "<gen>", T.gen_answer_tokens(self.num_embs_gen))
        tok = preprocess(
            preprocess_multimodal([[{"from": "human", "value": q},
                                    {"from": "gpt", "value": a}]]),
            self.tokenizer, version=self.conv_version, has_image=False,
            model_max_length=self.model_max_length)
        return {
            "input_ids": tok["input_ids"][0],
            "labels": tok["labels"][0],
            "output_images": _to_vae(img, self.output_size),
            "captions": caption,
            "img_metas": {"task": self.task,
                          "dataset_name": self.dataset_name},
        }


@register_dataset("ip2p")
class IP2PDataset:
    task = "edit"
    dataset_name = "ip2p"

    def __init__(self, ann_file: str, img_prefix: str, tokenizer, *,
                 num_embs_gen: int = 64, output_size: int = 512,
                 conv_version: str = "vicuna_v1",
                 model_max_length: int = 4096, seed: int = 0, **_):
        with open(ann_file) as f:
            self.rows = ([json.loads(l) for l in f]
                         if ann_file.endswith(".jsonl") else json.load(f))
        self.img_prefix = img_prefix
        self.tokenizer = tokenizer
        self.num_embs_gen = num_embs_gen
        self.output_size = output_size
        self.conv_version = conv_version
        self.model_max_length = model_max_length
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx: int) -> Dict:
        row = self.rows[idx]
        from PIL import Image
        src = np.asarray(Image.open(os.path.join(
            self.img_prefix, row["input_image"])).convert("RGB"))
        dst = np.asarray(Image.open(os.path.join(
            self.img_prefix, row["output_image"])).convert("RGB"))
        q = "<image>\n" + self.rng.choice(EDIT_QUESTIONS).replace(
            "<instruction>", row["instruction"])
        a = self.rng.choice(EDIT_ANS).replace(
            "<gen>", T.edit_answer_tokens(self.num_embs_gen))
        tok = preprocess(
            preprocess_multimodal([[{"from": "human", "value": q},
                                    {"from": "gpt", "value": a}]]),
            self.tokenizer, version=self.conv_version, has_image=True,
            image_token_len=576,
            model_max_length=self.model_max_length)
        from visionllm_tpu.data.mm_utils import clip_preprocess
        return {
            "input_ids": tok["input_ids"][0],
            "labels": tok["labels"][0],
            "image": clip_preprocess(src, 336, "pad").astype(np.float32),
            "input_images": _to_vae(src, self.output_size),
            "output_images": _to_vae(dst, self.output_size),
            "captions": row["instruction"],
            "img_metas": {"task": self.task,
                          "dataset_name": self.dataset_name},
        }


# named text2img sources (reference: datasets/text2img.py:1-257 —
# CC3MDataset / LaionDataset / MJDataset / JourneyDBDataset differ only
# in file layout and caption field; the conversation machinery is the
# Text2ImageDataset base). The json/jsonl rows here are pre-normalized
# to {"image", "caption"} so the variants differ only by dataset_name.
@register_dataset("cc3m")
class CC3MDataset(Text2ImgDataset):
    dataset_name = "cc3m"


@register_dataset("laion")
class LaionDataset(Text2ImgDataset):
    dataset_name = "laion"


@register_dataset("mj")
class MJDataset(Text2ImgDataset):
    dataset_name = "mj"


@register_dataset("journeydb")
class JourneyDBDataset(Text2ImgDataset):
    dataset_name = "journeydb"


@register_dataset("seedx")
class SeedXDataset(IP2PDataset):
    """SEED-X editing pairs (reference: datasets/ip2p.py SeedXDataset —
    same {input image, instruction, output image} protocol as IP2P)."""

    dataset_name = "seedx"
