"""Host-side multimodal utilities: image preprocessing (pad / anyres
tiling), prompt↔token plumbing.

Behavioral reference: visionllmv2/mm_utils.py (expand2square,
find_closest_aspect_ratio, dynamic_preprocess) and
visionllmv2/datasets/llava_data.py:538-564 (tokenizer_image_token).
Everything here is NumPy/PIL on the host — device work starts after the
collator.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from visionllm_tpu.constants import IMAGE_TOKEN_INDEX

# CLIP normalization constants (CLIPImageProcessor defaults)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
# ImageNet normalization (det/pose image branch, mmdet pipelines)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def expand2square(img: np.ndarray, background: Sequence[float]) -> np.ndarray:
    """Pad an HWC uint8/float image to a centered square (reference
    mm_utils.py:9-20)."""
    h, w, c = img.shape
    if h == w:
        return img
    side = max(h, w)
    out = np.empty((side, side, c), img.dtype)
    out[...] = np.asarray(background, img.dtype)
    if w > h:
        off = (side - h) // 2
        out[off:off + h, :, :] = img
    else:
        off = (side - w) // 2
        out[:, off:off + w, :] = img
    return out


def resize_image(img: np.ndarray, size: Tuple[int, int],
                 method: str = "bilinear") -> np.ndarray:
    """HWC resize matching torchvision/PIL results the reference
    pipelines produce. Fast path: the native fixed-point kernel
    (ops/native/imageproc.cc — bit-compatible with Pillow's resampler
    and GIL-releasing, so loader worker threads scale); falls back to
    PIL when no toolchain is available."""
    if img.dtype == np.uint8:
        from visionllm_tpu.data.native_image import resize_u8
        out = resize_u8(img, size, method)
        if out is not None:
            return out
    from PIL import Image
    pil = Image.fromarray(img.astype(np.uint8) if img.dtype != np.uint8
                          else img)
    resample = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC,
                "nearest": Image.NEAREST}[method]
    return np.asarray(pil.resize((size[1], size[0]), resample))


def clip_preprocess(img: np.ndarray, image_size: int = 336,
                    mode: str = "pad") -> np.ndarray:
    """uint8 HWC → normalized float32 [image_size, image_size, 3].

    mode "pad": expand2square with the CLIP mean (llava-style), then
    resize; mode "resize": plain resize."""
    if mode == "pad":
        bg = (CLIP_MEAN * 255).astype(np.uint8)
        img = expand2square(img, bg)
    img = resize_image(img, (image_size, image_size), "bicubic")
    x = img.astype(np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


def find_closest_aspect_ratio(aspect_ratio: float, target_ratios, width,
                              height, image_size):
    """Reference mm_utils.py:23-36."""
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for ratio in target_ratios:
        target = ratio[0] / ratio[1]
        diff = abs(aspect_ratio - target)
        if diff < best_diff:
            best_diff = diff
            best = ratio
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best = ratio
    return best


def dynamic_preprocess(img: np.ndarray, min_num: int = 1, max_num: int = 6,
                       image_size: int = 448, use_thumbnail: bool = True
                       ) -> List[np.ndarray]:
    """anyres tiling (reference mm_utils.py:39-77): split into up to
    max_num tiles of image_size² at the closest grid aspect ratio, plus a
    global thumbnail. Returns a list of HWC uint8 tiles."""
    h, w = img.shape[:2]
    aspect = w / h
    target_ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda x: x[0] * x[1])
    cols, rows = find_closest_aspect_ratio(aspect, target_ratios, w, h,
                                           image_size)
    tw, th = image_size * cols, image_size * rows
    resized = resize_image(img, (th, tw))
    tiles = []
    for i in range(cols * rows):
        x0 = (i % cols) * image_size
        y0 = (i // cols) * image_size
        tiles.append(resized[y0:y0 + image_size, x0:x0 + image_size])
    if use_thumbnail and len(tiles) != 1:
        tiles.append(resize_image(img, (image_size, image_size)))
    return tiles


def tokenizer_image_token(prompt: str, tokenizer,
                          image_token_index: int = IMAGE_TOKEN_INDEX,
                          return_array: bool = True):
    """Tokenize with `<image>` placeholders mapped to image_token_index
    (reference llava_data.py:538-564): split on '<image>', tokenize the
    chunks, interleave the sentinel, keeping a single leading BOS."""
    chunks = [tokenizer(c).input_ids for c in prompt.split("<image>")]

    def insert_sep(lists, sep):
        out = []
        for x in lists:
            out.extend([x, sep])
        return out[:-1]

    input_ids = []
    offset = 0
    if (len(chunks) > 0 and len(chunks[0]) > 0
            and chunks[0][0] == tokenizer.bos_token_id):
        # every chunk re-tokenizes with a BOS; [offset:] strips it, and the
        # (offset+1)-long sentinel chunk leaves exactly one sentinel
        offset = 1
        input_ids.append(chunks[0][0])
    for x in insert_sep(chunks, [image_token_index] * (offset + 1)):
        input_ids.extend(x[offset:])
    if return_array:
        return np.asarray(input_ids, dtype=np.int32)
    return input_ids


def expand_image_tokens(input_ids: np.ndarray, img_len: int,
                        im_patch_id: int, num_images: int = 1
                        ) -> np.ndarray:
    """Replace each IMAGE_TOKEN_INDEX sentinel with img_len `<im_patch>`
    ids (the static-shape prompt the model consumes)."""
    out = []
    for t in input_ids.tolist():
        if t == IMAGE_TOKEN_INDEX:
            out.extend([im_patch_id] * img_len)
        else:
            out.append(t)
    return np.asarray(out, dtype=np.int32)


def find_stop(text: str, stop_strs: Sequence[str]) -> Optional[int]:
    """First index where any stop string begins, or None (decode-loop
    equivalent of KeywordsStoppingCriteria, reference mm_utils.py:80+)."""
    pos = None
    for s in stop_strs:
        i = text.find(s)
        if i >= 0 and (pos is None or i < pos):
            pos = i
    return pos
