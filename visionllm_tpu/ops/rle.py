"""COCO-compressed RLE mask codec: ctypes bridge to the native C++
implementation (ops/native/rle.cc), with a pure-numpy fallback.

Replaces the pycocotools / crowdpose-api mask codecs the reference
depends on (SURVEY.md §2.6: crowdpose-api/common/maskApi.c|h) — the wire
format (column-major runs, delta + 5-bit-group string encoding) is kept
identical so encoded results are interchangeable with COCO tooling.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    src = os.path.join(here, "native", "rle.cc")
    so = os.path.join(here, "native", "librle.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.rle_decode.restype = ctypes.c_int
        lib.rle_decode.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_void_p]
        lib.rle_encode.restype = ctypes.c_int64
        lib.rle_encode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_char_p,
                                   ctypes.c_int64]
        lib.rle_area.restype = ctypes.c_int64
        lib.rle_area.argtypes = [ctypes.c_char_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


# ---------------------------------------------------------------------------
# numpy fallback
# ---------------------------------------------------------------------------

def _counts_from_string(s: bytes) -> List[int]:
    cnts: List[int] = []
    p = 0
    while p < len(s):
        x, k, more = 0, 0, True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def _string_from_counts(cnts: List[int]) -> bytes:
    out = bytearray()
    for i, c in enumerate(cnts):
        x = c - (cnts[i - 2] if i > 2 else 0)
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(ch + 48)
    return bytes(out)


def rle_decode(counts, h: int, w: int) -> np.ndarray:
    """Compressed-RLE string → row-major [h, w] uint8 mask."""
    if isinstance(counts, str):
        counts = counts.encode()
    lib = _load_native()
    if lib is not None:
        out = np.zeros((h, w), np.uint8)
        rc = lib.rle_decode(counts, h, w, out.ctypes.data)
        if rc == 0:
            return out
    cnts = _counts_from_string(counts)
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in cnts:
        flat[pos:pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape(w, h).T


def rle_encode(mask: np.ndarray) -> Dict:
    """Row-major [h, w] binary mask → {"size": [h, w], "counts": str}."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    lib = _load_native()
    if lib is not None:
        cap = 2 * h * w + 16
        buf = ctypes.create_string_buffer(cap)
        n = lib.rle_encode(mask.ctypes.data, h, w, buf, cap)
        if n >= 0:
            return {"size": [h, w], "counts": buf.raw[:n].decode()}
    col = mask.T.reshape(-1)
    change = np.nonzero(np.diff(col))[0] + 1
    bounds = np.concatenate([[0], change, [col.size]])
    runs = np.diff(bounds).tolist()
    if col[0] == 1:
        runs = [0] + runs
    return {"size": [h, w], "counts": _string_from_counts(runs).decode()}


def rle_area(rle: Dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = counts.encode()
    lib = _load_native()
    if lib is not None:
        return int(lib.rle_area(counts))
    cnts = _counts_from_string(counts)
    return int(sum(cnts[1::2]))


def rle_iou(dt: List[Dict], gt: List[Dict],
            iscrowd: Optional[List[int]] = None) -> np.ndarray:
    """Pairwise mask IoU by decoding (host-side eval helper)."""
    if not dt or not gt:
        return np.zeros((len(dt), len(gt)), np.float64)
    h, w = dt[0]["size"]
    d = np.stack([rle_decode(x["counts"], h, w) for x in dt]).reshape(
        len(dt), -1).astype(bool)
    g = np.stack([rle_decode(x["counts"], h, w) for x in gt]).reshape(
        len(gt), -1).astype(bool)
    inter = (d[:, None] & g[None]).sum(-1).astype(np.float64)
    if iscrowd is None:
        iscrowd = [0] * len(gt)
    out = np.zeros((len(dt), len(gt)), np.float64)
    for j in range(len(gt)):
        if iscrowd[j]:
            denom = d.sum(-1).astype(np.float64)
        else:
            denom = d.sum(-1) + g[j].sum() - inter[:, j]
        out[:, j] = inter[:, j] / np.maximum(denom, 1)
    return out
