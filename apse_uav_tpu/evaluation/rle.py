"""COCO-compatible RLE masks: ctypes wrapper over native/rle.cpp + numpy fallback.

Drop-in surface for the ``pycocotools.mask`` functions the reference uses
(encode/decode/area/iou/merge/toBbox — see SURVEY.md §2.2): RLE objects are
dicts ``{"size": [h, w], "counts": bytes}`` with COCO's compressed string
form, masks are numpy uint8 arrays in Fortran (column-major) order.

The native library is compiled on demand from ``native/rle.cpp`` (g++ is in
the image); if that fails, pure-numpy implementations take over — identical
results, slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import numpy as np

RLE = dict  # {"size": [h, w], "counts": bytes}

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_native", "librle.so")
_SRC = os.path.join(_REPO, "native", "rle.cpp")

_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and os.path.exists(_SRC):
        try:
            os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", _SO_PATH, _SRC],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rle_encode.restype = ctypes.c_int64
    lib.rle_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, u32p]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [u32p, ctypes.c_int64, u8p, ctypes.c_int64]
    lib.rle_to_string.restype = ctypes.c_int64
    lib.rle_to_string.argtypes = [u32p, ctypes.c_int64, ctypes.c_char_p]
    lib.rle_from_string.restype = ctypes.c_int64
    lib.rle_from_string.argtypes = [ctypes.c_char_p, u32p]
    lib.rle_area.restype = ctypes.c_uint64
    lib.rle_area.argtypes = [u32p, ctypes.c_int64]
    lib.rle_iou.restype = ctypes.c_double
    lib.rle_iou.argtypes = [u32p, ctypes.c_int64, u32p, ctypes.c_int64, ctypes.c_int]
    lib.rle_merge.restype = ctypes.c_int64
    lib.rle_merge.argtypes = [u32p, ctypes.c_int64, u32p, ctypes.c_int64, ctypes.c_int, u32p]
    lib.rle_bbox.restype = None
    lib.rle_bbox.argtypes = [u32p, ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


# ---- numpy fallback primitives -------------------------------------------


def _counts_encode_np(flat: np.ndarray) -> np.ndarray:
    v = flat.astype(bool)
    changes = np.nonzero(np.diff(v))[0] + 1
    edges = np.concatenate([[0], changes, [len(v)]])
    runs = np.diff(edges)
    if v[0] if len(v) else False:
        runs = np.concatenate([[0], runs])
    return runs.astype(np.uint32)


def _counts_decode_np(counts: np.ndarray, n: int) -> np.ndarray:
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    out = np.repeat(vals, counts.astype(np.int64))
    if len(out) < n:
        out = np.concatenate([out, np.zeros(n - len(out), np.uint8)])
    return out[:n]


def _string_encode_np(counts: np.ndarray) -> bytes:
    out = bytearray()
    counts = counts.astype(np.int64)
    for i, x in enumerate(counts):
        if i > 2:
            x = int(x) - int(counts[i - 2])
        x = int(x)
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def _string_decode_np(s: bytes) -> np.ndarray:
    counts: list[int] = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


# ---- public API (pycocotools.mask surface) --------------------------------


def encode(mask: np.ndarray) -> RLE:
    """Binary (H, W) mask -> compressed RLE (column-major scan order)."""
    h, w = mask.shape
    flat = np.asfortranarray(mask).ravel(order="F").astype(np.uint8)
    lib = _load()
    if lib is not None:
        counts = np.empty(h * w + 1, np.uint32)
        m = lib.rle_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        counts = counts[:m]
        buf = ctypes.create_string_buffer(6 * (m + 1))
        n = lib.rle_to_string(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), m, buf
        )
        return {"size": [h, w], "counts": buf.raw[:n]}
    counts = _counts_encode_np(flat)
    return {"size": [h, w], "counts": _string_encode_np(counts)}


def _counts_of(rle: RLE) -> np.ndarray:
    c = rle["counts"]
    if isinstance(c, str):
        c = c.encode()
    if isinstance(c, (bytes, bytearray)):
        lib = _load()
        if lib is not None:
            out = np.empty(len(c) + 1, np.uint32)
            m = lib.rle_from_string(
                ctypes.c_char_p(bytes(c)), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
            )
            return out[:m]
        return _string_decode_np(bytes(c))
    return np.asarray(c, np.uint32)  # uncompressed list form


def decode(rle: RLE) -> np.ndarray:
    """RLE -> binary (H, W) uint8 mask."""
    h, w = rle["size"]
    counts = _counts_of(rle)
    lib = _load()
    if lib is not None:
        out = np.empty(h * w, np.uint8)
        lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(counts),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h * w,
        )
    else:
        out = _counts_decode_np(counts, h * w)
    return out.reshape((h, w), order="F")


def area(rle: RLE) -> int:
    counts = _counts_of(rle)
    lib = _load()
    if lib is not None:
        return int(lib.rle_area(counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(counts)))
    return int(counts[1::2].astype(np.int64).sum())


def iou(dt: list[RLE], gt: list[RLE], iscrowd: list[int] | None = None) -> np.ndarray:
    """Pairwise IoU matrix (len(dt), len(gt)); iscrowd per GT -> IoA."""
    if iscrowd is None:
        iscrowd = [0] * len(gt)
    out = np.zeros((len(dt), len(gt)))
    lib = _load()
    dts = [_counts_of(r) for r in dt]
    gts = [_counts_of(r) for r in gt]
    for i, dc in enumerate(dts):
        for j, gc in enumerate(gts):
            if lib is not None:
                out[i, j] = lib.rle_iou(
                    dc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(dc),
                    gc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(gc),
                    int(iscrowd[j]),
                )
            else:
                a = _counts_decode_np(dc, int(dc.sum()))
                b = _counts_decode_np(gc, int(gc.sum()))
                n = max(len(a), len(b))
                a = np.pad(a, (0, n - len(a)))
                b = np.pad(b, (0, n - len(b)))
                inter = int(np.sum(a & b))
                if iscrowd[j]:
                    u = int(a.sum())
                else:
                    u = int(a.sum()) + int(b.sum()) - inter
                out[i, j] = inter / u if u > 0 else 0.0
    return out


def merge(rles: list[RLE], intersect: bool = False) -> RLE:
    """Union (or intersection) of RLEs of identical extent."""
    assert rles, "merge of empty list"
    h, w = rles[0]["size"]
    lib = _load()
    acc = _counts_of(rles[0])
    for r in rles[1:]:
        c = _counts_of(r)
        if lib is not None:
            out = np.empty(h * w + 1, np.uint32)
            m = lib.rle_merge(
                acc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(acc),
                c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(c),
                int(intersect), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            )
            acc = out[:m]
        else:
            a = _counts_decode_np(acc, h * w)
            b = _counts_decode_np(c, h * w)
            acc = _counts_encode_np((a & b) if intersect else (a | b))
    lib = _load()
    if lib is not None:
        buf = ctypes.create_string_buffer(6 * (len(acc) + 1))
        n = lib.rle_to_string(acc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(acc), buf)
        return {"size": [h, w], "counts": buf.raw[:n]}
    return {"size": [h, w], "counts": _string_encode_np(acc)}


def toBbox(rle: RLE) -> np.ndarray:
    """RLE -> (x, y, w, h) tight box."""
    h, _ = rle["size"]
    counts = _counts_of(rle)
    lib = _load()
    if lib is not None:
        out = (ctypes.c_double * 4)()
        lib.rle_bbox(counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(counts), h, out)
        return np.asarray(out[:], np.float64)
    mask = decode(rle)
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.zeros(4)
    return np.asarray([xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1], np.float64)
