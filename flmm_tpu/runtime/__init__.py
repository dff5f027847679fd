"""Native host runtime: C++ mask/data kernels with numpy fallbacks.

``lib()`` lazily builds (g++) and loads ``maskops.cpp``; every wrapper
falls back to pure numpy when no compiler is available, so the framework
never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def build(force: bool = False) -> pathlib.Path | None:
    so = _HERE / "libmaskops.so"
    src = _HERE / "maskops.cpp"
    if so.exists() and not force and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(so)],
            check=True, capture_output=True,
        )
        return so
    except (OSError, subprocess.CalledProcessError):
        return None


def lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is None and not _TRIED:
            _TRIED = True
            so = build()
            if so is not None:
                _LIB = ctypes.CDLL(str(so))
        return _LIB


def _c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def rgb2id(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H, W) int32 panoptic segment ids."""
    L = lib()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if L is None:
        c = rgb.astype(np.uint32)
        return (c[..., 0] + 256 * c[..., 1] + 65536 * c[..., 2]).astype(
            np.int32)
    out = np.empty(rgb.shape[:2], np.int32)
    L.rgb2id(_c(rgb), _c(out), ctypes.c_int64(out.size))
    return out


def segment_union(ids: np.ndarray, wanted) -> np.ndarray:
    L = lib()
    ids = np.ascontiguousarray(ids, np.int32)
    wanted = np.ascontiguousarray(np.asarray(wanted, np.int32))
    if L is None:
        return np.isin(ids, wanted).astype(np.uint8)
    out = np.empty(ids.shape, np.uint8)
    L.segment_union(_c(ids), ctypes.c_int64(ids.size), _c(wanted),
                    ctypes.c_int(len(wanted)), _c(out))
    return out


def rle_decode(counts, h: int, w: int) -> np.ndarray:
    L = lib()
    counts = np.ascontiguousarray(np.asarray(counts, np.int32))
    if L is None:
        flat = np.zeros(h * w, np.uint8)
        pos, val = 0, 0
        for c in counts:
            if val:
                flat[pos:pos + c] = 1
            pos += c
            val ^= 1
        return flat.reshape(w, h).T
    out = np.empty((h, w), np.uint8)
    L.rle_decode(_c(counts), ctypes.c_int(len(counts)),
                 ctypes.c_int(h), ctypes.c_int(w), _c(out))
    return out


def polygons_fill(polygons, h: int, w: int) -> np.ndarray:
    """Even-odd scanline fill over pixel centres; ORs multiple polygons."""
    L = lib()
    out = np.zeros((h, w), np.uint8)
    if L is None:
        from PIL import Image, ImageDraw

        img = Image.new("L", (w, h), 0)
        d = ImageDraw.Draw(img)
        for poly in polygons:
            pts = [(poly[i], poly[i + 1]) for i in range(0, len(poly) - 1, 2)]
            if len(pts) >= 3:
                d.polygon(pts, outline=1, fill=1)
        return np.asarray(img, np.uint8)
    for poly in polygons:
        xy = np.ascontiguousarray(np.asarray(poly, np.float64))
        L.polygon_fill(_c(xy), ctypes.c_int(len(xy) // 2),
                       ctypes.c_int(h), ctypes.c_int(w), _c(out))
    return out


def nearest_resize(mask: np.ndarray, oh: int, ow: int) -> np.ndarray:
    L = lib()
    mask = np.ascontiguousarray(mask, np.uint8)
    if L is None:
        rows = (np.arange(oh) * mask.shape[0] // oh)
        cols = (np.arange(ow) * mask.shape[1] // ow)
        return mask[rows][:, cols]
    out = np.empty((oh, ow), np.uint8)
    L.nearest_resize_u8(_c(mask), ctypes.c_int(mask.shape[0]),
                        ctypes.c_int(mask.shape[1]), _c(out),
                        ctypes.c_int(oh), ctypes.c_int(ow))
    return out
