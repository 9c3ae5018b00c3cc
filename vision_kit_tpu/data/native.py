"""ctypes bindings for the native C++ input pipeline (native/vkio.cpp).

Builds the shared library on first use if missing (make in native/); falls
back to the Python/cv2 path transparently when the toolchain or OpenCV dev
headers are unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvkio.so")

_lib = None
_tried = False

_ABI_VERSION = 3  # must match vkio.cpp vkio_abi_version()


def _make() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-B"], check=True,
            capture_output=True, timeout=300,
        )
        return True
    except Exception:
        return False


def _open_checked():
    """CDLL + ABI version gate (a stale .so would silently misread the
    newer bindings' trailing args)."""
    lib = ctypes.CDLL(_LIB_PATH)
    if not hasattr(lib, "vkio_abi_version"):
        raise OSError("vkio ABI v1 (pre-versioning)")
    lib.vkio_abi_version.restype = ctypes.c_int
    v = lib.vkio_abi_version()
    if v != _ABI_VERSION:
        raise OSError(f"vkio ABI v{v}, bindings expect v{_ABI_VERSION}")
    return lib


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _make():
        return None
    try:
        lib = _open_checked()
    except OSError:
        # stale or unloadable .so: rebuild once from source
        if not _make():
            return None
        try:
            lib = _open_checked()
        except OSError:
            return None
    lib.vkio_decode_letterbox.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.vkio_decode_letterbox.restype = ctypes.c_int
    lib.vkio_decode_letterbox_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.vkio_decode_letterbox_batch.restype = ctypes.c_int
    lib.vkio_decode_letterbox_mem.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    lib.vkio_decode_letterbox_mem.restype = ctypes.c_int
    lib.vkio_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    lib.vkio_decode_resize.restype = ctypes.c_int
    lib.vkio_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
    ]
    lib.vkio_decode_resize_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_letterbox(path: str, dst_hw: tuple[int, int], fast: bool = False):
    """Returns (img (H, W, 3) uint8 RGB letterboxed, (ratio, (dw, dh))) or
    None on decode failure. `fast`: reduced-scale JPEG decode when the
    ratio allows (see vkio.cpp FastDecodeJpeg)."""
    lib = _load()
    assert lib is not None, "native vkio unavailable"
    h, w = dst_hw
    out = np.empty((h, w, 3), np.uint8)
    info = np.empty(4, np.float32)
    lib.vkio_decode_letterbox(
        path.encode(), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        info.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(fast),
    )
    if info[3] < 0.5:
        return None
    return out, (float(info[0]), (float(info[1]), float(info[2])))


def decode_letterbox_bytes(data: bytes, dst_hw: tuple[int, int],
                           fast: bool = False):
    """Decode an in-memory encoded image (JPEG/PNG/...) + letterbox — the
    serving hot path (request bytes never touch the filesystem).

    Returns (img (H, W, 3) uint8 RGB letterboxed, (ratio, (dw, dh)),
    (h0, w0)) or None on decode failure."""
    lib = _load()
    assert lib is not None, "native vkio unavailable"
    h, w = dst_hw
    out = np.empty((h, w, 3), np.uint8)
    info = np.empty(4, np.float32)
    hw0 = np.empty(2, np.int32)
    buf = np.frombuffer(data, np.uint8)
    lib.vkio_decode_letterbox_mem(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        info.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hw0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(fast),
    )
    if info[3] < 0.5:
        return None
    return (
        out,
        (float(info[0]), (float(info[1]), float(info[2]))),
        (int(hw0[0]), int(hw0[1])),
    )


def decode_letterbox_batch(paths: list[str], dst_hw: tuple[int, int],
                           threads: int = 0, fast: bool = False):
    """Parallel batch decode+letterbox.

    Returns (imgs (N, H, W, 3) uint8, infos (N, 4) [ratio, dw, dh, ok])."""
    lib = _load()
    assert lib is not None, "native vkio unavailable"
    h, w = dst_hw
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    infos = np.empty((n, 4), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.vkio_decode_letterbox_batch(
        arr, n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        infos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        threads, int(fast),
    )
    return out, infos


def decode_resize(path: str, max_hw: tuple[int, int], fast: bool = False):
    """Decode + min-ratio resize (no pad) — the datasets' `_decode_resized`
    geometry. Returns ((h, w, 3) uint8 RGB view, (h0, w0)) or None on
    decode failure."""
    lib = _load()
    assert lib is not None, "native vkio unavailable"
    mh, mw = max_hw
    buf = np.empty(mh * mw * 3, np.uint8)
    meta = np.empty(5, np.int32)
    lib.vkio_decode_resize(
        path.encode(), mh, mw,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(fast),
    )
    h, w, h0, w0, ok = (int(v) for v in meta)
    if not ok:
        return None
    return buf[: h * w * 3].reshape(h, w, 3), (h0, w0)


def decode_resize_batch(paths: list[str], max_hw: tuple[int, int],
                        threads: int = 0, fast: bool = False):
    """Parallel batch decode + min-ratio resize.

    Returns (buf (N, max_h*max_w*3) uint8 — image k is
    buf[k, :h*w*3].reshape(h, w, 3) — and metas (N, 5) int32
    [h, w, h0, w0, ok])."""
    lib = _load()
    assert lib is not None, "native vkio unavailable"
    mh, mw = max_hw
    n = len(paths)
    buf = np.empty((n, mh * mw * 3), np.uint8)
    metas = np.empty((n, 5), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.vkio_decode_resize_batch(
        arr, n, mh, mw,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        metas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        threads, int(fast),
    )
    return buf, metas
