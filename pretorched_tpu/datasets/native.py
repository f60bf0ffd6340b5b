"""ctypes bindings for the native JPEG decoder (pretorched_tpu/native/).

Builds the shared library on first use (g++ -O2 -shared, links libjpeg) and
caches it; every entry point degrades to a PIL fallback when the toolchain or
libjpeg is unavailable, so the zoo never hard-depends on native code.

``decode_jpeg_batch(buffers, threads=8, scale_denom=1)`` decodes a list of
in-memory JPEGs to RGB uint8 arrays on a C++ thread pool. ``scale_denom`` in
{1,2,4,8} decodes at reduced resolution via libjpeg DCT scaling — pair with
``transforms.fused`` so the host never upsamples work it is about to throw
away.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / 'native' / 'decoder.cpp'
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[Path]:
    cache = Path(os.environ.get('PRETORCHED_HOME',
                                Path.home() / '.cache' / 'pretorched_tpu'))
    out = cache / 'native' / 'libptjpeg.so'
    if out.exists() and out.stat().st_mtime >= _SRC.stat().st_mtime:
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    cmd = ['g++', '-O2', '-shared', '-fPIC', '-std=c++17', str(_SRC),
           '-o', str(out), '-ljpeg', '-lpthread']
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:  # noqa: BLE001 — any toolchain failure -> PIL fallback
        return None
    return out


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build_lib()
        if path is not None:
            lib = ctypes.CDLL(str(path))
            lib.pt_jpeg_dims.restype = ctypes.c_int
            lib.pt_jpeg_decode_batch.restype = ctypes.c_int
            _LIB = lib
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def jpeg_short_side(buffer: bytes) -> Optional[int]:
    """Short side of a JPEG from its header only (no pixel decode); None if
    unparseable. Used to pick a batch-wide DCT scale_denom."""
    lib = _get_lib()
    if lib is not None:
        arr = np.frombuffer(buffer, np.uint8)
        h, w = ctypes.c_int(), ctypes.c_int()
        rc = lib.pt_jpeg_dims(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.c_size_t(len(buffer)), 1,
                              ctypes.byref(h), ctypes.byref(w))
        if rc == 0:
            return min(h.value, w.value)
        return None
    try:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(buffer)) as img:   # lazy: header only
            return min(img.size)
    except Exception:  # noqa: BLE001
        return None


def _pil_decode(buffers, scale_denom):
    import io

    from PIL import Image

    out = []
    for b in buffers:
        img = Image.open(io.BytesIO(b))
        if scale_denom > 1:
            img.draft('RGB', (img.width // scale_denom,
                              img.height // scale_denom))
        out.append(np.asarray(img.convert('RGB')))
    return out


def decode_jpeg_batch(buffers: List[bytes], threads: int = 8,
                      scale_denom: int = 1) -> List[np.ndarray]:
    """Decode JPEG byte strings to (H, W, 3) uint8 arrays."""
    lib = _get_lib()
    if lib is None:
        return _pil_decode(buffers, scale_denom)
    n = len(buffers)
    if n == 0:
        return []
    bufs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    lens = (ctypes.c_size_t * n)()
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    keep = []
    for i, b in enumerate(buffers):
        arr = np.frombuffer(b, np.uint8)
        keep.append(arr)
        bufs[i] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        lens[i] = len(b)
        h, w = ctypes.c_int(), ctypes.c_int()
        rc = lib.pt_jpeg_dims(bufs[i], lens[i], scale_denom,
                              ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            return _pil_decode(buffers, scale_denom)
        hs[i], ws[i] = h.value, w.value
    outs_np = [np.empty((hs[i], ws[i], 3), np.uint8) for i in range(n)]
    outs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for o in outs_np])
    status = (ctypes.c_int * n)()
    fails = lib.pt_jpeg_decode_batch(bufs, lens, outs, hs, ws,
                                     ctypes.c_int(scale_denom),
                                     ctypes.c_int(n), ctypes.c_int(threads),
                                     status)
    if fails:
        return _pil_decode(buffers, scale_denom)
    return outs_np


def decode_jpeg_files(paths: List[str], threads: int = 8,
                      scale_denom: int = 1) -> List[np.ndarray]:
    buffers = []
    for p in paths:
        with open(p, 'rb') as f:
            buffers.append(f.read())
    return decode_jpeg_batch(buffers, threads=threads, scale_denom=scale_denom)
