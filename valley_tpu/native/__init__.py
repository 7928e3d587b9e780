"""ctypes bindings for the native C++ video decode/preprocess extension.

Builds on first import when a compiler is present (`make -C
valley_tpu/native` does the same); falls back cleanly (ImportError) so the
python pipeline (`valley_tpu.data.video`) can use cv2/imageio instead.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvalley_video.so")

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_SO)
    except Exception as e:
        logger.debug("native build failed: %s", e)
        return False


_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_SO) and not _build():
        raise ImportError("libvalley_video.so unavailable (build failed)")
    lib = ctypes.CDLL(_SO)
    lib.valley_decode_video.restype = ctypes.c_int
    lib.valley_decode_video.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.valley_decode_video_raw.restype = ctypes.c_int
    lib.valley_decode_video_raw.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.valley_video_info.restype = ctypes.c_int
    lib.valley_video_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def video_info(path: str) -> Tuple[int, float]:
    lib = _load()
    n = ctypes.c_long()
    fps = ctypes.c_double()
    rc = lib.valley_video_info(path.encode(), ctypes.byref(n),
                               ctypes.byref(fps))
    if rc != 0:
        raise IOError(f"valley_video_info({path}) failed: {rc}")
    return n.value, fps.value


def decode_preprocess(path: str, frame_mode: str = "fixed",
                      num_frames: int = 8, fps_number: float = 0.5,
                      scale_size: int = 256, crop_size: int = 224,
                      mean=CLIP_MEAN, std=CLIP_STD,
                      max_frames: int = 64) -> np.ndarray:
    """Decode + preprocess in native code.  Returns (3, T, crop, crop)
    fp32 CLIP-normalized — the full `load_video` hot path in one call."""
    lib = _load()
    mode = 0 if frame_mode == "fixed" else 1
    cap = num_frames if mode == 0 else max_frames
    out = np.empty((3, cap, crop_size, crop_size), np.float32)
    mean_a = (ctypes.c_float * 3)(*mean)
    std_a = (ctypes.c_float * 3)(*std)
    nf = ctypes.c_int()
    rc = lib.valley_decode_video(
        path.encode(), mode, num_frames, fps_number, scale_size, crop_size,
        mean_a, std_a,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(nf), cap)
    if rc != 0:
        raise IOError(f"valley_decode_video({path}) failed: {rc}")
    return out[:, :nf.value]


def decode_preprocess_raw(path: str, frame_mode: str = "fixed",
                          num_frames: int = 8, fps_number: float = 0.5,
                          scale_size: int = 256, crop_size: int = 224,
                          max_frames: int = 64) -> np.ndarray:
    """Decode + resize + crop in native code WITHOUT normalization.
    Returns (3, T, crop, crop) uint8 — 1 byte/pixel, for device-side
    CLIP normalization (`valley.encode_images`): the serving host->device
    tunnel is the dominant video first-token cost, so raw pixels halve
    the transfer vs bf16-normalized frames (tools/exp_first_token.py)."""
    lib = _load()
    mode = 0 if frame_mode == "fixed" else 1
    cap = num_frames if mode == 0 else max_frames
    out = np.empty((3, cap, crop_size, crop_size), np.uint8)
    nf = ctypes.c_int()
    rc = lib.valley_decode_video_raw(
        path.encode(), mode, num_frames, fps_number, scale_size, crop_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(nf), cap)
    if rc != 0:
        raise IOError(f"valley_decode_video_raw({path}) failed: {rc}")
    return out[:, :nf.value]
