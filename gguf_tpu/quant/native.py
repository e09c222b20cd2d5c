"""ctypes bridge to the native K-quant codec core (csrc/gguf_kquant.c).

The reference repo requires the user to hand-compile its .so files
(/root/reference/utils/quantize/q4_k.py:41-45 raises with gcc instructions);
here the library is built automatically on first use via csrc/Makefile.

All entry points take/return numpy arrays; byte buffers are flat uint8 in the
exact GGUF on-disk block layout.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO_PATH = os.path.join(_CSRC_DIR, "build", "libgguf_kquant.so")

_lib = None
_lib_lock = threading.Lock()

QK_K = 256
Q4K_BLOCK_BYTES = 144
Q5K_BLOCK_BYTES = 176
Q6K_BLOCK_BYTES = 210


def _build_library() -> None:
    subprocess.run(
        ["make", "-C", _CSRC_DIR],
        check=True,
        capture_output=True,
    )


def get_lib() -> ctypes.CDLL:
    """Load (building if necessary) the native codec library."""
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            _build_library()
        lib = ctypes.CDLL(_SO_PATH)

        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)

        lib.gq_quantize_q4_k.argtypes = [f32p, u8p, ctypes.c_int64]
        lib.gq_quantize_q4_k.restype = None
        lib.gq_quantize_q5_k.argtypes = [f32p, u8p, ctypes.c_int64]
        lib.gq_quantize_q5_k.restype = None
        lib.gq_quantize_q6_k.argtypes = [f32p, u8p, ctypes.c_int64]
        lib.gq_quantize_q6_k.restype = None
        lib.gq_dequantize_q4_k.argtypes = [u8p, f32p, ctypes.c_int64]
        lib.gq_dequantize_q4_k.restype = None
        lib.gq_dequantize_q5_k.argtypes = [u8p, f32p, ctypes.c_int64]
        lib.gq_dequantize_q5_k.restype = None
        lib.gq_dequantize_q6_k.argtypes = [u8p, f32p, ctypes.c_int64]
        lib.gq_dequantize_q6_k.restype = None
        lib.gq_fp16_to_fp32.argtypes = [ctypes.c_uint16]
        lib.gq_fp16_to_fp32.restype = ctypes.c_float
        lib.gq_fp32_to_fp16.argtypes = [ctypes.c_float]
        lib.gq_fp32_to_fp16.restype = ctypes.c_uint16
        lib.gq_fp16_to_fp32_buf.argtypes = [u16p, f32p, ctypes.c_int64]
        lib.gq_fp16_to_fp32_buf.restype = None
        lib.gq_fp32_to_fp16_buf.argtypes = [f32p, u16p, ctypes.c_int64]
        lib.gq_fp32_to_fp16_buf.restype = None
        lib.gq_nearest_int.argtypes = [ctypes.c_float]
        lib.gq_nearest_int.restype = ctypes.c_int

        _lib = lib
        return _lib


def _as_f32_c(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.float32)


def quantize_q4_k(x: np.ndarray) -> np.ndarray:
    """Quantize a float array (size % 256 == 0) to flat Q4_K bytes (uint8)."""
    x = _as_f32_c(x.reshape(-1))
    n = x.size
    if n % QK_K:
        raise ValueError(f"Q4_K needs size % 256 == 0, got {n}")
    out = np.empty(n // QK_K * Q4K_BLOCK_BYTES, dtype=np.uint8)
    lib = get_lib()
    lib.gq_quantize_q4_k(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
    )
    return out


def quantize_q5_k(x: np.ndarray) -> np.ndarray:
    """Quantize a float array (size % 256 == 0) to flat Q5_K bytes (uint8)."""
    x = _as_f32_c(x.reshape(-1))
    n = x.size
    if n % QK_K:
        raise ValueError(f"Q5_K needs size % 256 == 0, got {n}")
    out = np.empty(n // QK_K * Q5K_BLOCK_BYTES, dtype=np.uint8)
    lib = get_lib()
    lib.gq_quantize_q5_k(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
    )
    return out


def quantize_q6_k(x: np.ndarray) -> np.ndarray:
    """Quantize a float array (size % 256 == 0) to flat Q6_K bytes (uint8)."""
    x = _as_f32_c(x.reshape(-1))
    n = x.size
    if n % QK_K:
        raise ValueError(f"Q6_K needs size % 256 == 0, got {n}")
    out = np.empty(n // QK_K * Q6K_BLOCK_BYTES, dtype=np.uint8)
    lib = get_lib()
    lib.gq_quantize_q6_k(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
    )
    return out


def dequantize_q4_k_native(q: np.ndarray, n_elems: int) -> np.ndarray:
    q = np.ascontiguousarray(q.reshape(-1).view(np.uint8))
    out = np.empty(n_elems, dtype=np.float32)
    get_lib().gq_dequantize_q4_k(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_elems),
    )
    return out


def dequantize_q5_k_native(q: np.ndarray, n_elems: int) -> np.ndarray:
    q = np.ascontiguousarray(q.reshape(-1).view(np.uint8))
    out = np.empty(n_elems, dtype=np.float32)
    get_lib().gq_dequantize_q5_k(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_elems),
    )
    return out


def dequantize_q6_k_native(q: np.ndarray, n_elems: int) -> np.ndarray:
    q = np.ascontiguousarray(q.reshape(-1).view(np.uint8))
    out = np.empty(n_elems, dtype=np.float32)
    get_lib().gq_dequantize_q6_k(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_elems),
    )
    return out


def fp16_bits_to_fp32(h: np.ndarray) -> np.ndarray:
    """Exact fp16(bits)->fp32 via the native core (widening is lossless)."""
    h = np.ascontiguousarray(h, dtype=np.uint16)
    out = np.empty(h.shape, dtype=np.float32)
    get_lib().gq_fp16_to_fp32_buf(
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(h.size),
    )
    return out


def fp32_to_fp16_bits(f: np.ndarray) -> np.ndarray:
    """fp32->fp16 bits, IEEE round-to-nearest-even (matches GGML exactly)."""
    f = _as_f32_c(f)
    out = np.empty(f.shape, dtype=np.uint16)
    get_lib().gq_fp32_to_fp16_buf(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_int64(f.size),
    )
    return out
