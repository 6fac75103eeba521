"""Native runtime bindings (ctypes). Optional: Python fallbacks exist.

Build with `make -C lstm_rnn_tpu/runtime`; `load()` also builds on demand
when g++ is available and the .so is missing/stale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfraction.so")
_lib = None
_tried = False


def load(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native fraction library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    srcs = [os.path.join(_DIR, "fraction.cpp"),
            os.path.join(_DIR, "jsonfmt.cpp")]
    try:
        stale = (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < max(os.path.getmtime(s)
                                                for s in srcs)
                 # an old build predating jsonfmt.cpp lacks the symbol;
                 # check BEFORE dlopen — dlopen caches by path, so a
                 # rebuild after loading would not be picked up
                 or b"lrt_format_f64_array" not in open(_SO, "rb").read())
        if stale:
            if not build:
                return None
            subprocess.run(["make", "-B", "-C", _DIR, "-s"], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO)
    except (OSError, subprocess.SubprocessError):
        return None

    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    lib.lrt_assemble_fraction.argtypes = [
        f32p, ctypes.c_void_p, i32p, i32p, c, c, c, c, c, c, c, c, c,
        f32p, ctypes.c_void_p, i8p,
    ]
    lib.lrt_assemble_fraction.restype = None
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.lrt_format_f64_array.argtypes = [
        f64p, ctypes.c_longlong, ctypes.c_char_p, ctypes.c_longlong]
    lib.lrt_format_f64_array.restype = ctypes.c_longlong
    _lib = lib
    return _lib


def fmt_f64_json(arr: np.ndarray) -> Optional[bytes]:
    """Format a 1-D float64 array as a compact JSON array (b"[v1,v2,...]")
    with shortest round-trip decimals (std::to_chars — value-identical to
    Python repr). None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(arr, np.float64)
    cap = 25 * a.size + 2
    buf = ctypes.create_string_buffer(cap)
    n = lib.lrt_format_f64_array(a, a.size, buf, cap)
    if n < 0:  # cannot happen with the cap above; stay safe
        return None
    return buf.raw[:n]


def assemble_fraction(inputs_cat: np.ndarray, targets_cat: np.ndarray,
                      offsets: np.ndarray, lengths: np.ndarray,
                      is_classification: bool, t_pad: int, b: int,
                      f_size: int, o_size: int, left: int, right: int,
                      lag: int):
    """Native fraction assembly; returns (inputs, targets, pattypes).
    Input noise is a Python-path concern (dataset.py gates native assembly
    on noise_deviation == 0: the RNG streams differ)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    ctx = left + right + 1
    out_inputs = np.empty((t_pad, b, ctx * f_size), np.float32)
    if is_classification:
        out_targets = np.empty((t_pad, b), np.int32)
    else:
        out_targets = np.empty((t_pad, b, o_size), np.float32)
    out_pattypes = np.empty((t_pad, b), np.int8)
    lib.lrt_assemble_fraction(
        np.ascontiguousarray(inputs_cat, np.float32),
        np.ascontiguousarray(
            targets_cat, np.int32 if is_classification else np.float32
        ).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(offsets, np.int32),
        np.ascontiguousarray(lengths, np.int32),
        len(lengths), int(is_classification), t_pad, b, f_size, o_size,
        left, right, lag,
        out_inputs, out_targets.ctypes.data_as(ctypes.c_void_p), out_pattypes)
    return out_inputs, out_targets, out_pattypes
