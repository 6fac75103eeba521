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
    src = os.path.join(_DIR, "fraction.cpp")
    try:
        if build and (not os.path.exists(_SO)
                      or os.path.getmtime(_SO) < os.path.getmtime(src)):
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
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
    _lib = lib
    return _lib


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
