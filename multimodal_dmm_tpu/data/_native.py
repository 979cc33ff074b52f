"""ctypes bindings for the native (C++) multiseq host kernels.

Loads native/libmultiseq_ops.so, building it on first use when a
toolchain is available; every entry point has a numpy fallback so the
framework works identically without the native library.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path():
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native", "libmultiseq_ops.so")


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        build = os.path.join(os.path.dirname(path), "build.sh")
        try:
            subprocess.run(["sh", build], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.pad_and_merge_f32.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32)]
    lib.resample_avg_f64.argtypes = [
        np.ctypeslib.ndpointer(np.float64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64)]
    lib.len_to_mask_u8.argtypes = [
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
        ctypes.c_int64, np.ctypeslib.ndpointer(np.uint8)]
    _LIB = lib
    return _LIB


def pad_and_merge_f32(sequences, max_len):
    """Native NaN-padded collation; returns (max_len, B, *dims) f32 or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dims = sequences[0].shape[1:]
    dim = int(np.prod(dims)) if dims else 1
    n = len(sequences)
    seqs32 = [np.ascontiguousarray(s.reshape(len(s), dim),
                                   dtype=np.float32)
              for s in sequences]
    lengths = np.array([len(s) for s in sequences], dtype=np.int64)
    out = np.empty((max_len, n, dim), dtype=np.float32)
    ptrs = (ctypes.c_void_p * n)(
        *[s.ctypes.data_as(ctypes.c_void_p).value for s in seqs32])
    lib.pad_and_merge_f32(ptrs, lengths, n, max_len, dim, out)
    return out.reshape((max_len, n) + tuple(dims))


def resample_avg(d, ratio):
    """Native time-average downsample; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    shape = d.shape[1:]
    dim = int(np.prod(shape)) if shape else 1
    src = np.ascontiguousarray(d.reshape(len(d), dim),
                               dtype=np.float64)
    n_out = (len(d) + ratio - 1) // ratio
    out = np.empty((n_out, dim), dtype=np.float64)
    lib.resample_avg_f64(src, len(d), dim, int(ratio), out)
    return out.reshape((n_out,) + tuple(shape))
