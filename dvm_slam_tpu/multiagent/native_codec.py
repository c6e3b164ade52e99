"""ctypes bridge to the native C++ map codec (native/mapcodec.cpp).

Drop-in accelerators for `codec.pack_arrays` / `codec.unpack_arrays`
producing byte-identical blobs; falls back to the pure-Python path when the
shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np

from . import codec as pycodec

_LIB = None


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "libdvmmapcodec.so")
    return cand if os.path.exists(cand) else None


def load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.dvm_pack.restype = ctypes.c_int
    lib.dvm_pack.argtypes = [
        ctypes.c_int, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.dvm_unpack_raw.restype = ctypes.c_int
    lib.dvm_unpack_raw.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.dvm_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def pack_arrays(arrays: dict) -> bytes:
    lib = load_library()
    if lib is None:
        return pycodec.pack_arrays(arrays)
    n = len(arrays)
    names = b"".join(k.encode() + b"\0" for k in arrays)
    codes = (ctypes.c_uint8 * n)()
    ndims = (ctypes.c_uint8 * n)()
    dims_list = []
    payload_ptrs = (ctypes.c_void_p * n)()
    sizes = (ctypes.c_uint64 * n)()
    keep = []
    for i, (k, arr) in enumerate(arrays.items()):
        arr = np.ascontiguousarray(arr)
        dt = np.dtype(arr.dtype).newbyteorder("<") if arr.dtype != bool else np.dtype("bool")
        arr = arr.astype(dt, copy=False)
        keep.append(arr)
        codes[i] = pycodec._DTYPE_CODES[np.dtype(dt)]
        ndims[i] = arr.ndim
        dims_list.extend(arr.shape)
        payload_ptrs[i] = arr.ctypes.data_as(ctypes.c_void_p)
        sizes[i] = arr.nbytes
    dims = (ctypes.c_uint32 * len(dims_list))(*dims_list)
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_uint64()
    rc = lib.dvm_pack(n, names, codes, ndims, dims, payload_ptrs, sizes,
                      ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0:
        raise RuntimeError(f"dvm_pack failed: {rc}")
    try:
        return ctypes.string_at(out, out_len.value)
    finally:
        lib.dvm_free(out)


def unpack_arrays(blob: bytes) -> dict:
    lib = load_library()
    if lib is None:
        return pycodec.unpack_arrays(blob)
    buf = (ctypes.c_uint8 * len(blob)).from_buffer_copy(blob)
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_uint64()
    rc = lib.dvm_unpack_raw(buf, len(blob), ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0:
        raise RuntimeError(f"dvm_unpack_raw failed: {rc}")
    try:
        raw = ctypes.string_at(out, out_len.value)
    finally:
        lib.dvm_free(out)
    # parse the frame (pure python, cheap relative to inflate)
    off = 0
    magic, n = struct.unpack_from("<II", raw, off)
    assert magic == pycodec.MAGIC
    off += 8
    arrays = {}
    for _ in range(n):
        (nlen,) = struct.unpack_from("<B", raw, off)
        off += 1
        name = raw[off:off + nlen].decode()
        off += nlen
        code, ndim = struct.unpack_from("<BB", raw, off)
        off += 2
        dims = struct.unpack_from(f"<{ndim}I", raw, off)
        off += 4 * ndim
        dt = pycodec._DTYPES[code]
        count = int(np.prod(dims)) if ndim else 1
        arr = np.frombuffer(raw, dtype=dt, count=count, offset=off).reshape(dims)
        off += arr.nbytes
        arrays[name] = arr.copy()
    return arrays


def use_native_in_codec():
    """Route codec.MapPacket through the native pack/unpack when available."""
    if available():
        pycodec.pack_arrays_python = pycodec.pack_arrays
        pycodec.pack_arrays = pack_arrays  # type: ignore[assignment]
    return available()
