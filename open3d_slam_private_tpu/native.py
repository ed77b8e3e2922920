"""ctypes bindings for the native host runtime (``native/o3s_host.cpp``).

The C++ library covers the host data plane — sensor-packet decoding
(≙ pointmatcher_ros deserialization), host voxel aggregation (≙ the CPU
VoxelHashMap), and the drop-oldest scan ring (≙ CircularBuffer.hpp). Every
entry point has a numpy fallback so the package works without a compiler;
``native_available()`` reports which path is active. The library is built on
first use (``make -C native``) and cached.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libo3s_host.so")

_lib = None
_lib_lock = threading.Lock()

# PointField-style dtype codes.
FLOAT32 = 7
FLOAT64 = 8
UINT8 = 2
UINT16 = 4


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.decode_xyz_strided.restype = ctypes.c_int64
        lib.decode_channel_strided.restype = ctypes.c_int64
        lib.voxel_downsample_host.restype = ctypes.c_int64
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_int64]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_push.restype = ctypes.c_int32
        lib.ring_push.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_double,
        ]
        lib.ring_peek_size.restype = ctypes.c_int64
        lib.ring_peek_size.argtypes = [ctypes.c_void_p]
        lib.ring_pop.restype = ctypes.c_int64
        lib.ring_pop.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.voxel_downsample_host.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.ring_count.restype = ctypes.c_int64
        lib.ring_count.argtypes = [ctypes.c_void_p]
        lib.ring_dropped.restype = ctypes.c_int64
        lib.ring_dropped.argtypes = [ctypes.c_void_p]
        lib.lz4_frame_decode.restype = ctypes.c_int64
        lib.lz4_frame_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_xyz(
    data: bytes,
    n_points: int,
    point_step: int,
    x_off: int,
    y_off: int,
    z_off: int,
    dtype: int = FLOAT32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode strided sensor records -> (packed finite xyz [k, 3], mask [n]).

    The native path compacts and NaN-filters in one GIL-free pass."""
    lib = _load()
    if lib is not None:
        out = np.empty((n_points, 3), np.float32)
        mask = np.empty((n_points,), np.uint8)
        k = lib.decode_xyz_strided(
            ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n_points),
            ctypes.c_int64(point_step),
            ctypes.c_int64(x_off),
            ctypes.c_int64(y_off),
            ctypes.c_int64(z_off),
            ctypes.c_int32(dtype),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out[:k], mask.astype(bool)
    # numpy fallback
    base = np.frombuffer(data, dtype=np.uint8).reshape(n_points, point_step)
    np_dtype = np.float32 if dtype == FLOAT32 else np.float64
    itemsize = np.dtype(np_dtype).itemsize

    def chan(off):
        return (
            base[:, off : off + itemsize]
            .copy()
            .view(np_dtype)
            .reshape(n_points)
            .astype(np.float32)
        )

    xyz = np.stack([chan(x_off), chan(y_off), chan(z_off)], axis=1)
    mask = np.all(np.isfinite(xyz), axis=1)
    return xyz[mask], mask


def decode_channel(
    data: bytes,
    n_points: int,
    point_step: int,
    off: int,
    dtype: int,
    mask: np.ndarray,
) -> np.ndarray:
    """Decode one extra channel aligned with :func:`decode_xyz`'s output."""
    lib = _load()
    mask_u8 = np.ascontiguousarray(mask.astype(np.uint8))
    if lib is not None:
        out = np.empty((n_points,), np.float32)
        k = lib.decode_channel_strided(
            ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n_points),
            ctypes.c_int64(point_step),
            ctypes.c_int64(off),
            ctypes.c_int32(dtype),
            mask_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out[:k]
    base = np.frombuffer(data, dtype=np.uint8).reshape(n_points, point_step)
    sizes = {FLOAT32: (np.float32, 4), FLOAT64: (np.float64, 8), UINT8: (np.uint8, 1), UINT16: (np.uint16, 2)}
    np_dtype, itemsize = sizes[dtype]
    vals = base[:, off : off + itemsize].copy().view(np_dtype).reshape(n_points)
    return vals[mask.astype(bool)].astype(np.float32)


def voxel_downsample_host(points: np.ndarray, voxel: float, capacity: Optional[int] = None) -> np.ndarray:
    """Hash-map voxel mean on the host (map assembly/export path)."""
    points = np.ascontiguousarray(points, np.float32)
    capacity = capacity or len(points)
    lib = _load()
    if lib is not None:
        out = np.empty((capacity, 3), np.float32)
        k = lib.voxel_downsample_host(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(len(points)),
            ctypes.c_float(voxel),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(capacity),
        )
        return out[:k]
    cells = np.floor(points / voxel).astype(np.int64)
    _, inv, counts = np.unique(cells, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((len(counts), 3), np.float64)
    np.add.at(sums, inv, points)
    return (sums / counts[:, None]).astype(np.float32)[:capacity]


class ScanRing:
    """Drop-oldest ring of raw scan blobs (native when available)."""

    def __init__(self, capacity: int = 16):
        self._lib = _load()
        self._capacity = capacity
        if self._lib is not None:
            self._h = self._lib.ring_create(capacity)
        else:
            from collections import deque

            self._q = deque(maxlen=capacity)
            self._dropped = 0

    def push(self, blob: bytes, stamp: float) -> bool:
        """Returns True if an old entry was dropped."""
        if self._lib is not None:
            return bool(self._lib.ring_push(self._h, blob, len(blob), stamp))
        dropped = len(self._q) == self._capacity
        if dropped:
            self._dropped += 1
        self._q.append((blob, stamp))
        return dropped

    def pop(self) -> Optional[Tuple[bytes, float]]:
        if self._lib is not None:
            size = self._lib.ring_peek_size(self._h)
            if size < 0:
                return None
            out = ctypes.create_string_buffer(size)
            stamp = ctypes.c_double()
            got = self._lib.ring_pop(self._h, ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), size, ctypes.byref(stamp))
            if got < 0:
                return None
            return out.raw[:got], stamp.value
        if not self._q:
            return None
        return self._q.popleft()

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.ring_count(self._h))
        return len(self._q)

    @property
    def dropped(self) -> int:
        if self._lib is not None:
            return int(self._lib.ring_dropped(self._h))
        return self._dropped

    def __del__(self):
        if getattr(self, "_lib", None) is not None:
            try:
                self._lib.ring_destroy(self._h)
            except Exception:
                pass


def lz4_frame_decompress(data: bytes, expected_size: int) -> bytes:
    """Decompress an LZ4 Frame (magic 0x184D2204 — rosbag 'lz4' chunks,
    roslz4's format). Uses the native decoder when built, else a pure-Python
    fallback (same format, ~MB/s). Raises ValueError on malformed input."""
    lib = _load()
    if lib is not None:
        src = np.frombuffer(data, np.uint8)
        dst = np.empty(expected_size, np.uint8)
        n = lib.lz4_frame_decode(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(dst),
        )
        if n < 0:
            raise ValueError("malformed LZ4 frame")
        return dst[:n].tobytes()
    return _lz4_frame_decode_py(data, expected_size)


def _lz4_block_decode_py(src: bytes, dst: bytearray) -> None:
    ip, n = 0, len(src)
    while ip < n:
        token = src[ip]; ip += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[ip]; ip += 1
                lit += b
                if b != 255:
                    break
        dst += src[ip:ip + lit]
        ip += lit
        if ip >= n:
            break
        offset = src[ip] | (src[ip + 1] << 8); ip += 2
        if offset == 0 or offset > len(dst):
            raise ValueError("malformed LZ4 block")
        mlen = token & 0x0F
        if mlen == 15:
            while True:
                b = src[ip]; ip += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        if offset >= mlen:
            start = len(dst) - offset
            dst += dst[start:start + mlen]
        else:  # overlapping match: byte-wise forward copy
            for _ in range(mlen):
                dst.append(dst[-offset])


def _lz4_frame_decode_py(data: bytes, expected_size: int) -> bytes:
    import struct as _struct

    if len(data) < 7 or _struct.unpack("<I", data[:4])[0] != 0x184D2204:
        raise ValueError("not an LZ4 frame")
    ip = 4
    flg = data[ip]; ip += 2  # FLG + BD
    if ((flg >> 6) & 0x3) != 1:
        raise ValueError("unsupported LZ4 frame version")
    b_checksum = (flg >> 4) & 1
    if (flg >> 3) & 1:
        ip += 8  # content size
    if flg & 1:
        ip += 4  # dict id
    ip += 1  # header checksum
    out = bytearray()
    while ip + 4 <= len(data):
        bsz = _struct.unpack("<I", data[ip:ip + 4])[0]; ip += 4
        if bsz == 0:
            return bytes(out)
        length = bsz & 0x7FFFFFFF
        block = data[ip:ip + length]; ip += length
        if bsz & 0x80000000:
            out += block
        else:
            _lz4_block_decode_py(block, out)
        if b_checksum:
            ip += 4
    raise ValueError("LZ4 frame missing EndMark")
