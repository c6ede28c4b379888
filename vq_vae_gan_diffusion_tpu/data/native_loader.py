"""ctypes binding for the native sampledb loader (native/sampledb.cpp).

The reference outsources host-side data work to torch DataLoader worker
*processes* (SURVEY §3 "process/device boundaries"); here the equivalent
native layer is a C++ thread pool over a memory-mapped, decoded-once uint8
sample store — gather, flip + random-rotation augmentation, u8→f32
normalization all happen in native code, and Python only hands contiguous
float32 batches to ``jax.device_put``.

Usage::

    path = build_sample_store(dataset, "cache/mnist_train.sdb", img_size=28)
    loader = NativeDataLoader(path, batch_size=200, mean=(0.5,), std=(0.5,))
    for batch in loader:          # float32 [B, H, W, C]
        ...

Falls back gracefully: ``is_available()`` is False when the .so hasn't been
built (``make -C native``), and callers keep using the Python DataLoader.
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Optional, Sequence

import numpy as np

_MAGIC = 0x53444231334C4456

_LIB = None


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libsampledb.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not os.path.exists(path):
        raise OSError(f"{path} not built; run `make -C native`")
    lib = ctypes.CDLL(path)
    lib.sdb_open.restype = ctypes.c_void_p
    lib.sdb_open.argtypes = [ctypes.c_char_p]
    lib.sdb_close.argtypes = [ctypes.c_void_p]
    lib.sdb_shape.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
    lib.sdb_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint64, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_uint64, ctypes.POINTER(ctypes.c_float)]
    lib.sdb_prefetcher_create.restype = ctypes.c_void_p
    lib.sdb_prefetcher_create.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_uint64, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
    lib.sdb_prefetcher_reset.restype = ctypes.c_uint64
    lib.sdb_prefetcher_reset.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sdb_prefetcher_next.restype = ctypes.c_int
    lib.sdb_prefetcher_next.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_float),
                                        ctypes.c_uint64]
    lib.sdb_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def is_available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def build_sample_store(dataset, path: str, img_size: Optional[int] = None,
                       grayscale: bool = False) -> str:
    """Decode a dataset once into the mmap-able uint8 store.

    ``grayscale`` converts multi-channel images with the same ITU-R 601-2
    luma as ``Preprocessor`` so a grayscale pipeline (e.g. mnist config on
    RGB sources) can still take the native path."""
    from .transforms import resize

    def prepare(img: np.ndarray) -> np.ndarray:
        if img_size is not None:
            img = resize(img, img_size)
        if grayscale and img.shape[-1] != 1:
            img = (img @ np.array([0.299, 0.587, 0.114], np.float32))
            img = np.clip(img, 0, 255)[..., None].astype(np.uint8)
        return img

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    first = prepare(dataset.get_image(0))
    h, w, c = first.shape
    n = len(dataset)
    with open(path, "wb") as f:
        f.write(struct.pack("<5Q", _MAGIC, n, h, w, c))
        for i in range(n):
            img = prepare(dataset.get_image(i))
            f.write(np.ascontiguousarray(img, np.uint8).tobytes())
    return path


def _stats(vals: Sequence[float]):
    arr = (ctypes.c_float * max(len(vals), 1))(*[float(v) for v in vals])
    return arr, len(vals)


class SampleStore:
    def __init__(self, path: str):
        self.lib = _load()
        self.handle = self.lib.sdb_open(path.encode())
        if not self.handle:
            raise OSError(f"failed to open sample store {path!r}")
        shape = (ctypes.c_uint64 * 4)()
        self.lib.sdb_shape(self.handle, shape)
        self.n, self.h, self.w, self.c = (int(shape[i]) for i in range(4))

    def gather(self, indices: np.ndarray, mean=(0.5,), std=(0.5,),
               p_hflip: float = 0.0, p_vflip: float = 0.0,
               p_rot: float = 0.0, max_deg: float = 0.0,
               seed: int = 0) -> np.ndarray:
        idx = np.ascontiguousarray(indices, np.uint64)
        out = np.empty((len(idx), self.h, self.w, self.c), np.float32)
        m, cm = _stats(mean)
        s, _ = _stats(std)
        self.lib.sdb_gather(
            self.handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(idx), m, s, cm, p_hflip, p_vflip, p_rot, max_deg, seed,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def close(self):
        if self.handle:
            self.lib.sdb_close(self.handle)
            self.handle = None


class NativeDataLoader:
    """Python-DataLoader-compatible iterator backed by the C++ prefetcher."""

    def __init__(self, store_path: str, batch_size: int, mean=(0.5,),
                 std=(0.5,), p_hflip: float = 0.0, p_vflip: float = 0.0,
                 p_rot: float = 0.0, max_deg: float = 0.0,
                 shuffle: bool = True, drop_last: bool = True, seed: int = 0,
                 num_threads: int = 0, max_samples: Optional[int] = None):
        self.lib = _load()
        self.store = SampleStore(store_path)
        self.batch_size = batch_size
        m, cm = _stats(mean)
        s, _ = _stats(std)
        limit = int(max_samples) if max_samples else 0
        self.pf = self.lib.sdb_prefetcher_create(
            self.store.handle, batch_size, m, s, cm, p_hflip, p_vflip,
            p_rot, max_deg, seed,
            1 if shuffle else 0, 1 if drop_last else 0, num_threads, limit)
        self._epoch = 0
        # epoch size honors max_samples (same subset semantics as the Python
        # DataLoader: first `max_samples` indices, shuffled per epoch)
        self.n = min(self.store.n, limit) if limit else self.store.n
        self.drop_last = drop_last

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        nb = self.lib.sdb_prefetcher_reset(self.pf, self._epoch)
        self._epoch += 1
        st = self.store
        elems = self.batch_size * st.h * st.w * st.c
        for _ in range(nb):
            out = np.empty((self.batch_size, st.h, st.w, st.c), np.float32)
            rc = self.lib.sdb_prefetcher_next(
                self.pf, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                elems)
            if rc != 0:
                break
            yield out

    def close(self):
        if getattr(self, "pf", None):
            self.lib.sdb_prefetcher_destroy(self.pf)
            self.pf = None
        self.store.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
