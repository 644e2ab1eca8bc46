"""ctypes loader for the C++ host-pipeline library (native/pvt_native.cpp).

Compiles the shared library on first use (cached next to the source) and
falls back to numpy implementations when no C++ toolchain is available, so
the framework never hard-depends on the native path.
"""
import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "pvt_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libpvt_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on demand; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and os.path.exists(_SRC):
            if not _build():
                return None
        if not os.path.exists(_LIB):
            return None
        lib = ctypes.CDLL(_LIB)
        lib.pvt_shuffle_indices.argtypes = [
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.pvt_gather_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.pvt_u8_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.pvt_pipeline_create.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_int, ctypes.c_int]
        lib.pvt_pipeline_create.restype = ctypes.c_void_p
        lib.pvt_pipeline_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.pvt_pipeline_next.restype = ctypes.c_int64
        lib.pvt_pipeline_acquire.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
        lib.pvt_pipeline_acquire.restype = ctypes.POINTER(ctypes.c_float)
        lib.pvt_pipeline_release.argtypes = [ctypes.c_void_p]
        lib.pvt_pipeline_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def shuffle_indices(n: int, seed: int, epoch: int) -> np.ndarray:
    """Deterministic permutation of [0, n) keyed by (seed, epoch);
    C++ Fisher-Yates when available, numpy otherwise."""
    lib = get_lib()
    if lib is None:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        return rng.permutation(n).astype(np.int32)
    out = np.empty(n, np.int32)
    lib.pvt_shuffle_indices(
        n, seed, epoch, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def gather_rows(src: np.ndarray, idx: np.ndarray,
                num_threads: int = 0) -> np.ndarray:
    """dst[i] = src[idx[i]] over leading rows. The C++ fast path handles
    float32; other dtypes fall back to numpy fancy indexing."""
    lib = get_lib()
    idx = np.ascontiguousarray(idx, np.int32)
    if lib is None or src.dtype != np.float32:
        return src[idx]
    src = np.ascontiguousarray(src)
    row_elems = int(np.prod(src.shape[1:])) if src.ndim > 1 else 1
    dst = np.empty((idx.shape[0],) + src.shape[1:], np.float32)
    nt = num_threads or min(8, os.cpu_count() or 1)
    lib.pvt_gather_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        idx.shape[0], row_elems,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nt)
    return dst


def u8_to_f32(src: np.ndarray, scale: float = 1.0 / 255.0,
              num_threads: int = 0) -> np.ndarray:
    """uint8 -> float32 normalization."""
    lib = get_lib()
    src = np.ascontiguousarray(src, np.uint8)
    if lib is None:
        return src.astype(np.float32) * scale
    dst = np.empty(src.shape, np.float32)
    nt = num_threads or min(8, os.cpu_count() or 1)
    lib.pvt_u8_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.size, scale,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nt)
    return dst


class BatchPipeline:
    """Ring-buffered native batch producer (``pvt_pipeline_*`` in
    ``native/pvt_native.cpp``): a C++ worker thread shuffles each epoch
    (same (seed, epoch)-keyed Fisher-Yates as :func:`shuffle_indices`, so
    batches are IDENTICAL to the plain streaming path) and pre-gathers
    upcoming batches into a ring of host buffers, overlapping batch
    assembly with the device step without touching the GIL.

    Falls back to a synchronous numpy producer when the native library is
    unavailable. Only single float32 source arrays are supported; the
    generic multi-array path stays on :class:`~pyroved_tpu.utils.data.DataLoader`'s
    Python iteration.

    NOTE (round 5, docs/PERFORMANCE.md "Native host pipeline"): this class
    has **no measured end-to-end win on any available runtime** — on the
    tunneled TPU the wire bounds every streaming variant (40.4 vs 48.0
    steps/s sync), and on a healthy transport (forced-CPU harness,
    ``benchmarks/pipeline_overlap.py``) the ring measures 0.92x sync
    because its worker threads compete with the device's own compute
    threads. Prefer ``DataLoader(stream_chunks=c)`` or narrow residency
    (``scale=`` / ``store_dtype=``) for out-of-core data.
    """

    def __init__(self, src: np.ndarray, batch_size: int, seed: int = 0,
                 depth: int = 3, num_threads: int = 0):
        self._src = np.ascontiguousarray(src, np.float32)  # keep alive
        self.n_rows = int(self._src.shape[0])
        self.row_shape = self._src.shape[1:]
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.num_batches = -(-self.n_rows // self.batch_size)
        self._row_elems = int(np.prod(self.row_shape)) if self.row_shape else 1
        self._lib = get_lib()
        self._handle = None
        self._closed = False
        self._pending_release = False
        if self._lib is not None:
            self._handle = self._lib.pvt_pipeline_create(
                self._src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.n_rows, self._row_elems, self.batch_size, self.seed,
                int(depth), num_threads or min(8, os.cpu_count() or 1))
        # synchronous-fallback cursor state, built lazily on first use (the
        # native path never reads it — no point shuffling 10M rows up front)
        self._epoch = 0
        self._cursor = 0
        self._perm = None

    def next(self, copy: bool = True) -> np.ndarray:
        """The next batch ([rows, *row_shape]; the epoch-final batch may be
        short). Blocks until the producer has it ready.

        With ``copy=False`` the native path returns a VIEW into the ring
        slot that is only valid until the next :meth:`next` call, a
        :meth:`close`, or the pipeline object being garbage-collected (the
        ring is C++-owned memory) — use it when the batch is consumed
        immediately (e.g. ``device_put``); it removes the last host copy
        from the consume path."""
        if self._closed:
            raise RuntimeError("BatchPipeline is closed")
        if self._handle is not None:
            if self._pending_release:
                # the previously returned view's slot is given back only
                # now, so a copy=False view stays valid between next() calls
                self._lib.pvt_pipeline_release(self._handle)
                self._pending_release = False
            rows_out = ctypes.c_int64()
            ptr = self._lib.pvt_pipeline_acquire(self._handle,
                                                 ctypes.byref(rows_out))
            rows = int(rows_out.value)
            if not ptr or rows < 0:
                raise RuntimeError("BatchPipeline is closed")
            view = np.ctypeslib.as_array(ptr, shape=(rows, self._row_elems))
            view = view.reshape((rows,) + self.row_shape)
            if copy:
                out = view.copy()
                self._lib.pvt_pipeline_release(self._handle)
                return out
            self._pending_release = True
            return view
        # synchronous fallback with the identical shuffle sequence
        if self._perm is None:
            self._perm = shuffle_indices(self.n_rows, self.seed, self._epoch)
        rows = min(self.batch_size, self.n_rows - self._cursor)
        out = self._src[self._perm[self._cursor:self._cursor + rows]]
        self._cursor += rows
        if self._cursor >= self.n_rows:
            self._epoch += 1
            self._perm = shuffle_indices(self.n_rows, self.seed, self._epoch)
            self._cursor = 0
        return out

    def epoch_batches(self):
        """Yield one epoch's worth of batches (as 1-tuples, DataLoader
        convention)."""
        for _ in range(self.num_batches):
            yield (self.next(),)

    def close(self) -> None:
        """Shut the producer down. Not safe to call concurrently with an
        in-flight :meth:`next` from another thread (single-consumer class);
        subsequent :meth:`next` calls raise."""
        self._closed = True
        if self._handle is not None:
            self._lib.pvt_pipeline_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
