"""ctypes bindings for the C++ data-plane (dataplane.cpp).

Compiled on first import with g++ (cached next to the source); falls back
to None when no toolchain is available — callers (data/indexing.py,
data/text.py) degrade to the pure-Python gzip path.
"""

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataplane.cpp")
_SO = os.path.join(_HERE, "_dataplane.so")

_lib = None
_lock = threading.Lock()


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO, "-lz", "-lpthread"],
            check=True,
            capture_output=True,
        )
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[native] dataplane build failed ({e}); using pure-Python gzip path")
        return None


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        so = _build()
        if so is None:
            _lib = False
            return None
        lib = ctypes.CDLL(so)
        lib.dp_index_file.restype = ctypes.c_int64
        lib.dp_index_file.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
        lib.dp_free.argtypes = [ctypes.c_void_p]
        lib.dp_index_many.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dp_open.restype = ctypes.c_void_p
        lib.dp_open.argtypes = [ctypes.c_char_p]
        lib.dp_close.argtypes = [ctypes.c_void_p]
        lib.dp_tell.restype = ctypes.c_int64
        lib.dp_tell.argtypes = [ctypes.c_void_p]
        lib.dp_read_range.restype = ctypes.c_int64
        lib.dp_read_range.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_char_p,
        ]
        _lib = lib
        return lib


def index_file(path: str) -> Optional[Dict[str, List[int]]]:
    """Newline offsets of a gzip JSONL shard in loader format
    ({row: [start, end]}), or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_int64)()
    n = lib.dp_index_file(path.encode(), ctypes.byref(out))
    if n < 0:
        return None
    offsets = {str(i): [out[2 * i], out[2 * i + 1]] for i in range(n)}
    lib.dp_free(out)
    return offsets


def index_many(paths: List[str], n_threads: int = 8) -> Optional[List[Dict[str, List[int]]]]:
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    results = (ctypes.POINTER(ctypes.c_int64) * n)()
    counts = (ctypes.c_int64 * n)()
    lib.dp_index_many(c_paths, n, n_threads, results, counts)
    out = []
    for i in range(n):
        if counts[i] < 0:
            out.append(None)
            continue
        arr = results[i]
        out.append({str(r): [arr[2 * r], arr[2 * r + 1]] for r in range(counts[i])})
        lib.dp_free(arr)
    return out


class NativeGzipStream:
    """Forward-seekable decompressed view over a local gzip shard."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native dataplane unavailable")
        self._lib = lib
        self._path = path
        self._h = lib.dp_open(path.encode())
        if not self._h:
            raise OSError(f"dp_open failed for {path}")

    def tell(self) -> int:
        return self._lib.dp_tell(self._h)

    def seek(self, pos: int):
        if pos < self.tell():  # rewind = reopen
            self._lib.dp_close(self._h)
            self._h = self._lib.dp_open(self._path.encode())
            if not self._h:
                # surface the failure as OSError so the loader's
                # ShardReadError fault tolerance handles it — a NULL
                # handle passed to dp_read_range would segfault
                raise OSError(f"dp_open failed reopening {self._path}")
        # forward skip happens lazily inside read()

        self._pending = pos

    def read(self, n: int) -> bytes:
        start = getattr(self, "_pending", None)
        if start is None:
            start = self.tell()
        buf = ctypes.create_string_buffer(n)
        got = self._lib.dp_read_range(self._h, start, n, buf)
        self._pending = None
        if got < 0:
            raise OSError(f"dp_read_range failed for {self._path} at {start}")
        return buf.raw[:got]

    def close(self):
        if self._h:
            self._lib.dp_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
