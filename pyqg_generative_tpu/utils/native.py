"""Build + ctypes bindings for the native (C++) runtime components.

The reference's data path is pure python (xarray mfdataset + in-process
shuffling, reference tools/cnn_tools.py:51-52,607-622); the native pendant
here is `fastloader.cpp`: an mmap'ed float32 sample store with a
multithreaded, double-buffered shuffled-batch producer. The shared library is
compiled on first use with g++ (no pip dependencies) and cached; a pure-numpy
fallback provides identical semantics where no toolchain exists.
"""
from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "fastloader.cpp")
_BUILD_DIR = os.path.join(_HERE, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libfastloader.so")
_build_lock = threading.Lock()
_lib = None


def build_native(force: bool = False) -> str | None:
    """Compile fastloader.cpp -> libfastloader.so (cached). Returns the path
    or None if no compiler is available."""
    with _build_lock:
        if not force and os.path.exists(_LIB_PATH) and \
                os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
            return _LIB_PATH
        os.makedirs(_BUILD_DIR, exist_ok=True)
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
               "-fPIC", "-pthread", _SRC, "-o", _LIB_PATH]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            msg = getattr(e, "stderr", b"")
            print(f"[native] build failed ({e}): "
                  f"{msg.decode() if isinstance(msg, bytes) else msg}")
            return None
        return _LIB_PATH


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.fl_open.restype = ctypes.c_long
    lib.fl_open.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_long]
    lib.fl_start_epoch.restype = ctypes.c_long
    lib.fl_start_epoch.argtypes = [ctypes.c_long, ctypes.c_ulong,
                                   ctypes.c_long, ctypes.c_int]
    lib.fl_next_batch.restype = ctypes.c_long
    lib.fl_next_batch.argtypes = [ctypes.c_long,
                                  ctypes.POINTER(ctypes.c_float)]
    lib.fl_batch_size.restype = ctypes.c_long
    lib.fl_batch_size.argtypes = [ctypes.c_long]
    lib.fl_close.argtypes = [ctypes.c_long]
    _lib = lib
    return lib


# --------------------------------------------------------------- sample store

def write_sample_store(folder: str, arrays: dict[str, np.ndarray]):
    """Persist named sample arrays (same leading dim) as one raw float32
    blob + meta.json. Samples are the concatenation of each array's
    per-sample flattening, in key order."""
    keys = sorted(arrays.keys())
    n = arrays[keys[0]].shape[0]
    parts = []
    meta = {"n_samples": int(n), "fields": {}}
    offset = 0
    for k in keys:
        a = np.ascontiguousarray(arrays[k], dtype=np.float32)
        assert a.shape[0] == n, (k, a.shape)
        flat = a.reshape(n, -1)
        meta["fields"][k] = {"shape": list(a.shape[1:]),
                             "offset": offset, "size": flat.shape[1]}
        offset += flat.shape[1]
        parts.append(flat)
    meta["sample_floats"] = offset
    os.makedirs(folder, exist_ok=True)
    blob = np.concatenate(parts, axis=1)
    blob.tofile(os.path.join(folder, "data.bin"))
    with open(os.path.join(folder, "meta.json"), "w") as f:
        json.dump(meta, f)


class FastLoader:
    """Shuffled minibatch iterator over a sample store, native when possible.

    Usage:
        fl = FastLoader(folder, batch_size=64)
        for batch in fl.epoch(seed=0):   # dict of field -> (bs, ...) float32
            ...
    """

    def __init__(self, folder: str, batch_size: int = 64,
                 drop_last: bool = False, force_python: bool = False):
        with open(os.path.join(folder, "meta.json")) as f:
            self.meta = json.load(f)
        self.folder = folder
        self.batch_size = int(batch_size)
        self.drop_last = drop_last
        self.n_samples = self.meta["n_samples"]
        self.sample_floats = self.meta["sample_floats"]
        self._lib = None if force_python else _load_lib()
        self._handle = None
        data_path = os.path.join(folder, "data.bin")
        if self._lib is not None:
            h = self._lib.fl_open(data_path.encode(), self.n_samples,
                                  self.sample_floats)
            if h > 0:
                self._handle = h
            else:
                self._lib = None
        if self._lib is None:
            self._mm = np.memmap(data_path, dtype=np.float32, mode="r",
                                 shape=(self.n_samples, self.sample_floats))

    @property
    def native(self) -> bool:
        return self._handle is not None

    def _split(self, flat: np.ndarray) -> dict[str, np.ndarray]:
        out = {}
        for k, info in self.meta["fields"].items():
            seg = flat[:, info["offset"]:info["offset"] + info["size"]]
            out[k] = seg.reshape((flat.shape[0],) + tuple(info["shape"]))
        return out

    def epoch(self, seed: int = 0):
        bs = self.batch_size
        if self.native:
            nb = self._lib.fl_start_epoch(self._handle, seed, bs,
                                          1 if self.drop_last else 0)
            buf = np.empty((bs, self.sample_floats), dtype=np.float32)
            ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            for _ in range(nb):
                idx = self._lib.fl_next_batch(self._handle, ptr)
                if idx < 0:
                    break
                yield self._split(buf.copy())
        else:
            rng = np.random.default_rng(seed)
            order = rng.permutation(self.n_samples)
            nb = self.n_samples // bs if self.drop_last else \
                -(-self.n_samples // bs)
            for b in range(nb):
                idx = order[b * bs:(b + 1) * bs]
                if len(idx) < bs:  # wrap like the native path
                    idx = np.concatenate(
                        [idx, order[:bs - len(idx)]])
                yield self._split(np.asarray(self._mm[idx]))

    def close(self):
        if self._handle is not None:
            self._lib.fl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
