"""ctypes bindings + on-demand build of the native sparse TSDF voxel hash.

The C++ source lives in ``native/tsdf_hash.cpp`` (see its header comment);
it is compiled once with g++ into ``native/build/libtsdf_hash.so`` and loaded
via ctypes. A pure-numpy fallback ``PyVoxelHash`` keeps the API available if
no compiler is present.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _ROOT / "native" / "tsdf_hash.cpp"
_BUILD = _ROOT / "native" / "build"
_SO = _BUILD / "libtsdf_hash.so"
_BUILD_LOCK = threading.Lock()


def _build_library() -> pathlib.Path | None:
    """Compile the voxel hash on this machine, keyed by source content hash.

    The shared object is never committed and never trusted across machines:
    mtimes are unreliable after checkout, and a foreign-built binary could
    carry ISA extensions this CPU lacks. -O2 without -march keeps the build
    portable; the hash file invalidates it whenever the source changes.
    """
    import hashlib

    with _BUILD_LOCK:
        src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()
        hash_file = _BUILD / "tsdf_hash.src.sha256"
        if (_SO.exists() and hash_file.exists()
                and hash_file.read_text().strip() == src_hash):
            return _SO
        _BUILD.mkdir(parents=True, exist_ok=True)
        cmd = ["g++", "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            hash_file.write_text(src_hash)
            return _SO
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            msg = getattr(e, "stderr", str(e))
            print(f"[native-tsdf] build failed, using numpy fallback: {msg}")
            return None


_lib = None
_lib_tried = False


def _get_lib():
    global _lib, _lib_tried
    if _lib is None and not _lib_tried:
        _lib_tried = True
        so = _build_library()
        if so is not None:
            lib = ctypes.CDLL(str(so))
            lib.tsdf_create.restype = ctypes.c_void_p
            lib.tsdf_create.argtypes = [ctypes.c_int64, ctypes.c_float,
                                        ctypes.c_float, ctypes.c_float]
            lib.tsdf_destroy.argtypes = [ctypes.c_void_p]
            lib.tsdf_clear.argtypes = [ctypes.c_void_p]
            lib.tsdf_integrate.restype = ctypes.c_int64
            lib.tsdf_integrate.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_float,
            ]
            lib.tsdf_query.restype = ctypes.c_int64
            lib.tsdf_query.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_float,
            ]
            lib.tsdf_num_voxels.restype = ctypes.c_int64
            lib.tsdf_num_voxels.argtypes = [ctypes.c_void_p]
            lib.tsdf_stats.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_double)]
            _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeVoxelHash:
    """C++ sparse TSDF volume (see native/tsdf_hash.cpp)."""

    def __init__(self, capacity=1 << 20, voxel_size=0.03, trunc=0.12,
                 max_weight=100.0):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native tsdf library unavailable")
        self._lib = lib
        self.voxel_size = voxel_size
        self.trunc = trunc
        self._h = lib.tsdf_create(capacity, voxel_size, trunc, max_weight)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.tsdf_destroy(self._h)
            self._h = None

    def integrate(self, points, conf, origin, min_conf=0.0) -> int:
        pts = np.ascontiguousarray(points, np.float32)
        cf = np.ascontiguousarray(conf, np.float32).reshape(-1)
        org = np.ascontiguousarray(origin, np.float32).reshape(3)
        return int(self._lib.tsdf_integrate(
            self._h, _fptr(pts), _fptr(cf), pts.shape[0], _fptr(org),
            float(min_conf),
        ))

    def query(self, points, min_weight=1e-3):
        pts = np.ascontiguousarray(points, np.float32)
        n = pts.shape[0]
        tsdf = np.empty(n, np.float32)
        grad = np.empty((n, 3), np.float32)
        valid = np.empty(n, np.uint8)
        self._lib.tsdf_query(
            self._h, _fptr(pts), n, _fptr(tsdf), _fptr(grad),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            float(min_weight),
        )
        return tsdf, grad, valid.astype(bool)

    def clear(self):
        self._lib.tsdf_clear(self._h)

    def num_voxels(self) -> int:
        return int(self._lib.tsdf_num_voxels(self._h))

    def stats(self) -> dict:
        out = (ctypes.c_double * 4)()
        self._lib.tsdf_stats(self._h, out)
        return {"voxels": int(out[0]), "capacity": int(out[1]),
                "updates": float(out[2]), "failed_inserts": int(out[3])}


class PyVoxelHash:
    """Numpy fallback with the same API (dict-of-voxels, like the reference's
    global_volume.py but vectorized per integrate call)."""

    def __init__(self, capacity=1 << 20, voxel_size=0.03, trunc=0.12,
                 max_weight=100.0):
        self.voxel_size = voxel_size
        self.trunc = trunc
        self.max_weight = max_weight
        self.vox: dict[tuple, list] = {}
        self._updates = 0

    def integrate(self, points, conf, origin, min_conf=0.0) -> int:
        pts = np.asarray(points, np.float32).reshape(-1, 3)
        cf = np.asarray(conf, np.float32).reshape(-1)
        org = np.asarray(origin, np.float32).reshape(3)
        keep = (cf >= min_conf) & np.isfinite(pts).all(1)
        pts, cf = pts[keep], cf[keep]
        d = pts - org
        lens = np.linalg.norm(d, axis=1)
        ok = lens > 1e-6
        pts, cf, d, lens = pts[ok], cf[ok], d[ok], lens[ok]
        dirs = d / lens[:, None]
        step = 0.5 * self.voxel_size
        n_steps = int(np.ceil(2 * self.trunc / step)) + 1
        ts = lens[:, None] + np.linspace(-self.trunc, self.trunc, n_steps)[None]
        ts = np.maximum(ts, 0.0)
        samples = org + dirs[:, None, :] * ts[..., None]
        sdf = (lens[:, None] - ts) / self.trunc
        w = cf[:, None] * np.exp(-np.abs(sdf))
        ijk = np.floor(samples / self.voxel_size).astype(np.int64)
        flat_ijk = ijk.reshape(-1, 3)
        flat_sdf = sdf.reshape(-1)
        flat_w = w.reshape(-1)
        count = 0
        for (x, y, z), s, ww in zip(map(tuple, flat_ijk), flat_sdf, flat_w):
            if ww <= 0:
                continue
            cell = self.vox.get((x, y, z))
            if cell is None:
                self.vox[(x, y, z)] = [s, ww]
            else:
                t_old, w_old = cell
                w_new = w_old + ww
                cell[0] = (t_old * w_old + s * ww) / w_new
                cell[1] = min(w_new, self.max_weight)
            count += 1
        self._updates += count
        return count

    def query(self, points, min_weight=1e-3):
        pts = np.asarray(points, np.float32).reshape(-1, 3)
        n = pts.shape[0]
        tsdf = np.zeros(n, np.float32)
        grad = np.zeros((n, 3), np.float32)
        valid = np.zeros(n, bool)
        inv = 1.0 / (2.0 * self.voxel_size)
        for i, p in enumerate(pts):
            ix, iy, iz = np.floor(p / self.voxel_size).astype(np.int64)

            def get(dx, dy, dz):
                c = self.vox.get((ix + dx, iy + dy, iz + dz))
                return None if c is None or c[1] < min_weight else c[0]

            c = get(0, 0, 0)
            nb = [get(1, 0, 0), get(-1, 0, 0), get(0, 1, 0), get(0, -1, 0),
                  get(0, 0, 1), get(0, 0, -1)]
            if c is None or any(v is None for v in nb):
                continue
            tsdf[i] = c
            grad[i] = [(nb[0] - nb[1]) * inv, (nb[2] - nb[3]) * inv,
                       (nb[4] - nb[5]) * inv]
            valid[i] = True
        return tsdf, grad, valid

    def clear(self):
        self.vox.clear()

    def num_voxels(self):
        return len(self.vox)

    def stats(self):
        return {"voxels": len(self.vox), "capacity": -1,
                "updates": float(self._updates), "failed_inserts": 0}


def make_voxel_hash(capacity=1 << 20, voxel_size=0.03, trunc=0.12,
                    max_weight=100.0):
    """Native hash if buildable, numpy fallback otherwise."""
    try:
        return NativeVoxelHash(capacity, voxel_size, trunc, max_weight)
    except RuntimeError:
        return PyVoxelHash(capacity, voxel_size, trunc, max_weight)
