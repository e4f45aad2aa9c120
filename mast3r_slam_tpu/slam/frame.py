"""Frames, keyframe ring buffer, and shared SLAM state (single controller).

TPU-native redesign of the reference's 3-process shared-CUDA-tensor layer
(reference: mast3r_slam/frame.py — ``Frame``, ``SharedStates``,
``SharedKeyframes``): here there is ONE controller process; keyframe state
lives in fixed-capacity device arrays (so every consumer jits once against
static shapes), and service threads coordinate through an ``RLock`` +
per-keyframe version counters instead of cross-process CUDA IPC.

Pointmap fusion policies (``first | recent | best_score | indep_conf |
weighted_pointmap | weighted_spherical``) are jitted pure functions.
"""

from __future__ import annotations

import dataclasses
import threading
from enum import IntEnum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import lie


class Mode(IntEnum):
    INIT = 0
    TRACKING = 1
    RELOC = 2
    TERMINATED = 3


@dataclasses.dataclass
class Frame:
    """Per-frame state. ``X_canon``/``C`` are flattened (H*W, 3)/(H*W, 1)."""

    frame_id: int
    img: jnp.ndarray                 # (H, W, 3) normalized to [-1, 1]
    img_shape: tuple                 # (H, W) after any display downsample
    img_true_shape: tuple            # (H, W) fed to the model
    uimg: np.ndarray                 # (H, W, 3) float [0, 1] display image (host)
    T_WC: jnp.ndarray = None         # (8,) Sim3
    X_canon: Optional[jnp.ndarray] = None
    C: Optional[jnp.ndarray] = None
    feat: Optional[jnp.ndarray] = None
    pos: Optional[jnp.ndarray] = None
    N: int = 0
    N_updates: int = 0
    K: Optional[jnp.ndarray] = None

    def __post_init__(self):
        if self.T_WC is None:
            self.T_WC = lie.identity()

    def get_average_conf(self):
        return self.C / self.N if self.C is not None else None

    def get_score(self, C, filtering_score: str):
        return jnp.median(C) if filtering_score == "median" else jnp.mean(C)

    def update_pointmap(self, X, C, filtering_mode="weighted_pointmap",
                        filtering_score="median"):
        if self.N == 0:
            self.X_canon = X
            self.C = C
            self.N = 1
            self.N_updates = 1
            if filtering_mode == "best_score":
                self.score = self.get_score(C, filtering_score)
            return
        if filtering_mode == "first":
            if self.N_updates == 1:
                self.X_canon, self.C, self.N = X, C, 1
        elif filtering_mode == "recent":
            self.X_canon, self.C, self.N = X, C, 1
        elif filtering_mode == "best_score":
            new_score = self.get_score(C, filtering_score)
            if bool(new_score > self.score):
                self.X_canon, self.C, self.N = X, C, 1
                self.score = new_score
        elif filtering_mode == "indep_conf":
            self.X_canon, self.C = _fuse_indep_conf(self.X_canon, self.C, X, C)
            self.N = 1
        elif filtering_mode == "weighted_pointmap":
            self.X_canon, self.C = _fuse_weighted(self.X_canon, self.C, X, C)
            self.N += 1
        elif filtering_mode == "weighted_spherical":
            self.X_canon, self.C = _fuse_weighted_spherical(self.X_canon, self.C, X, C)
            self.N += 1
        else:
            raise ValueError(f"unknown filtering_mode {filtering_mode}")
        self.N_updates += 1


@jax.jit
def _fuse_indep_conf(X0, C0, X, C):
    better = C > C0
    return jnp.where(better, X, X0), jnp.where(better, C, C0)


@jax.jit
def _fuse_weighted(X0, C0, X, C):
    return (C0 * X0 + C * X) / (C0 + C), C0 + C


@jax.jit
def _fuse_weighted_spherical(X0, C0, X, C):
    def to_sph(P):
        r = jnp.linalg.norm(P, axis=-1, keepdims=True)
        x, y, z = jnp.split(P, 3, axis=-1)
        phi = jnp.arctan2(y, x)
        theta = jnp.arccos(jnp.clip(z / jnp.clip(r, 1e-12), -1.0, 1.0))
        return jnp.concatenate([r, phi, theta], axis=-1)

    def to_cart(s):
        r, phi, theta = jnp.split(s, 3, axis=-1)
        return jnp.concatenate(
            [
                r * jnp.sin(theta) * jnp.cos(phi),
                r * jnp.sin(theta) * jnp.sin(phi),
                r * jnp.cos(theta),
            ],
            axis=-1,
        )

    sph = (C0 * to_sph(X0) + C * to_sph(X)) / (C0 + C)
    return to_cart(sph), C0 + C


class KeyframeBuffer:
    """Fixed-capacity keyframe store backed by device arrays.

    Equivalent capability to the reference ``SharedKeyframes`` ring
    (buffer=110 — frame.py:220-253) including the fork's ``frame_id_to_index``
    map and per-keyframe optimistic-concurrency ``version`` counters, but as a
    pytree of jnp arrays in a single process. All mutation happens under
    ``lock`` so quality/TSDF service threads can snapshot consistently.
    """

    def __init__(self, h, w, capacity=110, feat_dim=1024, patch_size=16,
                 device=None, model_hw=None):
        self.lock = threading.RLock()
        # (h, w): WORKING per-pixel resolution (model crop //
        # dataset.img_downsample); model_hw: the model crop itself — encoder
        # tokens stay at model resolution even when pointmaps are decimated
        self.h, self.w = h, w
        self.model_hw = model_hw if model_hw is not None else (h, w)
        self.capacity = capacity
        self.feat_dim = feat_dim
        self.num_patches = ((self.model_hw[0] // patch_size)
                            * (self.model_hw[1] // patch_size))
        n = h * w
        self.n_size = 0
        self.frame_id_to_index: dict[int, int] = {}

        self.dataset_idx = np.zeros(capacity, dtype=np.int64)
        self.T_WC = jnp.tile(lie.identity()[None], (capacity, 1))
        self.X = jnp.zeros((capacity, n, 3), jnp.float32)
        self.C = jnp.zeros((capacity, n, 1), jnp.float32)
        self.N = np.zeros(capacity, dtype=np.int32)
        self.N_updates = np.zeros(capacity, dtype=np.int32)
        self.feat = jnp.zeros((capacity, self.num_patches, feat_dim), jnp.float32)
        self.pos = jnp.zeros((capacity, self.num_patches, 2), jnp.int32)
        self.is_dirty = np.zeros(capacity, dtype=bool)
        self.version = np.zeros(capacity, dtype=np.int64)
        # Counts POINTMAP-CONTENT changes only (X/C/N writes), unlike
        # ``version`` which also bumps on pose-only updates — the factor
        # graph keys its measured-channel cache on this so a BA solve does
        # not invalidate every edge it just optimized.
        self.xc_version = np.zeros(capacity, dtype=np.int64)
        self.K: Optional[jnp.ndarray] = None
        # Host-side copies kept for services/visualization/export.
        self.uimg = [None] * capacity
        self.img = [None] * capacity
        self.img_shapes = [None] * capacity

    def __len__(self):
        with self.lock:
            return self.n_size

    def set_intrinsics(self, K):
        self.K = jnp.asarray(K, jnp.float32)

    def get_intrinsics(self):
        return self.K

    def __setitem__(self, idx, frame: Frame):
        with self.lock:
            self.n_size = max(idx + 1, self.n_size)
            self.frame_id_to_index[frame.frame_id] = idx
            self.dataset_idx[idx] = frame.frame_id
            self.T_WC = self.T_WC.at[idx].set(frame.T_WC.reshape(8))
            self.X = self.X.at[idx].set(frame.X_canon)
            self.C = self.C.at[idx].set(frame.C)
            self.N[idx] = frame.N
            self.N_updates[idx] = frame.N_updates
            self.feat = self.feat.at[idx].set(frame.feat[0])
            self.pos = self.pos.at[idx].set(frame.pos[0])
            self.is_dirty[idx] = True
            self.xc_version[idx] += 1
            self.uimg[idx] = frame.uimg
            self.img[idx] = frame.img
            self.img_shapes[idx] = (frame.img_shape, frame.img_true_shape)

    def __getitem__(self, idx) -> Frame:
        with self.lock:
            shp, true_shp = self.img_shapes[idx]
            kf = Frame(
                frame_id=int(self.dataset_idx[idx]),
                img=self.img[idx],
                img_shape=shp,
                img_true_shape=true_shp,
                uimg=self.uimg[idx],
                T_WC=self.T_WC[idx],
            )
            kf.X_canon = self.X[idx]
            kf.C = self.C[idx]
            kf.feat = self.feat[idx][None]
            kf.pos = self.pos[idx][None]
            kf.N = int(self.N[idx])
            kf.N_updates = int(self.N_updates[idx])
            kf.K = self.K
            return kf

    def append(self, frame: Frame):
        with self.lock:
            self[self.n_size] = frame

    def pop_last(self):
        with self.lock:
            self.n_size -= 1

    def last_keyframe(self) -> Optional[Frame]:
        with self.lock:
            if self.n_size == 0:
                return None
            return self[self.n_size - 1]

    def last_index(self) -> int:
        with self.lock:
            return self.n_size - 1

    def update_T_WCs(self, T_WCs, idx) -> None:
        with self.lock:
            self.T_WC = self.T_WC.at[jnp.asarray(idx)].set(T_WCs)
            for i in np.atleast_1d(np.asarray(idx)):
                self.version[int(i)] += 1

    def update_pointmap_inplace(self, idx, X, C, expected_version=None) -> bool:
        """Optimistic-concurrency pointmap write (used by the TSDF refiner).

        Returns False (and writes nothing) if the keyframe's version changed
        since ``expected_version`` was read — reference tsdf_refine.py:774-833.
        """
        with self.lock:
            if expected_version is not None and self.version[idx] != expected_version:
                return False
            self.X = self.X.at[idx].set(X)
            self.C = self.C.at[idx].set(C)
            self.is_dirty[idx] = True
            self.version[idx] += 1
            self.xc_version[idx] += 1
            return True

    def get_dirty_idx(self):
        with self.lock:
            idx = np.where(self.is_dirty)[0]
            self.is_dirty[:] = False
            return idx


class States:
    """Controller-wide mutable state: mode machine, reloc signal, backend queue.

    Single-process equivalent of the reference ``SharedStates``
    (frame.py:125-217): plain Python + a lock, since frontend/backend are
    asynchronously dispatched device computations in one controller, not
    separate processes.
    """

    def __init__(self):
        self.lock = threading.RLock()
        self.mode = Mode.INIT
        self.paused = False
        self.reloc_sem = 0
        self.global_optimizer_tasks: list[int] = []
        self.edges_ii: list[int] = []
        self.edges_jj: list[int] = []
        self.current_frame: Optional[Frame] = None
        # (i, j, idx_j2i[, valid_i, Q_i]) — the tracker's converged match at
        # keyframe creation, consumed once by the backend: the 5-tuple form
        # lets add_factors REUSE it as the consecutive edge's whole j→i
        # direction (half the edge-creation decode)
        self.kf_match_hint: Optional[tuple] = None

    def set_frame(self, frame: Frame):
        with self.lock:
            self.current_frame = frame

    def set_kf_match_hint(self, i: int, j: int, idx_j2i, valid_i=None,
                          Q_i=None) -> None:
        with self.lock:
            if valid_i is not None and Q_i is not None:
                self.kf_match_hint = (i, j, idx_j2i, valid_i, Q_i)
            else:
                self.kf_match_hint = (i, j, idx_j2i)

    def take_kf_match_hint(self, i=None, j=None):
        """Pop the stored hint. With ``(i, j)`` given, pop ONLY if it is for
        that edge — a lagging backend must not consume (and discard) the
        hint for keyframe N+1 while still processing keyframe N."""
        with self.lock:
            hint = self.kf_match_hint
            if hint is None:
                return None
            if i is not None and (int(hint[0]) != int(i)
                                  or int(hint[1]) != int(j)):
                return None
            self.kf_match_hint = None
            return hint

    def get_frame(self) -> Optional[Frame]:
        with self.lock:
            return self.current_frame

    def queue_global_optimization(self, idx: int):
        with self.lock:
            self.global_optimizer_tasks.append(idx)

    def pop_global_optimization(self) -> Optional[int]:
        with self.lock:
            if self.global_optimizer_tasks:
                return self.global_optimizer_tasks.pop(0)
            return None

    def queue_reloc(self):
        with self.lock:
            self.reloc_sem += 1

    def clear_reloc(self):
        """Drop ALL queued reloc counts — after a successful relocalization
        the remaining counts are stale attempts for the same lost-tracking
        episode; leaking them keeps idle() false forever and would fire a
        spurious relocalization on the NEXT tracking failure."""
        with self.lock:
            self.reloc_sem = 0

    def dequeue_reloc(self):
        with self.lock:
            if self.reloc_sem > 0:
                self.reloc_sem -= 1

    def get_mode(self) -> Mode:
        with self.lock:
            return self.mode

    def set_mode(self, mode: Mode):
        with self.lock:
            self.mode = mode

    def set_edges(self, ii, jj):
        with self.lock:
            self.edges_ii = list(ii)
            self.edges_jj = list(jj)
