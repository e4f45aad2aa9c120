"""SLAM pipeline orchestration: frame staging, relocalization, backend loop.

Single-controller redesign of the reference's 3-process topology (reference:
main.py:28-163 — ``relocalization`` + ``run_backend`` — and frame staging in
frame.py:111-122): the backend runs as a host THREAD driving its own jitted
device computations (XLA async dispatch provides the frontend/backend
overlap the reference got from ``mp.Process``), and the deterministic
``single_thread`` eval mode simply calls the backend step inline.
"""

from __future__ import annotations

import threading
import time

import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.data.image_ops import resize_img
from mast3r_slam_tpu.ops import lie
from mast3r_slam_tpu.slam.frame import Frame, KeyframeBuffer, Mode, States


def create_frame(frame_id: int, img_np: np.ndarray, T_WC=None,
                 img_size: int = 512) -> Frame:
    """Host image → model-resolution device Frame (reference frame.py:111-122).

    ``dataset.img_downsample`` decimates the display image (uimg) and
    ``img_shape`` here; the WORKING pointmaps/descriptors are decimated by
    the same stride at the inference layer (``MASt3RInference``, matching
    reference mast3r_utils.py:43-52) — ``img_true_shape`` stays the model
    crop fed to the ViT.
    """
    from mast3r_slam_tpu.utils.config import config

    res = resize_img(img_np, img_size)
    h, w = (int(v) for v in res["true_shape"][0])
    img = jnp.asarray(res["img"][0])
    uimg = res["unnormalized_img"].astype(np.float32) / 255.0
    ds = int(config.get("dataset", {}).get("img_downsample", 1))
    img_shape = (h, w)
    if ds > 1:
        uimg = uimg[::ds, ::ds]
        img_shape = (h // ds, w // ds)
    return Frame(
        frame_id=frame_id,
        img=img,
        img_shape=img_shape,
        img_true_shape=(h, w),
        uimg=uimg,
        T_WC=T_WC if T_WC is not None else lie.identity(),
    )


def relocalization(frame: Frame, keyframes: KeyframeBuffer, factor_graph,
                   retrieval_database, cfg) -> bool:
    """Query retrieval → tentative keyframe append → strict factor check →
    adopt matched pose + global solve, else roll back (reference main.py:28-71)."""
    rcfg = cfg.get("reloc", {})
    with keyframes.lock:
        candidates = retrieval_database.update(
            frame, add_after_query=False,
            k=int(cfg.get("retrieval", {}).get("k", 3)),
            min_thresh=float(cfg.get("retrieval", {}).get("min_thresh", 5e-3)),
        )
        if not candidates:
            return False
        keyframes.append(frame)
        n_kf = len(keyframes)
        kf_idx = [c for c in candidates if c != n_kf - 1]
        frame_idx = [n_kf - 1] * len(kf_idx)
        if not kf_idx:
            keyframes.pop_last()
            return False
        # NOTE argument order: the NEW keyframe goes first (as ii) so the
        # consecutive-edge exemption (ii == jj - 1) can never fire for a
        # reloc edge — candidates are always <= n_kf - 2 (reference
        # main.py:47-52 does the same). Passing (kf_idx, frame_idx) would let
        # a candidate at n_kf - 2 bypass strict-reloc validation entirely.
        added = factor_graph.add_factors(
            frame_idx, kf_idx,
            float(rcfg.get("min_match_frac", 0.3)),
            is_reloc=bool(rcfg.get("strict", True)),
            allow_geo_init=False,  # candidate poses are what's in question
        )
        if not added:
            keyframes.pop_last()
            print("Relocalization failed")
            return False
        retrieval_database.update(
            frame, add_after_query=True,
            k=int(cfg.get("retrieval", {}).get("k", 3)),
            min_thresh=float(cfg.get("retrieval", {}).get("min_thresh", 5e-3)),
            kf_idx=n_kf - 1,
            skip_query=True,  # signature cached from the query call above;
            #                   the result here would be discarded anyway
        )
        print(f"Relocalized against keyframe(s) {kf_idx}")
        # Adopt the best match's pose as the starting point.
        best = keyframes[kf_idx[0]]
        frame.T_WC = best.T_WC
        keyframes.T_WC = keyframes.T_WC.at[n_kf - 1].set(best.T_WC.reshape(8))
    if cfg.get("use_calib", False):
        factor_graph.solve_GN_calib()
    else:
        factor_graph.solve_GN_rays()
    return True


class Backend:
    """Keyframe-graph backend: retrieval + factor growth + global BA.

    Runs as a thread (default) or inline via ``step()`` in single_thread mode.
    """

    def __init__(self, model, keyframes: KeyframeBuffer, states: States,
                 factor_graph, retrieval_database, cfg, tsdf_manager=None):
        self.model = model
        self.keyframes = keyframes
        self.states = states
        self.graph = factor_graph
        self.retrieval = retrieval_database
        self.cfg = cfg
        self.tsdf_manager = tsdf_manager
        self.stop_flag = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="slam-backend")
        self._started = False

    def start(self):
        if not self._started:
            self._thread.start()
            self._started = True
        return self

    def stop(self, timeout=30.0):
        self.stop_flag.set()
        if self._started:
            self._thread.join(timeout=timeout)

    def idle(self) -> bool:
        with self.states.lock:
            return (not self.states.global_optimizer_tasks
                    and self.states.reloc_sem == 0)

    def _loop(self):
        while not self.stop_flag.is_set():
            if not self.step():
                time.sleep(0.005)

    def step(self) -> bool:
        """One backend action; returns True if any work was done."""
        mode = self.states.get_mode()
        if mode in (Mode.INIT,):
            return False
        if mode == Mode.RELOC:
            frame = self.states.get_frame()
            if frame is None or self.states.reloc_sem == 0:
                return False
            ok = relocalization(frame, self.keyframes, self.graph,
                                self.retrieval, self.cfg)
            if ok:
                # clear BEFORE flipping the mode: once TRACKING is visible
                # the frontend may fail a new frame and queue a fresh reloc
                # request — clearing afterwards would wipe that new
                # episode's first request (stale counts belong to this
                # resolved episode only)
                self.states.clear_reloc()
                self.states.set_mode(Mode.TRACKING)
            else:
                self.states.dequeue_reloc()
            return True

        idx = self.states.pop_global_optimization()
        if idx is None:
            return False

        # Loop-closure candidates via retrieval (+ insert this keyframe).
        frame = self.keyframes[idx]
        retr = self.retrieval.update(
            frame, add_after_query=True,
            k=int(self.cfg.get("retrieval", {}).get("k", 3)),
            min_thresh=float(self.cfg.get("retrieval", {}).get("min_thresh",
                                                               5e-3)),
            kf_idx=idx,
        )
        kf_idx = set(int(r) for r in retr)
        if idx - 1 >= 0:
            kf_idx.add(idx - 1)  # consecutive edge
        kf_idx.discard(idx)
        kf_idx = sorted(kf_idx)
        if kf_idx:
            frame_idx = [idx] * len(kf_idx)
            if retr:
                print(f"Database retrieval {idx}: {sorted(kf_idx)}")
            self.graph.add_factors(
                kf_idx, frame_idx,
                float(self.cfg.get("local_opt", {}).get("min_match_frac", 0.1)),
                # consume the tracker hint only if it is for THIS keyframe's
                # consecutive edge (a lagging backend would otherwise burn
                # keyframe N+1's hint while processing keyframe N)
                init_hint=self.states.take_kf_match_hint(idx - 1, idx),
            )
        self.states.set_edges(list(self.graph.ii), list(self.graph.jj))
        if self.cfg.get("use_calib", False):
            self.graph.solve_GN_calib()
        else:
            self.graph.solve_GN_rays()
        if self.tsdf_manager is not None:
            self.tsdf_manager.on_after_backend_solve(self.graph)
        return True
