"""Asynchronous pointmap-quality service (worker thread + bounded queues).

Capability parity with the reference service (reference:
mast3r_slam/quality_async.py:48-303): drop-on-full bounded job/result queues,
deadline-based micro-batching, per-keyframe EWMA coverage state re-injection,
dual-index result cache (by kf_id and frame_id), callback registry, global
sliding-window median/MAD statistics, and sentinel shutdown.

The compute itself is the jitted :mod:`quality_core` kernel — the worker
thread only shuttles numpy payloads and device dispatches, so it overlaps
with tracking via XLA async dispatch rather than competing with it.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.services import quality_core

_QUIT = "__quit__"


class AsynchronousQualityService:
    def __init__(self, cfg: dict, device=None):
        # ``device``: pin the jitted quality kernel to a dedicated service
        # chip (parallel/topology.py) so it never contends with tracking;
        # None = default device (single-chip sessions).
        self.device = device
        q = cfg.get("quality", {})
        self.ps = int(q.get("patch_size", 16))
        self.batch_size = int(q.get("batch_size", 4))
        self.max_wait_ms = float(q.get("max_wait_ms", 10))
        metrics = q.get("metrics", {}).get("coverage", {})
        self.alpha = float(metrics.get("alpha_ema", 0.8))
        self.b0 = float(metrics.get("b0", 0.15))
        self.theta0 = float(np.deg2rad(metrics.get("theta0_deg", 10.0)))
        thr = q.get("thresholds", {})
        self.thr_zr = float(thr.get("z_r", 1.0))
        self.thr_zu = float(thr.get("z_u", 1.0))
        self.thr_dc = float(thr.get("d_cov", 0.02))
        # C_thr is used verbatim (reference quality_async.py:89) — with the
        # default C_conf=0.0 the core's C/(C_thr+1e-8) normalization saturates
        # Cn to 1, matching reference quality_core.py:45 semantics.
        self.C_thr = float(cfg.get("tracking", {}).get("C_conf", 0.0))
        self.Q_thr = float(cfg.get("tracking", {}).get("Q_conf", 1.5))

        self.job_q: queue.Queue = queue.Queue(maxsize=64)
        self.res_q: queue.Queue = queue.Queue(maxsize=64)
        self._results_by_kf: dict[int, dict] = {}
        self._results_by_frame: dict[int, dict] = {}
        self._ewma_state: dict[int, np.ndarray] = {}
        self._callbacks: list = []
        self._stats_window: deque = deque(maxlen=256)
        self._lock = threading.RLock()
        self.dropped_jobs = 0
        self.processed_jobs = 0
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="quality-worker")
        self._started = False

    # -- public API --------------------------------------------------------

    def start(self):
        if not self._started:
            self._worker.start()
            self._started = True
        return self

    def is_alive(self):
        """Worker-thread health gate (mirrors TSDFRefiner.is_alive; the TSDF
        scheduler only defers on a pending quality result while the worker
        can still deliver one)."""
        return self._started and self._worker.is_alive()

    def submit(self, job: dict) -> bool:
        """Enqueue a quality job; drops (returns False) when the queue is full."""
        if not self._started:
            self.start()
        try:
            self.job_q.put_nowait(job)
            return True
        except queue.Full:
            self.dropped_jobs += 1
            return False

    def poll(self):
        """Drain completed results into the caches; returns newly-ready results."""
        out = []
        while True:
            try:
                res = self.res_q.get_nowait()
            except queue.Empty:
                break
            out.append(res)
        return out

    def get(self, kf_id: int):
        self.poll()
        with self._lock:
            return self._results_by_kf.get(kf_id)

    def get_by_kf_id(self, kf_id: int):
        return self.get(kf_id)

    def get_by_frame_id(self, frame_id: int):
        self.poll()
        with self._lock:
            return self._results_by_frame.get(frame_id)

    def register_callback(self, fn):
        with self._lock:
            self._callbacks.append(fn)

    def global_stats(self):
        """Sliding-window median/MAD of patch residual medians."""
        with self._lock:
            if not self._stats_window:
                return {"median": 0.0, "mad": 0.0, "n": 0}
            vals = np.asarray(self._stats_window)
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        return {"median": med, "mad": mad, "n": len(vals)}

    def shutdown(self):
        if self._started:
            self.job_q.put(_QUIT)
            self._worker.join(timeout=10.0)
            self._started = False

    # -- worker ------------------------------------------------------------

    def _collect_batch(self):
        """Block for one job, then batch up to batch_size within max_wait_ms."""
        try:
            first = self.job_q.get(timeout=0.25)
        except queue.Empty:
            return []
        if first is _QUIT:
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_wait_ms / 1000.0
        while len(batch) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self.job_q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is _QUIT:
                self.job_q.put(_QUIT)  # re-post for outer loop
                break
            batch.append(nxt)
        return batch

    def _run(self):
        while True:
            batch = self._collect_batch()
            if batch is None:
                break
            # One device program per same-shape run of jobs (consecutive
            # frames share (H, W), so a full batch is the common case).
            # Per-job fallback on any batch failure: the service must never
            # die silently.
            i = 0
            while i < len(batch):
                j = i + 1
                hw = (int(batch[i]["H"]), int(batch[i]["W"]))
                while (j < len(batch)
                       and (int(batch[j]["H"]), int(batch[j]["W"])) == hw):
                    j += 1
                group = batch[i:j]
                i = j
                try:
                    if len(group) == 1:
                        self._process(group[0])
                    else:
                        self._process_group(group)
                except Exception as e:
                    import traceback

                    print(f"[quality] batch of {len(group)} failed: {e}")
                    traceback.print_exc()
                    for job in group:
                        try:
                            self._process(job)
                        except Exception as e2:
                            print(f"[quality] job failed: {e2}")
                            traceback.print_exc()

    def _process_group(self, jobs):
        """All jobs of one same-shape group in ONE device program
        (:func:`quality_core.compute_quality_batch`) — bit-exact with the
        sequential per-job path; the EWMA chain across same-keyframe jobs
        is carried inside the program by its ``lax.scan``."""
        H, W = int(jobs[0]["H"]), int(jobs[0]["W"])
        gh, gw = H // self.ps, W // self.ps
        B = len(jobs)

        # The scan chain only carries state between ADJACENT same-keyframe
        # jobs; a stable sort by kf_id makes every same-kf run adjacent (in
        # arrival order within the run, so the chain follows frame order and
        # the last published result per kf is the newest — exactly the
        # sequential path's semantics even for interleaved batches like
        # [A, B, A] after a relocalization).
        jobs = sorted(jobs, key=lambda j: int(j["kf_id"]))

        chain = np.zeros(B, bool)
        prev = np.zeros((B, gh, gw), np.float32)
        with self._lock:
            for k, job in enumerate(jobs):
                kf_id = int(job["kf_id"])
                if k > 0 and kf_id == int(jobs[k - 1]["kf_id"]):
                    chain[k] = True  # scan carries job k-1's cov_ewma
                else:
                    p = self._ewma_state.get(kf_id)
                    if p is not None:
                        prev[k] = p

        def dev(x, dtype=None):
            x = jnp.asarray(x, dtype)
            return x if self.device is None else jax.device_put(x,
                                                                self.device)

        res = quality_core.compute_quality_batch(
            dev(np.stack([j["valid_kf"].reshape(-1) for j in jobs])),
            dev(np.stack([np.asarray(j["r_pix"]).reshape(-1) for j in jobs]),
                jnp.float32),
            dev(np.stack([np.asarray(j["Ck"]).reshape(-1) for j in jobs]),
                jnp.float32),
            dev(np.stack([np.asarray(j["Qk"]).reshape(-1) for j in jobs]),
                jnp.float32),
            dev(np.asarray([j["t_norm"] for j in jobs]), jnp.float32),
            dev(np.asarray([j["theta"] for j in jobs]), jnp.float32),
            dev(prev), dev(chain),
            H, W, self.ps, self.alpha, self.b0, self.theta0,
            self.C_thr, self.Q_thr, self.thr_zr, self.thr_zu, self.thr_dc,
        )
        res_np = {k: np.asarray(v) for k, v in res.items()}
        for k, job in enumerate(jobs):
            self._publish(job, {key: v[k] for key, v in res_np.items()})

    def _process(self, job):
        H, W = int(job["H"]), int(job["W"])
        gh, gw = H // self.ps, W // self.ps
        kf_id = int(job["kf_id"])
        prev = self._ewma_state.get(kf_id)
        if prev is None:
            prev = np.zeros((gh, gw), np.float32)

        def dev(x, dtype=None):
            x = jnp.asarray(x, dtype)
            return x if self.device is None else jax.device_put(x,
                                                                self.device)

        res = quality_core.compute_quality(
            dev(job["valid_kf"].reshape(-1)),
            dev(job["r_pix"], jnp.float32),
            dev(job["Ck"], jnp.float32),
            dev(job["Qk"], jnp.float32),
            dev(job["t_norm"], jnp.float32),
            dev(job["theta"], jnp.float32),
            dev(prev),
            H, W, self.ps, self.alpha, self.b0, self.theta0,
            self.C_thr, self.Q_thr, self.thr_zr, self.thr_zu, self.thr_dc,
        )
        self._publish(job, {k: np.asarray(v) for k, v in res.items()})

    def _publish(self, job, res_np):
        """Store one job's numpy results + EWMA state and notify consumers."""
        kf_id = int(job["kf_id"])
        packed = {
            "kf_id": kf_id,
            "frame_id": int(job.get("frame_id", -1)),
            "delta_cov": res_np["delta_cov"],
            "r": res_np["r"],
            "u": res_np["u"],
            "class_id": res_np["class_id"],
            "priority": res_np["priority"],
            "cov_ewma": res_np["cov_ewma"],
        }
        with self._lock:
            self._ewma_state[kf_id] = packed["cov_ewma"]
            self._results_by_kf[kf_id] = packed
            self._results_by_frame[packed["frame_id"]] = packed
            self._stats_window.append(float(np.median(packed["r"])))
            callbacks = list(self._callbacks)
        self.processed_jobs += 1
        try:
            self.res_q.put_nowait(packed)
        except queue.Full:
            pass  # result still reachable via the caches
        for fn in callbacks:
            try:
                fn(packed)
            except Exception as e:
                print(f"[quality] callback failed: {e}")
