"""Quality core + async service tests (synthetic residual/confidence grids)."""

import time

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.services.quality_async import AsynchronousQualityService
from mast3r_slam_tpu.services.quality_core import (
    compute_quality,
    masked_median,
    reduce_grid,
)

RNG = np.random.default_rng(11)


def test_masked_median_matches_torch_nanmedian():
    x = jnp.asarray(RNG.random((6, 32)).astype(np.float32))
    mask = jnp.asarray(RNG.random((6, 32)) > 0.4)
    got = np.asarray(masked_median(x, mask))
    for i in range(6):
        vals = np.sort(np.asarray(x[i])[np.asarray(mask[i])])
        # torch.nanmedian convention (reference quality_core.py:21-26):
        # the LOWER middle element for even counts, not numpy's average
        want = vals[(vals.size - 1) // 2] if vals.size else 0.0
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_reduce_grid_shapes():
    x = jnp.asarray(RNG.random((64, 96)).astype(np.float32))
    g = reduce_grid(x, 16)
    assert g.shape == (4, 6)
    g2 = reduce_grid(x, 16, valid=jnp.ones((64, 96), bool), method="mean")
    np.testing.assert_allclose(np.asarray(g2),
                               np.asarray(x).reshape(4, 16, 6, 16)
                               .transpose(0, 2, 1, 3).reshape(4, 6, -1).mean(-1),
                               atol=1e-5)


def test_compute_quality_flags_bad_region():
    """A patch with high residual + low confidence gets a nonzero priority."""
    H, W, ps = 64, 96, 16
    n = H * W
    r_pix = np.full(n, 0.01, np.float32)
    Ck = np.full(n, 2.0, np.float32)
    Qk = np.full(n, 3.0, np.float32)
    bad = np.zeros((H, W), bool)
    bad[16:32, 32:48] = True  # patch (1, 2)
    r_pix[bad.ravel()] = 0.5
    Ck[bad.ravel()] = 0.05
    Qk[bad.ravel()] = 0.1

    res = compute_quality(
        jnp.ones(n, bool), jnp.asarray(r_pix), jnp.asarray(Ck),
        jnp.asarray(Qk), jnp.asarray(0.2), jnp.asarray(0.1),
        jnp.zeros((H // ps, W // ps)),
        H, W, ps, 0.8, 0.15, np.deg2rad(10.0), 1.0, 1.5, 1.0, 1.0, 0.02,
    )
    pri = np.asarray(res["priority"])
    assert pri[1, 2] == pri.max() > 0.5
    assert np.asarray(res["class_id"])[1, 2] in (1, 2, 3)


def test_async_service_end_to_end():
    svc = AsynchronousQualityService({"quality": {"batch_size": 2,
                                                  "max_wait_ms": 5}})
    svc.start()
    H, W = 32, 48
    n = H * W
    job = {
        "kf_id": 7, "frame_id": 3, "H": H, "W": W,
        "valid_kf": np.ones(n, bool),
        "r_pix": RNG.random(n).astype(np.float32),
        "Ck": np.ones(n, np.float32),
        "Qk": np.ones(n, np.float32),
        "t_norm": 0.1, "theta": 0.05,
    }
    hits = []
    svc.register_callback(lambda res: hits.append(res["kf_id"]))
    assert svc.submit(dict(job))
    deadline = time.time() + 30
    while svc.get_by_kf_id(7) is None and time.time() < deadline:
        time.sleep(0.05)
    res = svc.get_by_kf_id(7)
    assert res is not None
    assert res["priority"].shape == (H // 16, W // 16)
    assert svc.get_by_frame_id(3) is not None
    assert hits == [7]

    # EWMA state persists: second job for same kf grows coverage
    ew1 = res["cov_ewma"].copy()
    svc.submit(dict(job))
    deadline = time.time() + 30
    while svc.processed_jobs < 2 and time.time() < deadline:
        time.sleep(0.05)
    ew2 = svc.get_by_kf_id(7)["cov_ewma"]
    assert (ew2 >= ew1 - 1e-6).all()
    stats = svc.global_stats()
    assert stats["n"] == 2
    svc.shutdown()


def test_compute_quality_batch_matches_sequential():
    """One batched program == the sequential per-job loop, bit-exact,
    including the EWMA chain across same-keyframe jobs (kf ids 5,5,9,5)."""
    import jax

    from mast3r_slam_tpu.services.quality_core import compute_quality_batch

    H, W, ps = 64, 96, 16
    gh, gw = H // ps, W // ps
    n = H * W
    B = 4
    kf_ids = [5, 5, 9, 5]
    args = dict(alpha=0.8, b0=0.15, theta0=float(np.deg2rad(10.0)),
                C_thr=1.0, Q_thr=1.5, thr_zr=1.0, thr_zu=1.0, thr_dc=0.02)

    jobs = []
    for k in range(B):
        jobs.append(dict(
            valid_kf=RNG.random(n) > 0.2,
            r_pix=RNG.random(n).astype(np.float32),
            Ck=RNG.uniform(0.1, 2.0, n).astype(np.float32),
            Qk=RNG.uniform(0.1, 3.0, n).astype(np.float32),
            t_norm=float(RNG.random()), theta=float(RNG.random() * 0.2)))

    # sequential reference with a per-kf EWMA store
    state = {}
    seq = []
    for k, job in enumerate(jobs):
        prev = state.get(kf_ids[k], np.zeros((gh, gw), np.float32))
        res = compute_quality(
            jnp.asarray(job["valid_kf"]), jnp.asarray(job["r_pix"]),
            jnp.asarray(job["Ck"]), jnp.asarray(job["Qk"]),
            jnp.asarray(job["t_norm"]), jnp.asarray(job["theta"]),
            jnp.asarray(prev), H, W, ps, args["alpha"], args["b0"],
            args["theta0"], args["C_thr"], args["Q_thr"],
            args["thr_zr"], args["thr_zu"], args["thr_dc"])
        state[kf_ids[k]] = np.asarray(res["cov_ewma"])
        seq.append({k2: np.asarray(v) for k2, v in res.items()})

    # batched: chain[k] set when kf matches the previous job in the batch
    chain = np.array([False] + [kf_ids[k] == kf_ids[k - 1]
                                for k in range(1, B)])
    prev_init = np.zeros((B, gh, gw), np.float32)
    state2 = {}
    for k in range(B):
        if not chain[k]:
            prev_init[k] = state2.get(kf_ids[k], 0.0)
        # mirror the service's store update order for later jobs
        state2[kf_ids[k]] = seq[k]["cov_ewma"]

    got = compute_quality_batch(
        jnp.asarray(np.stack([j["valid_kf"] for j in jobs])),
        jnp.asarray(np.stack([j["r_pix"] for j in jobs])),
        jnp.asarray(np.stack([j["Ck"] for j in jobs])),
        jnp.asarray(np.stack([j["Qk"] for j in jobs])),
        jnp.asarray(np.asarray([j["t_norm"] for j in jobs], np.float32)),
        jnp.asarray(np.asarray([j["theta"] for j in jobs], np.float32)),
        jnp.asarray(prev_init), jnp.asarray(chain),
        H, W, ps, args["alpha"], args["b0"], args["theta0"],
        args["C_thr"], args["Q_thr"],
        args["thr_zr"], args["thr_zu"], args["thr_dc"])

    for key in ("delta_cov", "r", "u", "class_id", "priority", "cov_ewma"):
        gk = np.asarray(got[key])
        for k in range(B):
            np.testing.assert_allclose(gk[k], seq[k][key], atol=1e-6,
                                       err_msg=f"{key}[{k}]")


def test_async_service_batches_into_one_program(monkeypatch):
    """4 queued same-kf jobs drain through _process_group (one device call)
    and the EWMA chain matches sequential submission."""
    from mast3r_slam_tpu.services import quality_async as QA

    calls = {"group": 0, "single": 0}
    orig_group = QA.AsynchronousQualityService._process_group
    orig_single = QA.AsynchronousQualityService._process

    def spy_group(self, jobs):
        calls["group"] += 1
        return orig_group(self, jobs)

    def spy_single(self, job):
        calls["single"] += 1
        return orig_single(self, job)

    monkeypatch.setattr(QA.AsynchronousQualityService, "_process_group",
                        spy_group)
    monkeypatch.setattr(QA.AsynchronousQualityService, "_process", spy_single)

    H, W = 32, 48
    n = H * W

    def make_job(fid):
        return {
            "kf_id": 3, "frame_id": fid, "H": H, "W": W,
            "valid_kf": RNG.random(n) > 0.1,
            "r_pix": RNG.random(n).astype(np.float32),
            "Ck": np.ones(n, np.float32),
            "Qk": np.ones(n, np.float32),
            "t_norm": 0.1 + 0.01 * fid, "theta": 0.05,
        }

    jobs = [make_job(f) for f in range(4)]

    # sequential reference service
    svc_seq = AsynchronousQualityService({"quality": {"batch_size": 1,
                                                      "max_wait_ms": 1}})
    svc_seq.start()
    for j in jobs:
        svc_seq.submit(dict(j))
        deadline = time.time() + 30
        while svc_seq.processed_jobs < j["frame_id"] + 1 and \
                time.time() < deadline:
            time.sleep(0.02)
    ref = svc_seq.get_by_kf_id(3)
    svc_seq.shutdown()

    # batched service: enqueue all 4 BEFORE start so one batch forms
    svc = AsynchronousQualityService({"quality": {"batch_size": 4,
                                                  "max_wait_ms": 200}})
    for j in jobs:
        assert svc.submit(dict(j))
    calls["group"] = calls["single"] = 0
    svc.start()
    deadline = time.time() + 60
    while svc.processed_jobs < 4 and time.time() < deadline:
        time.sleep(0.05)
    got = svc.get_by_kf_id(3)
    svc.shutdown()

    assert calls["group"] == 1 and calls["single"] == 0, calls
    for key in ("cov_ewma", "priority", "class_id", "r"):
        np.testing.assert_allclose(got[key], ref[key], atol=1e-6,
                                   err_msg=key)


def test_process_group_interleaved_kf_matches_sequential():
    """An interleaved batch [A, B, A] through _process_group gives the same
    results and persisted EWMA state as the sequential per-job path (the
    scan chain only links adjacent same-kf jobs; the service sorts the
    batch by kf_id so in-batch state flows to non-adjacent repeats)."""
    H, W = 32, 48
    n = H * W

    def mk(kf_id, frame_id):
        return {
            "kf_id": kf_id, "frame_id": frame_id, "H": H, "W": W,
            "valid_kf": RNG.random(n) > 0.2,
            "r_pix": RNG.random(n).astype(np.float32),
            "Ck": RNG.uniform(0.1, 2.0, n).astype(np.float32),
            "Qk": RNG.uniform(0.1, 3.0, n).astype(np.float32),
            "t_norm": float(RNG.random()), "theta": float(RNG.random() * 0.2),
        }

    jobs = [mk(3, 0), mk(8, 1), mk(3, 2)]  # reloc-style interleave

    cfg = {"quality": {"batch_size": 4, "max_wait_ms": 5}}
    svc_seq = AsynchronousQualityService(cfg)   # never started: direct calls
    svc_grp = AsynchronousQualityService(cfg)
    for j in jobs:
        svc_seq._process(dict(j))
    svc_grp._process_group([dict(j) for j in jobs])

    for kf_id, frame_id in ((3, 0), (8, 1), (3, 2)):
        a = svc_seq.get_by_frame_id(frame_id)
        b = svc_grp.get_by_frame_id(frame_id)
        assert a is not None and b is not None
        for key in ("delta_cov", "r", "u", "class_id", "priority",
                    "cov_ewma"):
            np.testing.assert_allclose(b[key], a[key], atol=1e-6,
                                       err_msg=f"{key} frame {frame_id}")
    # persisted per-kf EWMA state identical (the later A job must have seen
    # the earlier A job's in-batch update)
    for kf_id in (3, 8):
        np.testing.assert_allclose(svc_grp._ewma_state[kf_id],
                                   svc_seq._ewma_state[kf_id], atol=1e-6)
