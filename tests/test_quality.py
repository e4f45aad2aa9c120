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
