"""Tracker GN solvers on synthetic two-view problems with known ground truth."""

import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import geometry, lie
from mast3r_slam_tpu.slam.tracker import opt_pose_calib_sim3, opt_pose_ray_dist_sim3

RNG = np.random.default_rng(4)


def make_problem(n=500, noise=0.0):
    Xk = RNG.normal(size=(n, 3)).astype(np.float32) * 0.5
    Xk[:, 2] = np.abs(Xk[:, 2]) + 2.0
    xi = np.asarray([0.1, -0.05, 0.08, 0.04, -0.06, 0.05, 0.03], np.float32)
    T_gt = lie.exp(jnp.asarray(xi))  # T_CkCf ground truth
    Xf = lie.act(lie.inv(T_gt)[None], jnp.asarray(Xk))
    if noise:
        Xf = Xf + noise * RNG.normal(size=Xf.shape).astype(np.float32)
    return jnp.asarray(Xk), Xf, T_gt


def test_ray_dist_solver_recovers_pose():
    Xk, Xf, T_gt = make_problem()
    n = Xk.shape[0]
    Q = jnp.full((n, 1), 4.0)
    valid = jnp.ones((n, 1))
    T_WCk = lie.identity()
    T_WCf = lie.identity()

    T_WCf_new, T_CkCf, ok = opt_pose_ray_dist_sim3(
        Xf, Xk, T_WCf, T_WCk, Q, valid,
        0.003, 10.0, 1.345, 50, 1e-9, 1e-9,
    )
    assert bool(ok)
    err = lie.log(lie.compose(lie.inv(T_CkCf), T_gt))
    assert float(jnp.linalg.norm(err)) < 1e-3
    # T_WCf = T_WCk * T_CkCf with T_WCk = I
    np.testing.assert_allclose(np.asarray(T_WCf_new), np.asarray(T_CkCf), atol=1e-6)


def test_ray_dist_solver_robust_to_outliers():
    Xk, Xf, T_gt = make_problem(n=800)
    n = Xk.shape[0]
    # corrupt 10% of points badly
    bad = RNG.choice(n, size=n // 10, replace=False)
    Xf_np = np.asarray(Xf).copy()
    Xf_np[bad] += RNG.normal(size=(len(bad), 3)) * 2.0
    Q = jnp.full((n, 1), 4.0)
    valid = jnp.ones((n, 1))

    # sigma_dist must be small enough that whitened outlier residuals exceed
    # the Huber threshold — with the production 1e+1 the dist term is nearly
    # uninformative and scale (observable ONLY through distances; unit rays
    # are scale-invariant) would soak up the outlier bias unrobustified.
    _, T_CkCf, ok = opt_pose_ray_dist_sim3(
        jnp.asarray(Xf_np), Xk, lie.identity(), lie.identity(), Q, valid,
        0.003, 0.1, 1.345, 100, 1e-10, 1e-10,
    )
    assert bool(ok)
    err = lie.log(lie.compose(lie.inv(T_CkCf), T_gt))
    assert float(jnp.linalg.norm(err)) < 5e-2


def test_calib_solver_recovers_pose():
    H, W = 96, 128
    K = jnp.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    # Points on the pixel grid of the keyframe
    uv = geometry.get_pixel_coords((H, W))
    z = jnp.asarray(2.0 + 0.5 * RNG.random(size=(H * W, 1)).astype(np.float32))
    Xk = geometry.backproject(uv, z, K)
    xi = np.asarray([0.05, -0.02, 0.03, 0.02, -0.03, 0.02, 0.01], np.float32)
    T_gt = lie.exp(jnp.asarray(xi))
    Xf = lie.act(lie.inv(T_gt)[None], Xk)

    meas_k = jnp.concatenate([uv, jnp.log(Xk[:, 2:3])], axis=-1)
    valid_meas = Xk[:, 2:3] > 1e-6
    n = Xk.shape[0]
    Q = jnp.full((n, 1), 4.0)
    valid = jnp.ones((n, 1))

    _, T_CkCf, ok = opt_pose_calib_sim3(
        Xf, Xk, lie.identity(), lie.identity(), Q, valid,
        meas_k, valid_meas, K, (H, W),
        1.0, 10.0, 1.345, 100, 1e-10, 1e-10, -10, 1e-6,
    )
    assert bool(ok)
    err = lie.log(lie.compose(lie.inv(T_CkCf), T_gt))
    assert float(jnp.linalg.norm(err)) < 1e-3


def test_singular_problem_reports_failure():
    """A rank-deficient system (all identical points) must flag ok=False,
    not silently return garbage — mirrors reference Cholesky-except → RELOC."""
    n = 100
    Xk = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]]), (n, 1))
    Xf = Xk
    Q = jnp.full((n, 1), 4.0)
    valid = jnp.ones((n, 1))
    _, _, ok = opt_pose_ray_dist_sim3(
        Xf, Xk, lie.identity(), lie.identity(), Q, valid,
        0.003, 10.0, 1.345, 10, 1e-9, 1e-9,
    )
    assert not bool(ok)


def test_frame_best_score_fusion_policy():
    """best_score keeps the highest-scoring update (reference frame.py:62-68),
    for both median and mean scoring."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.slam.frame import Frame

    for score in ("median", "mean"):
        fr = Frame(frame_id=0, img=None, img_shape=(2, 3),
                   img_true_shape=(2, 3), uimg=None)
        X1 = jnp.ones((6, 3)); C1 = jnp.full((6, 1), 2.0)
        X2 = jnp.full((6, 3), 5.0); C2 = jnp.full((6, 1), 1.0)
        X3 = jnp.full((6, 3), 9.0); C3 = jnp.full((6, 1), 3.0)
        fr.update_pointmap(X1, C1, "best_score", score)
        fr.update_pointmap(X2, C2, "best_score", score)   # lower score: keep
        assert float(fr.X_canon[0, 0]) == 1.0
        fr.update_pointmap(X3, C3, "best_score", score)   # higher: replace
        assert float(fr.X_canon[0, 0]) == 9.0
        assert float(fr.C[0, 0]) == 3.0


def test_kf_selection_stats_sort_equals_scatter():
    """The sort-based distinct-target count equals the scatter-max
    formulation it replaced (scatters with colliding indices serialize on
    TPU)."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.slam.tracker import kf_selection_stats

    rng = np.random.default_rng(7)
    n = 500
    idx0 = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    vmatch = jnp.asarray(rng.random((n, 1)) < 0.7)
    valid_kf = jnp.asarray(rng.random((n, 1)) < 0.5)

    mf, uf = kf_selection_stats(vmatch, idx0, valid_kf, n)
    hit = jnp.zeros((n,), jnp.float32).at[
        jnp.where(vmatch[:, 0], idx0, 0)
    ].max(jnp.where(vmatch[:, 0], 1.0, 0.0))
    np.testing.assert_allclose(float(uf), float(jnp.sum(hit) / n), atol=1e-6)
    np.testing.assert_allclose(
        float(mf), float(jnp.mean(valid_kf.astype(jnp.float32))), atol=1e-6)
