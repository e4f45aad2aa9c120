"""Tests for projective/ray geometry Jacobians and masks (finite differences)."""

import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import geometry, lie

RNG = np.random.default_rng(1)


def test_point_to_ray_dist_values():
    X = jnp.asarray([[3.0, 0.0, 4.0]])
    rd = geometry.point_to_ray_dist(X)
    np.testing.assert_allclose(np.asarray(rd), [[0.6, 0.0, 0.8, 5.0]], atol=1e-6)


def test_point_to_ray_dist_jacobian():
    X = jnp.asarray(RNG.normal(size=(10, 3)) + np.array([0, 0, 3.0]), dtype=jnp.float32)
    rd, J = geometry.point_to_ray_dist(X, jacobian=True)
    eps = 1e-3
    for k in range(3):
        dX = np.zeros(3, dtype=np.float32)
        dX[k] = eps
        fd = (
            geometry.point_to_ray_dist(X + jnp.asarray(dX))
            - geometry.point_to_ray_dist(X - jnp.asarray(dX))
        ) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[..., k]), np.asarray(fd), rtol=3e-2, atol=3e-3)


def test_project_backproject_roundtrip():
    K = jnp.asarray([[300.0, 0, 128], [0, 300.0, 96], [0, 0, 1]])
    H, W = 192, 256
    uv = jnp.asarray(RNG.uniform([10, 10], [W - 10, H - 10], size=(50, 2)), jnp.float32)
    z = jnp.asarray(RNG.uniform(0.5, 5.0, size=(50, 1)), jnp.float32)
    P = geometry.backproject(uv, z, K)
    pz, valid = geometry.project_calib(P, K, (H, W))
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(pz[:, :2]), np.asarray(uv), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(pz[:, 2:]), np.asarray(jnp.log(z)), atol=1e-5)


def test_project_calib_jacobian():
    K = jnp.asarray([[300.0, 0, 128], [0, 300.0, 96], [0, 0, 1]])
    P = jnp.asarray(RNG.normal(size=(20, 3)) * 0.15 + np.array([0, 0, 2.0]), jnp.float32)
    pz, J, valid = geometry.project_calib(P, K, (192, 256), jacobian=True)
    assert bool(jnp.all(valid))
    eps = 1e-3
    for k in range(3):
        dP = np.zeros(3, dtype=np.float32)
        dP[k] = eps
        pz_p, _ = geometry.project_calib(P + jnp.asarray(dP), K, (192, 256))
        pz_m, _ = geometry.project_calib(P - jnp.asarray(dP), K, (192, 256))
        fd = (pz_p - pz_m) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[..., k]), np.asarray(fd), rtol=2e-2, atol=2e-2)


def test_project_validity_masks():
    K = jnp.asarray([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    P = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [10.0, 0.0, 1.0]])
    pz, valid = geometry.project_calib(P, K, (100, 100))
    np.testing.assert_array_equal(np.asarray(valid[:, 0]), [True, False, False])
    # invalid logz forced to 0 (no NaNs)
    assert np.isfinite(np.asarray(pz)).all()


def test_constrain_points_to_ray():
    K = jnp.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    H, W = 96, 128
    X = jnp.asarray(RNG.normal(size=(H * W, 3)).astype(np.float32))
    X = X.at[:, 2].set(jnp.abs(X[:, 2]) + 1.0)  # strictly positive depth
    Xc = geometry.constrain_points_to_ray((H, W), X, K)
    # z preserved
    np.testing.assert_allclose(np.asarray(Xc[:, 2]), np.asarray(X[:, 2]), atol=1e-6)
    # projections hit their own pixel centers
    pz, _ = geometry.project_calib(Xc, K, (H, W), border=-1000)
    uv = geometry.get_pixel_coords((H, W))
    np.testing.assert_allclose(np.asarray(pz[:, :2]), np.asarray(uv), atol=1e-3)


def test_act_sim3_consistency():
    T = lie.exp(jnp.asarray(RNG.normal(size=7) * 0.3, jnp.float32))
    X = jnp.asarray(RNG.normal(size=(17, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(geometry.act_Sim3(T, X)), np.asarray(lie.act(T, X)), atol=1e-6
    )


def test_estimate_focal_and_project_to_index_roundtrip():
    """Pinhole scene: estimate_focal recovers f; project_to_index with the
    estimated focal + relative pose lands within a pixel of ground truth."""
    from mast3r_slam_tpu.ops import geometry, lie

    H, W, f = 24, 32, 40.0
    uv = np.asarray(geometry.get_pixel_coords((H, W)))
    rng = np.random.default_rng(0)
    z = 2.0 + rng.random((H * W, 1)).astype(np.float32)
    K = jnp.asarray([[f, 0.0, (W - 1) / 2.0],
                     [0.0, f, (H - 1) / 2.0],
                     [0.0, 0.0, 1.0]])
    X_i = geometry.backproject(jnp.asarray(uv), jnp.asarray(z), K)[None]

    f_est = geometry.estimate_focal(X_i, (H, W))
    np.testing.assert_allclose(np.asarray(f_est), f, rtol=1e-3)

    T_i = lie.identity()[None]
    T_j = lie.exp(jnp.asarray([0.03, -0.02, 0.01, 0.01, -0.01, 0.02, 0.0]))[None]
    idx = np.asarray(geometry.project_to_index(X_i, T_i, T_j, f_est, (H, W)))[0]

    # ground truth: project through T_j^{-1} T_i with the true K
    P = np.asarray(lie.act(lie.compose(lie.inv(T_j), T_i)[:, None, :], X_i))[0]
    u = f * P[:, 0] / P[:, 2] + (W - 1) / 2.0
    v = f * P[:, 1] / P[:, 2] + (H - 1) / 2.0
    inb = (u > 0) & (u < W - 1) & (v > 0) & (v < H - 1)
    gt = np.round(np.clip(v, 0, H - 1)) * W + np.round(np.clip(u, 0, W - 1))
    du = np.abs(idx % W - gt % W)[inb]
    dv = np.abs(idx // W - gt // W)[inb]
    assert du.max() <= 1 and dv.max() <= 1
