"""Unit tests for the Sim(3)/SE(3) library: analytic identities + finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.ops import lie

RNG = np.random.default_rng(0)


def random_sim3(n=None, max_angle=2.5, max_t=2.0, max_logs=0.5):
    shape = () if n is None else (n,)
    axis = RNG.normal(size=shape + (3,))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = RNG.uniform(-max_angle, max_angle, size=shape + (1,))
    phi = axis * angle
    tau = RNG.uniform(-max_t, max_t, size=shape + (3,))
    sigma = RNG.uniform(-max_logs, max_logs, size=shape + (1,))
    xi = np.concatenate([tau, phi, sigma], axis=-1)
    return lie.exp(jnp.asarray(xi, dtype=jnp.float32))


def test_identity_act():
    T = lie.identity()
    X = jnp.asarray(RNG.normal(size=(10, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(lie.act(T, X), X, atol=1e-6)


def test_exp_log_roundtrip():
    # log is multivalued for |phi| > pi, so test the well-defined direction:
    # exp(log(T)) == T for arbitrary T, and log(exp(xi)) == xi for |phi| < pi.
    T = random_sim3(32)
    T2 = lie.exp(lie.log(T))
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), rtol=2e-3, atol=1e-3)

    xi = jnp.asarray(RNG.normal(size=(32, 7)) * 0.4, dtype=jnp.float32)
    phi_n = np.linalg.norm(np.asarray(xi[:, 3:6]), axis=-1)
    assert (phi_n < np.pi).all()  # guard the test's own assumption
    xi2 = lie.log(lie.exp(xi))
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), rtol=1e-3, atol=1e-4)


def test_exp_small_angle():
    xi = jnp.asarray(RNG.normal(size=(8, 7)) * 1e-6, dtype=jnp.float32)
    T = lie.exp(xi)
    # Near identity: t ~ tau, q ~ [phi/2, 1], s ~ 1 + sigma
    np.testing.assert_allclose(np.asarray(T[:, :3]), np.asarray(xi[:, :3]), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(T[:, 3:6]), np.asarray(xi[:, 3:6]) / 2.0, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(T[:, 7]), 1.0 + np.asarray(xi[:, 6]), atol=1e-5)


def test_compose_inverse():
    T = random_sim3(16)
    TT_inv = lie.compose(T, lie.inv(T))
    np.testing.assert_allclose(
        np.asarray(TT_inv), np.asarray(lie.identity((16,))), atol=1e-5
    )


def test_act_matches_matrix():
    T = random_sim3(4)
    X = jnp.asarray(RNG.normal(size=(4, 3)), dtype=jnp.float32)
    Y = lie.act(T, X)
    M = lie.matrix(T)
    Xh = jnp.concatenate([X, jnp.ones((4, 1))], axis=-1)
    Y2 = jnp.einsum("nij,nj->ni", M, Xh)[:, :3]
    np.testing.assert_allclose(np.asarray(Y), np.asarray(Y2), rtol=1e-5, atol=1e-5)


def test_compose_action_associativity():
    Ta, Tb = random_sim3(8), random_sim3(8)
    X = jnp.asarray(RNG.normal(size=(8, 3)), dtype=jnp.float32)
    lhs = lie.act(lie.compose(Ta, Tb), X)
    rhs = lie.act(Ta, lie.act(Tb, X))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-5, atol=1e-5)


def test_adjoint_identity():
    """T exp(xi) T^-1 == exp(Adj(T) xi)."""
    T = random_sim3(6)
    xi = jnp.asarray(RNG.normal(size=(6, 7)) * 0.3, dtype=jnp.float32)
    lhs = lie.compose(lie.compose(T, lie.exp(xi)), lie.inv(T))
    rhs = lie.exp(jnp.einsum("nij,nj->ni", lie.adjoint(T), xi))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=2e-4, atol=2e-4)


def test_adjoint_inv():
    T = random_sim3(5)
    AdjT_inv = jnp.linalg.inv(lie.adjoint(T))
    Adj_Tinv = lie.adjoint(lie.inv(T))
    np.testing.assert_allclose(
        np.asarray(AdjT_inv), np.asarray(Adj_Tinv), rtol=1e-3, atol=1e-4
    )


def test_retr_left_multiplicative():
    T = random_sim3(3)
    xi = jnp.asarray(RNG.normal(size=(3, 7)) * 0.1, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(lie.retr(T, xi)),
        np.asarray(lie.compose(lie.exp(xi), T)),
        atol=1e-6,
    )


def test_quat_matrix_roundtrip():
    T = random_sim3(64)
    q = lie.quaternion(T)
    q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
    # quaternions are sign-ambiguous
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-5)


def test_act_jacobian_finite_diff():
    from mast3r_slam_tpu.ops.geometry import act_Sim3

    T = random_sim3()
    X = jnp.asarray(RNG.normal(size=(5, 3)), dtype=jnp.float32)
    _, J = act_Sim3(T, X, jacobian=True)

    eps = 1e-3
    for k in range(7):
        dxi = np.zeros(7, dtype=np.float32)
        dxi[k] = eps
        Tp = lie.retr(T, jnp.asarray(dxi))
        Tm = lie.retr(T, jnp.asarray(-dxi))
        fd = (lie.act(Tp, X) - lie.act(Tm, X)) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(J[..., k]), np.asarray(fd), rtol=2e-2, atol=2e-3
        )


def test_se3_roundtrip():
    T = random_sim3(4)
    Tse3 = lie.sim3_to_se3(T)
    X = jnp.asarray(RNG.normal(size=(4, 3)), dtype=jnp.float32)
    # SE3 action should equal Sim3 action with scale 1
    T_noscale = T.at[..., 7].set(1.0)
    np.testing.assert_allclose(
        np.asarray(lie.se3_act(Tse3, X)),
        np.asarray(lie.act(T_noscale, X)),
        rtol=1e-5,
        atol=1e-5,
    )
    comp = lie.se3_compose(Tse3, lie.se3_inv(Tse3))
    np.testing.assert_allclose(
        np.asarray(comp), np.asarray(lie.se3_identity((4,))), atol=1e-5
    )


def test_W_coeffs_f32_stable():
    """C, A, B must stay accurate in f32 across the small-value zone where the
    naive closed forms catastrophically cancel (the bug class that produced
    NaNs/garbage with f64-tuned 1e-8 guards)."""
    thetas = np.array([0.0, 1e-8, 1e-6, 1e-4, 1e-3, 1e-2, 0.029, 0.031, 0.1, 1.0, 2.5])
    sigmas = np.array([0.0, 1e-8, 1e-6, 1e-4, 1e-3, 1e-2, 0.029, 0.031, 0.1, 0.5])
    tt, ss = np.meshgrid(thetas, sigmas, indexing="ij")
    tt = tt.ravel()
    ss = ss.ravel()

    # float64 ground truth via the integral form W = sum M^n/(n+1)! evaluated
    # with a high-order series (converges fast for |M| <= ~3).
    def ref_coeffs(theta, sigma):
        C = A = B = 0.0
        # coefficients of I, Phi, Phi^2 for M^n, M = sigma I + Phi
        cI, cP, cP2 = 1.0, 0.0, 0.0  # M^0
        fact = 1.0
        for n in range(0, 40):
            fact *= n + 1  # (n+1)!
            C += cI / fact
            A += cP / fact
            B += cP2 / fact
            # multiply (cI, cP, cP2) by M, reducing Phi^3 = -theta^2 Phi
            cI, cP, cP2 = (
                sigma * cI,
                cI + sigma * cP - theta**2 * cP2,
                cP + sigma * cP2,
            )
        return C, A, B

    want = np.array([ref_coeffs(a, b) for a, b in zip(tt, ss)])
    C, A, B = lie._sim3_W_coeffs(
        jnp.asarray((tt * tt).astype(np.float32)), jnp.asarray(ss.astype(np.float32))
    )
    got = np.stack([np.asarray(C), np.asarray(A), np.asarray(B)], axis=-1)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_vmap_and_jit():
    T = random_sim3(7)
    xi = jnp.asarray(RNG.normal(size=(7, 7)) * 0.2, dtype=jnp.float32)
    out = jax.jit(jax.vmap(lie.retr))(T, xi)
    assert out.shape == (7, 8)
    assert bool(jnp.all(jnp.isfinite(out)))
