"""Fused analytic BA edge system vs a dense weighted-Jacobian reference.

The production path (:func:`factor_graph._edge_system_fused`) never
materializes the ``(7, E, D*N)`` Jacobian stack; this test rebuilds that
dense stack explicitly (the round-1 implementation, and the layout of the
reference CUDA kernel gn_kernels.cu:813-1138) and checks the per-edge
H/g blocks agree for both residual types.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.ops import geometry, lie
from mast3r_slam_tpu.ops.robust import huber
from mast3r_slam_tpu.slam import factor_graph as FG


def _dense_reference(rho, d_res, Xp, c, adj_inv):
    """Round-1 dense construction: A = sqrt(c) * (d_res ∘ [I|-skew|X'])."""
    D = len(rho)
    d_res = [[jnp.zeros_like(rho[0]) if m is None else m for m in row]
             for row in d_res]
    Jl = geometry.compose_jac_channels(d_res, geometry.point_jac_channels(Xp))
    s = [jnp.sqrt(c[i]) for i in range(D)]
    A = jnp.stack([
        jnp.concatenate([s[i] * Jl[i][k] for i in range(D)], axis=-1)
        for k in range(7)
    ])
    bf = jnp.concatenate([s[i] * rho[i] for i in range(D)], axis=-1)
    H_local = jax.lax.dot_general(
        A, A, (((2,), (2,)), ((1,), (1,))), preferred_element_type=jnp.float32
    )
    g_local = jnp.einsum("aen,en->ea", A, bf)
    H = jnp.einsum("eab,eac,ecd->ebd", adj_inv, H_local, adj_inv)
    g = jnp.einsum("eab,ea->eb", adj_inv, g_local)
    return H, g


def _random_edge_inputs(seed, E=3, N=257):
    rng = np.random.default_rng(seed)
    cap = 6
    T = jax.vmap(lie.exp)(jnp.asarray(
        rng.normal(size=(cap, 7)).astype(np.float32) * 0.1))
    X = jnp.asarray(rng.uniform(-1, 1, (cap, N, 3)).astype(np.float32))
    X = X.at[..., 2].add(2.5)  # in front of the cameras
    Cavg = jnp.asarray(rng.uniform(0.0, 3.0, (cap, N, 1)).astype(np.float32))
    ii = jnp.asarray(rng.integers(0, cap, E).astype(np.int32))
    jj = jnp.asarray((np.asarray(ii) + 1) % cap)
    meas_idx = jnp.asarray(rng.integers(0, N, (E, N)).astype(np.int32))
    valid = jnp.asarray(rng.random((E, N, 1)) < 0.8)
    Q = jnp.asarray(rng.uniform(0.0, 3.0, (E, N, 1)).astype(np.float32))
    mask = jnp.asarray((rng.random(E) < 0.9).astype(np.float32))
    return T, X, Cavg, ii, jj, meas_idx, valid, Q, mask


# bf16 (the production compute dtype) rounds each Gram product to 8 mantissa
# bits; f32 mode must agree with the dense build to float rounding.
_TOL = {jnp.float32: 2e-5, jnp.bfloat16: 1.5e-2}


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_dense_rays(seed, dtype):
    T, X, Cavg, ii, jj, idx, valid, Q, mask = _random_edge_inputs(seed)
    meas = FG._premeas_rays(X, Cavg, ii, jj, idx, valid, Q, 0.5, 0.5)
    rho, d_res, Xp, sw, adj_inv = FG._edge_terms_rays(
        T, ii, jj, meas, 0.003, 10.0)
    c = [sw[i] * sw[i] * huber(sw[i] * rho[i]) * mask[:, None]
         for i in range(len(rho))]
    H_f, g_f, _ = FG._edge_system_fused(rho, d_res, Xp, c, adj_inv,
                                     compute_dtype=dtype)
    H_d, g_d = _dense_reference(rho, d_res, Xp, c, adj_inv)
    h_scale = float(jnp.max(jnp.abs(H_d))) + 1e-6
    g_scale = float(jnp.max(jnp.abs(g_d))) + 1e-6
    np.testing.assert_allclose(np.asarray(H_f) / h_scale,
                               np.asarray(H_d) / h_scale, atol=_TOL[dtype])
    np.testing.assert_allclose(np.asarray(g_f) / g_scale,
                               np.asarray(g_d) / g_scale, atol=_TOL[dtype])


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_dense_calib(seed, dtype):
    T, X, Cavg, ii, jj, idx, valid, Q, mask = _random_edge_inputs(seed)
    K = jnp.asarray([[40.0, 0.0, 16.0], [0.0, 40.0, 12.0], [0.0, 0.0, 1.0]])
    meas = FG._premeas_calib(X, Cavg, ii, jj, idx, valid, Q, 32,
                             1e-6, 0.5, 0.5)
    rho, d_res, Xp, sw, adj_inv = FG._edge_terms_calib(
        T, ii, jj, meas, K, (24, 32), 2.0, 1e-6, 1.0, 0.1)
    c = [sw[i] * sw[i] * huber(sw[i] * rho[i]) * mask[:, None]
         for i in range(len(rho))]
    H_f, g_f, _ = FG._edge_system_fused(rho, d_res, Xp, c, adj_inv,
                                     compute_dtype=dtype)
    H_d, g_d = _dense_reference(rho, d_res, Xp, c, adj_inv)
    h_scale = float(jnp.max(jnp.abs(H_d))) + 1e-6
    g_scale = float(jnp.max(jnp.abs(g_d))) + 1e-6
    np.testing.assert_allclose(np.asarray(H_f) / h_scale,
                               np.asarray(H_d) / h_scale, atol=_TOL[dtype])
    np.testing.assert_allclose(np.asarray(g_f) / g_scale,
                               np.asarray(g_d) / g_scale, atol=_TOL[dtype])


# ---------------------------------------------------------------------------
# Pallas Gram kernel vs the XLA fused path (interpret mode off-TPU)
# ---------------------------------------------------------------------------

from mast3r_slam_tpu.ops import ba_kernels  # noqa: E402


def _mask_weights(sw, rho, mask):
    return [sw[i] * sw[i] * huber(sw[i] * rho[i]) * mask[:, None]
            for i in range(len(rho))]


def test_pallas_gram_rays_matches_xla(monkeypatch):
    monkeypatch.setattr(ba_kernels, "_TNL", 128)
    T, X, Cavg, ii, jj, idx, valid, Q, mask = _random_edge_inputs(3, E=3,
                                                                  N=1024)
    meas = FG._premeas_rays(X, Cavg, ii, jj, idx, valid, Q, 0.5, 0.5)
    maskj = jnp.asarray(mask)

    Ti, rts = FG._rel_pose_rows(T, ii, jj, maskj)
    G = ba_kernels.gram_rays(rts, meas, 0.003, 10.0, interpret=True)
    H_p, g_p, _ = FG._edge_blocks_from_gram(G, 4, Ti)

    rho, d_res, Xp, sw, adj_inv = FG._edge_terms_rays(T, ii, jj, meas,
                                                      0.003, 10.0)
    H_x, g_x, _ = FG._edge_system_fused(rho, d_res, Xp,
                                     _mask_weights(sw, rho, maskj), adj_inv)
    h_scale = float(jnp.max(jnp.abs(H_x))) + 1e-6
    g_scale = float(jnp.max(jnp.abs(g_x))) + 1e-6
    np.testing.assert_allclose(np.asarray(H_p) / h_scale,
                               np.asarray(H_x) / h_scale, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g_p) / g_scale,
                               np.asarray(g_x) / g_scale, atol=2e-2)


def test_pallas_gram_calib_matches_xla(monkeypatch):
    monkeypatch.setattr(ba_kernels, "_TNL", 128)
    T, X, Cavg, ii, jj, idx, valid, Q, mask = _random_edge_inputs(4, E=3,
                                                                  N=1024)
    K = jnp.asarray([[40.0, 0.0, 16.0], [0.0, 40.0, 12.0], [0.0, 0.0, 1.0]])
    meas = FG._premeas_calib(X, Cavg, ii, jj, idx, valid, Q, 32,
                             1e-6, 0.5, 0.5)
    maskj = jnp.asarray(mask)

    fx, fy, cx, cy = geometry.decompose_K(K)
    Ti, rts = FG._rel_pose_rows(T, ii, jj, maskj, extra=(fx, fy, cx, cy))
    G = ba_kernels.gram_calib(rts, meas, (24, 32), 2.0, 1e-6, 1.0, 0.1,
                              interpret=True)
    H_p, g_p, _ = FG._edge_blocks_from_gram(G, 3, Ti)

    rho, d_res, Xp, sw, adj_inv = FG._edge_terms_calib(
        T, ii, jj, meas, K, (24, 32), 2.0, 1e-6, 1.0, 0.1)
    H_x, g_x, _ = FG._edge_system_fused(rho, d_res, Xp,
                                     _mask_weights(sw, rho, maskj), adj_inv)
    h_scale = float(jnp.max(jnp.abs(H_x))) + 1e-6
    g_scale = float(jnp.max(jnp.abs(g_x))) + 1e-6
    np.testing.assert_allclose(np.asarray(H_p) / h_scale,
                               np.asarray(H_x) / h_scale, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g_p) / g_scale,
                               np.asarray(g_x) / g_scale, atol=2e-2)
