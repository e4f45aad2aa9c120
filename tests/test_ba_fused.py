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


def test_lm_stabilizes_single_edge_pose():
    """Regression for the pre-LM oscillation: a pose held by ONE two-way
    edge of low-relief geometry swung its scale 0.99 -> 0.49 over 10
    fixed-damping GN iterations (oracle-scene capture). With LM
    accept/reject the solve must stay sane: scale within 10% and the
    perturbed pose pulled TOWARD its neighbor-consistent value."""
    rng = np.random.default_rng(3)
    cap, n = 3, 512
    # low-relief surface (weak scale observability — the hard case)
    xy = (rng.random((n, 2)) - 0.5) * 1.6
    z = 2.5 + 0.05 * np.sin(xy[:, 0] * 2.0) + 0.04 * np.cos(xy[:, 1] * 1.7)
    Xw = np.concatenate([xy, z[:, None]], 1).astype(np.float32)

    T_true = [lie.identity(),
              lie.exp(jnp.asarray([0.05, 0, 0, 0, 0.01, 0, 0])),
              lie.exp(jnp.asarray([0.1, 0.02, 0, 0.01, 0, 0, 0]))]
    X = jnp.stack([lie.act(lie.inv(T)[None], jnp.asarray(Xw))
                   for T in T_true])
    X = X + 0.003 * X[..., 2:3] * rng.standard_normal(X.shape).astype(
        np.float32)
    Cavg = jnp.ones((cap, n, 1))

    # pose 2 is held ONLY by the (1, 2) pair; pose 1 by (0, 1) too
    ii = jnp.asarray([0, 1, 1, 2, 0, 0, 0, 0], jnp.int32)
    jj = jnp.asarray([1, 0, 2, 1, 1, 1, 1, 1], jnp.int32)
    mask = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (8, n))
    valid = jnp.ones((8, n, 1), bool)
    Q = jnp.full((8, n, 1), 4.0)
    meas = FG.precompute_meas_rays(X, Cavg, ii, jj, idx, valid, Q, 0.0, 1.5)

    # perturb pose 2 (incl. scale) — the weakly-held pose
    T_in = jnp.stack([
        T_true[0], T_true[1],
        lie.retr(T_true[2], jnp.asarray([0.02, -0.01, 0.03, 0.01, 0, 0,
                                         0.05]))])
    free = jnp.asarray([False, False, True])
    err0 = float(jnp.linalg.norm(
        lie.log(lie.compose(lie.inv(T_in[2]), T_true[2]))))

    T_out = FG.gauss_newton_rays(T_in, meas, ii, jj, mask, free,
                                 0.003, 10.0, 12, 1e-9)
    s2 = float(T_out[2, 7])
    assert 0.9 < s2 < 1.1, s2
    err1 = float(jnp.linalg.norm(
        lie.log(lie.compose(lie.inv(T_out[2]), T_true[2]))))
    assert err1 < err0 * 0.7, (err0, err1)


def test_premeas_pixel_step_slices_channels():
    """pixel_step decimation: channels equal the full premeas sliced at the
    same stride (the gather math is per-query-pixel independent)."""
    import numpy as np
    import jax.numpy as jnp

    from mast3r_slam_tpu.slam.factor_graph import (precompute_meas_calib,
                                                   precompute_meas_rays)

    rng = np.random.default_rng(3)
    cap, E, N = 4, 2, 64
    X = jnp.asarray(rng.normal(size=(cap, N, 3)).astype(np.float32)
                    + [0, 0, 3.0])
    C = jnp.asarray(rng.uniform(0.5, 1, (cap, N, 1)).astype(np.float32))
    ii = jnp.asarray([0, 2], jnp.int32)
    jj = jnp.asarray([1, 3], jnp.int32)
    idx = jnp.asarray(rng.integers(0, N, (E, N)).astype(np.int32))
    valid = jnp.asarray(rng.random((E, N, 1)) < 0.9)
    Q = jnp.asarray(rng.uniform(1, 3, (E, N, 1)).astype(np.float32))

    full = precompute_meas_rays(X, C, ii, jj, idx, valid, Q, 0.0, 0.5)
    half = precompute_meas_rays(X, C, ii, jj, idx, valid, Q, 0.0, 0.5,
                                pixel_step=2)
    assert half[0].shape == (E, N // 2)
    for f, h in zip(full, half):
        np.testing.assert_array_equal(np.asarray(f)[:, ::2], np.asarray(h))

    fullc = precompute_meas_calib(X, C, ii, jj, idx, valid, Q, 8, 1e-6,
                                  0.0, 0.5)
    halfc = precompute_meas_calib(X, C, ii, jj, idx, valid, Q, 8, 1e-6,
                                  0.0, 0.5, pixel_step=2)
    for f, h in zip(fullc, halfc):
        np.testing.assert_array_equal(np.asarray(f)[:, ::2], np.asarray(h))


def test_pallas_gram_rays_bf16_meas_matches_xla(monkeypatch):
    """bf16-STORED measured channels (local_opt.meas_dtype): the kernel
    widens at load, so it must agree with the XLA path fed the SAME bf16
    channels — storage quantization is the only difference vs f32 (its ATE
    cost is priced separately on the oracle: 1.02x)."""
    monkeypatch.setattr(ba_kernels, "_TNL", 128)
    T, X, Cavg, ii, jj, idx, valid, Q, mask = _random_edge_inputs(5, E=3,
                                                                  N=2048)
    meas = FG._premeas_rays(X, Cavg, ii, jj, idx, valid, Q, 0.5, 0.5)
    meas16 = tuple(ch.astype(jnp.bfloat16) for ch in meas)
    maskj = jnp.asarray(mask)

    # split layout for bf16 uses 16 sublanes
    split = ba_kernels.view_sublane_split(meas16)
    assert split[0].shape[1] == 16

    Ti, rts = FG._rel_pose_rows(T, ii, jj, maskj)
    G = ba_kernels.gram_rays(rts, split, 0.003, 10.0, interpret=True)
    H_p, g_p, _ = FG._edge_blocks_from_gram(G, 4, Ti)

    rho, d_res, Xp, sw, adj_inv = FG._edge_terms_rays(T, ii, jj, meas16,
                                                      0.003, 10.0)
    H_x, g_x, _ = FG._edge_system_fused(rho, d_res, Xp,
                                        _mask_weights(sw, rho, maskj),
                                        adj_inv)
    h_scale = float(jnp.max(jnp.abs(H_x))) + 1e-6
    g_scale = float(jnp.max(jnp.abs(g_x))) + 1e-6
    np.testing.assert_allclose(np.asarray(H_p) / h_scale,
                               np.asarray(H_x) / h_scale, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g_p) / g_scale,
                               np.asarray(g_x) / g_scale, atol=2e-2)
