"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.models.inference import MASt3RInference
from mast3r_slam_tpu.ops import lie
from mast3r_slam_tpu.parallel import sharding as S
from mast3r_slam_tpu.slam import factor_graph as FG


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 2:
        pytest.skip("needs the virtual multi-device mesh")
    return S.make_mesh()


def test_sharded_symmetric_decode_matches_single(mesh):
    """Mesh-sharded batched pair decode == unsharded decode (same params)."""
    cfg = M.tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    H, W = 32, 48
    n_tok = (H // 16) * (W // 16)
    B = jax.device_count()
    key = jax.random.PRNGKey(1)
    feat_i = jax.random.normal(key, (B, n_tok, cfg.enc_embed_dim))
    feat_j = jax.random.normal(jax.random.fold_in(key, 1), feat_i.shape)
    pos = M.patch_positions(H // 16, W // 16, B)

    plain = MASt3RInference(params, cfg)
    sharded = MASt3RInference(params, cfg, mesh=mesh)
    X0, C0, D0, Q0 = plain.decode_symmetric_batch(feat_i, pos, feat_j, pos,
                                                  (H, W))
    X1, C1, D1, Q1 = sharded.decode_symmetric_batch(feat_i, pos, feat_j, pos,
                                                    (H, W))
    # desc is L2-normalized (bounded) → tight; pts3d goes through expm1(|x|)
    # which amplifies reduction-order noise on random weights → relative only.
    np.testing.assert_allclose(np.asarray(D0), np.asarray(D1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(Q0), np.asarray(Q1), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(X0), np.asarray(X1), rtol=5e-2)


def test_sharded_gauss_newton_matches_single(mesh):
    """Edge-sharded BA returns the same poses as the unsharded solve."""
    n_dev = jax.device_count()
    rng = np.random.default_rng(2)
    cap, n_pix = 8, 256
    E2 = 2 * n_dev
    ii = np.arange(E2) % (cap - 1)
    jj = ii + 1

    X = jnp.asarray(rng.random((cap, n_pix, 3)) + [0, 0, 2.0], jnp.float32)
    Cavg = jnp.ones((cap, n_pix, 1))
    T = jnp.tile(lie.identity()[None], (cap, 1))
    T = T.at[1:, 0].set(jnp.asarray(rng.normal(size=cap - 1) * 0.02))
    idx = jnp.broadcast_to(jnp.arange(n_pix, dtype=jnp.int32)[None], (E2, n_pix))
    valid = jnp.ones((E2, n_pix, 1), bool)
    Q = jnp.ones((E2, n_pix, 1))
    mask = jnp.ones((E2,), jnp.float32)
    free = jnp.asarray(np.arange(cap) > 0)
    meas = FG.precompute_meas_rays(
        X, Cavg, jnp.asarray(ii), jnp.asarray(jj), idx, valid, Q, 0.0, 0.0)
    args = (0.003, 1.0, 3, 1e-9)

    T_plain = FG.gauss_newton_rays(
        T.copy(), meas, jnp.asarray(ii), jnp.asarray(jj), mask, free, *args)
    T_shard = FG.gauss_newton_rays(
        S.replicate(T.copy(), mesh),
        tuple(S.shard_leading(ch, mesh) for ch in meas),
        S.shard_leading(jnp.asarray(ii), mesh),
        S.shard_leading(jnp.asarray(jj), mesh),
        S.shard_leading(mask, mesh),
        S.replicate(free, mesh), *args)
    np.testing.assert_allclose(np.asarray(T_plain), np.asarray(T_shard),
                               rtol=1e-4, atol=1e-5)


def test_pad_to_multiple():
    assert S.pad_to_multiple(5, 8) == 8
    assert S.pad_to_multiple(16, 8) == 16
    assert S.pad_to_multiple(17, 8) == 24


def test_factor_graph_sharded_solve(mesh):
    """FactorGraph with a mesh shards its edge buffers and still solves."""
    import sys

    sys.path.insert(0, ".")
    from tests.test_pipeline import CFG, StubModel, make_keyframes

    kfs = make_keyframes(5, noise=0.02)
    graph = FG.FactorGraph(StubModel(), kfs, CFG, mesh=mesh)
    graph.add_factors([0, 1, 2, 3], [1, 2, 3, 4], 0.0)
    T_before = np.asarray(kfs.T_WC[:5]).copy()
    graph.solve_GN_rays()
    T_after = np.asarray(kfs.T_WC[:5])
    assert np.isfinite(T_after).all()
    assert np.abs(T_after[1:] - T_before[1:]).max() > 1e-6
