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


def _ba_problem(n_dev, cap=8, n_pix=256, seed=2):
    """Shared synthetic two-way BA problem, geometrically CONSISTENT (every
    keyframe sees the same scene, so GN converges): on an inconsistent random
    problem GN is chaotic and amplifies the ~1e-5 formulation noise between
    the Pallas kernel and the XLA path ~200x per iteration, which would make
    cross-formulation equivalence untestable."""
    rng = np.random.default_rng(seed)
    E2 = 2 * n_dev
    ii = np.arange(E2) % (cap - 1)
    jj = ii + 1
    scene = rng.random((1, n_pix, 3)) + [0, 0, 2.0]
    X = jnp.asarray(np.broadcast_to(scene, (cap, n_pix, 3)), jnp.float32)
    Cavg = jnp.ones((cap, n_pix, 1))
    T = jnp.tile(lie.identity()[None], (cap, 1))
    T = T.at[1:, 0].set(jnp.asarray(rng.normal(size=cap - 1) * 0.02))
    idx = jnp.broadcast_to(jnp.arange(n_pix, dtype=jnp.int32)[None],
                           (E2, n_pix))
    valid = jnp.ones((E2, n_pix, 1), bool)
    Q = jnp.ones((E2, n_pix, 1))
    mask = jnp.ones((E2,), jnp.float32)
    free = jnp.asarray(np.arange(cap) > 0)
    return ii, jj, X, Cavg, T, idx, valid, Q, mask, free


def test_sharded_pallas_rays_matches_xla(mesh):
    """Pallas Gram kernel under shard_map (interpret) == unsharded XLA path.

    This is the production multi-chip BA configuration: edge-sharded measured
    channels, per-device kernel over the local edge slice, psum of the dense
    system (factor_graph._shard_edge_system)."""
    n_dev = jax.device_count()
    ii, jj, X, Cavg, T, idx, valid, Q, mask, free = _ba_problem(n_dev)
    meas = FG.precompute_meas_rays(
        X, Cavg, jnp.asarray(ii), jnp.asarray(jj), idx, valid, Q, 0.0, 0.0)
    # f32 compute on both sides: the bf16 Gram noise of the two
    # formulations differs by ~1e-2 rel (pinned separately in test_ba_fused);
    # this test isolates the SHARDING semantics.
    args = (0.003, 1.0, 3, 1e-9)

    T_xla = FG.gauss_newton_rays(
        T.copy(), meas, jnp.asarray(ii), jnp.asarray(jj), mask, free, *args,
        allow_pallas=False, compute_dtype="float32")
    T_pallas = FG.gauss_newton_rays(
        S.replicate(T.copy(), mesh),
        tuple(S.shard_leading(ch, mesh) for ch in meas),
        S.shard_leading(jnp.asarray(ii), mesh),
        S.shard_leading(jnp.asarray(jj), mesh),
        S.shard_leading(mask, mesh),
        S.replicate(free, mesh), *args,
        mesh=mesh, pallas_interpret=True, compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(T_xla), np.asarray(T_pallas),
                               rtol=1e-4, atol=1e-5)


def test_sharded_pallas_calib_matches_xla(mesh):
    """Calib Pallas kernel under shard_map (interpret) == unsharded XLA."""
    n_dev = jax.device_count()
    cap, n_pix = 8, 256
    W_img, H_img = 16, 16
    ii, jj, X, Cavg, T, idx, valid, Q, mask, free = _ba_problem(n_dev)
    K = jnp.asarray([[20.0, 0.0, 8.0], [0.0, 20.0, 8.0], [0.0, 0.0, 1.0]])
    meas = FG.precompute_meas_calib(
        X, Cavg, jnp.asarray(ii), jnp.asarray(jj), idx, valid, Q, W_img,
        1e-6, 0.0, 0.0)
    args = ((H_img, W_img), -10.0, 1e-6, 1.0, 10.0, 3, 1e-9)

    T_xla = FG.gauss_newton_calib(
        T.copy(), meas, K, jnp.asarray(ii), jnp.asarray(jj), mask, free,
        *args, allow_pallas=False, compute_dtype="float32")
    T_pallas = FG.gauss_newton_calib(
        S.replicate(T.copy(), mesh),
        tuple(S.shard_leading(ch, mesh) for ch in meas), S.replicate(K, mesh),
        S.shard_leading(jnp.asarray(ii), mesh),
        S.shard_leading(jnp.asarray(jj), mesh),
        S.shard_leading(mask, mesh),
        S.replicate(free, mesh), *args,
        mesh=mesh, pallas_interpret=True, compute_dtype="float32")
    # kernel-vs-XLA f32 formulation noise, amplified by the LM loop's
    # accept decisions near convergence (cost deltas below the formulation
    # noise can accept in one path and reject in the other — both end
    # within the noise ball of the same optimum)
    np.testing.assert_allclose(np.asarray(T_xla), np.asarray(T_pallas),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Production-shape sharded validation (slow: run explicitly with -m slow).
# XLA sharding pathologies (collective layouts, sharded-scan reshapes) often
# appear only at production shapes; these run the REAL sizes once on the
# virtual mesh. Wall times on this machine are recorded in
# docs/PERFORMANCE.md.
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["rays", "calib"])
def test_production_shape_sharded_solve(mesh, kind):
    """One production-scale GN iteration, edge-sharded over the mesh:
    cap=110 poses, 128 two-way edges (=256 one-way rows), 196k pixels —
    exactly the flagship solve the backend dispatches on v5e."""
    n_dev = jax.device_count()
    cap, n_pix, E2 = 110, 384 * 512, 256
    assert E2 % n_dev == 0
    rng = np.random.default_rng(0)
    ii = jnp.asarray((np.arange(E2) % (cap - 1)).astype(np.int32))
    jj = jnp.asarray((np.asarray(ii) + 1).astype(np.int32))
    scene = (rng.random((1, n_pix, 3)) + [0, 0, 2.0]).astype(np.float32)
    X = jnp.asarray(np.broadcast_to(scene, (cap, n_pix, 3)))
    Cavg = jnp.ones((cap, n_pix, 1), jnp.float32)
    T = jnp.tile(lie.identity()[None], (cap, 1))
    T = T.at[1:, 0].set(jnp.asarray(rng.normal(size=cap - 1) * 0.01,
                                    jnp.float32))
    base = np.arange(n_pix, dtype=np.int32)
    idx = jnp.asarray(np.clip(
        base[None] + rng.integers(-512, 512, (E2, n_pix)), 0, n_pix - 1
    ).astype(np.int32))
    valid = jnp.ones((E2, n_pix, 1), bool)
    Q = jnp.ones((E2, n_pix, 1), jnp.float32)
    mask = jnp.ones((E2,), jnp.float32)
    free = jnp.asarray(np.arange(cap) > 0)

    import time
    t0 = time.perf_counter()
    if kind == "rays":
        meas = FG.precompute_meas_rays(X, Cavg, ii, jj, idx, valid, Q,
                                       0.0, 0.0)
    else:
        meas = FG.precompute_meas_calib(X, Cavg, ii, jj, idx, valid, Q,
                                        512, 1e-6, 0.0, 0.0)
    jax.block_until_ready(meas)
    t_pre = time.perf_counter() - t0

    meas_sh = tuple(S.shard_leading(ch, mesh) for ch in meas)
    args = dict(T_ii=(S.replicate(T, mesh), meas_sh,
                      S.shard_leading(ii, mesh), S.shard_leading(jj, mesh),
                      S.shard_leading(mask, mesh), S.replicate(free, mesh)))
    t0 = time.perf_counter()
    if kind == "rays":
        T_new = FG.gauss_newton_rays(*args["T_ii"], 0.003, 10.0, 1, 1e-12)
    else:
        K = jnp.asarray([[500.0, 0.0, 256.0], [0.0, 500.0, 192.0],
                         [0.0, 0.0, 1.0]])
        a = args["T_ii"]
        T_new = FG.gauss_newton_calib(
            a[0], a[1], S.replicate(K, mesh), a[2], a[3], a[4], a[5],
            (384, 512), -10.0, 1e-6, 1.0, 10.0, 1, 1e-12)
    jax.block_until_ready(T_new)
    t_solve = time.perf_counter() - t0
    assert T_new.shape == (cap, 8)
    assert bool(jnp.all(jnp.isfinite(T_new)))
    print(f"\n[production-shape {kind}] premeas {t_pre:.1f}s, "
          f"1 GN iter sharded {t_solve:.1f}s (1-core CPU mesh, {n_dev} dev)")


@pytest.mark.slow
def test_production_shape_sharded_decode(mesh):
    """Sharded symmetric decode at the 512-crop token/pixel shapes (tiny
    layer dims — the sharding layouts depend on shapes, not depth)."""
    cfg = M.tiny_config()
    H, W = 384, 512
    n_tok = (H // 16) * (W // 16)
    B = jax.device_count()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    feat_i = jax.random.normal(key, (B, n_tok, cfg.enc_embed_dim))
    feat_j = jax.random.normal(jax.random.fold_in(key, 1), feat_i.shape)
    pos = M.patch_positions(H // 16, W // 16, B)

    import time
    sharded = MASt3RInference(params, cfg, mesh=mesh)
    t0 = time.perf_counter()
    X, C, D, Q = sharded.decode_symmetric_batch(feat_i, pos, feat_j, pos,
                                                (H, W))
    jax.block_until_ready(X)
    t = time.perf_counter() - t0
    assert X.shape == (4, B, H, W, 3)
    assert bool(jnp.all(jnp.isfinite(D)))
    print(f"\n[production-shape decode] B={B} sharded symmetric decode "
          f"{t:.1f}s (1-core CPU mesh)")


def test_factor_graph_mesh_non_divisible_bucket_fallback(mesh):
    """A mesh whose size does not divide the two-way edge bucket (3 devices,
    bucket 8) must fall back to a consistent single-device solve — the meas
    channels land on backend devices while kf.T_WC is homed to the frontend
    device, so every solve input has to be re-placed together (mixed
    commitments make jit raise)."""
    import sys

    sys.path.insert(0, ".")
    from tests.test_pipeline import CFG, StubModel, make_keyframes

    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices for a 3-device backend mesh")
    from jax.sharding import Mesh

    mesh3 = Mesh(np.array(jax.devices()[1:4]), (S.EDGE_AXIS,))
    home = jax.devices()[0]

    kfs = make_keyframes(5, noise=0.02)
    graph = FG.FactorGraph(StubModel(), kfs, CFG, mesh=mesh3,
                           home_device=home)
    graph.add_factors([0, 1, 2, 3], [1, 2, 3, 4], 0.0)
    T_before = np.asarray(kfs.T_WC[:5]).copy()
    graph.solve_GN_rays()   # first solve: T arrives uncommitted
    graph.solve_GN_rays()   # second solve: T arrives committed to `home`
    T_after = np.asarray(kfs.T_WC[:5])
    assert np.isfinite(T_after).all()
    assert np.abs(T_after[1:] - T_before[1:]).max() > 1e-6

    # matches the no-mesh solve on the same problem
    kfs2 = make_keyframes(5, noise=0.02)
    graph2 = FG.FactorGraph(StubModel(), kfs2, CFG)
    graph2.add_factors([0, 1, 2, 3], [1, 2, 3, 4], 0.0)
    graph2.solve_GN_rays()
    # double-solve vs single-solve: near the optimum the LM accept flips on
    # bf16 cost noise, so agreement is to the optimum's noise ball
    np.testing.assert_allclose(T_after, np.asarray(kfs2.T_WC[:5]),
                               rtol=1e-3, atol=5e-4)
