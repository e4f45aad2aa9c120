"""Disjoint device-role planning (parallel/topology.py) on the CPU mesh."""

import jax
import numpy as np
import pytest

from mast3r_slam_tpu.parallel.topology import plan_topology


def _devs(n):
    d = jax.devices()
    if len(d) < n:
        pytest.skip(f"needs {n} virtual devices")
    return d[:n]


def test_single_device_everything_local():
    t = plan_topology(_devs(1))
    assert t.backend_mesh is None
    assert t.quality_device is None and t.tsdf_local_device is None


@pytest.mark.parametrize("n,expect_backend", [(2, 1), (3, 2), (4, 2),
                                              (5, 2), (8, 4)])
def test_backend_is_power_of_two_and_disjoint(n, expect_backend):
    t = plan_topology(_devs(n))
    assert t.n_backend == expect_backend
    back = set(t.backend_mesh.devices.flat)
    assert t.frontend_device not in back, "frontend chip must be disjoint"
    # service chips never sit on the frontend chip
    for d in (t.quality_device, t.tsdf_local_device, t.tsdf_global_device):
        assert d is not t.frontend_device


def test_eight_devices_dedicated_service_chips():
    t = plan_topology(_devs(8))
    back = set(t.backend_mesh.devices.flat)
    services = {t.quality_device, t.tsdf_local_device, t.tsdf_global_device}
    assert services.isdisjoint(back), "v5e-8 layout gives services own chips"
    assert len(services) == 3
    assert t.describe().startswith("frontend=")


def test_decode_pads_non_divisible_batch_onto_mesh():
    """A pair batch not divisible by the mesh size is padded (never silently
    decoded on the frontend chip) and sliced back to B."""
    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.models.inference import MASt3RInference
    from mast3r_slam_tpu.parallel import sharding as S

    if jax.device_count() < 4:
        pytest.skip("needs the virtual multi-device mesh")
    mesh = S.make_mesh(4)
    cfg = M.tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    H, W = 32, 48
    n_tok = (H // 16) * (W // 16)
    B = 3  # not divisible by 4
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
    assert X1.shape == X0.shape == (4, B, H, W, 3)
    assert set(X1.devices()) <= set(mesh.devices.flat)
    np.testing.assert_allclose(np.asarray(D0), np.asarray(D1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(X0), np.asarray(X1), rtol=5e-2)


def test_match_symmetric_warm_start_crosses_device_boundary():
    """Warm-start inits computed on the frontend chip must be accepted by a
    mesh-sharded match_symmetric (the disjoint-topology production path:
    FactorGraph.add_factors builds pose-projected inits from frontend
    keyframe state, the decode+match runs on the backend sub-mesh)."""
    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.models.inference import MASt3RInference
    from mast3r_slam_tpu.parallel import sharding as S

    if jax.device_count() < 4:
        pytest.skip("needs the virtual multi-device mesh")
    devs = jax.devices()
    frontend = devs[0]
    mesh = S.make_mesh(2)  # pretend devs[0:2] are the backend sub-mesh
    cfg = M.tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    H, W = 32, 48
    n_tok = (H // 16) * (W // 16)
    n = H * W
    B = 2
    key = jax.random.PRNGKey(1)
    feat_i = jax.random.normal(key, (B, n_tok, cfg.enc_embed_dim))
    feat_j = jax.random.normal(jax.random.fold_in(key, 1), feat_i.shape)
    pos = M.patch_positions(H // 16, W // 16, B)

    model = MASt3RInference(params, cfg, {"radius": 1, "dilation_max": 2},
                            mesh=mesh)
    # frontend-committed warm start, as add_factors produces it
    import jax.numpy as jnp
    init = jax.device_put(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (B, n)),
        frontend)
    out = model.match_symmetric(feat_i, pos, feat_j, pos, (H, W),
                                init_i2j=init, init_j2i=init)
    assert out[0].shape == (B, n)
    assert bool(jnp.all(out[0] >= 0))
