"""FactorGraph measured-channel cache: invalidation semantics.

The cache (factor_graph.FactorGraph._ensure_meas) must refresh an edge's
channels when a touched keyframe's POINTMAP changed (xc_version) and must
NOT refresh on pose-only updates — in particular a BA solve's own pose
write-back, or the cache would re-gather every edge every solve.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mast3r_slam_tpu.slam import factor_graph as FG
from tests.test_pipeline import CFG, StubModel, make_keyframes


@pytest.fixture
def graph():
    kfs = make_keyframes(4, noise=0.02)
    g = FG.FactorGraph(StubModel(), kfs, CFG)
    g.add_factors([0, 1, 2], [1, 2, 3], 0.0)
    return g


def _cache_snapshot(g):
    g._ensure_meas("rays")
    return tuple(np.asarray(ch).copy() for ch in g._meas_ij)


def test_pose_update_does_not_invalidate(graph):
    before = _cache_snapshot(graph)
    ids_before = [id(ch) for ch in graph._meas_ij]
    # pose-only write (what solve_GN_rays does): bumps version, not xc_version
    kf = graph.keyframes
    kf.update_T_WCs(kf.T_WC[jnp.asarray([1])] , [1])
    graph._ensure_meas("rays")
    assert [id(ch) for ch in graph._meas_ij] == ids_before, \
        "pose-only update must not touch the cache"
    after = tuple(np.asarray(ch) for ch in graph._meas_ij)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)


def test_pointmap_update_invalidates_touched_edges(graph):
    before = _cache_snapshot(graph)
    kf = graph.keyframes
    # content write to keyframe 1 (gather side of edge 1, row side of edge 0)
    newX = np.asarray(kf.X[1]) + 0.5
    assert kf.update_pointmap_inplace(1, jnp.asarray(newX), kf.C[1])
    graph._ensure_meas("rays")
    after = tuple(np.asarray(ch) for ch in graph._meas_ij)
    # edge 2 = (2 -> 3): untouched by the kf-1 write, must be byte-identical
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a[2], b[2])
    # edge 1 = (1 -> 2): gathers FROM keyframe 1 -> its measured rays change
    changed = any(
        not np.array_equal(a[1], b[1]) for a, b in zip(before, after)
    )
    assert changed, "edge touching the rewritten keyframe was not refreshed"


def test_new_edges_append_without_recomputing_old(graph):
    before = _cache_snapshot(graph)
    ids_before_rows = np.asarray(graph._meas_ij[0])[:3].copy()
    graph.add_factors([0], [2], 0.0)           # new edge (0 -> 2)
    graph._ensure_meas("rays")
    assert graph._meas_ij[0].shape[0] == 4
    np.testing.assert_array_equal(
        np.asarray(graph._meas_ij[0])[:3], ids_before_rows)
    assert graph._meas_ver_ij.shape[0] == 4


def test_mode_switch_drops_cache(graph):
    graph._ensure_meas("rays")
    assert graph._meas_kind == "rays"
    n_rays = len(graph._meas_ij)
    graph.K = jnp.asarray([[100.0, 0, 16.0], [0, 100.0, 12.0], [0, 0, 1.0]])
    graph._ensure_meas("calib")
    assert graph._meas_kind == "calib"
    assert len(graph._meas_ij) != n_rays  # 7 calib channels vs 8 ray channels
