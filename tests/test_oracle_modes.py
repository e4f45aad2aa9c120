"""End-to-end SLAM-math validation on the analytic oracle scene.

The oracle replaces the network with exact multi-view-consistent geometry +
controlled noise (utils/oracle_scene.py), so these tests validate the whole
estimation stack — iterative-projection matcher, Sim(3) GN pose solver,
keyframe chaining, factor-graph BA with a loop closure — against KNOWN
ground truth, and pin the trajectory-error cost of the speed-motivated
matcher deviations (PARITY.md: refine_mode plus, level_step 2,
plateau_frac) relative to strict reference settings.

Full-size study: scripts/mode_ate_study.py (results in docs/PERFORMANCE.md).
"""

import numpy as np
import pytest

from mast3r_slam_tpu.utils.oracle_scene import (OracleScene, make_trajectory,
                                                run_oracle_slam)

HW = (32, 48)
N_FRAMES = 16

STRICT = dict(refine_mode="joint", level_step=1, plateau_frac=0.0,
              ba_pixel_step=1, ba_compute_dtype="float32",
              ba_delta_norm=1e-8)
# FAST mirrors the FULL production deviation set (config/base.yaml) —
# matcher cuts (plus-mode refine, level_step 2, plateau exit, radius 2,
# proj_step 2, tracker-only single-level ladder) AND the BA cuts
# (pixel_step 2, bf16 measured-channel storage, bf16 Gram compute,
# delta_norm 1e-2 early exit) — priced JOINTLY: scripts/ba_delta_study.py
# (round 5) measured the full stack at 0.85x strict ATE (matcher-only
# combo was 0.84x in round 4; the BA cuts cost nothing on top).
FAST = dict(refine_mode="plus", level_step=2, plateau_frac=0.001,
            radius=2, proj_step=2, track_dilation_max=1,
            ba_pixel_step=2, ba_meas_dtype="bfloat16",
            ba_compute_dtype="bfloat16", ba_delta_norm=1e-2)


def test_raycast_is_exact_and_consistent():
    scene = OracleScene(seed=0)
    poses = make_trajectory(8)
    K = scene.intrinsics(HW)
    X, hits = scene.raycast(poses[3], K, HW)
    # Newton residual: hit points lie ON the surface
    res = np.abs(hits[:, 2] - scene.height(hits[:, 0], hits[:, 1]))
    assert res.max() < 1e-9
    # pointmap depth is positive and near the base depth
    assert X[:, 2].min() > 1.0 and X[:, 2].max() < 5.0
    # multi-view consistency: frame 3's world hits reproject into frame 5
    # with substantial overlap
    Xb = scene.world_to_cam(hits, poses[5])
    _, ok = scene.project(Xb, K, HW)
    assert ok.mean() > 0.5
    # raycast from pose 5 at those pixels recovers the SAME surface: compare
    # world hits of both frames where rays nearly coincide (sanity that the
    # world is one consistent surface, not per-view)
    X5, hits5 = scene.raycast(poses[5], K, HW)
    assert np.abs(hits5[:, 2]
                  - scene.height(hits5[:, 0], hits5[:, 1])).max() < 1e-9


@pytest.fixture(scope="module")
def oracle_runs():
    scene = OracleScene(seed=0)
    poses = make_trajectory(N_FRAMES)
    return {
        "strict": run_oracle_slam(scene, poses, HW, STRICT, noise_seed=0),
        "fast": run_oracle_slam(scene, poses, HW, FAST, noise_seed=0),
        "poses": poses,
    }


def test_strict_mode_recovers_trajectory(oracle_runs):
    """With oracle inputs (0.3% depth noise), the full stack must recover
    the trajectory: matched pixels sub-pixel on average, BA tightens the
    tracked estimate, final ATE a small fraction of the path scale (~0.9 m
    span)."""
    r = oracle_runs["strict"]
    assert r["mean_pix_err"] < 1.0, r["mean_pix_err"]
    assert r["ate_ba"] < 0.03, r["ate_ba"]
    assert r["ate_ba"] <= r["ate_track"] * 1.05, (r["ate_ba"],
                                                  r["ate_track"])


def test_long_chain_stays_stable():
    """48-frame chain at low resolution — the regression test for the
    quaternion-norm explosion (ops/lie.py compose/inv renormalization).

    Without renormalization, |q| cubes per frame through the tracker chain
    ``T_new = T_k ∘ solve(T_k⁻¹ ∘ T_prev)`` and EXPLODES at frame ~33-37 of
    every run regardless of noise level (the ray residuals are
    |q|-invariant, so the solver keeps 'converging' on garbage). 16-frame
    tests can never see this — chain-dynamics bugs need chain-length runs.
    """
    scene = OracleScene(seed=0)
    poses = make_trajectory(48)
    r = run_oracle_slam(scene, poses, (24, 32), FAST, noise_seed=0)
    # every keyframe promoted, no skips: the chain never broke
    assert r["n_skipped"] == 0, r["n_skipped"]
    assert len(r["kf_ids"]) == 12
    T = r["T_kf_track"]
    assert np.isfinite(T).all()
    # quaternions stay unit through 47 compose/inv/solve rounds
    qn = np.linalg.norm(T[:, 3:7], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-4)
    # scale stays sane and the trajectory is recovered
    assert np.abs(T[:, 7] - 1.0).max() < 0.2
    assert r["ate_ba"] < 0.15, r["ate_ba"]  # low-res: ~0.083 measured


def test_calibrated_path_recovers_trajectory():
    """The calibrated solvers (opt_pose_calib_sim3 + gauss_newton_calib,
    both LM) against exact intrinsics: pixel + log-depth residuals must
    recover the trajectory at least as well as the uncalibrated path — the
    calib formulation observes scale directly through the fixed [u, v,
    log z] measurements."""
    scene = OracleScene(seed=0)
    poses = make_trajectory(N_FRAMES)
    r = run_oracle_slam(scene, poses, HW, FAST, noise_seed=0,
                        use_calib=True)
    assert r["n_skipped"] == 0, r["n_skipped"]
    assert np.isfinite(r["T_kf_ba"]).all()
    assert r["ate_ba"] < 0.03, r["ate_ba"]


def test_fast_mode_ate_cost_is_bounded(oracle_runs):
    """The production matcher deviations may cost accuracy, but the cost
    must stay bounded: fast-mode ATE within 2x strict (+1 mm absolute
    slack), matched-pixel error within +0.5 px. Measured values (recorded
    2026-08-17, docs/PERFORMANCE.md): ~1.1x ATE, +0.2 px."""
    s = oracle_runs["strict"]
    f = oracle_runs["fast"]
    assert f["ate_ba"] < s["ate_ba"] * 2.0 + 1e-3, (f["ate_ba"], s["ate_ba"])
    assert f["mean_pix_err"] < s["mean_pix_err"] + 0.5
