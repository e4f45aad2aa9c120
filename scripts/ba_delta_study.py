"""Oracle-ATE pricing of the BA early-exit threshold and the FULL joint
production deviation stack (VERDICT round-4 items 2+3).

Two questions, answered on the analytic oracle scene (utils/oracle_scene.py,
same protocol as scripts/mode_ate_study.py — 96-frame loop, 64x96 pointmaps,
keyframe every 4, mean of 3 noise seeds):

1. ``local_opt.delta_norm``: the reference exits BA on ‖dx‖ < 1e-8
   (gn_kernels.cu:1217-1222 via config delta_norm) — effectively never
   inside max_iters=10, so every solve pays all 10 iterations. How much
   trajectory error does a REAL early exit cost? (The LM loop only counts
   an ACCEPTED step's ‖dx‖, so this is a convergence-declaration threshold.)

2. The complete production stack (config/base.yaml): matcher cuts (radius 2,
   plus-mode, level_step 2, plateau, proj_step 2, track_dilation_max 1)
   TOGETHER WITH the BA cuts (ba_pixel_step 2, meas bf16, Gram bf16) —
   previous rounds priced these alone or pairwise; matcher decimation feeds
   BA correspondences, so interactions are untested until priced jointly.

Run: python scripts/ba_delta_study.py [--calib]
Results land in docs/PERFORMANCE.md; regression pinned in
tests/test_oracle_modes.py (production-stack row).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from mast3r_slam_tpu.utils.oracle_scene import (OracleScene, make_trajectory,
                                                run_oracle_slam)

PROD_MATCH = dict(refine_mode="plus", level_step=2, plateau_frac=0.001,
                  radius=2, proj_step=2, track_dilation_max=1)
PROD_BA = dict(ba_pixel_step=2, ba_meas_dtype="bfloat16",
               ba_compute_dtype="bfloat16")

MODES = {
    "strict reference (all pins)": dict(
        refine_mode="joint", level_step=1, plateau_frac=0.0,
        ba_pixel_step=1, ba_compute_dtype="float32", ba_delta_norm=1e-8),
    "production matcher cuts only (r4 baseline)": dict(PROD_MATCH),
    "production-defaults JOINT (ships in base.yaml)": dict(
        **PROD_MATCH, **PROD_BA),
    "prod-joint + ba_delta 1e-4": dict(
        **PROD_MATCH, **PROD_BA, ba_delta_norm=1e-4),
    "prod-joint + ba_delta 1e-3": dict(
        **PROD_MATCH, **PROD_BA, ba_delta_norm=1e-3),
    "prod-joint + ba_delta 1e-2": dict(
        **PROD_MATCH, **PROD_BA, ba_delta_norm=1e-2),
    "prod-joint + ba_delta 3e-2": dict(
        **PROD_MATCH, **PROD_BA, ba_delta_norm=3e-2),
}


def main():
    hw = (64, 96)
    n_frames = 96
    seeds = (0, 1, 2)
    use_calib = "--calib" in sys.argv
    scene = OracleScene(seed=0)
    poses = make_trajectory(n_frames)

    print(f"oracle scene {hw}, {n_frames} frames, kf_every=4, calib="
          f"{use_calib}, seeds {seeds}", flush=True)
    rows = []
    for name, mode in MODES.items():
        at, ab, pe = [], [], []
        for s in seeds:
            r = run_oracle_slam(scene, poses, hw, mode, noise_seed=s,
                                use_calib=use_calib)
            at.append(r["ate_track"])
            ab.append(r["ate_ba"])
            pe.append(r["mean_pix_err"])
        rows.append((name, np.mean(at), np.mean(ab), np.mean(pe)))
        print(f"{name:48s} ate_track {np.mean(at)*1e3:7.2f} mm  "
              f"ate_ba {np.mean(ab)*1e3:7.2f} mm  "
              f"pix_err {np.mean(pe):6.3f} px", flush=True)

    strict = rows[0]
    print("\nrelative to strict:")
    for name, at, ab, pe in rows[1:]:
        print(f"{name:48s} ate_ba {ab/strict[2]:5.2f}x  "
              f"pix_err {pe - strict[3]:+6.3f} px", flush=True)


if __name__ == "__main__":
    main()
