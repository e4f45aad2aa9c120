"""ATE cost of DEEPER matcher cuts, on the oracle scene.

The frontend's remaining ~48 ms is gather-row-rate bound; the only levers
left are semantic (fewer refinement candidates / levels / LM iterations —
docs/PERFORMANCE.md breakdown). This sweep measures what each candidate cut
costs in trajectory error BEFORE any of them is considered as a default.
Gather volume per frame scales with ``levels x candidates``:

  production  (r3, d5, step2, plus): 3 levels x 13 candidates  = 39 rows/px
  r2          (r2, d5, step2):       3 x 9                     = 27 (-31%)
  r2 d4       (r2, d4, step2):       2 x 9  (d=4,2? -> 4,2,1=3) ...
  step4       (r3, d5, step4):       2 x 13 (d=5,1)            = 26 (-33%)
  iter6       (max_iter 6):          fewer LM gather passes

Run: ``JAX_PLATFORMS=cpu python scripts/matcher_cut_sweep.py``
Results in docs/PERFORMANCE.md.
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

SWEEP = {
    "production (r3 d5 step2 plus, 10 LM iters)": dict(),
    "radius 2 (27 rows/px, -31% refine gather)": dict(radius=2),
    "step 4 -> levels d=5,1 (26 rows/px, -33%)": dict(level_step=4),
    "radius 2 + step 4 (18 rows/px, -54%)": dict(radius=2, level_step=4),
    "LM 6 iters (fewer iter_proj passes)": dict(max_iter=6),
    "radius 2 + step 4 + LM 6 (max cut)": dict(radius=2, level_step=4,
                                               max_iter=6),
    # tracker-only ladder cuts (warm-started matching; backend edges keep
    # the full r2/d5/step2 ladder) — the refine gather is the hottest
    # frontend row volume (docs/PERFORMANCE.md breakdown)
    "TRACK d_max 3 (r2; 2 lvls, 18 rows/px -54%)": dict(
        radius=2, track_dilation_max=3),
    "TRACK d_max 1 (r2; 1 lvl, 9 rows/px -77%)": dict(
        radius=2, track_dilation_max=1),
    "TRACK d_max 1 + LM 6 (max tracker cut)": dict(
        radius=2, track_dilation_max=1, track_max_iter=6),
    # decimated LM projection (coarse query grid + correction-field
    # upsample): cuts the hottest row-rate-bound gather volume proj_step²x
    "proj_step 2 (LM on 1/4 queries)": dict(radius=2, proj_step=2),
    "TRACK proj_step 2 (backend full-res)": dict(
        radius=2, track_proj_step=2),
    "TRACK proj_step 2 + d_max 3": dict(
        radius=2, track_proj_step=2, track_dilation_max=3),
}


def main():
    hw = (64, 96)
    scene = OracleScene(seed=0)
    poses = make_trajectory(96)
    seeds = (0, 1, 2)
    print(f"oracle {hw}, 96 frames, kf_every=4, seeds {seeds}")
    base = None
    for name, mode in SWEEP.items():
        ab, pe, sk = [], [], 0
        for s in seeds:
            r = run_oracle_slam(scene, poses, hw, mode, noise_seed=s)
            ab.append(r["ate_ba"])
            pe.append(r["mean_pix_err"])
            sk += r["n_skipped"]
        a, p = np.mean(ab), np.mean(pe)
        if base is None:
            base = a
        print(f"{name:46s} ate_ba {a * 1e3:6.2f} mm ({a / base:4.2f}x)  "
              f"pix {p:5.3f}  skips {sk}", flush=True)


if __name__ == "__main__":
    main()
