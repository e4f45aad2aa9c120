"""ATE impact of the speed-motivated matcher deviations, on oracle geometry.

The production config deviates from strict reference matcher semantics in
three ways (PARITY.md): ``refine_mode: plus`` (vs the reference's joint
window argmax), ``level_step: 2`` (strided dilation ladder), and
``plateau_frac: 0.001`` (LM progress early-exit). Their FPS value is
measured (docs/PERFORMANCE.md); their TRAJECTORY-ERROR cost was not — this
study measures it on an analytic oracle scene where ground truth is exact
and the network is out of the loop (utils/oracle_scene.py), so any ATE
difference is attributable to the matcher semantics alone.

Protocol: 96-frame (video-rate motion) loop trajectory over a smooth height field, 64x96
pointmaps with 0.3%-of-depth noise + 0.02 descriptor jitter; frame-to-keyframe
tracking with the production Sim(3) GN solver (keyframe every 4 frames),
then a 10-iteration global BA over consecutive + loop-closure edges matched
with the SAME mode under test. Each mode runs on 3 noise seeds.

Run: ``JAX_PLATFORMS=cpu python scripts/mode_ate_study.py``
Results recorded in docs/PERFORMANCE.md; regression pinned by
tests/test_oracle_modes.py.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon site hook force-sets jax_platforms="axon,cpu" during import,
# overriding the env var — re-pin CPU or the first dispatch hangs on the
# TPU tunnel (tests/conftest.py does the same)
jax.config.update("jax_platforms", "cpu")

import numpy as np

from mast3r_slam_tpu.utils.oracle_scene import (OracleScene, make_trajectory,
                                                run_oracle_slam)

MODES = {
    "strict (joint, ladder 5..1, no plateau exit)": dict(
        refine_mode="joint", level_step=1, plateau_frac=0.0,
        ba_pixel_step=1, ba_compute_dtype="float32", ba_delta_norm=1e-8),
    "production (plus, ladder 5,3,1, plateau 1e-3)": dict(
        refine_mode="plus", level_step=2, plateau_frac=0.001),
    # EXACTLY what config/base.yaml ships — matcher cuts AND BA cuts jointly
    # (pixel_step 2, bf16 meas storage, bf16 Gram, delta_norm 1e-2 exit);
    # see scripts/ba_delta_study.py for the delta_norm ladder
    "production-defaults (all cuts, base.yaml)": dict(
        refine_mode="plus", level_step=2, plateau_frac=0.001,
        radius=2, proj_step=2, track_dilation_max=1,
        ba_pixel_step=2, ba_meas_dtype="bfloat16",
        ba_compute_dtype="bfloat16", ba_delta_norm=1e-2),
    "separable (ablation)": dict(
        refine_mode="separable", level_step=2, plateau_frac=0.001),
}


def main():
    hw = (64, 96)
    n_frames = 96
    seeds = (0, 1, 2)
    scene = OracleScene(seed=0)
    poses = make_trajectory(n_frames)

    print(f"oracle scene {hw}, {n_frames} frames, kf_every=4, "
          f"noise 0.3% depth + 0.02 desc, seeds {seeds}")
    rows = []
    for name, mode in MODES.items():
        at, ab, pe = [], [], []
        for s in seeds:
            r = run_oracle_slam(scene, poses, hw, mode, noise_seed=s)
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
              f"pix_err {pe - strict[3]:+6.3f} px")


if __name__ == "__main__":
    main()
