"""Analytic oracle scene: exact multi-view-consistent pointmaps + descriptors.

End-to-end validation tool for the SLAM math (matcher modes, Sim(3) GN pose
solve, factor-graph BA) with KNOWN ground truth: a smooth analytic height
field is ray-cast exactly from any camera pose, so every frame's pointmap,
every cross-view pointmap ("keyframe seen from the frame's coordinates" —
what the two-view network predicts), and every ground-truth correspondence
is available in closed form. Controlled noise stands in for network
prediction error.

This isolates exactly the part of the system the speed-motivated matcher
deviations touch (`matching.refine_mode`, `level_step`, `plateau_frac` —
PARITY.md): with oracle inputs, any trajectory-error difference between
strict reference settings and the production fast settings is attributable
to the matcher semantics, not to the network. Used by
scripts/mode_ate_study.py (results in docs/PERFORMANCE.md) and pinned by
tests/test_oracle_modes.py.

Conventions match the framework: OpenCV camera (+z forward), Sim(3) poses
``[t, q(xyzw), s]`` (ops/lie.py), pointmaps row-major ``(H*W, 3)``.
"""

from __future__ import annotations

import numpy as np


class OracleScene:
    """Smooth height-field world ``z = f(x, y)`` with an analytic descriptor
    field on the surface. All math is float64 numpy for exactness; outputs
    are float32."""

    def __init__(self, seed=0, desc_dim=24, base_depth=2.5):
        rng = np.random.default_rng(seed)
        self.base = base_depth
        # relief must be genuinely 3D: a near-planar world leaves the Sim(3)
        # system with weak scale/normal-translation modes and the (reference-
        # parity, undamped) GN pose solver can spiral on them — real scenes
        # don't have this degeneracy. |∇f| stays < ~1 in the typical case so
        # the Newton ray-cast converges for mostly-forward rays.
        self.amps = rng.uniform(0.1, 0.22, 4)
        self.freqs = rng.uniform(0.5, 1.3, (4, 2))
        self.phases = rng.uniform(0, 2 * np.pi, 4)
        # descriptor field: desc_dim sinusoids over the surface, with a
        # log-spread of spatial frequencies (low channels disambiguate the
        # coarse window levels, high channels give per-pixel discrimination
        # like trained local features do)
        self.dfreq = np.exp(rng.uniform(np.log(1.0), np.log(24.0),
                                        (desc_dim, 2)))
        self.dphase = rng.uniform(0, 2 * np.pi, desc_dim)

    # -- surface ------------------------------------------------------------
    def height(self, x, y):
        z = np.full(np.broadcast(x, y).shape, self.base, np.float64)
        for a, (fx, fy), p in zip(self.amps, self.freqs, self.phases):
            z = z + a * np.sin(fx * x + fy * y + p)
        return z

    def height_grad(self, x, y):
        gx = np.zeros(np.broadcast(x, y).shape, np.float64)
        gy = np.zeros_like(gx)
        for a, (fx, fy), p in zip(self.amps, self.freqs, self.phases):
            c = a * np.cos(fx * x + fy * y + p)
            gx += fx * c
            gy += fy * c
        return gx, gy

    def descriptors(self, hits):
        """L2-normalized descriptors at world points ``hits (N, 3)``."""
        x, y = hits[:, 0:1], hits[:, 1:2]
        d = np.sin(x * self.dfreq[:, 0] + y * self.dfreq[:, 1] + self.dphase)
        d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
        return d.astype(np.float32)

    # -- cameras ------------------------------------------------------------
    @staticmethod
    def intrinsics(hw, fov_scale=1.1):
        H, W = hw
        f = fov_scale * max(H, W)
        K = np.array([[f, 0, (W - 1) / 2.0],
                      [0, f, (H - 1) / 2.0],
                      [0, 0, 1.0]], np.float64)
        return K

    def raycast(self, T_WC, K, hw, newton_iters=25):
        """Exact pointmap from Sim(3) pose ``T_WC (8,)``.

        Returns ``(X_cam (H*W, 3) float32, hits_world (H*W, 3) float64)``.
        Solves ``o_z + t d_z = f(o_x + t d_x, o_y + t d_y)`` per pixel by
        Newton; with ``d_z`` bounded below by the FOV and ``|∇f| < 1`` the
        iteration is a contraction (validated to <1e-9 residual in tests).
        """
        H, W = hw
        R, tvec, s = _pose_Rts(T_WC)
        u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64), indexing="xy")
        d_cam = np.stack([(u - K[0, 2]) / K[0, 0],
                          (v - K[1, 2]) / K[1, 1],
                          np.ones_like(u)], axis=-1).reshape(-1, 3)
        d_w = d_cam @ R.T                         # row i = R @ d_cam[i]
        o = tvec                                  # camera center in world
        t = np.full(d_w.shape[0], self.base - o[2], np.float64)
        t = np.maximum(t / np.maximum(d_w[:, 2], 0.2), 0.1)
        for _ in range(newton_iters):
            px = o[0] + t * d_w[:, 0]
            py = o[1] + t * d_w[:, 1]
            pz = o[2] + t * d_w[:, 2]
            g = pz - self.height(px, py)
            gx, gy = self.height_grad(px, py)
            dg = d_w[:, 2] - gx * d_w[:, 0] - gy * d_w[:, 1]
            t = t - g / np.maximum(dg, 0.2)
        hits = o[None, :] + t[:, None] * d_w
        X_cam = self.world_to_cam(hits, T_WC)
        return X_cam.astype(np.float32), hits

    @staticmethod
    def world_to_cam(P_w, T_WC):
        """``T_WC^{-1} · P_w`` without jax round-trips."""
        R, tvec, s = _pose_Rts(T_WC)
        return ((P_w - tvec) @ R) / s

    @staticmethod
    def project(P_cam, K, hw):
        """Pixel coords + linear indices of camera-frame points; ``valid``
        marks in-image, in-front points."""
        H, W = hw
        z = P_cam[:, 2]
        ok = z > 1e-6
        zs = np.where(ok, z, 1.0)
        uu = K[0, 0] * P_cam[:, 0] / zs + K[0, 2]
        vv = K[1, 1] * P_cam[:, 1] / zs + K[1, 2]
        ui = np.clip(np.round(uu).astype(np.int64), 0, W - 1)
        vi = np.clip(np.round(vv).astype(np.int64), 0, H - 1)
        ok &= (uu >= -0.5) & (uu < W - 0.5) & (vv >= -0.5) & (vv < H - 0.5)
        return ui + W * vi, ok


def _pose_Rts(T_WC):
    """Pure-numpy pose decompose (no jax dispatch — keeps the oracle usable
    even when no backend can initialize)."""
    T = np.asarray(T_WC, np.float64)
    x, y, z, w = T[3:7] / np.linalg.norm(T[3:7])
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    return R, T[0:3], float(T[7])


def make_trajectory(n_frames, seed=1, loop=True, rot_amp=0.06,
                    trans_amp=(0.45, 0.3, 0.12)):
    """Smooth Sim(3) camera path (scale 1) that returns near its start.

    Rotations stay small (<~4°) so the whole surface remains in view; the
    path's second half retraces toward the start so a loop-closure edge
    (first keyframe, last keyframe) is geometrically meaningful.
    """
    rng = np.random.default_rng(seed)
    ph = rng.uniform(0, 2 * np.pi, 3)
    poses = []
    for i in range(n_frames):
        th = 2 * np.pi * i / n_frames if loop else np.pi * i / n_frames
        t = np.array([trans_amp[0] * np.sin(th),
                      trans_amp[1] * np.sin(th) * np.cos(th),
                      trans_amp[2] * np.sin(2 * th)])
        ang = np.array([rot_amp * np.sin(th + ph[0]),
                        rot_amp * np.sin(2 * th + ph[1]),
                        0.5 * rot_amp * np.sin(th + ph[2])])
        q = _euler_to_quat(ang)
        poses.append(np.concatenate([t, q, [1.0]]).astype(np.float32))
    return poses


def _euler_to_quat(ang):
    """xyz-intrinsic small-angle Euler → xyzw quaternion."""
    hx, hy, hz = ang / 2.0
    qx = np.array([np.sin(hx), 0, 0, np.cos(hx)])
    qy = np.array([0, np.sin(hy), 0, np.cos(hy)])
    qz = np.array([0, 0, np.sin(hz), np.cos(hz)])

    def mul(a, b):
        x1, y1, z1, w1 = a
        x2, y2, z2, w2 = b
        return np.array([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ])

    return mul(mul(qx, qy), qz)


def run_oracle_slam(scene, poses, hw, mode, noise_seed=0, kf_every=4,
                    sigma_point=0.003, sigma_desc=0.02, ba_iters=30,
                    sigma_ray=0.003, sigma_dist=10.0, use_calib=False,
                    sigma_pixel=1.0, sigma_depth=10.0, debug=False):
    """Frame-to-keyframe tracking + keyframe BA over oracle inputs, using the
    PRODUCTION math components (ops/matching.py, tracker's Sim(3) GN solver,
    slam/factor_graph.py) with the network replaced by exact geometry +
    controlled noise.

    ``mode``: dict with ``refine_mode``, ``level_step``, ``plateau_frac``
    (the speed-deviation knobs under study; radius/dilation stay at the
    production 3/5). ``use_calib`` switches the frame solve AND the BA to
    the calibrated (pixel + log-depth) residuals with the scene's exact
    intrinsics, mirroring track_core's calib branch (ray-constrained
    pointmaps, measured [u, v, log z] from the keyframe canonical map).
    Returns a dict of metrics: keyframe ATE before/after BA, mean
    matched-pixel error vs the ground-truth correspondence, and the
    estimated keyframe poses.
    """
    import jax
    import jax.numpy as jnp

    from mast3r_slam_tpu.ops import geometry, lie, matching
    from mast3r_slam_tpu.slam import factor_graph as FG
    from mast3r_slam_tpu.slam.tracker import (opt_pose_calib_sim3,
                                              opt_pose_ray_dist_sim3)

    H, W = hw
    n = H * W
    K = scene.intrinsics(hw)
    rng = np.random.default_rng(noise_seed)

    # oracle per-frame data (noise emulates network prediction error:
    # additive 3D noise scaled by depth, descriptor jitter re-normalized)
    Xs, Ds, hits_all = [], [], []
    for T in poses:
        X, hits = scene.raycast(T, K, hw)
        z = X[:, 2:3]
        Xn = X + (sigma_point * z * rng.standard_normal(X.shape)
                  ).astype(np.float32)
        D = scene.descriptors(hits)
        Dn = D + sigma_desc * rng.standard_normal(D.shape).astype(np.float32)
        Dn /= np.linalg.norm(Dn, axis=-1, keepdims=True) + 1e-12
        Xs.append(Xn)
        Ds.append(Dn)
        hits_all.append(hits)

    match_kw = dict(
        radius=int(mode.get("radius", 3)),
        dilation_max=int(mode.get("dilation_max", 5)),
        max_iter=int(mode.get("max_iter", 10)),
        refine_mode=mode.get("refine_mode", "plus"),
        level_step=int(mode.get("level_step", 2)),
        plateau_frac=float(mode.get("plateau_frac", 0.001)),
        proj_step=int(mode.get("proj_step", 1)),
    )
    # tracker-only overrides (``track_*`` keys): frame-to-keyframe matching
    # is warm-started from the previous frame's converged correspondence, so
    # it can tolerate a shallower refine ladder than the cold-start backend
    # edges — price that separately before making it a production default
    track_kw = dict(match_kw)
    for k_ in ("radius", "dilation_max", "max_iter", "level_step",
               "proj_step"):
        if f"track_{k_}" in mode:
            track_kw[k_] = int(mode[f"track_{k_}"])

    Kj = jnp.asarray(K, jnp.float32)

    @jax.jit
    def step(Xff, Xkf_in_f, Dff, Dkf, Xk_can, T_init, T_k, idx_init):
        idx, valid = matching.match(
            Xff.reshape(1, H, W, 3), Xkf_in_f.reshape(1, H, W, 3),
            Dff.reshape(1, H, W, -1), Dkf.reshape(1, H, W, -1),
            idx_1_to_2_init=idx_init[None], **track_kw)
        idx0 = idx[0]
        Qk = jnp.full((n, 1), 2.0)
        vm = valid[0].astype(jnp.float32)
        if use_calib:
            # track_core's calib branch: ray-constrained pointmaps, fixed
            # [u, v, log z] measurements from the keyframe canonical map
            Xf_all = geometry.constrain_points_to_ray(hw, Xff, Kj)
            Xk_c = geometry.constrain_points_to_ray(hw, Xk_can, Kj)
            Xf = Xf_all[idx0]
            uv_k = geometry.get_pixel_coords(hw, dtype=Xf.dtype)
            valid_meas = Xk_c[..., 2:3] > 1e-6
            logz = jnp.where(valid_meas,
                             jnp.log(jnp.clip(Xk_c[..., 2:3], 1e-12)), 0.0)
            meas_k = jnp.where(valid_meas,
                               jnp.concatenate([uv_k, logz], axis=-1), 0.0)
            T_new, T_CkCf, ok = opt_pose_calib_sim3(
                Xf, Xk_c, T_init, T_k, Qk, vm, meas_k, valid_meas, Kj, hw,
                sigma_pixel, sigma_depth, 1.345, 50, 1e-3, 1e-3, -10, 1e-6)
        else:
            Xf = Xff[idx0]
            T_new, T_CkCf, ok = opt_pose_ray_dist_sim3(
                Xf, Xk_can, T_init, T_k, Qk, vm,
                sigma_ray, sigma_dist, 1.345, 50, 1e-3, 1e-3)
        return idx0, valid[0, :, 0], T_new, ok

    def cross_map(k_hits, T_frame):
        X = scene.world_to_cam(k_hits, T_frame).astype(np.float32)
        return X + (sigma_point * X[:, 2:3]
                    * rng.standard_normal(X.shape)).astype(np.float32)

    # -- tracking ------------------------------------------------------------
    kf_ids = [0]
    T_kf_est = [np.asarray(poses[0])]            # gauge: first pose is GT
    T_prev = jnp.asarray(poses[0])
    idx_warm = jnp.arange(n, dtype=jnp.int32)
    k = 0
    promote_due = False
    pix_err_sum, pix_err_cnt = 0.0, 0
    n_skipped = 0
    n_relocs = 0
    for f in range(1, len(poses)):
        # cadence flag set BEFORE the solve so a skipped boundary frame
        # still promotes the next successfully tracked frame
        promote_due = promote_due or (f % kf_every == 0)
        Xkf_in_f = cross_map(hits_all[k], poses[f])
        idx0, vm, T_new, ok = step(
            jnp.asarray(Xs[f]), jnp.asarray(Xkf_in_f), jnp.asarray(Ds[f]),
            jnp.asarray(Ds[k]), jnp.asarray(Xs[k]), T_prev,
            jnp.asarray(T_kf_est[-1]), idx_warm)
        # matched-pixel error vs ground truth (frame pixel that actually
        # sees keyframe pixel's world point)
        gt_idx, gt_ok = scene.project(
            scene.world_to_cam(hits_all[k], poses[f]), K, hw)
        sel = np.asarray(vm) & gt_ok
        if sel.any():
            d = np.abs(np.asarray(idx0)[sel] % W - gt_idx[sel] % W) + \
                np.abs(np.asarray(idx0)[sel] // W - gt_idx[sel] // W)
            pix_err_sum += float(d.sum())
            pix_err_cnt += int(sel.sum())
        if not bool(ok):
            if debug:
                print(f"  frame {f} vs kf {k}: first attempt failed",
                      flush=True)
            # production semantics: solver failure → relocalization. The
            # reloc path re-matches fresh and solves from the keyframe pose
            # (relative identity init); emulate exactly that retry here.
            idx0, vm, T_new, ok = step(
                jnp.asarray(Xs[f]), jnp.asarray(Xkf_in_f), jnp.asarray(Ds[f]),
                jnp.asarray(Ds[k]), jnp.asarray(Xs[k]),
                jnp.asarray(T_kf_est[-1]), jnp.asarray(T_kf_est[-1]),
                jnp.arange(n, dtype=jnp.int32))
            if not bool(ok):
                if debug:
                    print(f"  frame {f} vs kf {k}: reloc retry failed too",
                          flush=True)
                n_skipped += 1           # reloc failed too: frame dropped
                continue
            n_relocs += 1
        T_prev = T_new
        idx_warm = idx0
        # keyframe cadence, but like production the promotion happens on a
        # SUCCESSFULLY tracked frame (a missed boundary promotes the next
        # good frame instead of deadlocking on a stale keyframe)
        if promote_due:
            kf_ids.append(f)
            T_kf_est.append(np.asarray(T_new))
            k = f
            idx_warm = jnp.arange(n, dtype=jnp.int32)
            promote_due = False

    # -- keyframe BA with a loop-closure edge --------------------------------
    # loop partner chosen by ground-truth view overlap (production gates
    # loop edges by retrieval score; an unconditioned low-overlap edge would
    # feed the BA garbage no real system would accept)
    m = len(kf_ids)
    best_pair, best_ov = None, 0.0
    for a in range(max(m - m // 3, 1), m):
        for b in range(min(m // 3 + 1, m)):
            if abs(a - b) <= 1:
                continue
            Xab = scene.world_to_cam(hits_all[kf_ids[a]], poses[kf_ids[b]])
            _, ok_ab = scene.project(Xab, K, hw)
            if ok_ab.mean() > best_ov:
                best_ov, best_pair = ok_ab.mean(), (a, b)
    pairs = [(a, a + 1) for a in range(m - 1)]
    if best_pair is not None and best_ov > 0.4:
        pairs.append(best_pair)
    ii_l, jj_l, idx_l, val_l = [], [], [], []

    @jax.jit
    def edge_match(Xi_img, Xj_in_i, Di, Dj):
        return matching.match(
            Xi_img.reshape(1, H, W, 3), Xj_in_i.reshape(1, H, W, 3),
            Di.reshape(1, H, W, -1), Dj.reshape(1, H, W, -1), **match_kw)

    for (a, b) in pairs:
        for (i, j) in ((a, b), (b, a)):
            fi, fj = kf_ids[i], kf_ids[j]
            Xj_in_i = cross_map(hits_all[fj], poses[fi])
            idx, valid = edge_match(jnp.asarray(Xs[fi]),
                                    jnp.asarray(Xj_in_i),
                                    jnp.asarray(Ds[fi]), jnp.asarray(Ds[fj]))
            if float(valid.mean()) < 0.2:
                continue          # production min-match gate on new factors
            ii_l.append(i)
            jj_l.append(j)
            idx_l.append(np.asarray(idx[0]))
            val_l.append(np.asarray(valid[0]))

    E = len(ii_l)
    if E == 0:
        gt_kf = [poses[f] for f in kf_ids]
        return {
            "kf_ids": kf_ids, "n_skipped": n_skipped, "n_relocs": n_relocs,
            "ate_track": ate_rmse_points(T_kf_est, gt_kf),
            "ate_ba": ate_rmse_points(T_kf_est, gt_kf),
            "mean_pix_err": pix_err_sum / max(pix_err_cnt, 1),
            "T_kf_track": np.stack(T_kf_est), "T_kf_ba": np.stack(T_kf_est),
        }
    E_pad = -(-E // 8) * 8
    ii = np.zeros(E_pad, np.int32)
    jj = np.zeros(E_pad, np.int32)
    idx_e = np.zeros((E_pad, n), np.int32)
    val_e = np.zeros((E_pad, n, 1), bool)
    ii[:E] = ii_l
    jj[:E] = jj_l
    jj[E:] = 1  # padded edges must not be self-loops; masked out anyway
    idx_e[:E] = np.stack(idx_l)
    val_e[:E] = np.stack(val_l)
    mask_e = np.zeros(E_pad, np.float32)
    mask_e[:E] = 1.0

    X_all = jnp.asarray(np.stack([Xs[f] for f in kf_ids]))
    Cavg = jnp.ones((m, n, 1), jnp.float32)
    Q_e = jnp.full((E_pad, n, 1), 2.0, jnp.float32)
    free = jnp.asarray(np.arange(m) > 0)
    T_in = jnp.asarray(np.stack(T_kf_est))
    if use_calib:
        # the reference constrains every pointmap through the pixel rays
        # before the calib solve (global_opt.py:145-150)
        X_all = jax.vmap(
            lambda X: geometry.constrain_points_to_ray(hw, X, Kj))(X_all)
    # ``ba_delta_norm``: the BA early-exit threshold on an ACCEPTED step's
    # ‖dx‖ (reference exits at delta_norm=1e-8, i.e. effectively never inside
    # max_iters=10 — gn_kernels.cu:1217-1222). A larger threshold trades BA
    # iterations for trajectory error; price it here before shipping.
    ba_delta = float(mode.get("ba_delta_norm", 1e-8))
    # ``ba_compute_dtype``: Gram/system accumulation dtype of the BA solve
    # (production bfloat16, eval configs pin float32 — config/base.yaml)
    ba_cdt = str(mode.get("ba_compute_dtype", "bfloat16"))
    if use_calib:
        meas = FG.precompute_meas_calib(
            X_all, Cavg, jnp.asarray(ii), jnp.asarray(jj),
            jnp.asarray(idx_e), jnp.asarray(val_e), Q_e, W, 1e-6, 0.0, 1.5,
            pixel_step=int(mode.get("ba_pixel_step", 1)))
        if mode.get("ba_meas_dtype") == "bfloat16":
            meas = tuple(ch.astype(jnp.bfloat16) for ch in meas)
        T_out = FG.gauss_newton_calib(
            T_in, meas, Kj, jnp.asarray(ii), jnp.asarray(jj),
            jnp.asarray(mask_e), free, hw, -10, 1e-6, sigma_pixel,
            sigma_depth, ba_iters, ba_delta, compute_dtype=ba_cdt)
    else:
        meas = FG.precompute_meas_rays(
            X_all, Cavg, jnp.asarray(ii), jnp.asarray(jj),
            jnp.asarray(idx_e), jnp.asarray(val_e), Q_e, 0.0, 1.5,
            pixel_step=int(mode.get("ba_pixel_step", 1)))
        if mode.get("ba_meas_dtype") == "bfloat16":
            # measured-channel storage quantization under study (the solve
            # widens to f32; only the stored measurements are rounded)
            meas = tuple(ch.astype(jnp.bfloat16) for ch in meas)
        T_out = FG.gauss_newton_rays(
            T_in, meas, jnp.asarray(ii), jnp.asarray(jj),
            jnp.asarray(mask_e), free, sigma_ray, sigma_dist, ba_iters,
            ba_delta, compute_dtype=ba_cdt)
    T_out = np.asarray(T_out)

    gt_kf = [poses[f] for f in kf_ids]
    return {
        "kf_ids": kf_ids,
        "n_skipped": n_skipped,
        "n_relocs": n_relocs,
        "ate_track": ate_rmse_points(T_kf_est, gt_kf),
        "ate_ba": ate_rmse_points(list(T_out), gt_kf),
        "mean_pix_err": pix_err_sum / max(pix_err_cnt, 1),
        "T_kf_track": np.stack(T_kf_est),
        "T_kf_ba": T_out,
    }


def ate_rmse_points(est, gt, with_scale=True):
    """ATE RMSE between pose-position arrays after Umeyama alignment,
    via the framework's own scorer math (evaluation.umeyama_alignment)."""
    from mast3r_slam_tpu.evaluation import umeyama_alignment

    P = np.asarray([p[:3] for p in est], np.float64)
    G = np.asarray([g[:3] for g in gt], np.float64)
    s, R, t = umeyama_alignment(P, G, with_scale=with_scale)
    P2 = s * (P @ R.T) + t
    return float(np.sqrt(np.mean(np.sum((P2 - G) ** 2, axis=-1))))
