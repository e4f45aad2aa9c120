"""Frontend frame-to-keyframe tracking: Sim(3) Gauss-Newton on matched pointmaps.

TPU-native equivalent of the reference ``FrameTracker`` (reference:
mast3r_slam/tracker.py:15-317). The whole inner loop — residuals, analytic
Jacobians, whitened Huber IRLS, 7x7 normal equations, Cholesky solve, and the
left-multiplicative Sim(3) retraction — runs as a single jitted
``lax.while_loop`` on device. Cholesky failure is detected via NaN (no
exceptions under jit) and surfaces as ``ok=False`` → relocalization, matching
the reference's try/except → RELOC behavior (tracker.py:91-93).

Two measurement models, as in the reference:
- uncalibrated: residual ``[unit_ray(3), dist(1)]`` (opt_pose_ray_dist_sim3)
- calibrated:   residual ``[u, v, log z]`` against fixed keyframe pixels
  with per-iteration border/depth validity (opt_pose_calib_sim3)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mast3r_slam_tpu.ops import geometry, lie, matching
from mast3r_slam_tpu.ops.robust import huber
from mast3r_slam_tpu.slam.frame import Frame


def _solve_7x7(sqrt_info, r, J, huber_k):
    """Whitened-Huber IRLS normal equations → (tau (7,), cost, ok).

    ``sqrt_info, r (N, D)``; ``J (N, D, 7)``. Builds H = AᵀA on the MXU and
    solves with an on-device Cholesky.
    """
    whitened = sqrt_info * r
    robust = sqrt_info * jnp.sqrt(huber(whitened, huber_k))
    A = robust[..., None] * J           # (N, D, 7)
    b = robust * r                      # (N, D)
    Af = A.reshape(-1, 7)
    bf = b.reshape(-1)
    H = Af.T @ Af
    g = -(Af.T @ bf)
    cost = 0.5 * jnp.dot(bf, bf)
    Lc = jnp.linalg.cholesky(H)
    ok = jnp.all(jnp.isfinite(Lc))
    Lc_safe = jnp.where(ok, Lc, jnp.eye(7, dtype=H.dtype))
    tau = jax.scipy.linalg.cho_solve((Lc_safe, True), g)
    return tau, cost, ok


@partial(jax.jit, static_argnames=("max_iters",))
def opt_pose_ray_dist_sim3(
    Xf, Xk, T_WCf, T_WCk, Qk, valid,
    sigma_ray, sigma_dist, huber_k, max_iters, rel_error, delta_norm,
):
    """Uncalibrated pose solve. ``Xf, Xk (N, 3)``; ``Qk, valid (N, 1)``.

    Returns ``(T_WCf (8,), T_CkCf (8,), ok)``.
    """
    sq = valid * jnp.sqrt(Qk)
    sqrt_ray = (1.0 / sigma_ray) * sq
    sqrt_dist = (1.0 / sigma_dist) * sq
    sqrt_info = jnp.concatenate([jnp.tile(sqrt_ray, (1, 3)), sqrt_dist], axis=1)

    T_CkCf0 = lie.compose(lie.inv(T_WCk), T_WCf)
    rd_k = geometry.point_to_ray_dist(Xk)

    def step_fn(state):
        T, old_cost, it, _, ok = state
        Xf_Ck, dX_dT = geometry.act_Sim3(T, Xf, jacobian=True)
        rd_f, drd_dX = geometry.point_to_ray_dist(Xf_Ck, jacobian=True)
        r = rd_k - rd_f
        J = -jnp.einsum("nij,njk->nik", drd_dX, dX_dT)
        tau, new_cost, chol_ok = _solve_7x7(sqrt_info, r, J, huber_k)
        T_new = lie.retr(T, tau)
        done = (
            (jnp.abs((old_cost - new_cost) / jnp.maximum(old_cost, 1e-30)) < rel_error)
            | (jnp.linalg.norm(tau) < delta_norm)
            | ~chol_ok
        )
        return T_new, new_cost, it + 1, done, ok & chol_ok

    def cond_fn(state):
        _, _, it, done, _ = state
        return (it < max_iters) & ~done

    init = (T_CkCf0, jnp.asarray(jnp.inf, Xf.dtype), jnp.asarray(0), jnp.asarray(False), jnp.asarray(True))
    T_CkCf, _, _, _, ok = lax.while_loop(cond_fn, step_fn, init)
    T_WCf_new = lie.compose(T_WCk, T_CkCf)
    return T_WCf_new, T_CkCf, ok


@partial(jax.jit, static_argnames=("max_iters", "img_size"))
def opt_pose_calib_sim3(
    Xf, Xk, T_WCf, T_WCk, Qk, valid, meas_k, valid_meas_k, K, img_size,
    sigma_pixel, sigma_depth, huber_k, max_iters, rel_error, delta_norm,
    pixel_border, depth_eps,
):
    """Calibrated pose solve against fixed pixel+logdepth measurements."""
    sq = valid * jnp.sqrt(Qk)
    sqrt_pix = (1.0 / sigma_pixel) * sq
    sqrt_dep = (1.0 / sigma_depth) * sq
    sqrt_info = jnp.concatenate([jnp.tile(sqrt_pix, (1, 2)), sqrt_dep], axis=1)

    T_CkCf0 = lie.compose(lie.inv(T_WCk), T_WCf)

    def step_fn(state):
        T, old_cost, it, _, ok = state
        Xf_Ck, dX_dT = geometry.act_Sim3(T, Xf, jacobian=True)
        pzf, dpz_dX, valid_proj = geometry.project_calib(
            Xf_Ck, K, img_size, jacobian=True, border=pixel_border, z_eps=depth_eps
        )
        valid2 = valid_proj & valid_meas_k
        info2 = jnp.where(valid2, sqrt_info, 0.0)
        r = meas_k - pzf
        J = -jnp.einsum("nij,njk->nik", dpz_dX, dX_dT)
        tau, new_cost, chol_ok = _solve_7x7(info2, r, J, huber_k)
        T_new = lie.retr(T, tau)
        done = (
            (jnp.abs((old_cost - new_cost) / jnp.maximum(old_cost, 1e-30)) < rel_error)
            | (jnp.linalg.norm(tau) < delta_norm)
            | ~chol_ok
        )
        return T_new, new_cost, it + 1, done, ok & chol_ok

    def cond_fn(state):
        _, _, it, done, _ = state
        return (it < max_iters) & ~done

    init = (T_CkCf0, jnp.asarray(jnp.inf, Xf.dtype), jnp.asarray(0), jnp.asarray(False), jnp.asarray(True))
    T_CkCf, _, _, _, ok = lax.while_loop(cond_fn, step_fn, init)
    T_WCf_new = lie.compose(T_WCk, T_CkCf)
    return T_WCf_new, T_CkCf, ok


@jax.jit
def fused_match_confidence(Qff, idx_f2k, Qkf):
    """Qk = sqrt(Qff[idx] * Qkf) — geometric-mean fused descriptor confidence."""
    return jnp.sqrt(Qff[idx_f2k] * Qkf)


@jax.jit
def pose_magnitude(T):
    """(|t|, rotation angle) of a Sim3 — used by the quality service."""
    t = T[..., 0:3]
    w = jnp.clip(jnp.abs(T[..., 6]), 0.0, 1.0)
    theta = 2.0 * jnp.arccos(w)
    return jnp.linalg.norm(t, axis=-1), theta


class FrameTracker:
    """Drives per-frame tracking: model match → masks → pose solve → fusion.

    API parity with the reference FrameTracker: ``track(frame)`` returns
    ``(new_kf, match_info, try_reloc)``.
    """

    def __init__(self, model, keyframes, cfg, quality_service=None):
        self.model = model              # models.inference.MASt3RInference
        self.keyframes = keyframes
        self.cfg = cfg["tracking"]
        self.use_calib = cfg["use_calib"]
        self.full_cfg = cfg
        self.quality_service = quality_service
        self.idx_f2k = None             # warm-start correspondence across frames

    def reset_idx_f2k(self):
        self.idx_f2k = None

    def track(self, frame: Frame):
        cfg = self.cfg
        keyframe = self.keyframes.last_keyframe()

        (idx_f2k, valid_match_k, Xff, Cff, Qff, Xkf, Ckf, Qkf) = (
            self.model.match_asymmetric(frame, keyframe, idx_i2j_init=self.idx_f2k)
        )
        self.idx_f2k = idx_f2k
        idx0 = idx_f2k[0]
        valid_match = valid_match_k[0]

        Qk = fused_match_confidence(Qff[0], idx0, Qkf[0])

        frame.update_pointmap(Xff[0], Cff[0], cfg["filtering_mode"],
                              cfg["filtering_score"])

        img_size = frame.img_true_shape
        K = self.keyframes.K if self.use_calib else None

        Xf, Xk, T_WCf, T_WCk, Cf, Ck, meas_k, valid_meas_k = self._points_poses(
            frame, keyframe, idx0, img_size, K
        )

        valid_opt = (
            valid_match
            & (Cf > cfg["C_conf"])
            & (Ck > cfg["C_conf"])
            & (Qk > cfg["Q_conf"])
        )
        valid_kf = valid_match & (Qk > cfg["Q_conf"])

        match_frac = float(jnp.mean(valid_opt.astype(jnp.float32)))
        if match_frac < cfg["min_match_frac"]:
            print(f"Skipped frame {frame.frame_id}")
            return False, [], True

        if not self.use_calib:
            T_WCf_new, T_CkCf, ok = opt_pose_ray_dist_sim3(
                Xf, Xk, T_WCf, T_WCk, Qk, valid_opt.astype(Xf.dtype),
                cfg["sigma_ray"], cfg["sigma_dist"], cfg["huber"],
                int(cfg["max_iters"]), cfg["rel_error"], cfg["delta_norm"],
            )
        else:
            T_WCf_new, T_CkCf, ok = opt_pose_calib_sim3(
                Xf, Xk, T_WCf, T_WCk, Qk, valid_opt.astype(Xf.dtype),
                meas_k, valid_meas_k, K, tuple(int(v) for v in img_size),
                cfg["sigma_pixel"], cfg["sigma_depth"], cfg["huber"],
                int(cfg["max_iters"]), cfg["rel_error"], cfg["delta_norm"],
                cfg["pixel_border"], cfg["depth_eps"],
            )
        if not bool(ok):
            print(f"Cholesky failed {frame.frame_id}")
            return False, [], True

        self._submit_quality(
            frame, keyframe, T_CkCf, Xf, Xk, Ck, Qk, valid_kf, meas_k,
            valid_meas_k, K, img_size
        )

        frame.T_WC = T_WCf_new

        # Update keyframe pointmap with frame observations mapped into its frame.
        Xkk = lie.act(T_CkCf[None], Xkf[0])
        keyframe.update_pointmap(Xkk, Ckf[0], cfg["filtering_mode"],
                                 cfg["filtering_score"])
        self.keyframes[len(self.keyframes) - 1] = keyframe

        # Keyframe selection: low coverage in either direction spawns a new KF.
        n_valid = float(jnp.sum(valid_kf.astype(jnp.float32)))
        match_frac_k = n_valid / valid_kf.size
        unique = np.unique(np.asarray(idx0)[np.asarray(valid_match[:, 0])]).size
        unique_frac_f = unique / valid_kf.size
        new_kf = min(match_frac_k, unique_frac_f) < cfg["match_frac_thresh"]
        if new_kf:
            self.reset_idx_f2k()

        return (
            new_kf,
            [
                keyframe.X_canon,
                keyframe.get_average_conf(),
                frame.X_canon,
                frame.get_average_conf(),
                Qkf,
                Qff,
            ],
            False,
        )

    def _points_poses(self, frame, keyframe, idx_f2k, img_size, K):
        Xf = frame.X_canon
        Xk = keyframe.X_canon
        T_WCf = frame.T_WC
        T_WCk = keyframe.T_WC
        Cf = frame.get_average_conf()
        Ck = keyframe.get_average_conf()

        meas_k = None
        valid_meas_k = None
        if self.use_calib:
            img_size = tuple(int(v) for v in img_size)
            Xf = geometry.constrain_points_to_ray(img_size, Xf, K)
            Xk = geometry.constrain_points_to_ray(img_size, Xk, K)
            uv_k = geometry.get_pixel_coords(img_size, dtype=Xf.dtype)
            valid_meas_k = Xk[..., 2:3] > self.cfg["depth_eps"]
            logz = jnp.where(valid_meas_k, jnp.log(jnp.clip(Xk[..., 2:3], 1e-12)), 0.0)
            meas_k = jnp.concatenate([uv_k, logz], axis=-1)
            meas_k = jnp.where(valid_meas_k, meas_k, 0.0)

        return Xf[idx_f2k], Xk, T_WCf, T_WCk, Cf[idx_f2k], Ck, meas_k, valid_meas_k

    def _submit_quality(self, frame, keyframe, T_CkCf, Xf, Xk, Ck, Qk, valid_kf,
                        meas_k, valid_meas_k, K, img_size):
        """Assemble and enqueue the pointmap-quality job (reference
        tracker.py:95-145); no-op without a quality service."""
        if self.quality_service is None:
            return
        try:
            Xf_Ck = lie.act(T_CkCf[None], Xf)
            if self.use_calib:
                pzf, valid_proj = geometry.project_calib(
                    Xf_Ck, K, tuple(int(v) for v in img_size)
                )
                d = meas_k - pzf
                lam = (self.cfg["sigma_pixel"] ** 2) / (
                    self.cfg["sigma_depth"] ** 2 + 1e-8
                )
                r_pix = jnp.sqrt(
                    d[..., 0] ** 2 + d[..., 1] ** 2 + lam * d[..., 2] ** 2
                )
                valid_submit = (valid_kf & valid_proj & valid_meas_k)[..., 0]
            else:
                rd_k = geometry.point_to_ray_dist(Xk)
                rd_f = geometry.point_to_ray_dist(Xf_Ck)
                r_pix = jnp.linalg.norm(rd_k - rd_f, axis=-1)
                valid_submit = valid_kf[..., 0]

            t_norm, theta = pose_magnitude(T_CkCf)
            H, W = (int(v) for v in img_size)
            self.quality_service.submit(
                {
                    "kf_id": len(self.keyframes) - 1,
                    "frame_id": int(keyframe.frame_id),
                    "H": H,
                    "W": W,
                    "valid_kf": np.asarray(valid_submit),
                    "r_pix": np.asarray(r_pix).reshape(-1),
                    "Ck": np.asarray(Ck).reshape(-1),
                    "Qk": np.asarray(Qk).reshape(-1),
                    "t_norm": float(t_norm),
                    "theta": float(theta),
                }
            )
        except Exception as e:  # quality is best-effort; never break tracking
            print(f"ERROR in quality submission: {e}")
