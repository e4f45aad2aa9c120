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


def _normal_7x7(sqrt_info, r, J, huber_k):
    """Whitened-Huber IRLS normal equations → (H (7, 7), g (7,), cost).

    STRUCTURE-OF-ARRAYS layout: ``sqrt_info, r`` are length-D lists of
    ``(N,)`` channel vectors and ``J`` is a D x 7 nested list of ``(N,)``
    vectors. TPU rationale: the (N, D, 7) array-of-structs layout puts the
    7-dim in lanes (7/128 = 5% utilization — measured 18 GB/s and 6.7 ms per
    GN iteration); channels-first keeps every elementwise op lane-parallel
    over N and feeds the MXU one (7, D*N) @ (D*N, 7) contraction.
    """
    D = len(r)
    robust, b_rows = [], []
    for i in range(D):
        whitened = sqrt_info[i] * r[i]
        rob = sqrt_info[i] * jnp.sqrt(huber(whitened, huber_k))
        robust.append(rob)
        b_rows.append(rob * r[i])
    A = jnp.stack([
        jnp.concatenate([robust[i] * J[i][k] for i in range(D)])
        for k in range(7)
    ])                                   # (7, D*N)
    bf = jnp.concatenate(b_rows)         # (D*N,)
    H = jax.lax.dot_general(A, A, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = -(A @ bf)
    cost = 0.5 * jnp.dot(bf, bf)
    return H, g, cost


def _solve_damped_7x7(H, g, lam):
    """Cholesky solve of ``(H + λ·diag(H)) τ = g`` → (tau, chol_ok)."""
    Hd = H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-12))
    Lc = jnp.linalg.cholesky(Hd)
    ok = jnp.all(jnp.isfinite(Lc))
    Lc_safe = jnp.where(ok, Lc, jnp.eye(7, dtype=H.dtype))
    tau = jax.scipy.linalg.cho_solve((Lc_safe, True), g)
    return jnp.where(ok, tau, 0.0), ok


def _lm_pose_loop(system, T0, max_iters, rel_error, delta_norm,
                  lam0=1e-8, accept_slack=1e-6):
    """Levenberg-Marquardt accept/reject driver for the 7x7 pose solvers.

    The reference tracker (tracker.py:208-266) takes plain Gauss-Newton
    steps with no step control; on weakly-conditioned geometry (low-relief
    scenes, Huber-saturated residuals) a full step ascends and the iterate
    spirals — scale → 0 within a few iterations from a ~3 cm-off init on
    the oracle scene, costing ~35% of frames to skip/RELOC. The cost is
    already evaluated every iteration, so true LM costs nothing extra:

    - accept (candidate cost ≤ cost·(1+slack)): keep it, λ ← max(λ0, λ/4);
    - reject: keep the previous iterate, λ ← 10λ, re-solve the SAME
      normal equations with stiffer damping (the 7x7 re-solve is free
      next to the 196k-pixel residual evaluation).

    The slack accepts numerically-equal candidates so a solve that starts
    AT the optimum converges instead of rejecting forever. When every step
    accepts at λ0 ≈ 0 the iterate sequence is the reference's GN
    trajectory. ``ok`` is False only when the system itself is broken
    (non-finite cost / Cholesky failure) — divergence can no longer
    produce a garbage pose, the iterate is always the best one seen.
    Deviation from the reference documented in PARITY.md.
    """
    H0, g0, c0, ok0 = system(T0)
    # reference singularity signal (tracker.py:91-93 Cholesky-except →
    # RELOC): a rank-deficient initial system flags ok=False even though
    # the damped LM solves below would paper over it
    ok0 &= jnp.all(jnp.isfinite(jnp.linalg.cholesky(H0)))

    def step_fn(state):
        T_ref, cost_ref, H, g, lam, it, _, acc = state
        tau, chol_ok = _solve_damped_7x7(H, g, lam)
        T_cand = lie.retr(T_ref, tau)
        H_c, g_c, cost_c, sys_ok = system(T_cand)
        accept = chol_ok & sys_ok & (cost_c <= cost_ref * (1.0 + accept_slack))
        T_ref = jnp.where(accept, T_cand, T_ref)
        H = jnp.where(accept, H_c, H)
        g = jnp.where(accept, g_c, g)
        new_cost = jnp.where(accept, cost_c, cost_ref)
        lam = jnp.where(accept, jnp.maximum(lam0, lam * 0.25), lam * 10.0)
        done = accept & (
            (jnp.abs((cost_ref - new_cost)
                     / jnp.maximum(cost_ref, 1e-30)) < rel_error)
            | (jnp.linalg.norm(tau) < delta_norm)
        )
        # stuck: damping grew past any useful scale without an accept
        done |= lam > 1e8
        return T_ref, new_cost, H, g, lam, it + 1, done, acc | accept

    def cond_fn(state):
        *_, it, done, _ = state
        return (it < max_iters) & ~done

    lam_init = jnp.asarray(lam0, jnp.float32)
    init = (T0, c0, H0, g0, lam_init, jnp.asarray(0), jnp.asarray(False),
            jnp.asarray(False))
    T, cost, *_, accepted_any = lax.while_loop(cond_fn, step_fn, init)
    # ok=False (→ skip/RELOC upstream) when the solve never improved on the
    # init: broken inputs, or an init so far outside the basin that even
    # λ→1e8 steps ascend. The accept slack guarantees an at-optimum init
    # still accepts its (numerically equal) first candidate.
    return T, ok0 & accepted_any & jnp.isfinite(cost)


def _ray_dist_channels(X):
    """Channels-first ray+dist residual pieces for ``X (N, 3)``.

    Returns ``rd`` = list of 4 ``(N,)`` channels ``[rx, ry, rz, d]`` and the
    4x3 Jacobian ``d(rd)/dX`` as nested lists of ``(N,)`` vectors
    (``dr/dX = (I - r rᵀ)/d``, ``dd/dX = rᵀ`` — geometry.point_to_ray_dist).
    """
    x, y, z = X[:, 0], X[:, 1], X[:, 2]
    d = jnp.sqrt(x * x + y * y + z * z)
    d_inv = 1.0 / d
    rx, ry, rz = x * d_inv, y * d_inv, z * d_inv
    rd = [rx, ry, rz, d]
    r = (rx, ry, rz)
    jac = [[d_inv * ((1.0 if a == b else 0.0) - r[a] * r[b]) for b in range(3)]
           for a in range(3)]
    jac.append([rx, ry, rz])
    return rd, jac


@partial(jax.jit, static_argnames=("max_iters",))
def opt_pose_ray_dist_sim3(
    Xf, Xk, T_WCf, T_WCk, Qk, valid,
    sigma_ray, sigma_dist, huber_k, max_iters, rel_error, delta_norm,
):
    """Uncalibrated pose solve. ``Xf, Xk (N, 3)``; ``Qk, valid (N, 1)``.

    Returns ``(T_WCf (8,), T_CkCf (8,), ok)``.
    """
    sq = (valid * jnp.sqrt(Qk))[:, 0]
    sqrt_ray = (1.0 / sigma_ray) * sq
    sqrt_dist = (1.0 / sigma_dist) * sq
    sqrt_info = [sqrt_ray, sqrt_ray, sqrt_ray, sqrt_dist]

    T_CkCf0 = lie.compose(lie.inv(T_WCk), T_WCf)
    rd_k, _ = _ray_dist_channels(Xk)

    def system(T):
        Xf_Ck = lie.act(T, Xf)
        rd_f, drd_dX = _ray_dist_channels(Xf_Ck)
        r = [rd_k[i] - rd_f[i] for i in range(4)]
        J = geometry.compose_jac_channels(
            drd_dX, geometry.point_jac_channels(Xf_Ck), negate=True)
        H, g, cost = _normal_7x7(sqrt_info, r, J, huber_k)
        return H, g, cost, jnp.isfinite(cost)

    T_CkCf, ok = _lm_pose_loop(system, T_CkCf0, max_iters, rel_error,
                               delta_norm)
    T_WCf_new = lie.compose(T_WCk, T_CkCf)
    return T_WCf_new, T_CkCf, ok


@partial(jax.jit, static_argnames=("max_iters", "img_size"))
def opt_pose_calib_sim3(
    Xf, Xk, T_WCf, T_WCk, Qk, valid, meas_k, valid_meas_k, K, img_size,
    sigma_pixel, sigma_depth, huber_k, max_iters, rel_error, delta_norm,
    pixel_border, depth_eps,
):
    """Calibrated pose solve against fixed pixel+logdepth measurements."""
    sq = (valid * jnp.sqrt(Qk))[:, 0]
    sqrt_pix = (1.0 / sigma_pixel) * sq
    sqrt_dep = (1.0 / sigma_depth) * sq
    meas = [meas_k[:, 0], meas_k[:, 1], meas_k[:, 2]]
    vmeas = valid_meas_k[:, 0]

    T_CkCf0 = lie.compose(lie.inv(T_WCk), T_WCf)
    fx, fy, cx, cy = geometry.decompose_K(K)
    Himg, Wimg = img_size

    def system(T):
        Xw = lie.act(T, Xf)
        x, y, z = Xw[:, 0], Xw[:, 1], Xw[:, 2]
        valid_z = z > depth_eps
        z_safe = jnp.where(valid_z, z, 1.0)
        z_inv = 1.0 / z_safe
        u = fx * x * z_inv + cx
        v = fy * y * z_inv + cy
        valid_proj = (
            valid_z
            & (u > pixel_border) & (u < Wimg - 1 - pixel_border)
            & (v > pixel_border) & (v < Himg - 1 - pixel_border)
        )
        logz = jnp.where(valid_z, jnp.log(z_safe), 0.0)
        r = [meas[0] - u, meas[1] - v, meas[2] - logz]
        zero = jnp.zeros_like(z_inv)
        dpz_dX = [
            [fx * z_inv, zero, -fx * x * z_inv * z_inv],
            [zero, fy * z_inv, -fy * y * z_inv * z_inv],
            [zero, zero, z_inv],
        ]
        J = geometry.compose_jac_channels(
            dpz_dX, geometry.point_jac_channels(Xw), negate=True)
        gate = (valid_proj & vmeas).astype(sq.dtype)
        info2 = [sqrt_pix * gate, sqrt_pix * gate, sqrt_dep * gate]
        H, g, cost = _normal_7x7(info2, r, J, huber_k)
        return H, g, cost, jnp.isfinite(cost)

    T_CkCf, ok = _lm_pose_loop(system, T_CkCf0, max_iters, rel_error,
                               delta_norm)
    T_WCf_new = lie.compose(T_WCk, T_CkCf)
    return T_WCf_new, T_CkCf, ok


@jax.jit
def pose_magnitude(T):
    """(|t|, rotation angle) of a Sim3 — used by the quality service."""
    t = T[..., 0:3]
    w = jnp.clip(jnp.abs(T[..., 6]), 0.0, 1.0)
    theta = 2.0 * jnp.arccos(w)
    return jnp.linalg.norm(t, axis=-1), theta


def make_scfg(tracking_cfg: dict, matching_cfg: dict) -> tuple:
    """Hashable solver/matcher config tuple for :func:`track_core`.

    Single source of truth for the tuple layout — track_core unpacks it
    positionally, so every consumer (FrameTracker, the multichip dryrun)
    must build it here.
    """
    c, m = tracking_cfg, matching_cfg
    return (
        float(c["sigma_ray"]), float(c["sigma_dist"]),
        float(c["sigma_pixel"]), float(c["sigma_depth"]),
        float(c["huber"]), int(c["max_iters"]), float(c["rel_error"]),
        float(c["delta_norm"]), float(c["C_conf"]), float(c["Q_conf"]),
        float(c["pixel_border"]), float(c["depth_eps"]),
        int(m.get("max_iter", 10)), float(m.get("lambda_init", 1e-8)),
        float(m.get("convergence_thresh", 1e-6)),
        float(m.get("dist_thresh", 0.1)), int(m.get("radius", 3)),
        # the tracker may use a SHALLOWER refine ladder than the cold-start
        # backend edges (warm-started matching): matching.track_dilation_max
        # overrides dilation_max for track_core only (priced on the oracle
        # ATE harness, scripts/matcher_cut_sweep.py)
        int(m.get("track_dilation_max", m.get("dilation_max", 5))),
        matching.resolve_refine_mode(m), float(m.get("plateau_frac", 0.001)),
        int(m.get("level_step", 1)), int(m.get("proj_step", 1)),
        str(c["filtering_mode"]), str(c.get("filtering_score", "median")),
    )


@partial(jax.jit, static_argnames=("mcfg", "img_hw", "use_calib", "scfg",
                                   "model_hw"))
def track_core(params, mcfg, img, feat_k, pos_k, idx_init, X_k, C_k, N_k,
               T_WCf_init, T_WCk, K, img_hw, use_calib, scfg, model_hw=None):
    """The ENTIRE per-frame tracking computation as ONE XLA program.

    encode → cross-decode + heads → iterative-projection match → fused
    confidences → validity masks → Sim(3) GN pose solve → keyframe pointmap
    fusion → keyframe-selection statistics → quality-job tensors. One
    program per frame matters twice: program switches are expensive on
    remote-attached chips (~20 ms each), and XLA optimizes across stage
    boundaries it can see.

    ``scfg`` is a hashable tuple of solver/config scalars (see
    FrameTracker._scfg). Returns a dict of device arrays; all control-flow
    decisions (skip/reloc/new-keyframe) happen on the host afterwards.
    """
    from mast3r_slam_tpu.models import mast3r as M

    (sigma_ray, sigma_dist, sigma_pixel, sigma_depth, huber_k, max_iters,
     rel_error, delta_norm, C_conf, Q_conf, pixel_border, depth_eps,
     match_max_iter, match_lambda, match_conv, match_dist, match_radius,
     match_dilation, match_refine_mode, match_plateau, match_level_step,
     match_proj_step, filtering_mode, filtering_score) = scfg
    H, W = img_hw
    n = H * W

    # -- model ---------------------------------------------------------------
    # img_hw is the WORKING resolution; the heads unflatten at the model
    # crop (model_hw) and their outputs are decimated down to img_hw when
    # dataset.img_downsample > 1 (reference mast3r_utils.py:43-52).
    from mast3r_slam_tpu.models.inference import _decimate

    mh = model_hw if model_hw is not None else img_hw
    ds = mh[0] // H
    feat_f, pos_f = M.encode_image(params, mcfg, img)
    d1, d2 = M.decode_pair(params, mcfg, feat_f, pos_f, feat_k, pos_k)
    res_ff, res_kf = M.downstream_heads(params, mcfg, d1, d2, mh)
    res_ff = {k: _decimate(v, ds, h_axis=1) for k, v in res_ff.items()}
    res_kf = {k: _decimate(v, ds, h_axis=1) for k, v in res_kf.items()}
    Xff = res_ff["pts3d"].reshape(1, n, 3)
    Cff = res_ff["conf"].reshape(1, n, 1)
    Qff = res_ff["desc_conf"].reshape(n)
    Xkf = res_kf["pts3d"].reshape(1, n, 3)
    Ckf = res_kf["conf"].reshape(1, n, 1)
    Qkf = res_kf["desc_conf"].reshape(n)

    # -- matching -------------------------------------------------------------
    idx_f2k, valid_match = matching.match(
        res_ff["pts3d"], res_kf["pts3d"], res_ff["desc"], res_kf["desc"],
        idx_1_to_2_init=idx_init,
        max_iter=match_max_iter, lambda_init=match_lambda,
        convergence_thresh=match_conv, dist_thresh=match_dist,
        radius=match_radius, dilation_max=match_dilation,
        refine_mode=match_refine_mode, plateau_frac=match_plateau,
        level_step=match_level_step, proj_step=match_proj_step,
    )
    idx0 = idx_f2k[0]
    vmatch = valid_match[0]                                   # (n, 1)

    # -- masks / coverage ------------------------------------------------------
    Cf_avg = Cff[0]
    Ck_avg = C_k / jnp.maximum(N_k, 1.0)
    Xf_all = Xff[0]
    Xk_can = X_k

    meas_k = valid_meas_k = None
    if use_calib:
        Xf_all = geometry.constrain_points_to_ray(img_hw, Xf_all, K)
        Xk_can = geometry.constrain_points_to_ray(img_hw, Xk_can, K)
        uv_k = geometry.get_pixel_coords(img_hw, dtype=Xf_all.dtype)
        valid_meas_k = Xk_can[..., 2:3] > depth_eps
        logz = jnp.where(valid_meas_k,
                         jnp.log(jnp.clip(Xk_can[..., 2:3], 1e-12)), 0.0)
        meas_k = jnp.where(valid_meas_k,
                           jnp.concatenate([uv_k, logz], axis=-1), 0.0)

    # ONE row gather at idx0 for every frame-side channel (X, C, Q): TPU
    # gathers are row-rate-bound, so three separate 196k-row gathers cost
    # ~3x one 5-channel-row gather (docs/PERFORMANCE.md rule 2)
    fch = jnp.concatenate([Xf_all, Cf_avg, Qff[:, None]], axis=-1)[idx0]
    Xf, Cf, Qf = fch[:, 0:3], fch[:, 3:4], fch[:, 4:5]
    Qk = jnp.sqrt(Qf * Qkf[:, None])                          # (n, 1)
    valid_opt = (vmatch & (Cf > C_conf) & (Ck_avg > C_conf) & (Qk > Q_conf))
    valid_kf = vmatch & (Qk > Q_conf)
    match_frac = jnp.mean(valid_opt.astype(jnp.float32))

    # -- pose solve -------------------------------------------------------------
    if not use_calib:
        T_WCf_new, T_CkCf, ok = opt_pose_ray_dist_sim3(
            Xf, Xk_can, T_WCf_init, T_WCk, Qk, valid_opt.astype(Xf.dtype),
            sigma_ray, sigma_dist, huber_k, max_iters, rel_error, delta_norm,
        )
    else:
        T_WCf_new, T_CkCf, ok = opt_pose_calib_sim3(
            Xf, Xk_can, T_WCf_init, T_WCk, Qk, valid_opt.astype(Xf.dtype),
            meas_k, valid_meas_k, K, img_hw,
            sigma_pixel, sigma_depth, huber_k, max_iters, rel_error,
            delta_norm, pixel_border, depth_eps,
        )

    # -- keyframe pointmap fusion (frame obs mapped into keyframe frame) -------
    Xkk = lie.act(T_CkCf[None], Xkf[0])
    X_k_new, C_k_new, N_k_new = fuse_pointmap(
        filtering_mode, filtering_score, X_k, C_k, N_k, Xkk, Ckf[0])

    # -- keyframe-selection statistics -----------------------------------------
    match_frac_k, unique_frac_f = kf_selection_stats(vmatch, idx0, valid_kf, n)

    # -- quality-job tensors (reference tracker.py:95-145) ----------------------
    r_pix, valid_submit, t_norm, theta = quality_job_tensors(
        use_calib, T_CkCf, Xf, Xk_can, valid_kf, meas_k, valid_meas_k, K,
        img_hw, sigma_pixel, sigma_depth)

    return {
        "feat_f": feat_f, "pos_f": pos_f,
        "X_frame": Xff[0], "C_frame": Cff[0],
        "idx_f2k": idx_f2k, "valid_match": vmatch,
        "Qk": Qk, "Qkf": Qkf[:, None][None], "Qff": Qff[:, None][None],
        "T_WCf": T_WCf_new, "T_CkCf": T_CkCf, "ok": ok,
        "match_frac": match_frac,
        "X_k_new": X_k_new, "C_k_new": C_k_new,
        "N_k_new": jnp.asarray(N_k_new, jnp.float32),
        "match_frac_k": match_frac_k, "unique_frac_f": unique_frac_f,
        "Ck_avg": Ck_avg, "r_pix": r_pix, "valid_submit": valid_submit,
        "t_norm": t_norm, "theta": theta,
    }


def fuse_pointmap(filtering_mode, filtering_score, X_k, C_k, N_k, Xkk, Ckf0):
    """Keyframe pointmap fusion — all six reference policies
    (frame.py:41-105), expressed jit-compatibly. ``Xkk``: the frame's points
    mapped into the keyframe frame; ``Ckf0``: their confidences."""
    if filtering_mode == "weighted_pointmap":
        X_k_new = (C_k * X_k + Ckf0 * Xkk) / (C_k + Ckf0)
        C_k_new = C_k + Ckf0
        N_k_new = N_k + 1.0
    elif filtering_mode == "weighted_spherical":
        def to_sph(P):
            rr = jnp.linalg.norm(P, axis=-1, keepdims=True)
            px, py, pz = jnp.split(P, 3, axis=-1)
            phi = jnp.arctan2(py, px)
            theta = jnp.arccos(jnp.clip(pz / jnp.clip(rr, 1e-12), -1.0, 1.0))
            return jnp.concatenate([rr, phi, theta], axis=-1)

        def to_cart(s):
            rr, phi, theta = jnp.split(s, 3, axis=-1)
            return jnp.concatenate(
                [rr * jnp.sin(theta) * jnp.cos(phi),
                 rr * jnp.sin(theta) * jnp.sin(phi),
                 rr * jnp.cos(theta)], axis=-1)

        sph = (C_k * to_sph(X_k) + Ckf0 * to_sph(Xkk)) / (C_k + Ckf0)
        X_k_new = to_cart(sph)
        C_k_new = C_k + Ckf0
        N_k_new = N_k + 1.0
    elif filtering_mode == "recent":
        X_k_new, C_k_new, N_k_new = Xkk, Ckf0, 1.0
    elif filtering_mode == "indep_conf":
        better = Ckf0 > C_k
        X_k_new = jnp.where(better, Xkk, X_k)
        C_k_new = jnp.where(better, Ckf0, C_k)
        N_k_new = 1.0
    elif filtering_mode == "first":
        # keep the FIRST post-creation update (reference frame.py:74-76):
        # N_k == 1 means only the mono-init map exists → adopt this update.
        first = N_k <= 1.0
        X_k_new = jnp.where(first, Xkk, X_k)
        C_k_new = jnp.where(first, Ckf0, C_k)
        N_k_new = 2.0  # sentinel: > 1 blocks later updates
    elif filtering_mode == "best_score":
        # The stored map's C is always the WINNING update's C (N stays 1 in
        # this mode), so scoring stored-vs-new directly reproduces the
        # reference's persistent best-score policy (frame.py:62-68) without
        # carrying a separate score field through the fused program.
        score = (jnp.median if filtering_score == "median" else jnp.mean)
        better = score(Ckf0) > score(C_k / jnp.maximum(N_k, 1.0))
        X_k_new = jnp.where(better, Xkk, X_k)
        C_k_new = jnp.where(better, Ckf0, C_k)
        N_k_new = 1.0
    else:
        X_k_new, C_k_new, N_k_new = X_k, C_k, N_k
    return X_k_new, C_k_new, N_k_new


def kf_selection_stats(vmatch, idx0, valid_kf, n):
    """Keyframe-selection coverage statistics (reference tracker.py:168-181):
    fraction of keyframe pixels matched, and fraction of keyframe pixels hit
    by a UNIQUE frame pixel."""
    match_frac_k = jnp.mean(valid_kf.astype(jnp.float32))
    # distinct-target count via SORT, not scatter-max: TPU scatters with
    # colliding indices serialize (same pathology as the TSDF build), while
    # a 196k int32 sort is a fast fixed-depth bitonic network.
    s = jnp.sort(jnp.where(vmatch[:, 0], idx0, -1))
    first = (s[:1] >= 0).astype(jnp.float32)
    new_vals = ((s[1:] != s[:-1]) & (s[1:] >= 0)).astype(jnp.float32)
    unique_frac_f = (jnp.sum(new_vals) + jnp.sum(first)) / n
    return match_frac_k, unique_frac_f


def quality_job_tensors(use_calib, T_CkCf, Xf, Xk_can, valid_kf, meas_k,
                        valid_meas_k, K, img_hw, sigma_pixel, sigma_depth):
    """Per-pixel quality-job residuals + pose magnitude (reference
    tracker.py:95-145): what the tracker submits to the quality service."""
    Xf_Ck = lie.act(T_CkCf[None], Xf)
    if use_calib:
        pzf, valid_proj = geometry.project_calib(Xf_Ck, K, img_hw)
        d = meas_k - pzf
        lam = (sigma_pixel ** 2) / (sigma_depth ** 2 + 1e-8)
        r_pix = jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2 + lam * d[..., 2] ** 2)
        valid_submit = (valid_kf & valid_proj & valid_meas_k)[..., 0]
    else:
        rd_k = geometry.point_to_ray_dist(Xk_can)
        rd_f = geometry.point_to_ray_dist(Xf_Ck)
        r_pix = jnp.linalg.norm(rd_k - rd_f, axis=-1)
        valid_submit = valid_kf[..., 0]
    t_norm, theta = pose_magnitude(T_CkCf)
    return r_pix, valid_submit, t_norm, theta


class FrameTracker:
    """Drives per-frame tracking: model match → masks → pose solve → fusion.

    API parity with the reference FrameTracker: ``track(frame)`` returns
    ``(new_kf, match_info, try_reloc)``. The whole device computation runs
    as the single :func:`track_core` program.
    """

    def __init__(self, model, keyframes, cfg, quality_service=None):
        self.model = model              # models.inference.MASt3RInference
        self.keyframes = keyframes
        self.cfg = cfg["tracking"]
        self.match_cfg = cfg.get("matching", {})
        self.use_calib = cfg["use_calib"]
        self.full_cfg = cfg
        self.quality_service = quality_service
        self.idx_f2k = None             # warm-start correspondence across frames
        self._warm_kf_idx = None        # which keyframe idx_f2k converged on
        self.last_kf_match = None       # (kf_idx, idx_f2k) at last KF creation

    def reset_idx_f2k(self):
        self.idx_f2k = None
        self._warm_kf_idx = None

    def _scfg(self):
        return make_scfg(self.cfg, self.match_cfg)

    def track(self, frame: Frame):
        cfg = self.cfg
        kfs = self.keyframes
        kf_idx = len(kfs) - 1
        with kfs.lock:
            feat_k = kfs.feat[kf_idx][None]
            pos_k = kfs.pos[kf_idx][None]
            X_k = kfs.X[kf_idx]
            C_k = kfs.C[kf_idx]
            N_k = float(kfs.N[kf_idx])
            T_WCk = kfs.T_WC[kf_idx]
            kf_frame_id = int(kfs.dataset_idx[kf_idx])
            ver_k = int(kfs.version[kf_idx])

        n = kfs.h * kfs.w
        if self._warm_kf_idx is not None and self._warm_kf_idx != kf_idx:
            # the tracking target changed outside this tracker (a reloc-
            # appended keyframe): a correspondence converged against a
            # DIFFERENT keyframe is worse than the identity cold start
            self.reset_idx_f2k()
        idx_init = (self.idx_f2k if self.idx_f2k is not None
                    else jnp.broadcast_to(jnp.arange(n)[None], (1, n)))
        K = kfs.K if self.use_calib else jnp.eye(3)
        img_hw = (kfs.h, kfs.w)

        out = track_core(
            self.model.params, self.model.cfg, frame.img[None], feat_k,
            pos_k, idx_init, X_k, C_k, jnp.asarray(N_k), frame.T_WC, T_WCk,
            K, img_hw, bool(self.use_calib), self._scfg(),
            model_hw=tuple(kfs.model_hw),
        )

        # ---- host-side decisions on the (single) program's outputs ----
        self.idx_f2k = out["idx_f2k"]
        self._warm_kf_idx = kf_idx
        frame.feat = out["feat_f"]
        frame.pos = out["pos_f"]
        frame.X_canon = out["X_frame"]
        frame.C = out["C_frame"]
        frame.N = frame.N_updates = 1

        if float(out["match_frac"]) < cfg["min_match_frac"]:
            print(f"Skipped frame {frame.frame_id}")
            return False, [], True
        if not bool(out["ok"]):
            print(f"Cholesky failed {frame.frame_id}")
            return False, [], True

        self._submit_quality_packed(out, kf_idx, kf_frame_id, img_hw)

        frame.T_WC = out["T_WCf"]

        # Keyframe pointmap fusion write-back, version-checked both ways: the
        # bump makes this write visible to the TSDF refiner's optimistic-
        # concurrency check, and a refiner (or BA) write that landed between
        # our snapshot and now wins — the fusion is computed from a stale
        # pointmap, so skip it rather than clobber the fresher data (the next
        # frame re-fuses against it).
        with kfs.lock:
            if int(kfs.version[kf_idx]) == ver_k:
                kfs.X = kfs.X.at[kf_idx].set(out["X_k_new"])
                kfs.C = kfs.C.at[kf_idx].set(out["C_k_new"])
                kfs.N[kf_idx] = int(float(out["N_k_new"]))
                kfs.N_updates[kf_idx] += 1
                kfs.is_dirty[kf_idx] = True
                kfs.version[kf_idx] += 1
                kfs.xc_version[kf_idx] += 1

        # Keyframe selection: low coverage in either direction spawns a new KF.
        new_kf = min(float(out["match_frac_k"]),
                     float(out["unique_frac_f"])) < cfg["match_frac_thresh"]
        if new_kf:
            # keep this frame's converged match against the current keyframe:
            # when the frame becomes keyframe kf_idx+1, the backend REUSES it
            # as the whole j→i direction of the consecutive edge (the
            # tracker's decode+match is bit-identical to what the symmetric
            # path would recompute — see FactorGraph.add_factors) — the
            # fused Qk is exactly the edge's Q_jj2ii channel
            self.last_kf_match = (kf_idx, out["idx_f2k"],
                                  out["valid_match"], out["Qk"])
            self.reset_idx_f2k()

        return (
            new_kf,
            [out["X_k_new"], out["C_k_new"], frame.X_canon, frame.C,
             out["Qkf"], out["Qff"]],
            False,
        )

    def _submit_quality_packed(self, out, kf_idx, kf_frame_id, img_hw):
        """Enqueue the quality job from track_core outputs (reference
        tracker.py:95-145); no-op without a quality service."""
        if self.quality_service is None:
            return
        try:
            H, W = img_hw
            self.quality_service.submit({
                "kf_id": kf_idx,
                "frame_id": kf_frame_id,
                "H": H, "W": W,
                "valid_kf": np.asarray(out["valid_submit"]),
                "r_pix": np.asarray(out["r_pix"]).reshape(-1),
                "Ck": np.asarray(out["Ck_avg"]).reshape(-1),
                "Qk": np.asarray(out["Qk"]).reshape(-1),
                "t_norm": float(out["t_norm"]),
                "theta": float(out["theta"]),
            })
        except Exception as e:  # quality is best-effort; never break tracking
            print(f"ERROR in quality submission: {e}")
