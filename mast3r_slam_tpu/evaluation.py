"""Trajectory/reconstruction export and ATE evaluation.

Capability parity with the reference export layer (reference: evaluate.py —
``prepare_savedir`` :14, ``save_traj`` :23, ``save_reconstruction`` :47,
``save_ply_with_quality`` :109, ``save_keyframes`` :73) plus a built-in
``evo_ape tum <gt> <est> -as`` equivalent (timestamp association + Umeyama
Sim(3) alignment + translational RMSE) so evaluation needs no external evo
install. PLY writing is implemented directly (binary little-endian) instead
of the plyfile dependency.
"""

from __future__ import annotations

import pathlib

import numpy as np

from mast3r_slam_tpu.ops import lie


# ---------------------------------------------------------------------------
# Save directory / trajectory
# ---------------------------------------------------------------------------

def prepare_savedir(save_as: str, dataset):
    """``logs/<save_as>/<dataset_name>/``, created if missing."""
    name = pathlib.Path(str(getattr(dataset, "path", "live"))).name or "live"
    savedir = pathlib.Path("logs") / (save_as or "default") / name
    savedir.mkdir(parents=True, exist_ok=True)
    return savedir, name


def save_traj(savedir, filename: str, timestamps, keyframes) -> pathlib.Path:
    """TUM-format trajectory ``t x y z qx qy qz qw`` from keyframe Sim3 poses.

    Scale is dropped via Sim3→SE3 as in the reference (evaluate.py:23-44,
    lietorch_utils.py:6-13).
    """
    path = pathlib.Path(savedir) / filename
    with keyframes.lock:
        n = len(keyframes)
        T = np.asarray(keyframes.T_WC[:n])
        ids = [int(keyframes.dataset_idx[i]) for i in range(n)]
    with open(path, "w") as f:
        for i in range(n):
            t = timestamps[ids[i]] if ids[i] < len(timestamps) else float(ids[i])
            tx, ty, tz, qx, qy, qz, qw = T[i, :7]
            f.write(f"{t:.6f} {tx:.9f} {ty:.9f} {tz:.9f} "
                    f"{qx:.9f} {qy:.9f} {qz:.9f} {qw:.9f}\n")
    return path


# ---------------------------------------------------------------------------
# PLY export
# ---------------------------------------------------------------------------

def _uimg_colors(uimg, h, w):
    """Display image → per-pointmap-pixel colors (h*w, 3) float [0, 255].

    uimg may be display-downsampled (dataset.img_downsample); upsample back
    to the pointmap grid by nearest-neighbour repetition.
    """
    u = np.asarray(uimg, np.float32)
    if u.shape[0] != h or u.shape[1] != w:
        ry = int(np.ceil(h / u.shape[0]))
        rx = int(np.ceil(w / u.shape[1]))
        u = np.repeat(np.repeat(u, ry, 0), rx, 1)[:h, :w]
    u = u.reshape(-1, 3)
    if u.max() <= 1.0:
        u = u * 255.0
    return u


def write_ply(path, xyz: np.ndarray, rgb: np.ndarray | None = None,
              extra: dict[str, np.ndarray] | None = None):
    """Binary little-endian PLY with optional uchar colors + float properties."""
    n = xyz.shape[0]
    props = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    cols = [xyz[:, 0].astype("<f4"), xyz[:, 1].astype("<f4"),
            xyz[:, 2].astype("<f4")]
    names = ["float x", "float y", "float z"]
    if rgb is not None:
        for i, c in enumerate("red green blue".split()):
            props.append((c, "u1"))
            cols.append(rgb[:, i].astype("u1"))
            names.append(f"uchar {c}")
    for k, v in (extra or {}).items():
        if np.issubdtype(v.dtype, np.integer):
            props.append((k, "<i4"))
            cols.append(v.astype("<i4"))
            names.append(f"int {k}")
        else:
            props.append((k, "<f4"))
            cols.append(v.astype("<f4"))
            names.append(f"float {k}")
    rec = np.empty(n, dtype=props)
    for (name, _), col in zip(props, cols):
        rec[name] = col
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property {s}\n" for s in names)
        + "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        rec.tofile(f)


def save_reconstruction(savedir, filename, keyframes, conf_threshold=0.0):
    """Dense colored point cloud of all keyframes in world frame
    (reference evaluate.py:47-70)."""
    pts, cols = [], []
    with keyframes.lock:
        n = len(keyframes)
        for i in range(n):
            X = np.asarray(keyframes.X[i])          # (N, 3)
            C = np.asarray(keyframes.C[i][:, 0])
            Nw = max(int(keyframes.N[i]), 1)
            T = np.asarray(keyframes.T_WC[i])
            uimg = keyframes.uimg[i]
            keep = (C / Nw) > conf_threshold
            Xw = np.asarray(lie.act(T[None], X))[keep]
            rgb = _uimg_colors(uimg, keyframes.h, keyframes.w)[keep]
            pts.append(Xw)
            cols.append(rgb.astype(np.uint8))
    if not pts:
        return None
    path = pathlib.Path(savedir) / filename
    write_ply(path, np.concatenate(pts), np.concatenate(cols))
    return path


def save_ply_with_quality(savedir, filename, keyframes, quality_service,
                          conf_threshold=0.0, patch_size=16):
    """Dense PLY with per-vertex quality fields ``r/delta_cov/u/class_id/
    priority`` upsampled from the 16x16 quality grids (reference
    evaluate.py:109-187)."""
    pts, cols = [], []
    extras = {k: [] for k in ("r", "delta_cov", "u", "class_id", "priority")}
    with keyframes.lock:
        n = len(keyframes)
        for i in range(n):
            X = np.asarray(keyframes.X[i])
            C = np.asarray(keyframes.C[i][:, 0])
            Nw = max(int(keyframes.N[i]), 1)
            T = np.asarray(keyframes.T_WC[i])
            uimg = np.asarray(keyframes.uimg[i])
            h, w = keyframes.h, keyframes.w
            keep = (C / Nw) > conf_threshold
            Xw = np.asarray(lie.act(T[None], X))[keep]
            rgb = _uimg_colors(uimg, h, w)[keep]
            pts.append(Xw)
            cols.append(rgb.astype(np.uint8))

            q = quality_service.get_by_kf_id(i) if quality_service else None
            for k in extras:
                if q is None:
                    full = np.zeros(h * w, np.float32)
                else:
                    import cv2

                    g = np.asarray(q[k], np.float32)
                    # bilinear for continuous fields, nearest for the
                    # categorical class id (reference evaluate.py:128-147)
                    interp = (cv2.INTER_NEAREST if k == "class_id"
                              else cv2.INTER_LINEAR)
                    full = cv2.resize(g, (w, h),
                                      interpolation=interp).reshape(-1)
                extras[k].append(full[keep])
    if not pts:
        return None
    path = pathlib.Path(savedir) / filename
    extra = {k: np.concatenate(v) for k, v in extras.items()}
    extra["class_id"] = extra["class_id"].astype(np.int32)
    write_ply(path, np.concatenate(pts), np.concatenate(cols), extra)
    return path


def save_keyframes(savedir, timestamps, keyframes):
    """PNG dump of keyframe display images (reference evaluate.py:73-85)."""
    import cv2

    outdir = pathlib.Path(savedir) / "keyframes"
    outdir.mkdir(parents=True, exist_ok=True)
    with keyframes.lock:
        n = len(keyframes)
        for i in range(n):
            uimg = np.asarray(keyframes.uimg[i])
            if uimg.dtype != np.uint8:
                uimg = np.clip(uimg * 255, 0, 255).astype(np.uint8)
            ts = timestamps[int(keyframes.dataset_idx[i])] if int(
                keyframes.dataset_idx[i]
            ) < len(timestamps) else float(i)
            cv2.imwrite(str(outdir / f"{ts:.6f}.png"),
                        cv2.cvtColor(uimg, cv2.COLOR_RGB2BGR))


# ---------------------------------------------------------------------------
# ATE evaluation (evo_ape tum <gt> <est> -as equivalent)
# ---------------------------------------------------------------------------

def main_ape(argv=None):
    """CLI: ``python -m mast3r_slam_tpu.evaluation <gt> <est> [-as|-a]`` —
    drop-in for the ``evo_ape tum`` invocation of the reference eval scripts."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("gt")
    ap.add_argument("est")
    ap.add_argument("-a", "--align", action="store_true")
    ap.add_argument("-s", "--correct-scale", action="store_true")
    ap.add_argument("-as", dest="align_scale", action="store_true")
    ap.add_argument("--max-diff", type=float, default=0.02)
    ap.add_argument("--rpe", type=int, default=0, metavar="DELTA",
                    help="also report relative pose error over DELTA-step "
                         "pairs (evo_rpe equivalent)")
    args = ap.parse_args(argv)
    align = args.align or args.align_scale
    scale = args.correct_scale or args.align_scale
    res = ate_rmse(args.gt, args.est, align=align, scale=scale,
                   max_diff=args.max_diff)
    print("APE w.r.t. translation part (m)")
    for k in ("rmse", "mean", "median", "std", "min", "max"):
        print(f"  {k:>8s}  {res[k]:.6f}")
    print(f"  pairs: {res['n_pairs']}")
    if args.rpe > 0:
        rres = rpe_rmse(args.gt, args.est, delta=args.rpe,
                        align_scale=scale, max_diff=args.max_diff)
        print(f"RPE w.r.t. translation part (m), delta={args.rpe}")
        for k in ("rmse", "mean", "median", "std", "min", "max"):
            print(f"  {k:>8s}  {rres[k]:.6f}")
        print(f"  pairs: {rres['n_pairs']}")
        res["rpe"] = rres
    return res


def load_tum_traj(path):
    """Trajectory file → (timestamps (N,), t (N, 3), q (N, 4) xyzw).

    Reads TUM format (``t x y z qx qy qz qw``, seconds) and the EuRoC
    ``state_groundtruth_estimate0/data.csv`` format (nanosecond timestamps,
    quaternion in w-first order) — detected by the timestamp magnitude, so
    ``eval_euroc.sh``'s raw-CSV fallback scores correctly without a
    converted groundtruth file.
    """
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or line.startswith("ts"):
                continue
            vals = [float(v) for v in line.replace(",", " ").split()]
            if len(vals) >= 8:
                rows.append(vals[:8])
    arr = np.asarray(rows, np.float64)
    ts, t, q = arr[:, 0], arr[:, 1:4], arr[:, 4:8]
    if ts.size and ts.max() > 1e14:  # nanoseconds → the EuRoC CSV layout
        ts = ts / 1e9
        q = q[:, [1, 2, 3, 0]]       # wxyz → xyzw
    return ts, t, q


def associate(ts_a, ts_b, max_diff=0.02):
    """Nearest-timestamp association (one-to-one greedy by time difference)."""
    ia, ib = [], []
    j = 0
    used = np.zeros(len(ts_b), bool)
    for i, t in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - t)))
        if not used[j] and abs(ts_b[j] - t) <= max_diff:
            ia.append(i)
            ib.append(j)
            used[j] = True
    return np.asarray(ia, int), np.asarray(ib, int)


def umeyama_alignment(src, dst, with_scale=True):
    """Least-squares Sim(3)/SE(3) aligning ``src`` onto ``dst`` (Umeyama 1991).

    Returns (s, R, t) with ``dst ≈ s R src + t``.
    """
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / src.shape[0]
        s = float(np.trace(np.diag(d) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(gt_file, est_file, align=True, scale=True, max_diff=0.02):
    """Absolute trajectory error RMSE after association (+Sim3 alignment).

    The same metric as ``evo_ape tum gt est -as`` used by the reference eval
    scripts (scripts/eval_tum.sh:37-42). Returns dict with rmse/mean/median/
    std/min/max/n_pairs.
    """
    ts_g, t_g, _ = load_tum_traj(gt_file)
    ts_e, t_e, _ = load_tum_traj(est_file)
    ie, ig = associate(ts_e, ts_g, max_diff)
    if len(ie) < 3:
        raise ValueError(f"only {len(ie)} associated pairs (need >= 3)")
    P = t_e[ie]
    G = t_g[ig]
    if align:
        s, R, t = umeyama_alignment(P, G, with_scale=scale)
        P = (s * (R @ P.T)).T + t
    err = np.linalg.norm(P - G, axis=1)
    return {
        "rmse": float(np.sqrt(np.mean(err ** 2))),
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "std": float(err.std()),
        "min": float(err.min()),
        "max": float(err.max()),
        "n_pairs": int(len(err)),
    }


def rpe_rmse(gt_file, est_file, delta=1, align_scale=True, max_diff=0.02):
    """Relative pose error over ``delta``-step pairs (evo_rpe equivalent).

    Drift metric complementing :func:`ate_rmse`: for each associated index
    pair (i, i+delta), compares the ESTIMATED relative motion against the
    ground-truth relative motion; translation part reported, with a global
    scale correction (monocular trajectories) when ``align_scale``. Returns
    the same stats dict shape as ate_rmse.
    """
    ts_g, t_g, q_g = load_tum_traj(gt_file)
    ts_e, t_e, q_e = load_tum_traj(est_file)
    ie, ig = associate(ts_e, ts_g, max_diff)
    if len(ie) < delta + 2:
        raise ValueError(f"only {len(ie)} associated pairs")
    P, G = t_e[ie], t_g[ig]
    if align_scale:
        # relative errors are invariant to a global R/t, so only the SCALE
        # part of the alignment applies (rotating P without rotating the
        # per-pose quaternions would mix frames in rel() below)
        s, _, _ = umeyama_alignment(P, G, with_scale=True)
        P = s * P

    def rel(tr, q, i, j):
        # relative translation expressed in frame i: R_i^T (t_j - t_i)
        x, y, z, w = q[i] / np.linalg.norm(q[i])
        Rm = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        return Rm.T @ (tr[j] - tr[i])

    errs = []
    for a in range(len(ie) - delta):
        b = a + delta
        d_e = rel(P, q_e[ie], a, b)
        d_g = rel(G, q_g[ig], a, b)
        errs.append(np.linalg.norm(d_e - d_g))
    err = np.asarray(errs)
    return {
        "rmse": float(np.sqrt(np.mean(err ** 2))),
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "std": float(err.std()),
        "min": float(err.min()),
        "max": float(err.max()),
        "n_pairs": int(len(err)),
    }


if __name__ == "__main__":
    main_ape()
