"""Headless SLAM-state renderer (software z-buffer point splatting).

Visualization-capability counterpart of the reference's moderngl/GLFW viewer
(reference: mast3r_slam/visualization.py + thirdparty/in3d + surfelmap.glsl):
renders confidence-thresholded keyframe pointmaps, the camera trajectory,
frustum wireframes, and factor-graph edges — but to a numpy image, so it
works headless (snapshot PNGs during/after a run) and is unit-testable. The
interactive OpenGL window lives in viz/viewer.py and reuses these camera
helpers.
"""

from __future__ import annotations

import numpy as np

from mast3r_slam_tpu.ops import lie


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    """World→camera rotation/translation for a camera at ``eye`` looking at
    ``target`` (OpenCV convention: +z forward, +y down)."""
    eye = np.asarray(eye, np.float64)
    f = np.asarray(target, np.float64) - eye
    f /= np.linalg.norm(f) + 1e-12
    upv = -np.asarray(up, np.float64)
    r = np.cross(f, upv)
    r /= np.linalg.norm(r) + 1e-12
    d = np.cross(f, r)
    R = np.stack([r, d, f], axis=0)
    t = -R @ eye
    return R.astype(np.float32), t.astype(np.float32)


def _project(P_w, R, t, K, hw):
    H, W = hw
    P_c = P_w @ R.T + t
    z = P_c[:, 2]
    ok = z > 1e-6
    zs = np.where(ok, z, 1.0)
    u = K[0, 0] * P_c[:, 0] / zs + K[0, 2]
    v = K[1, 1] * P_c[:, 1] / zs + K[1, 2]
    ok &= (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1)
    return u, v, z, ok


def splat_points(img, zbuf, P_w, colors, R, t, K):
    """Z-buffered 1-px point splats into ``img (H, W, 3)`` / ``zbuf (H, W)``."""
    H, W = zbuf.shape
    u, v, z, ok = _project(P_w, R, t, K, (H, W))
    ui = u[ok].astype(np.int32)
    vi = v[ok].astype(np.int32)
    zi = z[ok]
    ci = colors[ok]
    # near-to-far ordering so the first write per pixel wins
    order = np.argsort(zi)
    ui, vi, zi, ci = ui[order], vi[order], zi[order], ci[order]
    lin = vi * W + ui
    first = np.unique(lin, return_index=True)[1]
    zb = zbuf.reshape(-1)
    im = img.reshape(-1, 3)
    sel = lin[first]
    closer = zi[first] < zb[sel]
    sel = sel[closer]
    zb[sel] = zi[first][closer]
    im[sel] = ci[first][closer]


def draw_line(img, p0, p1, color):
    """Naive DDA line in pixel space (endpoints pre-projected)."""
    H, W = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    us = np.linspace(p0[0], p1[0], n + 1)
    vs = np.linspace(p0[1], p1[1], n + 1)
    ok = (us >= 0) & (us < W) & (vs >= 0) & (vs < H)
    img[vs[ok].astype(int), us[ok].astype(int)] = color


def draw_polyline_3d(img, pts_w, R, t, K, color):
    H, W = img.shape[:2]
    u, v, z, ok = _project(np.asarray(pts_w, np.float32), R, t, K, (H, W))
    for i in range(len(u) - 1):
        if ok[i] and ok[i + 1]:
            draw_line(img, (u[i], v[i]), (u[i + 1], v[i + 1]), color)


def frustum_corners(T_WC, scale=0.08, aspect=4.0 / 3.0):
    """5 world-space points of a camera frustum wireframe (apex + 4 corners)."""
    T = np.asarray(T_WC)
    zs = scale
    xs = zs * aspect * 0.8
    ys = zs * 0.8
    local = np.array([
        [0, 0, 0],
        [-xs, -ys, zs], [xs, -ys, zs], [xs, ys, zs], [-xs, ys, zs],
    ], np.float32)
    return np.asarray(lie.act(T[None], local))


def turbo_colormap(t):
    """Cheap turbo-like colormap for normalized depth ``t (N,) in [0, 1]``
    (reference visualization_utils.py:15-24 colors the current frame by
    depth)."""
    t = np.clip(np.asarray(t, np.float32), 0.0, 1.0)
    r = np.clip(1.6 - np.abs(4.0 * t - 3.2), 0, 1)
    g = np.clip(1.6 - np.abs(4.0 * t - 1.9), 0, 1)
    b = np.clip(1.6 - np.abs(4.0 * t - 0.8), 0, 1)
    return np.stack([r, g, b], axis=-1)


def render_state(keyframes, states=None, img_hw=(480, 640),
                 conf_threshold=0.0, eye=None, target=None,
                 max_points_per_kf=20000):
    """Render the current SLAM state to an RGB uint8 image."""
    H, W = img_hw
    img = np.zeros((H, W, 3), np.float32)
    zbuf = np.full((H, W), np.inf, np.float32)
    K = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]],
                 np.float32)

    with keyframes.lock:
        n = len(keyframes)
        if n == 0:
            return (img * 255).astype(np.uint8)
        traj = np.asarray(keyframes.T_WC[:n])
        pts_all, col_all = [], []
        for i in range(n):
            X = np.asarray(keyframes.X[i])
            C = np.asarray(keyframes.C[i][:, 0])
            Nw = max(int(keyframes.N[i]), 1)
            keep = (C / Nw) > conf_threshold
            Xw = np.asarray(lie.act(traj[i][None], X))[keep]
            uimg = keyframes.uimg[i]
            col = (np.asarray(uimg).reshape(-1, 3)[keep]
                   if uimg is not None else np.full((keep.sum(), 3), 0.7))
            if Xw.shape[0] > max_points_per_kf:
                step = Xw.shape[0] // max_points_per_kf + 1
                Xw, col = Xw[::step], col[::step]
            finite = np.isfinite(Xw).all(1) & (np.abs(Xw) < 1e4).all(1)
            pts_all.append(Xw[finite])
            col_all.append(col[finite])
        edges = (list(zip(states.edges_ii, states.edges_jj))
                 if states is not None else [])

    # Current frame: depth-colored splats (reference visualization.py:358-380).
    cur = states.get_frame() if states is not None else None
    if cur is not None and cur.X_canon is not None:
        Xc = np.asarray(cur.X_canon)
        Tc = np.asarray(cur.T_WC)
        Xw = np.asarray(lie.act(Tc[None], Xc))
        finite = np.isfinite(Xw).all(1) & (np.abs(Xw) < 1e4).all(1)
        Xw = Xw[finite]
        depth = np.linalg.norm(Xc[finite], axis=-1)
        rng = np.percentile(depth, [5, 95]) if depth.size else (0, 1)
        tcol = turbo_colormap((depth - rng[0]) / max(rng[1] - rng[0], 1e-6))
        if Xw.shape[0] > max_points_per_kf:
            step = Xw.shape[0] // max_points_per_kf + 1
            Xw, tcol = Xw[::step], tcol[::step]
        pts_all.append(Xw)
        col_all.append(tcol)

    P = np.concatenate(pts_all) if pts_all else np.zeros((0, 3))
    C = np.concatenate(col_all) if col_all else np.zeros((0, 3))

    centers = traj[:, :3]
    scene_c = np.median(centers, axis=0) if len(centers) else np.zeros(3)
    if eye is None:
        spread = float(np.max(np.std(P, axis=0))) if len(P) else 1.0
        eye = scene_c + np.array([0.0, -1.5, -3.0]) * max(spread, 0.5)
    if target is None:
        target = scene_c
    R, t = look_at(eye, target)

    if len(P):
        splat_points(img, zbuf, P.astype(np.float32), C.astype(np.float32),
                     R, t, K)
    draw_polyline_3d(img, centers, R, t, K, np.array([1.0, 0.3, 0.2]))
    for T in traj:
        c = frustum_corners(T)
        for a, b in ((0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4),
                     (4, 1)):
            u, v, z, ok = _project(c[[a, b]], R, t, K, (H, W))
            if ok.all():
                draw_line(img, (u[0], v[0]), (u[1], v[1]),
                          np.array([0.3, 0.8, 1.0]))
    for i, j in edges:
        if i < len(centers) and j < len(centers):
            u, v, z, ok = _project(centers[[i, j]].astype(np.float32), R, t,
                                   K, (H, W))
            if ok.all():
                draw_line(img, (u[0], v[0]), (u[1], v[1]),
                          np.array([0.2, 1.0, 0.3]))
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def save_snapshot(path, keyframes, states=None, **kw):
    import cv2

    img = render_state(keyframes, states, **kw)
    cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return img
