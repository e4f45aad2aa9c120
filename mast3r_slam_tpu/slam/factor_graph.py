"""Backend factor graph + global Sim(3) Gauss-Newton bundle adjustment on TPU.

Replaces the reference's largest native component — the CUDA GN solvers +
host-side Eigen sparse Cholesky (reference: mast3r_slam/global_opt.py and
backend/src/gn_kernels.cu: ``ray_align_kernel`` :813-1138,
``calib_proj_kernel`` :1231-1545, ``SparseBlock``/``SimplicialLLT`` :57-159)
— with a single jitted computation per iteration:

- per-edge/per-pixel residuals + analytic Jacobians as batched einsums (MXU),
- Hessian block assembly via scatter-add into a FIXED-capacity dense
  ``(7*cap, 7*cap)`` system (the keyframe buffer is bounded at ~110 poses, so
  the dense normal equations are ≤ 770², trivially Cholesky-factored
  on-device — no GPU→CPU→GPU round-trip per iteration like the reference),
- left-multiplicative Sim(3) retraction of all free poses,
- ``lax.while_loop`` until ``‖dx‖ < delta_thresh`` or ``max_iter``.

Pose Jacobian convention (same math as the reference kernels): residuals are
functions of ``X' = T_i^{-1} T_j ∘ X_j``; the local point Jacobian
``D(X') = [I | -skew(X') | X']`` maps to world-frame perturbations of pose j
through ``Adj(T_i^{-1})``, and ``J_i = -J_j``.

Edge buffers are padded to power-of-two buckets so XLA compiles once per
bucket, not per edge count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mast3r_slam_tpu.ops import geometry, lie
from mast3r_slam_tpu.ops.robust import huber


# ---------------------------------------------------------------------------
# Jitted GN core
# ---------------------------------------------------------------------------

def _edge_local_system(r, Jl, w, adj_inv):
    """Per-edge LOCAL normal equations → world-frame blocks for pose j.

    ``r, w``: length-D lists of ``(E, N)``; ``Jl``: D x 7 channel lists
    (Jacobian of the residual w.r.t. a LEFT perturbation of the relative pose
    at frame i, i.e. BEFORE the adjoint map). TPU layout rationale: channel
    lists keep N in lanes (the (E, N, D, 7) array layout wastes 95% of each
    lane vector — measured 6.7 ms/GN-iter in the tracker before the same
    rewrite). The 7x7 local blocks are built by one batched (7, D*N) matmul
    per edge chunk, then transformed once per EDGE with the adjoint sandwich
    ``H_j = Adjᵀ H_local Adj`` instead of per PIXEL — and since
    ``J_i = -J_j`` exactly, the (ii, ij, jj) blocks are ``(H, -H, H)`` and
    ``g_i = -g_j``, halving the remaining work.
    """
    D = len(r)
    E = r[0].shape[0]
    A = jnp.stack([
        jnp.concatenate([w[i] * Jl[i][k] for i in range(D)], axis=-1)
        for k in range(7)
    ])                                            # (7, E, D*N) — w = sqrt-weights
    bf = jnp.concatenate([w[i] * r[i] for i in range(D)], axis=-1)  # (E, D*N)
    H_local = jax.lax.dot_general(
        A, A, (((2,), (2,)), ((1,), (1,))), preferred_element_type=jnp.float32
    )                                             # (E, 7, 7)
    g_local = jnp.einsum("aen,en->ea", A, bf)     # (E, 7)
    # world-frame pose-j blocks: Jj = Jl @ adj_inv
    H = jnp.einsum("eab,eac,ecd->ebd", adj_inv, H_local, adj_inv)
    g = jnp.einsum("eab,ea->eb", adj_inv, g_local)
    return H, g


def _premeas_rays(X, Cavg, ii, jj, idx_ii2jj, valid_match, Q,
                  C_thresh, Q_thresh):
    """ITERATION-INVARIANT measured channels for the ray residual.

    The per-edge correspondence gather ``X[ii][e, idx]`` dominates the BA
    solve (86% of an iteration when run in-loop) yet depends only on the
    matches, never on the poses — so it runs ONCE per solve through
    :func:`_precompute_measured` and the GN loop reads the resulting stacks
    sequentially. Returns channel tuple ``(mx, my, mz, di, conf)``, each
    ``(E, N)``: the unit measurement ray, its length, and the gated
    confidence (zero where the pixel fails any validity test).
    """
    e_idx = jnp.arange(ii.shape[0])[:, None]
    safe_idx = jnp.where(valid_match[..., 0], idx_ii2jj, 0)
    Xi = X[ii][e_idx, safe_idx]                   # (E, N, 3) scattered gather
    Ci = Cavg[ii][e_idx, safe_idx, 0]
    Cj = Cavg[jj][..., 0]
    di = jnp.linalg.norm(Xi, axis=-1)
    di_safe = jnp.maximum(di, 1e-12)
    q = Q[..., 0]
    valid = (
        valid_match[..., 0]
        & (q > Q_thresh)
        & (Ci > C_thresh)
        & (Cj > C_thresh)
    )
    conf = jnp.where(valid, q, 0.0)
    return (Xi[..., 0] / di_safe, Xi[..., 1] / di_safe,
            Xi[..., 2] / di_safe, di, conf)


def _edge_terms_rays(T_WC, X, ii, jj, meas, sigma_ray, sigma_dist):
    """Ray+dist residual channels for each edge (channels-first), given the
    precomputed measured channels from :func:`_premeas_rays`.

    For edge (i, j): pixel k of keyframe j matches pixel ``idx_ii2jj[e, k]``
    of keyframe i; residual compares unit rays + distances in frame i.
    Returns ``(r, Jl, sw, adj_inv)`` for :func:`_edge_local_system`.
    """
    mx, my, mz, di, conf = meas
    Ti = T_WC[ii]                                 # (E, 8)
    Tj = T_WC[jj]
    Tij = lie.compose(lie.inv(Ti), Tj)
    Xj = X[jj]                                    # (E, N, 3) contiguous rows

    Xj_Ci = lie.act(Tij[:, None, :], Xj)
    x, y, z = Xj_Ci[..., 0], Xj_Ci[..., 1], Xj_Ci[..., 2]
    d = jnp.sqrt(x * x + y * y + z * z)
    d_inv = 1.0 / d
    rx, ry, rz = x * d_inv, y * d_inv, z * d_inv
    # r = predicted - measured (per channel)
    r = [rx - mx, ry - my, rz - mz, d - di]
    rr = (rx, ry, rz)
    drd = [[d_inv * ((1.0 if a == b else 0.0) - rr[a] * rr[b])
            for b in range(3)] for a in range(3)]
    drd.append([rx, ry, rz])
    Jl = geometry.compose_jac_channels(drd, geometry.point_jac_channels(Xj_Ci))

    sw_ray = jnp.sqrt(conf) / sigma_ray
    sw_dist = jnp.sqrt(conf) / sigma_dist
    sw = [sw_ray, sw_ray, sw_ray, sw_dist]
    adj_inv = lie.adjoint(lie.inv(Ti))            # (E, 7, 7)
    return r, Jl, sw, adj_inv


def _premeas_calib(X, Cavg, ii, jj, idx_ii2jj, valid_match, Q, K,
                   z_eps, C_thresh, Q_thresh):
    """Iteration-invariant measured channels for the calibrated residual:
    ``(ui, vi, logzi, conf)``, each ``(E, N)`` (keyframe i's matched pixel +
    log depth; conf gated by all measurement-side validity tests)."""
    fx, fy, cx, cy = geometry.decompose_K(K)
    e_idx = jnp.arange(ii.shape[0])[:, None]
    safe_idx = jnp.where(valid_match[..., 0], idx_ii2jj, 0)
    Xi = X[ii][e_idx, safe_idx]
    Ci = Cavg[ii][e_idx, safe_idx, 0]
    Cj = Cavg[jj][..., 0]

    zi = Xi[..., 2]
    valid_zi = zi > z_eps
    zi_safe = jnp.where(valid_zi, zi, 1.0)
    ui = fx * Xi[..., 0] / zi_safe + cx
    vi = fy * Xi[..., 1] / zi_safe + cy
    q = Q[..., 0]
    valid = (
        valid_match[..., 0]
        & (q > Q_thresh)
        & (Ci > C_thresh)
        & (Cj > C_thresh)
        & valid_zi
    )
    conf = jnp.where(valid, q, 0.0)
    return ui, vi, jnp.where(valid_zi, jnp.log(zi_safe), 0.0), conf


def _edge_terms_calib(T_WC, X, ii, jj, meas, K, img_size, pixel_border,
                      z_eps, sigma_pixel, sigma_depth):
    """Calibrated pixel+logdepth residual channels (channels-first), given
    the precomputed measured channels from :func:`_premeas_calib`."""
    ui, vi, logzi, conf = meas
    Ti = T_WC[ii]
    Tj = T_WC[jj]
    Tij = lie.compose(lie.inv(Ti), Tj)
    Xj = X[jj]

    Xj_Ci = lie.act(Tij[:, None, :], Xj)
    fx, fy, cx, cy = geometry.decompose_K(K)
    H_img, W_img = img_size

    x, y, z = Xj_Ci[..., 0], Xj_Ci[..., 1], Xj_Ci[..., 2]
    valid_z = z > z_eps
    z_safe = jnp.where(valid_z, z, 1.0)
    z_inv = 1.0 / z_safe
    u = fx * x * z_inv + cx
    v = fy * y * z_inv + cy
    valid_proj = (
        valid_z
        & (u > pixel_border) & (u < W_img - 1 - pixel_border)
        & (v > pixel_border) & (v < H_img - 1 - pixel_border)
    )
    r = [u - ui, v - vi, jnp.where(valid_z, jnp.log(z_safe), 0.0) - logzi]
    zero = jnp.zeros_like(z_inv)
    dpz = [
        [fx * z_inv, zero, -fx * x * z_inv * z_inv],
        [zero, fy * z_inv, -fy * y * z_inv * z_inv],
        [zero, zero, z_inv],
    ]
    Jl = geometry.compose_jac_channels(dpz, geometry.point_jac_channels(Xj_Ci))

    conf = jnp.where(valid_proj, conf, 0.0)       # prediction-side gate
    sw_pix = jnp.sqrt(conf) / sigma_pixel
    sw_dep = jnp.sqrt(conf) / sigma_depth
    sw = [sw_pix, sw_pix, sw_dep]
    adj_inv = lie.adjoint(lie.inv(Ti))
    return r, Jl, sw, adj_inv


def _scatter_blocks(H, g, He, ge, ii, jj, free_mask, cap):
    """Scatter per-edge blocks into the dense system (trash slot = cap).

    With ``J_i = -J_j`` the four blocks are (ii: +He, jj: +He, ij: -He) and
    the gradients are ``g_i = +ge``, ``g_j = -ge`` where
    ``ge = Adjᵀ Jlᵀ W r`` (see :func:`_edge_local_system`).
    """
    slot_i = jnp.where(free_mask[ii], ii, cap)
    slot_j = jnp.where(free_mask[jj], jj, cap)
    H = H.at[slot_i, :, slot_i, :].add(He)
    H = H.at[slot_j, :, slot_j, :].add(He)
    H = H.at[slot_i, :, slot_j, :].add(-He)
    H = H.at[slot_j, :, slot_i, :].add(-jnp.swapaxes(He, -1, -2))
    g = g.at[slot_i].add(ge)
    g = g.at[slot_j].add(-ge)
    return H, g


# Edges are processed in chunks of this size inside a lax.scan: the per-edge
# residual/Jacobian tensors are (chunk, n_pix, 4, 7) — at 196k pixels a chunk
# of 8 bounds the transient to ~180 MB instead of materializing all edges
# (~2.7 GB at a 128-edge bucket, an OOM on 16 GB HBM).
_EDGE_CHUNK = 8


def _chunked(E):
    chunk = min(_EDGE_CHUNK, E)
    return chunk, E // chunk


def _precompute_measured(premeas_fn, ii, jj, idx, valid, Q):
    """Run the iteration-invariant measured-channel computation (including
    THE scattered correspondence gather) once, as the same 8-edge chunked
    scan the GN loop uses — the chunking matters: the identical gather
    unchunked over all edges runs >20x slower (4 GB/s vs 33 GB/s measured on
    v5e; see docs/PERFORMANCE.md). Returns a tuple of ``(n_chunks, chunk,
    N)`` channel stacks consumed chunk-by-chunk by the GN-loop scan."""
    E = ii.shape[0]
    chunk, n_chunks = _chunked(E)

    def body(_, sl):
        ii_c, jj_c, idx_c, valid_c, Q_c = sl
        return None, premeas_fn(ii_c, jj_c, idx_c, valid_c, Q_c)

    _, meas = lax.scan(body, None, (
        ii.reshape(n_chunks, chunk),
        jj.reshape(n_chunks, chunk),
        idx.reshape(n_chunks, chunk, -1),
        valid.reshape(n_chunks, chunk, -1, 1),
        Q.reshape(n_chunks, chunk, -1, 1),
    ))
    return meas


def _accumulate_system(terms_fn, ii, jj, meas, edge_mask, free_mask,
                       cap, dtype):
    """Chunked scan over edges accumulating the dense normal equations.

    ``meas`` is the per-chunk measured-channel stack from
    :func:`_precompute_measured` (iteration-invariant, read sequentially)."""
    E = ii.shape[0]
    chunk, n_chunks = _chunked(E)
    H0 = jnp.zeros((cap + 1, 7, cap + 1, 7), dtype=dtype)
    g0 = jnp.zeros((cap + 1, 7), dtype=dtype)

    def body(carry, sl):
        H, g = carry
        ii_c, jj_c, mask_c, meas_c = sl
        r, Jl, sw, adj_inv = terms_fn(ii_c, jj_c, meas_c)
        # whitened-Huber sqrt-weights (+ padded-edge mask; binary, so it
        # passes through the square unchanged)
        s = [sw[i] * jnp.sqrt(huber(sw[i] * r[i])) * mask_c[:, None]
             for i in range(len(r))]
        He, ge = _edge_local_system(r, Jl, s, adj_inv)
        H, g = _scatter_blocks(H, g, He, ge, ii_c, jj_c, free_mask, cap)
        return (H, g), None

    sl = (
        ii.reshape(n_chunks, chunk),
        jj.reshape(n_chunks, chunk),
        edge_mask.reshape(n_chunks, chunk),
        meas,
    )
    (H, g), _ = lax.scan(body, (H0, g0), sl)
    return H, g


def _solve_system(H, g, free_mask, cap, damping):
    """Dense Cholesky of the accumulated system. Returns ``dx (cap, 7)``."""
    Hd = H[:cap, :, :cap, :].reshape(cap * 7, cap * 7)
    gd = g[:cap].reshape(cap * 7)

    # Identity rows for non-free poses keep the system well-posed.
    diag_free = jnp.repeat(free_mask[:cap], 7)
    Hd = jnp.where(diag_free[:, None] & diag_free[None, :], Hd, 0.0)
    eye = jnp.eye(cap * 7, dtype=Hd.dtype)
    Hd = Hd + jnp.where(diag_free, damping, 1.0)[:, None] * eye
    gd = jnp.where(diag_free, gd, 0.0)

    Lc = jnp.linalg.cholesky(Hd)
    ok = jnp.all(jnp.isfinite(Lc))
    Lc_safe = jnp.where(ok, Lc, eye)
    dx = jax.scipy.linalg.cho_solve((Lc_safe, True), gd)
    dx = jnp.where(ok, dx, 0.0)
    return dx.reshape(cap, 7)


@partial(jax.jit, static_argnames=("max_iter",), donate_argnums=(0,))
def gauss_newton_rays(T_WC, X, Cavg, ii, jj, idx_ii2jj, valid_match, Q,
                      edge_mask, free_mask,
                      sigma_ray, sigma_dist, C_thresh, Q_thresh,
                      max_iter, delta_thresh, damping=1e-4):
    """Global ray-alignment BA over padded two-way edges. Updates T_WC (cap, 8).

    ``ii, jj (E,)`` already two-way-duplicated; ``edge_mask (E,)`` masks
    padding; ``free_mask (cap,)`` marks poses that may move.
    """
    cap = T_WC.shape[0]
    meas = _precompute_measured(
        lambda ii_c, jj_c, idx_c, valid_c, Q_c: _premeas_rays(
            X, Cavg, ii_c, jj_c, idx_c, valid_c, Q_c, C_thresh, Q_thresh,
        ),
        ii, jj, idx_ii2jj, valid_match, Q,
    )

    def body(state):
        T, it, _ = state

        def terms(ii_c, jj_c, meas_c):
            return _edge_terms_rays(T, X, ii_c, jj_c, meas_c,
                                    sigma_ray, sigma_dist)

        H, g = _accumulate_system(terms, ii, jj, meas,
                                  edge_mask, free_mask, cap, T.dtype)
        dx = _solve_system(H, g, free_mask, cap, damping)
        T_new = jax.vmap(lie.retr)(T, dx)
        delta = jnp.linalg.norm(dx)
        return T_new, it + 1, delta

    def cond(state):
        _, it, delta = state
        return (it < max_iter) & (delta >= delta_thresh)

    T, _, _ = lax.while_loop(
        cond, body, (T_WC, jnp.asarray(0), jnp.asarray(jnp.inf, T_WC.dtype))
    )
    return T


@partial(jax.jit, static_argnames=("max_iter", "img_size"), donate_argnums=(0,))
def gauss_newton_calib(T_WC, X, Cavg, K, ii, jj, idx_ii2jj, valid_match, Q,
                       edge_mask, free_mask, img_size,
                       pixel_border, z_eps, sigma_pixel, sigma_depth,
                       C_thresh, Q_thresh, max_iter, delta_thresh, damping=1e-4):
    """Global calibrated BA (pixel + log-depth residuals)."""
    cap = T_WC.shape[0]
    meas = _precompute_measured(
        lambda ii_c, jj_c, idx_c, valid_c, Q_c: _premeas_calib(
            X, Cavg, ii_c, jj_c, idx_c, valid_c, Q_c, K,
            z_eps, C_thresh, Q_thresh,
        ),
        ii, jj, idx_ii2jj, valid_match, Q,
    )

    def body(state):
        T, it, _ = state

        def terms(ii_c, jj_c, meas_c):
            return _edge_terms_calib(T, X, ii_c, jj_c, meas_c, K, img_size,
                                     pixel_border, z_eps, sigma_pixel,
                                     sigma_depth)

        H, g = _accumulate_system(terms, ii, jj, meas,
                                  edge_mask, free_mask, cap, T.dtype)
        dx = _solve_system(H, g, free_mask, cap, damping)
        T_new = jax.vmap(lie.retr)(T, dx)
        delta = jnp.linalg.norm(dx)
        return T_new, it + 1, delta

    def cond(state):
        _, it, delta = state
        return (it < max_iter) & (delta >= delta_thresh)

    T, _, _ = lax.while_loop(
        cond, body, (T_WC, jnp.asarray(0), jnp.asarray(jnp.inf, T_WC.dtype))
    )
    return T


# ---------------------------------------------------------------------------
# Host-side factor graph
# ---------------------------------------------------------------------------

def _bucket(n, minimum=8):
    b = minimum
    while b < n:
        b *= 2
    return b


class FactorGraph:
    """Edge store + BA driver (capability parity with reference
    mast3r_slam/global_opt.py:12-223, redesigned around padded device buffers).
    """

    def __init__(self, model, keyframes, cfg, K=None, mesh=None):
        self.model = model
        self.keyframes = keyframes
        self.cfg = cfg["local_opt"]
        self.K = K
        # Optional device mesh: the two-way padded edge buffers are sharded
        # over its edge axis at solve time (power-of-two buckets are always
        # divisible by the mesh size for meshes up to the minimum bucket).
        self.mesh = mesh
        n_pix = keyframes.h * keyframes.w
        self.n_pix = n_pix
        # Host-side dynamic edge lists; device arrays built at solve time.
        self.ii = np.zeros((0,), np.int32)
        self.jj = np.zeros((0,), np.int32)
        self.idx_ii2jj = jnp.zeros((0, n_pix), jnp.int32)
        self.idx_jj2ii = jnp.zeros((0, n_pix), jnp.int32)
        self.valid_match_j = jnp.zeros((0, n_pix, 1), bool)
        self.valid_match_i = jnp.zeros((0, n_pix, 1), bool)
        self.Q_ii2jj = jnp.zeros((0, n_pix, 1), jnp.float32)
        self.Q_jj2ii = jnp.zeros((0, n_pix, 1), jnp.float32)
        self.last_unique_kf_idx: np.ndarray | None = None

    def n_edges(self):
        return int(self.ii.shape[0])

    def add_factors(self, ii_new, jj_new, min_match_frac, is_reloc=False):
        """Symmetric-decode candidate edges; accept by bidirectional coverage.

        Returns True if at least one edge was added. In strict-reloc mode the
        whole batch is rejected if ANY edge is invalid (reference
        global_opt.py:78-79).
        """
        if len(ii_new) == 0:
            return False
        kf = self.keyframes
        with kf.lock:
            feat_i = kf.feat[np.asarray(ii_new)]
            feat_j = kf.feat[np.asarray(jj_new)]
            pos_i = kf.pos[np.asarray(ii_new)]
            pos_j = kf.pos[np.asarray(jj_new)]
        img_hw = kf.img_shapes[int(ii_new[0])][1]

        (idx_i2j, idx_j2i, valid_j, valid_i, Qii, Qjj, Qji, Qij) = (
            self.model.match_symmetric(feat_i, pos_i, feat_j, pos_j, img_hw)
        )

        b_idx = jnp.arange(idx_i2j.shape[0])[:, None]
        Qj = jnp.sqrt(Qii[b_idx, idx_i2j] * Qji)
        Qi = jnp.sqrt(Qjj[b_idx, idx_j2i] * Qij)

        valid_j_full = valid_j & (Qj > self.cfg["Q_conf"])
        valid_i_full = valid_i & (Qi > self.cfg["Q_conf"])
        frac_j = np.asarray(jnp.mean(valid_j_full.astype(jnp.float32), axis=(1, 2)))
        frac_i = np.asarray(jnp.mean(valid_i_full.astype(jnp.float32), axis=(1, 2)))

        ii_arr = np.asarray(ii_new, np.int32)
        jj_arr = np.asarray(jj_new, np.int32)
        invalid = np.minimum(frac_j, frac_i) < min_match_frac
        consecutive = ii_arr == (jj_arr - 1)
        invalid = (~consecutive) & invalid
        if invalid.any() and is_reloc:
            return False

        keep = ~invalid
        if not keep.any():
            return False
        kidx = np.where(keep)[0]
        self.ii = np.concatenate([self.ii, ii_arr[kidx]])
        self.jj = np.concatenate([self.jj, jj_arr[kidx]])
        kj = jnp.asarray(kidx)
        self.idx_ii2jj = jnp.concatenate([self.idx_ii2jj, idx_i2j[kj].astype(jnp.int32)])
        self.idx_jj2ii = jnp.concatenate([self.idx_jj2ii, idx_j2i[kj].astype(jnp.int32)])
        self.valid_match_j = jnp.concatenate([self.valid_match_j, valid_j[kj]])
        self.valid_match_i = jnp.concatenate([self.valid_match_i, valid_i[kj]])
        self.Q_ii2jj = jnp.concatenate([self.Q_ii2jj, Qj[kj]])
        self.Q_jj2ii = jnp.concatenate([self.Q_jj2ii, Qi[kj]])
        return True

    def get_unique_kf_idx(self):
        return np.unique(np.concatenate([self.ii, self.jj]))

    def _two_way_padded(self):
        """Two-way duplicated edge arrays padded to a power-of-two bucket."""
        E = self.n_edges()
        ii2 = np.concatenate([self.ii, self.jj])
        jj2 = np.concatenate([self.jj, self.ii])
        idx = jnp.concatenate([self.idx_ii2jj, self.idx_jj2ii], axis=0)
        valid = jnp.concatenate([self.valid_match_j, self.valid_match_i], axis=0)
        Q = jnp.concatenate([self.Q_ii2jj, self.Q_jj2ii], axis=0)

        pad = _bucket(2 * E) - 2 * E
        mask = np.ones(2 * E, np.float32)
        if pad:
            ii2 = np.concatenate([ii2, np.zeros(pad, np.int32)])
            jj2 = np.concatenate([jj2, np.zeros(pad, np.int32)])
            idx = jnp.concatenate([idx, jnp.zeros((pad, self.n_pix), jnp.int32)])
            valid = jnp.concatenate([valid, jnp.zeros((pad, self.n_pix, 1), bool)])
            Q = jnp.concatenate([Q, jnp.zeros((pad, self.n_pix, 1), jnp.float32)])
            mask = np.concatenate([mask, np.zeros(pad, np.float32)])
        out = (
            jnp.asarray(ii2), jnp.asarray(jj2), idx, valid, Q, jnp.asarray(mask)
        )
        if self.mesh is not None:
            import numpy as _np

            from mast3r_slam_tpu.parallel import sharding as S

            n_dev = int(_np.prod(self.mesh.devices.shape))
            if out[0].shape[0] % n_dev == 0:
                out = tuple(S.shard_leading(a, self.mesh) for a in out)
        return out

    def _free_mask(self, unique_kf_idx):
        pin = int(self.cfg["pin"])
        cap = self.keyframes.capacity
        mask = np.zeros(cap, bool)
        mask[unique_kf_idx[pin:]] = True
        return jnp.asarray(mask)

    def solve_GN_rays(self):
        unique = self.get_unique_kf_idx()
        if unique.size <= int(self.cfg["pin"]):
            self.last_unique_kf_idx = None
            return
        self.last_unique_kf_idx = unique
        kf = self.keyframes
        ii2, jj2, idx, valid, Q, mask = self._two_way_padded()
        with kf.lock:
            Cavg = kf.C / jnp.clip(
                jnp.asarray(kf.N, jnp.float32)[:, None, None], 1.0
            )
            T_new = gauss_newton_rays(
                kf.T_WC, kf.X, Cavg, ii2, jj2, idx, valid, Q, mask,
                self._free_mask(unique),
                float(self.cfg["sigma_ray"]), float(self.cfg["sigma_dist"]),
                float(self.cfg["C_conf"]), float(self.cfg["Q_conf"]),
                int(self.cfg["max_iters"]), float(self.cfg["delta_norm"]),
            )
            kf.T_WC = T_new
            for i in unique[int(self.cfg["pin"]):]:
                kf.version[int(i)] += 1

    def solve_GN_calib(self):
        unique = self.get_unique_kf_idx()
        if unique.size <= int(self.cfg["pin"]):
            self.last_unique_kf_idx = None
            return
        self.last_unique_kf_idx = unique
        kf = self.keyframes
        img_size = (kf.h, kf.w)
        ii2, jj2, idx, valid, Q, mask = self._two_way_padded()
        with kf.lock:
            Cavg = kf.C / jnp.clip(
                jnp.asarray(kf.N, jnp.float32)[:, None, None], 1.0
            )
            X_rays = jax.vmap(
                lambda x: geometry.constrain_points_to_ray(img_size, x, self.K)
            )(kf.X)
            T_new = gauss_newton_calib(
                kf.T_WC, X_rays, Cavg, self.K, ii2, jj2, idx, valid, Q, mask,
                self._free_mask(unique), img_size,
                float(self.cfg["pixel_border"]), float(self.cfg["depth_eps"]),
                float(self.cfg["sigma_pixel"]), float(self.cfg["sigma_depth"]),
                float(self.cfg["C_conf"]), float(self.cfg["Q_conf"]),
                int(self.cfg["max_iters"]), float(self.cfg["delta_norm"]),
            )
            kf.T_WC = T_new
            for i in unique[int(self.cfg["pin"]):]:
                kf.version[int(i)] += 1
