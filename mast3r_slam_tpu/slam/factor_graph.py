"""Backend factor graph + global Sim(3) Gauss-Newton bundle adjustment on TPU.

Replaces the reference's largest native component — the CUDA GN solvers +
host-side Eigen sparse Cholesky (reference: mast3r_slam/global_opt.py and
backend/src/gn_kernels.cu: ``ray_align_kernel`` :813-1138,
``calib_proj_kernel`` :1231-1545, ``SparseBlock``/``SimplicialLLT`` :57-159)
— with a TPU-shaped split of the solve into two phases:

1. **Measured-channel precompute** (:func:`_premeas_rays` /
   :func:`_premeas_calib`): everything that depends on the matches and
   keyframe pointmaps but NOT on the poses — including THE scattered
   per-edge correspondence gather ``X[ii][e, idx]`` and the contiguous
   observer rows ``X[jj]`` — is captured once per edge into flat ``(E, N)``
   channel stacks. The GN loop then contains **no large gathers at all**
   (XLA lowers even contiguous row gathers inside a scan to full-table
   scans: the in-loop ``X[jj]``/``C[jj]`` reads measured 25 ms/iteration
   before being hoisted here). :class:`FactorGraph` caches these stacks
   across solves and refreshes only edges whose keyframes changed
   (version counters), so repeat solves skip the expensive gather entirely.
2. **GN iterations**: per-edge residuals + analytic Jacobians as one batched
   bf16 Gram matmul per edge chunk (:func:`_edge_system_fused`), Hessian
   block assembly via scatter-add into a FIXED-capacity dense
   ``(7*cap, 7*cap)`` system (the keyframe buffer is bounded at ~110 poses,
   so the dense normal equations are ≤ 770², trivially Cholesky-factored
   on-device — no GPU→CPU→GPU round-trip per iteration like the reference),
   left-multiplicative Sim(3) retraction, ``lax.while_loop`` until
   ``‖dx‖ < delta_thresh`` or ``max_iter``.

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

from mast3r_slam_tpu.ops import ba_kernels, geometry, lie
from mast3r_slam_tpu.ops.robust import huber


# ---------------------------------------------------------------------------
# Jitted GN core
# ---------------------------------------------------------------------------

def _zmul(a, b):
    """Channel multiply with ``None`` as structural zero."""
    if a is None or b is None:
        return None
    return a * b


def _zsum(terms):
    acc = None
    for t in terms:
        if t is None:
            continue
        acc = t if acc is None else acc + t
    return acc


def _edge_system_fused(rho, d_res, Xp, c, adj_inv,
                       compute_dtype=jnp.bfloat16):
    """Per-edge world-frame normal-equation blocks as ONE batched Gram
    matmul, never materializing the ``(7, E, D·N)`` f32 Jacobian stack.

    The local Sim3 J-row of residual channel d has the closed form
    ``j_d = [m_d | X'×m_d | m_d·X']`` (``m_d`` = d-th row of the residual's
    point derivative, ``X'`` the transformed point). Stack the weighted rows
    and residual as ``S[e, d] = √c_d [j_d ; ρ_d] (8, N)`` in bf16; then the
    batched Gram ``G = S Sᵀ (E, D, 8, 8)`` contains every entry of
    ``H = Σ_d c_d j_d j_dᵀ`` (top-left 7x7 of ``Σ_d G[d]``) and
    ``g = Σ_d c_d ρ_d j_d`` (its last column) — one MXU pass over a
    half-size bf16 stack with f32 accumulation, instead of two f32
    dot_generals over a 176 MB weighted-Jacobian per 8-edge chunk (59.5 →
    38 ms per GN iteration at 128 edges x 196k px; see
    docs/PERFORMANCE.md). Per-channel Huber IRLS weights ``c_d`` match
    reference gn_kernels.cu:813-1138 semantics.

    ``rho``: D residual channels (E, N); ``d_res``: D x 3 channel lists
    (``None`` = structural zero); ``Xp (E, N, 3)``; ``c``: D IRLS weight
    channels (mask already folded in); ``adj_inv (E, 7, 7)``.
    """
    x, y, z = Xp[..., 0], Xp[..., 1], Xp[..., 2]
    D = len(rho)

    rows = []
    for d in range(D):
        m1, m2, m3 = d_res[d]
        sq = jnp.sqrt(c[d])
        jd = [
            m1, m2, m3,
            _zsum([_zmul(y, m3), _zmul(-z if m2 is not None else None, m2)]),
            _zsum([_zmul(z, m1), _zmul(-x if m3 is not None else None, m3)]),
            _zsum([_zmul(x, m2), _zmul(-y if m1 is not None else None, m1)]),
            _zsum([_zmul(x, m1), _zmul(y, m2), _zmul(z, m3)]),
            rho[d],
        ]
        # cast per channel BEFORE stacking: the producers then write bf16
        # directly instead of materializing 32 f32 channels that the stack
        # re-reads (halves the dominant band of the iteration)
        rows.append(jnp.stack(
            [jnp.zeros_like(rho[0], dtype=compute_dtype) if ch is None
             else (sq * ch).astype(compute_dtype) for ch in jd], axis=-2,
        ))                                        # (E, 8, N)
    S = jnp.stack(rows, axis=-3)                  # (E, D, 8, N)
    # Barrier: keep XLA from re-fusing the channel producer chain into each
    # of the dot's operand reads (duplicated-traffic pathology measured at
    # 14.7 GB/iteration in the reduction-based variant of this function).
    S = lax.optimization_barrier(S)
    G = lax.dot_general(
        S, S, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )                                             # (E, D, 8, 8)
    Gs = jnp.sum(G, axis=1)                       # (E, 8, 8)
    H_local = Gs[:, :7, :7]
    g_local = Gs[:, :7, 7]                        # (E, 7)
    # the Gram's (ρ, ρ) corner is the whitened-Huber cost — free, and what
    # makes the LM accept/reject loop possible without a second pass
    cost = jnp.sum(Gs[:, 7, 7])
    # world-frame pose-j blocks: Jj = Jl @ adj_inv; since ``J_i = -J_j``
    # exactly, the (ii, ij, jj) blocks downstream are ``(H, -H, H)`` and
    # ``g_i = -g_j``, halving the remaining work.
    H = jnp.einsum("eab,eac,ecd->ebd", adj_inv, H_local, adj_inv)
    g = jnp.einsum("eab,ea->eb", adj_inv, g_local)
    return H, g, cost


def _decimate_queries(idx_ii2jj, valid_match, Q, pixel_step):
    """BA residual decimation: keep every ``pixel_step``-th QUERY pixel of
    each edge. Reference BA uses every pixel (gn_kernels.cu loops all h*w);
    the cut is semantic and priced on the oracle ATE harness before being a
    default (scripts/matcher_cut_sweep.py). All downstream channel stacks
    shrink by the same factor — premeas gather volume, the meas cache, and
    per-GN-iteration read traffic all scale with it."""
    if pixel_step > 1:
        idx_ii2jj = idx_ii2jj[:, ::pixel_step]
        valid_match = valid_match[:, ::pixel_step]
        Q = Q[:, ::pixel_step]
    return idx_ii2jj, valid_match, Q


def _premeas_rays(X, Cavg, ii, jj, idx_ii2jj, valid_match, Q,
                  C_thresh, Q_thresh, pixel_step=1):
    """POSE-INVARIANT measured channels for the ray residual.

    Everything here depends only on the matches and the keyframe pointmaps,
    never on the poses: the scattered correspondence gather ``X[ii][e, idx]``
    (86% of a GN iteration when run in-loop), the confidence gates, AND the
    observer-side rows ``X[jj]`` (contiguous, but XLA lowers row gathers
    inside the GN scan to full-table scans — 25 ms/iter before hoisting).

    Returns channel tuple ``(mx, my, mz, di, conf, xj, yj, zj)``, each
    ``(E, N)``: unit measurement ray + its length, fully gated confidence,
    and the observer points the iteration transforms.
    """
    idx_ii2jj, valid_match, Q = _decimate_queries(idx_ii2jj, valid_match, Q,
                                                  pixel_step)
    e_idx = jnp.arange(ii.shape[0])[:, None]
    safe_idx = jnp.where(valid_match[..., 0], idx_ii2jj, 0)
    Xi = X[ii][e_idx, safe_idx]                   # (E, N, 3) scattered gather
    Ci = Cavg[ii][e_idx, safe_idx, 0]
    Cj = Cavg[jj][:, ::pixel_step, 0]
    Xj = X[jj][:, ::pixel_step]                   # (E, N, 3) contiguous rows
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
            Xi[..., 2] / di_safe, di, conf,
            Xj[..., 0], Xj[..., 1], Xj[..., 2])


def _edge_terms_rays(T_WC, ii, jj, meas, sigma_ray, sigma_dist):
    """Ray+dist residual channels for each edge (channels-first), given the
    precomputed measured channels from :func:`_premeas_rays`.

    For edge (i, j): pixel k of keyframe j matches pixel ``idx_ii2jj[e, k]``
    of keyframe i; residual compares unit rays + distances in frame i.
    Returns ``(rho, d_res, Xp, sw, adj_inv)`` for :func:`_edge_system_fused`.
    """
    # channels may be STORED bf16 (local_opt.meas_dtype — halves the cache
    # and per-iteration read traffic); all residual math runs in f32
    mx, my, mz, di, conf, xj, yj, zj = (
        ch.astype(jnp.float32) for ch in meas)
    Ti = T_WC[ii]                                 # (E, 8)
    Tj = T_WC[jj]
    Tij = lie.compose(lie.inv(Ti), Tj)
    Xj = jnp.stack([xj, yj, zj], axis=-1)

    Xp = lie.act(Tij[:, None, :], Xj)
    x, y, z = Xp[..., 0], Xp[..., 1], Xp[..., 2]
    d = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-12)
    d_inv = 1.0 / d
    rx, ry, rz = x * d_inv, y * d_inv, z * d_inv
    # rho = predicted - measured (per channel)
    rho = [rx - mx, ry - my, rz - mz, d - di]
    rr = (rx, ry, rz)
    d_res = [[d_inv * ((1.0 if a == b else 0.0) - rr[a] * rr[b])
              for b in range(3)] for a in range(3)]
    d_res.append([rx, ry, rz])

    sw_ray = jnp.sqrt(conf) / sigma_ray
    sw_dist = jnp.sqrt(conf) / sigma_dist
    sw = [sw_ray, sw_ray, sw_ray, sw_dist]
    adj_inv = lie.adjoint(lie.inv(Ti))            # (E, 7, 7)
    return rho, d_res, Xp, sw, adj_inv


def _premeas_calib(X, Cavg, ii, jj, idx_ii2jj, valid_match, Q, W_img,
                   z_eps, C_thresh, Q_thresh, pixel_step=1):
    """Pose-invariant measured channels for the calibrated residual:
    ``(ui, vi, logzi, conf, xj, yj, zj)``, each ``(E, N)``.

    Both sides use ray-constrained points (reference
    global_opt.py:145-150 constrains every pointmap with
    ``constrain_points_to_ray`` before the calib solve): for the MEASURED
    side the projection of the constrained point through K is by construction
    the pixel grid position of the match index, so ``ui, vi`` come straight
    from ``idx`` without touching K; the observer side keeps its raw x, y
    replaced by the pixel ray scaled to the stored depth (applied by the
    caller via ``constrain_X=True`` semantics — here ``X`` must already be
    the ray-constrained pointmap OR raw with identical z; only z is read for
    the measured side, and xj/yj/zj rows are emitted as stored).
    """
    idx_ii2jj, valid_match, Q = _decimate_queries(idx_ii2jj, valid_match, Q,
                                                  pixel_step)
    e_idx = jnp.arange(ii.shape[0])[:, None]
    safe_idx = jnp.where(valid_match[..., 0], idx_ii2jj, 0)
    Xi = X[ii][e_idx, safe_idx]
    Ci = Cavg[ii][e_idx, safe_idx, 0]
    Cj = Cavg[jj][:, ::pixel_step, 0]
    Xj = X[jj][:, ::pixel_step]

    zi = Xi[..., 2]
    valid_zi = zi > z_eps
    zi_safe = jnp.where(valid_zi, zi, 1.0)
    fidx = safe_idx.astype(zi.dtype)
    ui = jnp.mod(fidx, float(W_img))
    vi = jnp.floor(fidx / float(W_img))
    q = Q[..., 0]
    valid = (
        valid_match[..., 0]
        & (q > Q_thresh)
        & (Ci > C_thresh)
        & (Cj > C_thresh)
        & valid_zi
    )
    conf = jnp.where(valid, q, 0.0)
    return (ui, vi, jnp.where(valid_zi, jnp.log(zi_safe), 0.0), conf,
            Xj[..., 0], Xj[..., 1], Xj[..., 2])


def _edge_terms_calib(T_WC, ii, jj, meas, K, img_size, pixel_border,
                      z_eps, sigma_pixel, sigma_depth):
    """Calibrated pixel+logdepth residual channels (channels-first), given
    the precomputed measured channels from :func:`_premeas_calib`."""
    ui, vi, logzi, conf, xj, yj, zj = (
        ch.astype(jnp.float32) for ch in meas)
    Ti = T_WC[ii]
    Tj = T_WC[jj]
    Tij = lie.compose(lie.inv(Ti), Tj)
    Xj = jnp.stack([xj, yj, zj], axis=-1)

    Xp = lie.act(Tij[:, None, :], Xj)
    fx, fy, cx, cy = geometry.decompose_K(K)
    H_img, W_img = img_size

    x, y, z = Xp[..., 0], Xp[..., 1], Xp[..., 2]
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
    rho = [u - ui, v - vi, jnp.where(valid_z, jnp.log(z_safe), 0.0) - logzi]
    # None = structural zero: _edge_system_fused skips those products
    d_res = [
        [fx * z_inv, None, -fx * x * z_inv * z_inv],
        [None, fy * z_inv, -fy * y * z_inv * z_inv],
        [None, None, z_inv],
    ]

    conf = jnp.where(valid_proj, conf, 0.0)       # prediction-side gate
    sw_pix = jnp.sqrt(conf) / sigma_pixel
    sw_dep = jnp.sqrt(conf) / sigma_depth
    sw = [sw_pix, sw_pix, sw_dep]
    adj_inv = lie.adjoint(lie.inv(Ti))
    return rho, d_res, Xp, sw, adj_inv


def _scatter_blocks(H, g, He, ge, ii, jj, free_mask, cap):
    """Scatter per-edge blocks into the dense system (trash slot = cap).

    With ``J_i = -J_j`` the four blocks are (ii: +He, jj: +He, ij: -He) and
    the gradients are ``g_i = +ge``, ``g_j = -ge`` where
    ``ge = Adjᵀ Jlᵀ W r`` (see :func:`_edge_system_fused`).
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


# Edges are processed in chunks of this size inside a lax.scan: the PREMEAS
# scattered gather runs >20x faster chunked at 8 than whole-bucket (4 GB/s
# vs 33 GB/s measured on v5e), and the gather-free GN loop also measured
# fastest at 8 (25.5 ms/iter vs 38 at chunk 32 — the bigger bf16 Gram-stack
# transient starts spilling; see docs/PERFORMANCE.md).
import os as _os


def _validated_chunk(raw: str, default: int = 8) -> int:
    """Edge buckets are powers of two; a chunk that is not itself a power of
    two (e.g. 12) makes ``E // chunk`` truncate and the scan reshape raise at
    trace time with an opaque error — reject such overrides up front."""
    try:
        v = int(raw)
    except ValueError:
        v = -1
    if v < 1 or (v & (v - 1)) != 0:
        import warnings

        warnings.warn(
            f"MAST3R_TPU_BA_CHUNK={raw!r} is not a positive power of two; "
            f"falling back to {default}")
        return default
    return v


_EDGE_CHUNK = _validated_chunk(_os.environ.get("MAST3R_TPU_BA_CHUNK", "8"))
_PRE_CHUNK = 8


def _chunked(E):
    chunk = min(_EDGE_CHUNK, E)
    return chunk, E // chunk


def precompute_measured(premeas_fn, ii, jj, idx, valid, Q):
    """Run a measured-channel premeas over all edges as an 8-edge chunked
    scan (the chunking is what makes the scattered gather fast — see
    :data:`_PRE_CHUNK`). Returns flat ``(E, N)`` channel stacks."""
    E = ii.shape[0]
    chunk = min(_PRE_CHUNK, E)
    n_chunks = E // chunk

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
    return tuple(ch.reshape(E, -1) for ch in meas)


@partial(jax.jit, static_argnames=("C_thresh", "Q_thresh", "pixel_step"))
def precompute_meas_rays(X, Cavg, ii, jj, idx, valid, Q, C_thresh, Q_thresh,
                         pixel_step=1):
    """Jitted full-edge-set ray premeas (tests / benches / graft entry)."""
    return precompute_measured(
        lambda ii_c, jj_c, idx_c, valid_c, Q_c: _premeas_rays(
            X, Cavg, ii_c, jj_c, idx_c, valid_c, Q_c, C_thresh, Q_thresh,
            pixel_step,
        ),
        ii, jj, idx, valid, Q,
    )


@partial(jax.jit, static_argnames=("W_img", "z_eps", "C_thresh", "Q_thresh",
                                   "pixel_step"))
def precompute_meas_calib(X, Cavg, ii, jj, idx, valid, Q, W_img,
                          z_eps, C_thresh, Q_thresh, pixel_step=1):
    """Jitted full-edge-set calib premeas (``X`` must be ray-constrained)."""
    return precompute_measured(
        lambda ii_c, jj_c, idx_c, valid_c, Q_c: _premeas_calib(
            X, Cavg, ii_c, jj_c, idx_c, valid_c, Q_c, W_img,
            z_eps, C_thresh, Q_thresh, pixel_step,
        ),
        ii, jj, idx, valid, Q,
    )


def _accumulate_system(terms_fn, ii, jj, meas, edge_mask, free_mask,
                       cap, dtype, compute_dtype=jnp.bfloat16):
    """Chunked scan over edges accumulating the dense normal equations.

    ``meas``: flat ``(E, N)`` pose-invariant channel stacks — the loop body
    reads them with sequential dynamic slices and performs NO large gather."""
    E = ii.shape[0]
    chunk, n_chunks = _chunked(E)
    H0 = jnp.zeros((cap + 1, 7, cap + 1, 7), dtype=dtype)
    g0 = jnp.zeros((cap + 1, 7), dtype=dtype)
    c0 = jnp.zeros((), jnp.float32)

    def body(carry, sl):
        H, g, cost = carry
        ii_c, jj_c, mask_c, meas_c = sl
        rho, d_res, Xp, sw, adj_inv = terms_fn(ii_c, jj_c, meas_c)
        # whitened-Huber IRLS weights (+ padded-edge mask, binary)
        c = [sw[i] * sw[i] * huber(sw[i] * rho[i]) * mask_c[:, None]
             for i in range(len(rho))]
        He, ge, cost_e = _edge_system_fused(rho, d_res, Xp, c, adj_inv,
                                            compute_dtype=compute_dtype)
        H, g = _scatter_blocks(H, g, He, ge, ii_c, jj_c, free_mask, cap)
        return (H, g, cost + cost_e), None

    sl = (
        ii.reshape(n_chunks, chunk),
        jj.reshape(n_chunks, chunk),
        edge_mask.reshape(n_chunks, chunk),
        tuple(ch.reshape(n_chunks, chunk, -1) for ch in meas),
    )
    (H, g, cost), _ = lax.scan(body, (H0, g0, c0), sl)
    return H, g, cost


def _use_pallas(meas):
    """The Pallas Gram kernel needs a TPU and a tile-divisible pixel count;
    everything else (CPU tests, odd sizes) takes the XLA chunked-scan path.
    Mesh-sharded solves DO run the kernel (inside ``shard_map`` — see
    :func:`_shard_edge_system`). Channels may arrive flat ``(E, N)`` or
    already in the kernel's split ``(E, 8, N/8)`` layout."""
    if not ba_kernels.supports_pallas():
        return False
    ch = meas[0]
    if ch.ndim == 3:
        return ch.shape[2] % ba_kernels._TNL == 0
    s = ba_kernels.sublane_count(ch.dtype)
    return ch.shape[1] % (s * ba_kernels._TNL) == 0


def _edge_blocks_from_gram(G, D, Ti):
    """Extract per-edge H/g (+ total whitened-Huber cost, the Gram's (ρ, ρ)
    corner) from the kernel's Gram and map to world frame."""
    H_local = sum(G[:, d * 8:d * 8 + 7, d * 8:d * 8 + 7] for d in range(D))
    g_local = sum(G[:, d * 8:d * 8 + 7, d * 8 + 7] for d in range(D))
    cost = sum(jnp.sum(G[:, d * 8 + 7, d * 8 + 7]) for d in range(D))
    adj_inv = lie.adjoint(lie.inv(Ti))
    H = jnp.einsum("eab,eac,ecd->ebd", adj_inv, H_local, adj_inv)
    g = jnp.einsum("eab,ea->eb", adj_inv, g_local)
    return H, g, cost


def _rel_pose_rows(T, ii, jj, edge_mask, extra=()):
    """``[s*R | t | mask | extra...] (E, 13+len(extra))`` for the kernel."""
    Ti = T[ii]
    Tij = lie.compose(lie.inv(Ti), T[jj])
    sR = lie.quat_to_matrix(lie.quaternion(Tij)) * lie.scale(Tij)[..., None]
    cols = [sR.reshape(-1, 9), lie.translation(Tij), edge_mask[:, None]]
    if extra:
        E = ii.shape[0]
        row = jnp.stack([jnp.asarray(v, sR.dtype) for v in extra])
        cols.append(jnp.broadcast_to(row[None], (E, len(extra))))
    return Ti, jnp.concatenate(cols, axis=-1)


def _accumulate_pallas_rays(T, meas, ii, jj, edge_mask, free_mask, cap,
                            sigma_ray, sigma_dist,
                            compute_dtype=jnp.bfloat16, interpret=False):
    Ti, rts = _rel_pose_rows(T, ii, jj, edge_mask)
    G = ba_kernels.gram_rays(rts, meas, sigma_ray, sigma_dist,
                             compute_dtype=compute_dtype, interpret=interpret)
    He, ge, cost = _edge_blocks_from_gram(G, 4, Ti)
    H0 = jnp.zeros((cap + 1, 7, cap + 1, 7), T.dtype)
    g0 = jnp.zeros((cap + 1, 7), T.dtype)
    H, g = _scatter_blocks(H0, g0, He, ge, ii, jj, free_mask, cap)
    return H, g, cost


def _accumulate_pallas_calib(T, meas, K, ii, jj, edge_mask, free_mask, cap,
                             img_size, pixel_border, z_eps,
                             sigma_pixel, sigma_depth,
                             compute_dtype=jnp.bfloat16, interpret=False):
    fx, fy, cx, cy = geometry.decompose_K(K)
    Ti, rts = _rel_pose_rows(T, ii, jj, edge_mask, extra=(fx, fy, cx, cy))
    G = ba_kernels.gram_calib(rts, meas, img_size, pixel_border, z_eps,
                              sigma_pixel, sigma_depth,
                              compute_dtype=compute_dtype, interpret=interpret)
    He, ge, cost = _edge_blocks_from_gram(G, 3, Ti)
    H0 = jnp.zeros((cap + 1, 7, cap + 1, 7), T.dtype)
    g0 = jnp.zeros((cap + 1, 7), T.dtype)
    H, g = _scatter_blocks(H0, g0, He, ge, ii, jj, free_mask, cap)
    return H, g, cost


def _shard_edge_system(mesh, accum, T, free_mask, ii, jj, edge_mask, meas,
                       extra_arrays=()):
    """Run a per-edge Pallas accumulate on each device's local slice of the
    (edge-sharded) two-way buffers and ``psum`` the dense normal equations
    over the mesh's edge axis.

    ``pallas_call`` cannot be auto-partitioned by GSPMD, so under a mesh the
    kernel runs inside ``shard_map``: every device builds the full-size dense
    system from ITS edges only (the scatter targets are global keyframe slots,
    so local scatters are disjoint contributions), and one psum over the edge
    axis reproduces the single-chip system bit-for-bit up to f32 summation
    order. ``accum(T, meas, ii, jj, mask, free, *extras)`` is one of the
    ``_accumulate_pallas_*`` closures. ``extra_arrays`` (e.g. K) replicate.
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_extra = len(extra_arrays)

    def local(T_r, free_r, ii_l, jj_l, mask_l, *rest):
        extras = rest[:n_extra]
        meas_l = rest[n_extra:]
        H, g, cost = accum(T_r, tuple(meas_l), ii_l, jj_l, mask_l, free_r,
                           *extras)
        return lax.psum(H, axis), lax.psum(g, axis), lax.psum(cost, axis)

    in_specs = ((P(), P(), P(axis), P(axis), P(axis))
                + tuple(P() for _ in extra_arrays)
                + tuple(P(axis) for _ in meas))
    return jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=(P(), P(), P()), check_vma=False)(
        T, free_mask, ii, jj, edge_mask, *extra_arrays, *meas)


def _solve_system(H, g, free_mask, cap, damping):
    """Dense Cholesky of the accumulated system. Returns ``dx (cap, 7)``.

    ``damping`` is Marquardt-style RELATIVE damping: ``H + λ·diag(H)``.
    Absolute ``λI`` is meaningless here — H's diagonal scales with
    ``n_pix · conf/σ²`` (~1e10 at production shapes), so any fixed absolute
    λ is either invisible or crushing depending on edge count.
    """
    Hd = H[:cap, :, :cap, :].reshape(cap * 7, cap * 7)
    gd = g[:cap].reshape(cap * 7)

    # Identity rows for non-free poses keep the system well-posed.
    diag_free = jnp.repeat(free_mask[:cap], 7)
    Hd = jnp.where(diag_free[:, None] & diag_free[None, :], Hd, 0.0)
    # bf16-Gram rounding leaves H slightly asymmetric/indefinite along weak
    # dims (diag ~1e9, weak eigenvalues ~1e0): symmetrize before factoring
    Hd = 0.5 * (Hd + Hd.T)
    eye = jnp.eye(cap * 7, dtype=Hd.dtype)
    diag = jnp.diagonal(Hd)
    Hd = Hd + jnp.where(diag_free,
                        damping * jnp.maximum(diag, 1e-6), 1.0)[:, None] * eye
    gd = jnp.where(diag_free, gd, 0.0)

    Lc = jnp.linalg.cholesky(Hd)
    ok = jnp.all(jnp.isfinite(Lc))
    Lc_safe = jnp.where(ok, Lc, eye)
    dx = jax.scipy.linalg.cho_solve((Lc_safe, True), gd)
    dx = jnp.where(ok, dx, 0.0)
    return dx.reshape(cap, 7), ok


def _lm_loop(system, T_WC, free_mask, cap, max_iter, delta_thresh, damping):
    """Levenberg-Marquardt accept/reject driver shared by the BA solvers.

    The reference backend (gn_kernels.cu:813-1138 + global_opt.py) takes
    plain Gauss-Newton steps with a fixed tiny damping; on weakly-constrained
    poses (e.g. a keyframe held by a single low-overlap edge) those steps
    oscillate in the scale direction and can walk the pose away without any
    signal (observed on the oracle scene: one pose's scale swung 0.99 → 0.49
    in 10 iterations while every other pose stayed put). Here each iteration
    evaluates the TRUE whitened-Huber cost of the candidate — free, it is
    the (ρ, ρ) corner of the same Gram that builds H/g — and:

    - accept (cost decreased): keep the candidate, relax λ toward the base
      ``damping`` (λ ← max(damping, λ/4)),
    - reject: keep the previous iterate, λ ← 10λ, re-solve the SAME system
      with the stiffer damping.

    When every step accepts (the healthy case), λ stays at ``damping`` and
    the iterate sequence is exactly the reference's GN trajectory. One extra
    system build (at T₀) per solve is the only added cost. Deviation from
    the reference documented in PARITY.md.
    """
    H0, g0, c0 = system(T_WC)

    def body(state):
        T_ref, cost_ref, H, g, lam, it, _ = state
        dx, chol_ok = _solve_system(H, g, free_mask, cap, lam)
        T_cand = jax.vmap(lie.retr)(T_ref, dx)
        H_c, g_c, cost_c = system(T_cand)
        accept = chol_ok & (cost_c < cost_ref)
        T_ref = jnp.where(accept, T_cand, T_ref)
        cost_ref = jnp.where(accept, cost_c, cost_ref)
        H = jnp.where(accept, H_c, H)
        g = jnp.where(accept, g_c, g)
        lam = jnp.where(accept, jnp.maximum(damping, lam * 0.25), lam * 10.0)
        # only a tiny ACCEPTED step means converged; rejections (incl.
        # Cholesky failures) shrink dx as λ escalates and must not read as
        # convergence — the λ cap below bounds a reject-only stall instead
        delta = jnp.where(chol_ok & accept, jnp.linalg.norm(dx),
                          jnp.asarray(jnp.inf, dx.dtype))
        delta = jnp.where(lam > 1e8, 0.0, delta)   # stuck: no step accepts
        return T_ref, cost_ref, H, g, lam, it + 1, delta

    def cond(state):
        *_, it, delta = state
        return (it < max_iter) & (delta >= delta_thresh)

    lam0 = jnp.asarray(damping, jnp.float32)
    T, *_ = lax.while_loop(
        cond, body,
        (T_WC, c0, H0, g0, lam0, jnp.asarray(0),
         jnp.asarray(jnp.inf, T_WC.dtype)),
    )
    return T


@partial(jax.jit,
         static_argnames=("sigma_ray", "sigma_dist", "max_iter",
                          "allow_pallas", "compute_dtype", "mesh",
                          "pallas_interpret"),
         donate_argnums=(0,))
def gauss_newton_rays(T_WC, meas, ii, jj, edge_mask, free_mask,
                      sigma_ray, sigma_dist,
                      max_iter, delta_thresh, damping=1e-4,
                      allow_pallas=True, compute_dtype="bfloat16",
                      mesh=None, pallas_interpret=False):
    """Global ray-alignment BA over padded two-way edges. Updates T_WC (cap, 8).

    ``meas``: pose-invariant channel stacks from :func:`precompute_meas_rays`
    (or the :class:`FactorGraph` cross-solve cache). ``ii, jj (E,)`` already
    two-way-duplicated; ``edge_mask (E,)`` masks padding; ``free_mask (cap,)``
    marks poses that may move. ``mesh``: run the Pallas edge-system kernel
    inside ``shard_map`` over the mesh's edge axis (requires ``E`` divisible
    by the mesh size). ``pallas_interpret``: force the kernel in interpret
    mode (CPU-mesh tests).

    Iterations are Levenberg-Marquardt with accept/reject (see
    :func:`_lm_loop`) — the whitened-Huber cost falls out of the edge-system
    Gram for free, so step control costs nothing extra per iteration.
    """
    cap = T_WC.shape[0]
    cdt = jnp.dtype(compute_dtype)
    interp = bool(pallas_interpret)
    pallas = allow_pallas and (interp or _use_pallas(meas))
    if pallas and meas[0].ndim == 2:
        # the kernel's sublane-split relayout is a real copy — do it ONCE
        # per solve, not inside the GN loop (measured 32 ms/solve in-loop);
        # the FactorGraph cache stores the split layout to skip even this
        meas = ba_kernels.view_sublane_split(meas)
    elif not pallas and meas[0].ndim == 3:
        meas = tuple(ch.reshape(ch.shape[0], -1) for ch in meas)

    def system(T):
        if pallas and mesh is not None:
            def accum(T_r, meas_l, ii_l, jj_l, mask_l, free_r):
                return _accumulate_pallas_rays(
                    T_r, meas_l, ii_l, jj_l, mask_l, free_r, cap,
                    sigma_ray, sigma_dist, compute_dtype=cdt,
                    interpret=interp)

            return _shard_edge_system(mesh, accum, T, free_mask, ii, jj,
                                      edge_mask, meas)
        if pallas:
            return _accumulate_pallas_rays(
                T, meas, ii, jj, edge_mask, free_mask, cap,
                sigma_ray, sigma_dist, compute_dtype=cdt, interpret=interp)

        def terms(ii_c, jj_c, meas_c):
            return _edge_terms_rays(T, ii_c, jj_c, meas_c,
                                    sigma_ray, sigma_dist)

        return _accumulate_system(terms, ii, jj, meas,
                                  edge_mask, free_mask, cap, T.dtype,
                                  compute_dtype=cdt)

    return _lm_loop(system, T_WC, free_mask, cap, max_iter, delta_thresh,
                    damping)


@partial(jax.jit,
         static_argnames=("img_size", "pixel_border", "z_eps",
                          "sigma_pixel", "sigma_depth", "max_iter",
                          "allow_pallas", "compute_dtype", "mesh",
                          "pallas_interpret"),
         donate_argnums=(0,))
def gauss_newton_calib(T_WC, meas, K, ii, jj, edge_mask, free_mask, img_size,
                       pixel_border, z_eps, sigma_pixel, sigma_depth,
                       max_iter, delta_thresh, damping=1e-4,
                       allow_pallas=True, compute_dtype="bfloat16",
                       mesh=None, pallas_interpret=False):
    """Global calibrated BA (pixel + log-depth residuals)."""
    cap = T_WC.shape[0]
    cdt = jnp.dtype(compute_dtype)
    interp = bool(pallas_interpret)
    pallas = allow_pallas and (interp or _use_pallas(meas))
    if pallas and meas[0].ndim == 2:
        meas = ba_kernels.view_sublane_split(meas)
    elif not pallas and meas[0].ndim == 3:
        meas = tuple(ch.reshape(ch.shape[0], -1) for ch in meas)

    def system(T):
        if pallas and mesh is not None:
            def accum(T_r, meas_l, ii_l, jj_l, mask_l, free_r, K_r):
                return _accumulate_pallas_calib(
                    T_r, meas_l, K_r, ii_l, jj_l, mask_l, free_r, cap,
                    img_size, pixel_border, z_eps, sigma_pixel, sigma_depth,
                    compute_dtype=cdt, interpret=interp)

            return _shard_edge_system(mesh, accum, T, free_mask, ii, jj,
                                      edge_mask, meas, extra_arrays=(K,))
        if pallas:
            return _accumulate_pallas_calib(
                T, meas, K, ii, jj, edge_mask, free_mask, cap, img_size,
                pixel_border, z_eps, sigma_pixel, sigma_depth,
                compute_dtype=cdt, interpret=interp)

        def terms(ii_c, jj_c, meas_c):
            return _edge_terms_calib(T, ii_c, jj_c, meas_c, K, img_size,
                                     pixel_border, z_eps, sigma_pixel,
                                     sigma_depth)

        return _accumulate_system(terms, ii, jj, meas,
                                  edge_mask, free_mask, cap, T.dtype,
                                  compute_dtype=cdt)

    return _lm_loop(system, T_WC, free_mask, cap, max_iter, delta_thresh,
                    damping)


# ---------------------------------------------------------------------------
# Host-side factor graph
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("img_hw",))
def _geo_match_init(X_i, X_j, T_i, T_j, img_hw):
    """Pose-projected matcher inits for both directions of B edges.

    ``matching.match(X11, X21, init)`` expects one init entry PER IMAGE-2
    PIXEL giving a pixel of image 1 (the matcher projects image-2 targets
    into image 1 — see the tracker's ``Xf = Xf_all[idx0]`` usage). So the
    init for the direction whose output is ``idx_ii2jj``
    (``match(Xii, Xji)``: j-pixels → i-pixels) is the projection of
    keyframe j's points into camera i, and vice versa.
    ``X (B, N, 3)``, ``T (B, 8)``. Returns ``(init_ii2jj, init_jj2ii)``.
    """
    f_i = geometry.estimate_focal(X_i, img_hw)
    f_j = geometry.estimate_focal(X_j, img_hw)
    init_ii2jj = geometry.project_to_index(X_j, T_j, T_i, f_i, img_hw)
    init_jj2ii = geometry.project_to_index(X_i, T_i, T_j, f_j, img_hw)
    return init_ii2jj, init_jj2ii


def _bucket(n, minimum=8):
    b = minimum
    while b < n:
        b *= 2
    return b


class FactorGraph:
    """Edge store + BA driver (capability parity with reference
    mast3r_slam/global_opt.py:12-223, redesigned around padded device buffers).

    Beyond the reference, the pose-invariant measured channels of every edge
    (incl. the scattered correspondence gather) are CACHED across solves and
    refreshed per edge only when a touched keyframe's version counter moved —
    repeat solves skip ~400 ms of gather at production scale.
    """

    def __init__(self, model, keyframes, cfg, K=None, mesh=None,
                 home_device=None):
        self.model = model
        self.keyframes = keyframes
        self.cfg = cfg["local_opt"]
        self.K = K
        # Optional device mesh: the two-way padded edge buffers are sharded
        # over its edge axis at solve time (power-of-two buckets are always
        # divisible by the mesh size for meshes up to the minimum bucket).
        # ``home_device``: where solved poses are committed back to (the
        # frontend device in a disjoint topology — see parallel/topology.py);
        # None keeps them wherever the solve left them.
        self.mesh = mesh
        self.home_device = home_device
        # which solve placement ran (observability + multichip tests):
        # "sharded" = edge bucket divisible by the mesh → shard_map solve;
        # "fallback_single_device" = non-divisible early bucket → first
        # backend chip (see _two_way_padded)
        self.solve_stats = {"sharded": 0, "fallback_single_device": 0}
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
        # Measured-channel cache: per ONE-WAY edge and direction, plus the
        # (gather-side, row-side) keyframe versions it was computed at.
        # Stored directly in the Pallas kernel's (E, 8, N/8) layout when the
        # kernel will run — the relayout is a real copy, paid once per edge
        # at premeas time instead of per solve. Mesh-sharded solves keep the
        # split layout too: the shard axis is the leading edge dim, which the
        # relayout never touches.
        # BA residual decimation (local_opt.pixel_step): every channel
        # stack, the meas cache, and the per-iteration read volume shrink by
        # this factor. 1 = reference semantics (every pixel).
        self.pixel_step = int(self.cfg.get("pixel_step", 1))
        # measured-channel STORAGE dtype (local_opt.meas_dtype): bfloat16
        # halves the cache and per-GN-iteration read traffic; all residual
        # math widens to f32 at load (kernel + XLA paths). float32 = strict.
        self.meas_dtype = jnp.dtype(self.cfg.get("meas_dtype", "float32"))
        n_ba = n_pix // self.pixel_step
        s_sub = ba_kernels.sublane_count(self.meas_dtype)
        self._split_layout = (ba_kernels.supports_pallas()
                              and n_ba % (s_sub * ba_kernels._TNL) == 0)
        self._meas_kind: str | None = None
        self._meas_ij: tuple | None = None        # dir i->j (gather side ii)
        self._meas_ji: tuple | None = None        # dir j->i (gather side jj)
        self._meas_ver_ij = np.zeros((0, 2), np.int64)
        self._meas_ver_ji = np.zeros((0, 2), np.int64)

    def n_edges(self):
        return int(self.ii.shape[0])

    def add_factors(self, ii_new, jj_new, min_match_frac, is_reloc=False,
                    init_hint=None, allow_geo_init=True):
        """Symmetric-decode candidate edges; accept by bidirectional coverage.

        Returns True if at least one edge was added. In strict-reloc mode the
        whole batch is rejected if ANY edge is invalid (reference
        global_opt.py:78-79).

        ``init_hint`` (optional) carries the tracker's converged
        frame→keyframe match for the consecutive edge ``(i, j)``:

        - 5-tuple ``(i, j, idx_j2i, valid_i, Q_i)`` — REUSED verbatim as
          the edge's whole j→i direction (``idx_j2i (N,)`` maps i-pixels →
          j-pixels; ``valid_i (N, 1)`` the matcher's valid mask; ``Q_i
          (N, 1)`` the fused ``sqrt(Qjj[idx]·Qij)`` the tracker already
          computed). The event then runs only the (i, j) half-decode + one
          matcher (``model.match_oneway``). Single-device path only.
        - legacy 3-tuple ``(i, j, idx_j2i)`` — warm-starts the full
          symmetric matcher's j→i direction instead.
        """
        if len(ii_new) == 0:
            return False
        kf = self.keyframes
        # ``allow_geo_init=False`` for relocalization calls regardless of
        # reloc.strict: the candidate poses are exactly what is in question
        # there, so projecting through them seeds the matcher WORSE than
        # identity (``is_reloc`` is the reference's batch-strictness flag,
        # which non-strict reloc legitimately passes as False).
        use_geo = (allow_geo_init and not is_reloc
                   and bool(self.cfg.get("warm_start_geo", True)))
        with kf.lock:
            feat_i = kf.feat[np.asarray(ii_new)]
            feat_j = kf.feat[np.asarray(jj_new)]
            pos_i = kf.pos[np.asarray(ii_new)]
            pos_j = kf.pos[np.asarray(jj_new)]
            if use_geo:
                # only the geometric warm start consumes these — don't pay
                # four (B, n_pix, 3)/(B, 8) gathers under the keyframe lock
                # (blocking the tracker) on reloc / warm_start_geo=False
                X_i = kf.X[np.asarray(ii_new)]
                X_j = kf.X[np.asarray(jj_new)]
                T_i = kf.T_WC[np.asarray(ii_new)]
                T_j = kf.T_WC[np.asarray(jj_new)]
        img_hw = kf.img_shapes[int(ii_new[0])][1]

        # Geometric warm start for every edge in BOTH directions: project
        # each keyframe's pointmap into the other through the current pose
        # estimates (by solve time the poses ARE known for loop-closure /
        # retrieval edges — reference matching_kernels.cu:119-275 init
        # semantics). Approximation errors only cost LM iterations. Skipped
        # in reloc mode, where the candidate poses are exactly what is in
        # question and identity is the safer init.
        init_i2j = init_j2i = None
        if use_geo:
            # pointmaps live at the WORKING resolution (img_hw is the model
            # resolution — they differ under dataset.img_downsample)
            init_i2j, init_j2i = _geo_match_init(X_i, X_j, T_i, T_j,
                                                 (kf.h, kf.w))

        # Hint handling. A 5-tuple hint (i, j, idx_j2i, valid_i, Qi) REUSES
        # the tracker's converged frame→keyframe match as the whole j→i
        # direction of the consecutive edge: the tracker's decode
        # (frame=j ↔ keyframe=i) and matcher are bit-identical computations
        # to what match_symmetric would redo for that direction, so the
        # event pays only the (i, j) decode + one matcher (match_oneway) —
        # roughly half the edge-creation device time. A legacy 3-tuple
        # (i, j, idx_j2i) only warm-starts the full symmetric matcher.
        reuse_row = None
        if init_hint is not None and not is_reloc:
            hi, hj = init_hint[0], init_hint[1]
            rows = [r for r in range(len(ii_new))
                    if int(ii_new[r]) == int(hi) and int(jj_new[r]) == int(hj)]
            if rows and len(init_hint) == 5 and self.mesh is None \
                    and hasattr(self.model, "match_oneway"):
                reuse_row = rows[0]
            elif rows:
                n = self.n_pix
                if init_j2i is None:
                    init_j2i = jnp.broadcast_to(
                        jnp.arange(n, dtype=jnp.int32)[None],
                        (len(ii_new), n))
                # the tracker's CONVERGED correspondence beats the geometric
                # projection for its (consecutive) edge. It maps i-pixels →
                # j-pixels, i.e. it is an init for the matcher whose OUTPUT
                # is idx_jj2ii (init entries are indexed by image-2 pixels).
                init_j2i = init_j2i.at[rows[0]].set(
                    jnp.asarray(init_hint[2]).reshape(-1)[:n]
                    .astype(jnp.int32))

        if reuse_row is not None:
            r = reuse_row
            n = self.n_pix
            full = [k for k in range(len(ii_new)) if k != r]
            # i→j direction of the hint edge: half-decode + one matcher
            idx1, vj1, Qii1, Qji1 = self.model.match_oneway(
                feat_i[r:r + 1], pos_i[r:r + 1], feat_j[r:r + 1],
                pos_j[r:r + 1], img_hw,
                init_i2j=None if init_i2j is None else init_i2j[r:r + 1])
            Qj1 = jnp.sqrt(Qii1[0][idx1[0]] * Qji1[0])[None, :, None]
            idx2 = jnp.asarray(init_hint[2]).reshape(1, n).astype(jnp.int32)
            vi1 = jnp.asarray(init_hint[3]).reshape(1, n, 1)
            Qi1 = jnp.asarray(init_hint[4], jnp.float32).reshape(1, n, 1)
            if full:
                fj = jnp.asarray(full)
                (fidx_i2j, fidx_j2i, fvalid_j, fvalid_i, fQii, fQjj, fQji,
                 fQij) = self.model.match_symmetric(
                    feat_i[fj], pos_i[fj], feat_j[fj], pos_j[fj], img_hw,
                    init_i2j=None if init_i2j is None else init_i2j[fj],
                    init_j2i=None if init_j2i is None else init_j2i[fj])
                fb = jnp.arange(fidx_i2j.shape[0])[:, None]
                fQj = jnp.sqrt(fQii[fb, fidx_i2j] * fQji)
                fQi = jnp.sqrt(fQjj[fb, fidx_j2i] * fQij)

                def merge(hint_v, full_v):
                    out = [None] * len(ii_new)
                    out[r] = hint_v[0]
                    for k, row in enumerate(full):
                        out[row] = full_v[k]
                    return jnp.stack(out)

                idx_i2j = merge(idx1, fidx_i2j)
                idx_j2i = merge(idx2, fidx_j2i)
                valid_j = merge(vj1, fvalid_j)
                valid_i = merge(vi1, fvalid_i)
                Qj = merge(Qj1, fQj)
                Qi = merge(Qi1, fQi)
            else:
                idx_i2j, idx_j2i = idx1, idx2
                valid_j, valid_i = vj1, vi1
                Qj, Qi = Qj1, Qi1
        else:
            (idx_i2j, idx_j2i, valid_j, valid_i, Qii, Qjj, Qji, Qij) = (
                self.model.match_symmetric(feat_i, pos_i, feat_j, pos_j,
                                           img_hw, init_i2j=init_i2j,
                                           init_j2i=init_j2i)
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

    # -- measured-channel cache ---------------------------------------------

    def _kf_versions(self):
        """Pointmap-CONTENT versions (pose-only updates — including this
        graph's own solves — must not invalidate the cache)."""
        return np.asarray(self.keyframes.xc_version, np.int64).copy()

    def _premeas_rows(self, kind, rows, direction, X, Cavg):
        """Compute measured channels for one-way edge ``rows`` in the given
        direction, padded to a power-of-two bucket (one compile per size)."""
        rows = np.asarray(rows, np.int64)
        # minimum bucket 2 (not 8): the steady-state call premeases the 1-2
        # edges a keyframe event just added — padding those to 8 made every
        # event pay 4x the necessary gather (~60 ms vs ~15 at production
        # scale). Solve-side buckets stay at minimum 8 for mesh divisibility.
        B = _bucket(len(rows), minimum=2)
        pad_rows = np.concatenate(
            [rows, np.zeros(B - len(rows), np.int64)])
        rj = jnp.asarray(pad_rows)
        if direction == "ij":
            g_kf = jnp.asarray(self.ii[pad_rows])
            r_kf = jnp.asarray(self.jj[pad_rows])
            idx, valid, Q = (self.idx_ii2jj[rj], self.valid_match_j[rj],
                             self.Q_ii2jj[rj])
        else:
            g_kf = jnp.asarray(self.jj[pad_rows])
            r_kf = jnp.asarray(self.ii[pad_rows])
            idx, valid, Q = (self.idx_jj2ii[rj], self.valid_match_i[rj],
                             self.Q_jj2ii[rj])
        C_thresh = float(self.cfg["C_conf"])
        Q_thresh = float(self.cfg["Q_conf"])
        if kind == "rays":
            meas = precompute_meas_rays(X, Cavg, g_kf, r_kf, idx, valid, Q,
                                        C_thresh, Q_thresh,
                                        pixel_step=self.pixel_step)
        else:
            meas = precompute_meas_calib(
                X, Cavg, g_kf, r_kf, idx, valid, Q, self.keyframes.w,
                float(self.cfg["depth_eps"]), C_thresh, Q_thresh,
                pixel_step=self.pixel_step)
        meas = tuple(ch[:len(rows)].astype(self.meas_dtype) for ch in meas)
        if self._split_layout:
            meas = ba_kernels.view_sublane_split(meas)
        return meas

    def _ensure_meas(self, kind):
        """Create/refresh the per-edge measured-channel cache: new edges are
        appended; cached edges are recomputed only if the version counter of
        either touched keyframe moved (TSDF refinement writeback, pointmap
        fusion on a then-current keyframe, ...)."""
        E = self.n_edges()
        if E == 0:
            return
        kf = self.keyframes
        ver = self._kf_versions()
        want_ij = np.stack([ver[self.ii], ver[self.jj]], 1)
        want_ji = np.stack([ver[self.jj], ver[self.ii]], 1)

        # The premeas inputs are only needed when at least one row is
        # actually (re)computed — a warm-cache solve must not pay the Cavg
        # build, the calib ray-constraint, or the ~260 MB X/Cavg replication
        # onto the backend mesh. Build lazily, once per _ensure_meas call.
        _cache = []

        def _inputs():
            if _cache:
                return _cache[0]
            X = kf.X
            Cavg = kf.C / jnp.clip(
                jnp.asarray(kf.N, jnp.float32)[:, None, None], 1.0)
            if kind == "calib":
                # both solve sides use ray-constrained points (reference
                # global_opt.py:145-150)
                X = geometry.constrain_points_to_ray(
                    (kf.h, kf.w), X.reshape(-1, self.n_pix, 3), self.K)
            if self.mesh is not None:
                # Disjoint topology: the keyframe buffers live on the
                # frontend device; replicate the premeas inputs onto the
                # backend sub-mesh so the gather programs run there (mixing
                # commitments would error, and running on the frontend chip
                # would stall tracking).
                from mast3r_slam_tpu.parallel import sharding as S

                X = S.replicate(X, self.mesh)
                Cavg = S.replicate(Cavg, self.mesh)
            _cache.append((X, Cavg))
            return _cache[0]

        if self._meas_kind != kind or self._meas_ij is None:
            rows = np.arange(E)
            X, Cavg = _inputs()
            self._meas_ij = self._premeas_rows(kind, rows, "ij", X, Cavg)
            self._meas_ji = self._premeas_rows(kind, rows, "ji", X, Cavg)
            self._meas_kind = kind
            self._meas_ver_ij = want_ij
            self._meas_ver_ji = want_ji
            return

        E0 = self._meas_ver_ij.shape[0]
        if E0 < E:
            rows = np.arange(E0, E)
            X, Cavg = _inputs()
            new_ij = self._premeas_rows(kind, rows, "ij", X, Cavg)
            new_ji = self._premeas_rows(kind, rows, "ji", X, Cavg)
            self._meas_ij = tuple(
                jnp.concatenate([a, b]) for a, b in zip(self._meas_ij, new_ij))
            self._meas_ji = tuple(
                jnp.concatenate([a, b]) for a, b in zip(self._meas_ji, new_ji))
            self._meas_ver_ij = np.concatenate(
                [self._meas_ver_ij, want_ij[E0:]])
            self._meas_ver_ji = np.concatenate(
                [self._meas_ver_ji, want_ji[E0:]])

        for direction, ver_cached, want in (
            ("ij", self._meas_ver_ij, want_ij),
            ("ji", self._meas_ver_ji, want_ji),
        ):
            stale = np.where((ver_cached != want).any(axis=1))[0]
            if stale.size == 0:
                continue
            X, Cavg = _inputs()
            fresh = self._premeas_rows(kind, stale, direction, X, Cavg)
            sj = jnp.asarray(stale)
            if direction == "ij":
                self._meas_ij = tuple(
                    ch.at[sj].set(f) for ch, f in zip(self._meas_ij, fresh))
            else:
                self._meas_ji = tuple(
                    ch.at[sj].set(f) for ch, f in zip(self._meas_ji, fresh))
            ver_cached[stale] = want[stale]

    def drop_meas_cache(self):
        """Invalidate the measured-channel cache (e.g. after a checkpoint
        restore replaced the keyframe buffers wholesale)."""
        self._meas_kind = None
        self._meas_ij = self._meas_ji = None
        self._meas_ver_ij = np.zeros((0, 2), np.int64)
        self._meas_ver_ji = np.zeros((0, 2), np.int64)

    # -- solve drivers -------------------------------------------------------

    def _two_way_padded(self):
        """Two-way duplicated edge+meas arrays padded to a power-of-two
        bucket."""
        E = self.n_edges()
        ii2 = np.concatenate([self.ii, self.jj])
        jj2 = np.concatenate([self.jj, self.ii])
        meas = tuple(
            jnp.concatenate([a, b]) for a, b in
            zip(self._meas_ij, self._meas_ji)
        )

        pad = _bucket(2 * E) - 2 * E
        mask = np.ones(2 * E, np.float32)
        if pad:
            ii2 = np.concatenate([ii2, np.zeros(pad, np.int32)])
            jj2 = np.concatenate([jj2, np.zeros(pad, np.int32)])
            meas = tuple(
                jnp.concatenate(
                    [ch, jnp.zeros((pad,) + ch.shape[1:], ch.dtype)])
                for ch in meas
            )
            mask = np.concatenate([mask, np.zeros(pad, np.float32)])
        out = (jnp.asarray(ii2), jnp.asarray(jj2), jnp.asarray(mask), meas)
        solve_mesh = None
        if self.mesh is not None:
            from mast3r_slam_tpu.parallel import sharding as S

            n_dev = int(np.prod(self.mesh.devices.shape))
            if out[0].shape[0] % n_dev == 0:
                out = (
                    S.shard_leading(out[0], self.mesh),
                    S.shard_leading(out[1], self.mesh),
                    S.shard_leading(out[2], self.mesh),
                    tuple(S.shard_leading(ch, self.mesh) for ch in meas),
                )
                solve_mesh = self.mesh
                self.solve_stats["sharded"] += 1
            else:
                self.solve_stats["fallback_single_device"] += 1
                # bucket not divisible by the mesh (e.g. few edges early in
                # a session on a large slice): fall back to a single-device
                # solve on the first backend chip. The meas channels were
                # already committed to mesh devices by _ensure_meas, so
                # EVERY solve input must land on that one device — mixed
                # frontend/backend commitments make jit raise.
                dev0 = self.mesh.devices.flat[0]
                out = (
                    jax.device_put(out[0], dev0),
                    jax.device_put(out[1], dev0),
                    jax.device_put(out[2], dev0),
                    tuple(jax.device_put(ch, dev0) for ch in meas),
                )
        return out + (solve_mesh,)

    def _place_T(self, T, solve_mesh):
        """Place the pose table where the solve runs (it may arrive
        committed to the frontend device, and jit rejects inputs committed
        to different devices): replicated over the backend mesh, or on the
        first backend chip for the non-divisible single-device fallback."""
        if solve_mesh is None:
            if self.mesh is not None:
                return jax.device_put(T, self.mesh.devices.flat[0])
            return T  # donated and immediately replaced by the caller
        from mast3r_slam_tpu.parallel import sharding as S

        return S.replicate(T, solve_mesh)

    def _place_K(self, solve_mesh):
        if self.K is None:
            return self.K
        if solve_mesh is None:
            if self.mesh is not None:
                return jax.device_put(self.K, self.mesh.devices.flat[0])
            return self.K
        from mast3r_slam_tpu.parallel import sharding as S

        return S.replicate(self.K, solve_mesh)

    def _home(self, T_new):
        """Commit solved poses back to the frontend device so downstream
        tracking programs stay on their own chip."""
        if self.home_device is None:
            return T_new
        return jax.device_put(T_new, self.home_device)

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
        with kf.lock:
            self._ensure_meas("rays")
            ii2, jj2, mask, meas, solve_mesh = self._two_way_padded()
            T_new = gauss_newton_rays(
                self._place_T(kf.T_WC, solve_mesh), meas, ii2, jj2, mask,
                self._free_mask(unique),
                float(self.cfg["sigma_ray"]), float(self.cfg["sigma_dist"]),
                int(self.cfg["max_iters"]), float(self.cfg["delta_norm"]),
                compute_dtype=str(self.cfg.get("ba_compute_dtype",
                                               "bfloat16")),
                mesh=solve_mesh,
            )
            kf.T_WC = self._home(T_new)
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
        with kf.lock:
            self._ensure_meas("calib")
            ii2, jj2, mask, meas, solve_mesh = self._two_way_padded()
            T_new = gauss_newton_calib(
                self._place_T(kf.T_WC, solve_mesh),
                meas, self._place_K(solve_mesh), ii2, jj2, mask,
                self._free_mask(unique), img_size,
                float(self.cfg["pixel_border"]), float(self.cfg["depth_eps"]),
                float(self.cfg["sigma_pixel"]), float(self.cfg["sigma_depth"]),
                int(self.cfg["max_iters"]), float(self.cfg["delta_norm"]),
                compute_dtype=str(self.cfg.get("ba_compute_dtype",
                                               "bfloat16")),
                mesh=solve_mesh,
            )
            kf.T_WC = self._home(T_new)
            for i in unique[int(self.cfg["pin"]):]:
                kf.version[int(i)] += 1
