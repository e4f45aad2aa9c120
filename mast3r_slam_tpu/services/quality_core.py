"""Pointmap quality assessment — pure jittable tensor core.

Capability parity with the reference quality core (reference:
mast3r_slam/quality_core.py): per-keyframe 16x16-patch-grid reductions of
residuals / uncertainty / coverage, EWMA coverage deltas, robust z-scores, and
a 3-way degradation classification with normalized refinement priorities.

Redesigned for TPU: the whole per-keyframe computation is ONE jitted function
over fixed (H, W); masked nan-median reductions are expressed as sort-based
masked medians (no data-dependent shapes). Batch processing is a vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _to_grid(x, ps):
    """(H, W) → (gh, gw, ps*ps) patch grid."""
    h, w = x.shape
    gh, gw = h // ps, w // ps
    x = x[: gh * ps, : gw * ps].reshape(gh, ps, gw, ps)
    return x.transpose(0, 2, 1, 3).reshape(gh, gw, ps * ps), gh, gw


def masked_median(x, mask):
    """Median over the last axis counting only ``mask`` entries (0 if none).

    Sort-based: invalid entries are pushed to +inf, then the median of the k
    valid entries is element ``(k-1)//2`` — the LOWER middle element for even
    k, matching ``torch.nanmedian`` (reference quality_core.py:21-26), not
    the two-element average ``numpy.median`` would take.
    """
    big = jnp.asarray(jnp.inf, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=-1)
    k = jnp.sum(mask, axis=-1)
    lo = jnp.clip((k - 1) // 2, 0)
    med = jnp.take_along_axis(xs, lo[..., None], -1)[..., 0]
    return jnp.where(k > 0, med, 0.0)


def reduce_grid(x, ps, valid=None, method="median"):
    """Patch-grid reduction of ``x (H, W)`` with optional validity mask."""
    X, gh, gw = _to_grid(x, ps)
    if valid is None:
        if method == "median":
            # torch.median lower-middle convention (see masked_median)
            return jnp.sort(X, axis=-1)[..., (X.shape[-1] - 1) // 2]
        return jnp.mean(X, axis=-1)
    M, _, _ = _to_grid(valid.astype(jnp.float32), ps)
    mask = M >= 0.5
    if method == "median":
        return masked_median(X, mask)
    s = jnp.sum(jnp.where(mask, X, 0.0), axis=-1)
    n = jnp.sum(mask, axis=-1)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)


def view_weight(t_norm, theta, b0, theta0):
    """Observation weight from camera motion: 0.5*(clip(t/b0) + clip(θ/θ0)).

    Branchless (b0/theta0 may be traced values under jit): a non-positive
    normalizer means "always fully weighted"."""
    t = jnp.where(b0 > 0, jnp.clip(t_norm / jnp.maximum(b0, 1e-12), 0.0, 1.0),
                  1.0)
    r = jnp.where(theta0 > 0,
                  jnp.clip(theta / jnp.maximum(theta0, 1e-12), 0.0, 1.0), 1.0)
    return 0.5 * (t + r)


def ema_delta(prev, inc, alpha):
    new = alpha * prev + (1.0 - alpha) * inc
    return new, new - prev


def robust_z(x, eps=1e-6):
    """Median/MAD standardization (flattened)."""
    m = jnp.median(x)
    mad = jnp.median(jnp.abs(x - m)) + eps
    return (x - m) / mad


def classify(delta_cov, r, u, thr_zr=1.0, thr_zu=1.0, thr_dc=0.02):
    """3-way degradation classes + [0, 1] priority scores.

    Class 1: stagnant coverage + high uncertainty.
    Class 2: coverage ok but high residual AND high uncertainty.
    Class 3: high residual with low uncertainty (likely geometry error).
    """
    shape = delta_cov.shape
    dc = delta_cov.reshape(-1)
    rf = r.reshape(-1)
    uf = u.reshape(-1)
    zr = robust_z(rf)
    zu = robust_z(uf)

    c1 = (dc < thr_dc) & (zu > thr_zu)
    c2 = (dc >= thr_dc) & (zr > thr_zr) & (zu > thr_zu)
    c3 = (zr > thr_zr) & (zu <= thr_zu)
    cls = jnp.where(c1, 1, jnp.where(c2, 2, jnp.where(c3, 3, 0)))

    p1 = (1.0 - jnp.clip(dc, 0.0, 1.0)) + jnp.clip(zu, 0.0, None)
    p2 = jnp.clip(zr, 0.0, None) + jnp.clip(zu, 0.0, None)
    p3 = jnp.clip(zr, 0.0, None) + jnp.clip(1.0 - uf, 0.0, None)
    p = jnp.where(c1, p1, jnp.where(c2, p2, jnp.where(c3, p3, 0.0)))
    p = p / (jnp.max(p) + 1e-6)
    return cls.reshape(shape), p.reshape(shape)


def _job_fields(valid_kf, r_pix, Ck, Qk, t_norm, theta,
                H, W, ps, b0, theta0, C_thr, Q_thr):
    """Per-job patch-grid fields that do NOT depend on the EWMA state:
    coverage increment ``inc``, residual median ``r``, uncertainty ``u``."""
    valid = valid_kf.reshape(H, W)
    vgrid = (reduce_grid(valid.astype(jnp.float32), ps, method="mean") > 0).astype(
        jnp.float32
    )
    inc = vgrid * view_weight(t_norm, theta, b0, theta0)

    r = reduce_grid(r_pix.reshape(H, W), ps, valid=valid, method="median")

    Cn = jnp.clip(Ck.reshape(H, W) / (C_thr + 1e-8), 0.0, 1.0)
    Qn = jnp.clip(Qk.reshape(H, W) / (Q_thr + 1e-8), 0.0, 1.0)
    U = 1.0 - jnp.sqrt(jnp.clip(Cn * Qn, 0.0, 1.0))
    u = reduce_grid(U, ps, method="median")
    return inc, r, u


@partial(jax.jit, static_argnames=("H", "W", "ps"))
def compute_quality(valid_kf, r_pix, Ck, Qk, t_norm, theta, cov_ewma_prev,
                    H, W, ps, alpha, b0, theta0, C_thr, Q_thr,
                    thr_zr, thr_zu, thr_dc):
    """Full quality computation for one keyframe (all inputs flat H*W).

    Returns dict of patch-grid arrays:
    ``delta_cov, r, u, class_id, priority, cov_ewma`` each (H//ps, W//ps).
    """
    inc, r, u = _job_fields(valid_kf, r_pix, Ck, Qk, t_norm, theta,
                            H, W, ps, b0, theta0, C_thr, Q_thr)
    ew, dc = ema_delta(cov_ewma_prev, inc, alpha)
    cls, pri = classify(dc, r, u, thr_zr, thr_zu, thr_dc)
    return {
        "delta_cov": dc,
        "r": r,
        "u": u,
        "class_id": cls,
        "priority": pri,
        "cov_ewma": ew,
    }


@partial(jax.jit, static_argnames=("H", "W", "ps"))
def compute_quality_batch(valid_kf, r_pix, Ck, Qk, t_norm, theta,
                          prev_init, chain, H, W, ps, alpha, b0, theta0,
                          C_thr, Q_thr, thr_zr, thr_zu, thr_dc):
    """Batch of B quality jobs in submission order as ONE device program.

    Bit-exact with running :func:`compute_quality` per job sequentially:
    the per-job patch reductions (the heavy part) vmap over the batch, and
    the EWMA coverage chain is a ``lax.scan`` so job ``i`` sees job
    ``i-1``'s ``cov_ewma`` whenever ``chain[i]`` is set (same keyframe as
    the previous job in the batch — consecutive frames usually are).
    ``prev_init[i]`` is the service's stored EWMA state, used when
    ``chain[i]`` is False; ``chain[0]`` must be False.

    All leading dims are B; returns the same dict as
    :func:`compute_quality` with a leading batch axis. One program per
    batch instead of one per frame — on a remote-attached chip the
    per-program dispatch dominates this kernel's device time.
    """
    inc, r, u = jax.vmap(
        lambda v, rp, c, q, tn, th: _job_fields(
            v, rp, c, q, tn, th, H, W, ps, b0, theta0, C_thr, Q_thr)
    )(valid_kf, r_pix, Ck, Qk, t_norm, theta)

    def step(carry, x):
        inc_i, prev_i, chain_i = x
        prev = jnp.where(chain_i, carry, prev_i)
        ew, dc = ema_delta(prev, inc_i, alpha)
        return ew, (ew, dc)

    _, (ew, dc) = jax.lax.scan(
        step, jnp.zeros_like(prev_init[0]), (inc, prev_init, chain))

    cls, pri = jax.vmap(
        lambda d, r_, u_: classify(d, r_, u_, thr_zr, thr_zu, thr_dc)
    )(dc, r, u)
    return {
        "delta_cov": dc,
        "r": r,
        "u": u,
        "class_id": cls,
        "priority": pri,
        "cov_ewma": ew,
    }


def upsample_to_hw(grid, h, w):
    """Nearest-neighbour upsample of a patch grid back to (h, w) (export use)."""
    gh, gw = grid.shape
    ry = h // gh + (1 if h % gh else 0)
    rx = w // gw + (1 if w % gw else 0)
    out = jnp.repeat(jnp.repeat(grid, ry, axis=0), rx, axis=1)
    return out[:h, :w]
