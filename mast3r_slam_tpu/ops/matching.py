"""Iterative-projection pointmap matching, TPU-native.

Replaces the reference's two CUDA kernels (mast3r_slam/backend/src/
matching_kernels.cu: ``iter_proj_kernel`` :119-275 and
``refine_matches_kernel`` :26-81) and their Python driver
(mast3r_slam/matching.py) with fully-vectorized jittable JAX: all pixels carry
a fixed ``max_iter`` Levenberg-Marquardt loop with masked accept/reject (the
same schedule the CUDA kernel runs per-thread), and the coarse-to-fine
descriptor refinement maximizes windowed descriptor dot products on the MXU.

TPU gather strategy (the perf-critical design): random row gathers of tiny
rows (36-48 B) are pathologically slow on TPU. Both kernels therefore
pre-stack the neighborhoods they need into wide rows so each query costs ONE
contiguous-row gather:

- ``iter_proj`` gathers the full 2x2 bilinear footprint as one (4*9,) row
  from a corner-stacked ray image (built once, reused across LM iterations).
- ``refine_matches`` evaluates, per dilation level, the K window candidates
  as K statically-rolled descriptor images gathered with the SAME per-query
  index vector (one coalesced row-gather pass per offset, scores fused into
  the gather loop). Measured on v5e: 575 ms → ~2.5 ms/frame for the 5-level
  default — the (H*W, K, F) stacked-window variant is 95x slower because the
  F=24 minor dim pads to 128 lanes.

Semantics parity notes:
- LM solves the 2x2 normal equations of ``min_p || normalize(bilerp(rays, p)) - r* ||^2``
  using the raw channel gradients as Jacobian, with multiplicative damping
  (x0.1 on accept, x10 on reject) and border clamping to ``[1, W-2] x [1, H-2]``.
- ``converged`` is the last iteration's cost test against ``convergence_thresh``.
- Occlusion rejection: 3D distance between matched points > ``dist_thresh``.
- Refinement searches a dilated square window (dilation ``d = dilation_max..1``,
  radius ``radius``, stride ``d``) maximizing descriptor dot product,
  re-centering between dilation levels; dots run in bf16 (reference uses fp16).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mast3r_slam_tpu.ops.image import img_gradient


def resolve_refine_mode(matching_cfg: dict) -> str:
    """Resolve ``matching.refine_mode`` with back-compat for the legacy
    ``separable_refine`` bool (True→separable, False→joint)."""
    mode = matching_cfg.get("refine_mode")
    if mode is None:
        legacy = matching_cfg.get("separable_refine")
        if legacy is None:
            return "plus"
        return "separable" if legacy else "joint"
    assert mode in ("plus", "separable", "joint"), mode
    return str(mode)


def pixel_to_lin(p, w):
    """(u, v) integer pixel coords → linear index ``u + w*v``."""
    return p[..., 0] + w * p[..., 1]


def lin_to_pixel(idx, w):
    return jnp.stack([idx % w, idx // w], axis=-1)


def _stack_corners(rays9):
    """(H, W, C) → (H*W, 4*C) rows holding the 2x2 bilinear footprint
    [p00, p01, p10, p11] of each pixel (valid for coords < H-1 / W-1)."""
    h, w, c = rays9.shape
    p00 = rays9
    p01 = jnp.roll(rays9, -1, axis=1)
    p10 = jnp.roll(rays9, -1, axis=0)
    p11 = jnp.roll(p10, -1, axis=1)
    return jnp.stack([p00, p01, p10, p11], axis=2).reshape(h * w, 4 * c)


def _sample_rays(corners, u, v, h, w, c):
    """Bilinear sample via one wide-row gather from the corner stack.

    ``u, v (N,)`` pre-clamped to [1, W-2]/[1, H-2]. Returns ``(N, C)``.
    """
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = (u - u0.astype(u.dtype))[:, None]
    dv = (v - v0.astype(v.dtype))[:, None]
    rows = corners[v0 * w + u0].reshape(-1, 4, c)
    top = rows[:, 0] * (1.0 - du) + rows[:, 1] * du
    bot = rows[:, 2] * (1.0 - du) + rows[:, 3] * du
    return top * (1.0 - dv) + bot * dv


def _ray_cost(corners, u, v, target, h, w, c):
    """Unit-ray alignment cost at (u, v); also returns the raw sample."""
    s = _sample_rays(corners, u, v, h, w, c)
    r = s[:, 0:3]
    r = r * lax.rsqrt(jnp.sum(r * r, axis=-1, keepdims=True))
    err = r - target
    return jnp.sum(err * err, axis=-1), s, err


@partial(jax.jit, static_argnames=("max_iter", "img_hw", "plateau_frac"))
def _iter_proj_single(rays9_flat, pts_norm, p_init, img_hw, max_iter,
                      lambda_init, cost_thresh, plateau_frac=0.0):
    """LM projection for one image: ``rays9_flat (H*W, 9)``, ``pts_norm (N, 3)``.

    ``plateau_frac > 0`` enables progress-based early exit: stop iterating
    once the converged-pixel count grows by less than ``plateau_frac * N``
    in an iteration. This is the lockstep analog of the reference CUDA
    kernel's per-thread termination (matching_kernels.cu:119-275: threads
    whose pixel converged stop costing) — in a vectorized loop, stragglers
    that will never converge (occlusion boundaries, newly revealed regions)
    would otherwise force every pixel through all ``max_iter`` gather
    passes. Pixels still unconverged at exit are flagged invalid exactly as
    at max_iter. ``plateau_frac=0`` reproduces the strict schedule (eval
    parity).
    """
    h, w = img_hw
    c = rays9_flat.shape[-1]
    # Barrier: keep the corner stack materialized ONCE outside the LM loop —
    # without it XLA's fusion can sink its construction (gradients + 4-way
    # stack, ~28 MB) into every loop iteration when iter_proj is embedded in
    # a larger jit (measured: 166 s compiles and 2x runtime in match()).
    corners = lax.optimization_barrier(
        _stack_corners(rays9_flat.reshape(h, w, c))
    )
    u = jnp.clip(p_init[:, 0], 1.0, w - 2.0)
    v = jnp.clip(p_init[:, 1], 1.0, h - 2.0)
    lam = jnp.full(u.shape, lambda_init, dtype=u.dtype)

    # Cache (cost, sample, err) of the CURRENT position across iterations so
    # each LM step costs one bilinear gather pass, not two.
    cost0, s0, err0 = _ray_cost(corners, u, v, pts_norm, h, w, c)

    n_q = u.shape[0]
    min_progress = int(np.ceil(plateau_frac * n_q)) if plateau_frac else 0

    def cond(carry):
        it, prev_cnt, state = carry
        cost = state[3]
        cnt = jnp.sum(cost < cost_thresh)
        go = (it < max_iter) & (cnt < n_q)
        if min_progress:
            # converged count is monotone (accept only lowers cost), so a
            # stalled count means remaining pixels are stuck — stop paying
            # full gather passes for them (they are flagged invalid anyway)
            go &= (it < 2) | (cnt - prev_cnt >= min_progress)
        return go

    def body(carry, _=None):
        it, _, state = carry
        u, v, lam, cost, s, err = state
        prev_cnt = jnp.sum(cost < cost_thresh)
        gx = s[:, 3:6]
        gy = s[:, 6:9]
        # 2x2 J^T J (+ LM damping) and -J^T r from the channel gradients
        a00 = jnp.sum(gx * gx, axis=-1) + lam
        a01 = jnp.sum(gx * gy, axis=-1)
        a11 = jnp.sum(gy * gy, axis=-1) + lam
        b0 = -jnp.sum(err * gx, axis=-1)
        b1 = -jnp.sum(err * gy, axis=-1)
        det_inv = 1.0 / (a00 * a11 - a01 * a01)
        du = det_inv * (a11 * b0 - a01 * b1)
        dv = det_inv * (-a01 * b0 + a00 * b1)

        u_new = jnp.clip(u + du, 1.0, w - 2.0)
        v_new = jnp.clip(v + dv, 1.0, h - 2.0)
        new_cost, new_s, new_err = _ray_cost(corners, u_new, v_new, pts_norm,
                                             h, w, c)

        accept = new_cost < cost
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        cost = jnp.where(accept, new_cost, cost)
        s = jnp.where(accept[:, None], new_s, s)
        err = jnp.where(accept[:, None], new_err, err)
        return it + 1, prev_cnt, (u, v, lam, cost, s, err)

    _, _, (u, v, lam, cost, _, _) = lax.while_loop(
        cond, body,
        (jnp.asarray(0), jnp.asarray(0, dtype=jnp.int32),
         (u, v, lam, cost0, s0, err0)),
    )
    return jnp.stack([u, v], axis=-1), cost < cost_thresh


def iter_proj(rays_with_grad, pts_norm, p_init, max_iter=10, lambda_init=1e-8,
              cost_thresh=1e-6, plateau_frac=0.0):
    """Batched LM projection. ``rays_with_grad (B, H, W, 9)``, ``pts_norm (B, N, 3)``,
    ``p_init (B, N, 2)`` → ``(p (B, N, 2) float, converged (B, N) bool)``."""
    b, h, w, c = rays_with_grad.shape
    fn = jax.vmap(
        lambda r, p, pi: _iter_proj_single(
            r.reshape(h * w, c), p, pi, (h, w), max_iter, lambda_init,
            cost_thresh, plateau_frac
        )
    )
    return fn(rays_with_grad, pts_norm, p_init)


def _window_offsets_np(radius: int, dilation: int) -> np.ndarray:
    """Static (K, 2) integer (du, dv) offsets of the dilated square window."""
    rng = np.arange(-radius, radius + 1) * dilation
    du, dv = np.meshgrid(rng, rng, indexing="xy")
    return np.stack([du.ravel(), dv.ravel()], axis=-1)


def _dilation_levels(dilation_max: int, step: int) -> list:
    """Coarse-to-fine dilation schedule. ``step=1`` is the reference's full
    ladder (d = dilation_max..1); ``step=2`` skips every other level but
    ALWAYS ends at d=1 so the final position is refined at pixel
    granularity."""
    levels = list(range(dilation_max, 0, -step))
    if not levels:
        return []  # dilation_max=0: no refinement (reference's empty loop)
    if levels[-1] != 1:
        levels.append(1)
    return levels


@partial(jax.jit, static_argnames=("radius", "dilation_max", "mode",
                                   "level_step"))
def refine_matches(D11, D21, p1, radius=3, dilation_max=5, mode="plus",
                   level_step=1):
    """Coarse-to-fine descriptor-similarity refinement of integer matches.

    ``D11 (B, H, W, F)`` target descriptor image; ``D21 (B, N, F)`` query
    descriptors; ``p1 (B, N, 2)`` integer initial matches. Returns refined
    ``(B, N, 2)`` integer positions.

    ``mode`` selects the per-level window search (the level's gather is the
    single hottest cost in the tracking step — TPU gathers here are
    row-rate-bound, so candidate count AND pass count both matter):

    - ``"joint"``: the reference kernel's full (2r+1)² window argmax
      (matching_kernels.cu:26-81 semantics) — 49 candidates, 1 gather pass.
    - ``"separable"``: two coordinate-descent passes (horizontal then
      vertical, re-centering in between) — 2·(2r+1)=14 candidates over
      2 gather passes.
    - ``"plus"`` (default): ONE pass per level over the plus-shaped
      candidate set (both axes jointly, 4r+1=13 candidates) — same
      candidate volume as separable but HALF the gather passes, and unlike
      separable the axis choice is made jointly rather than greedily.

    Equivalence of the reduced modes with the joint search on realistic
    smooth descriptor fields is pinned by tests/test_matching.py; eval
    configs pin ``matching.refine_mode: joint`` for strict reference parity
    of benchmarked numbers.

    Positions are carried as separate (u, v) channel vectors — clipping and
    updating an (N, 2) array wastes 126/128 lanes per op (measured ~7 ms of
    pure clip/add per frame before this layout).
    """
    b, h, w, f = D11.shape
    n = h * w
    D11h = D11.astype(jnp.bfloat16)
    D21h = D21.astype(jnp.bfloat16)

    def search(pu, pv, offs):
        K = offs.shape[0]
        du_off = jnp.asarray(offs[:, 0])
        dv_off = jnp.asarray(offs[:, 1])

        def one_img(Dimg, pu_i, pv_i, q):
            pu_c = jnp.clip(pu_i, 0, w - 1)
            pv_c = jnp.clip(pv_i, 0, h - 1)
            # TPU gathers are row-rate-limited (~200M rows/s measured on
            # v5e), so fetch ALL K window candidates of a query as ONE wide
            # (K*F,) row: concat the K statically-rolled descriptor images
            # along the channel (minor) dim, then a single N-row gather.
            # K separate row gathers per level measured 47x slower.
            stack = jnp.concatenate(
                [
                    jnp.roll(Dimg, (-int(dv), -int(du)), axis=(0, 1))
                    for du, dv in offs
                ],
                axis=-1,
            ).reshape(n, K * f)
            n_q = pu_i.shape[0]
            cand = stack[pv_c * w + pu_c].reshape(n_q, K, f)
            # batched (K, F) @ (F,) as dot_general: bf16 operands feed the
            # MXU directly (an einsum here materializes f32 copies of the
            # (N, K, F) candidates — ~11 ms/frame of pure converts).
            scores = lax.dot_general(
                cand, q, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            # mask candidates that fall outside the image (roll wraps).
            # Transposed (K, N) layout: K in sublanes, N in lanes.
            scores_t = scores.T                      # (K, N)
            cu = du_off[:, None] + pu_c[None, :]
            cv = dv_off[:, None] + pv_c[None, :]
            inside = (cu >= 0) & (cu < w) & (cv >= 0) & (cv < h)
            scores_t = jnp.where(inside, scores_t, -jnp.inf)
            best = jnp.argmax(scores_t, axis=0)      # (N,)
            return pu_i + du_off[best], pv_i + dv_off[best]

        return jax.vmap(one_img)(D11h, pu, pv, D21h)

    pu, pv = p1[..., 0], p1[..., 1]
    for d in _dilation_levels(dilation_max, level_step):
        rng = np.arange(-radius, radius + 1) * d
        zeros = np.zeros_like(rng)
        if mode == "separable":
            pu, pv = search(pu, pv, np.stack([rng, zeros], -1))  # horizontal
            pu, pv = search(pu, pv, np.stack([zeros, rng], -1))  # vertical
        elif mode == "plus":
            nz = rng[rng != 0]
            offs = np.concatenate(
                [np.stack([rng, zeros], -1),          # horizontal arm (+center)
                 np.stack([np.zeros_like(nz), nz], -1)],  # vertical arm
            )
            pu, pv = search(pu, pv, offs)
        else:  # joint — full reference window
            pu, pv = search(pu, pv, _window_offsets_np(radius, d))
    return jnp.stack([pu, pv], axis=-1)


@jax.jit
def _prep_core(X11, X21):
    b, h, w, _ = X11.shape
    rays = X11 * lax.rsqrt(
        jnp.clip(jnp.sum(X11 * X11, axis=-1, keepdims=True), 1e-24)
    )
    gx, gy = img_gradient(rays)
    rays9 = jnp.concatenate([rays, gx, gy], axis=-1)
    X21v = X21.reshape(b, h * w, 3)
    pts_norm = X21v * lax.rsqrt(
        jnp.clip(jnp.sum(X21v * X21v, axis=-1, keepdims=True), 1e-24)
    )
    return rays9, pts_norm


@jax.jit
def _occlusion_gate(X11, X21, p1, converged, dist_thresh):
    b, h, w, _ = X11.shape
    lin = pixel_to_lin(p1, w)
    matched = jax.vmap(lambda img, i: img[i])(X11.reshape(b, h * w, 3), lin)
    dists = jnp.linalg.norm(matched - X21.reshape(b, -1, 3), axis=-1)
    return converged & (dists < dist_thresh)


def prep_for_iter_proj(X11, X21, idx_1_to_2_init):
    """Build the 9-channel ray image, normalized targets, and init pixels.

    ``X11, X21 (B, H, W, 3)``. Mirrors reference matching.py:25-49.
    """
    b, h, w, _ = X11.shape
    rays9, pts_norm = _prep_core(X11, X21)
    if idx_1_to_2_init is None:
        idx_1_to_2_init = jnp.broadcast_to(jnp.arange(h * w)[None], (b, h * w))
    p_init = lin_to_pixel(idx_1_to_2_init, w).astype(X11.dtype)
    return rays9, pts_norm, p_init


@partial(jax.jit, static_argnames=("max_iter", "radius", "dilation_max",
                                   "refine_mode", "plateau_frac",
                                   "level_step", "proj_step"))
def match(X11, X21, D11, D21, idx_1_to_2_init=None, *, max_iter=10,
          lambda_init=1e-8, convergence_thresh=1e-6, dist_thresh=0.1,
          radius=3, dilation_max=5, refine_mode="plus",
          plateau_frac=0.001, level_step=1, proj_step=1):
    """Full matching pipeline: LM projection + occlusion gate + refinement.

    Returns ``(idx_1_to_2 (B, N) int32, valid (B, N, 1) bool)`` where N = H*W:
    for each pixel of image 2's pointmap-in-frame-1, the linear index of its
    correspondence in image 1.

    One fused XLA program, exactly like the frontend's ``track_core`` (which
    inlines these same stages): fusing used to run 4x SLOWER until the
    optimization barrier after the LM loop (see ``iter_proj``) stopped XLA
    from merging the LM-loop gathers with the refinement gathers into one
    giant materialized gather; with the barrier in place the fused program
    saves the ~20 ms/program dispatch switches of stage-by-stage dispatch
    (backend ``match_symmetric`` B=2 measured 157 -> ~110 ms).

    ``proj_step > 1`` runs the LM projection on a ``proj_step``-strided query
    grid and bilinearly upsamples the CORRECTION field ``p - p_init`` back to
    full resolution (the correction is smooth wherever the scene is; the
    per-query structure lives in ``p_init``). The full-resolution descriptor
    refinement re-centers each pixel and the occlusion gate re-validates
    every pixel at full resolution, so interpolation errors at surface
    boundaries are caught the same way iter-proj divergence is. The LM
    gather volume — the hottest row-rate-bound cost of the tracking step —
    drops by ``proj_step²``. ``proj_step=1`` is the strict reference
    schedule (eval configs pin it); deviation priced on the oracle ATE
    harness (scripts/matcher_cut_sweep.py).
    """
    b, h, w, _ = X21.shape
    rays9, pts_norm, p_init = prep_for_iter_proj(X11, X21, idx_1_to_2_init)
    s = proj_step if (proj_step > 1 and h % proj_step == 0
                      and w % proj_step == 0) else 1
    if s > 1:
        hc, wc = h // s, w // s
        sel = ((jnp.arange(hc) * s)[:, None] * w
               + (jnp.arange(wc) * s)[None, :]).reshape(-1)
        p_c, conv_c = iter_proj(
            rays9, pts_norm[:, sel], p_init[:, sel], max_iter, lambda_init,
            convergence_thresh, plateau_frac,
        )
        delta = (p_c - p_init[:, sel]).reshape(b, hc, wc, 2)
        delta_full = jax.image.resize(delta, (b, h, w, 2), method="linear")
        p1 = p_init + delta_full.reshape(b, h * w, 2)
        p1 = jnp.stack([jnp.clip(p1[..., 0], 1.0, w - 2.0),
                        jnp.clip(p1[..., 1], 1.0, h - 2.0)], axis=-1)
        conv_full = jnp.repeat(jnp.repeat(conv_c.reshape(b, hc, wc), s, 1),
                               s, 2)
        converged = conv_full.reshape(b, h * w)
    else:
        p1, converged = iter_proj(
            rays9, pts_norm, p_init, max_iter, lambda_init,
            convergence_thresh, plateau_frac,
        )
    p1 = jnp.floor(p1).astype(jnp.int32)

    valid = _occlusion_gate(X11, X21, p1, converged, dist_thresh)

    if radius > 0:
        p1 = refine_matches(D11, D21.reshape(b, h * w, -1), p1, radius,
                            dilation_max, refine_mode, level_step)

    idx = pixel_to_lin(p1, w)
    return idx, valid[..., None]
