"""Pallas TPU kernels for the BA per-edge normal equations.

One kernel program per (edge, pixel-tile) computes the pose transform,
residual channels, per-channel Huber IRLS weights and the weighted-Jacobian
Gram matrix entirely in VMEM — HBM traffic is exactly one read of the
pose-invariant measured channels (the XLA formulation of the same math
additionally writes + twice reads a bf16 Jacobian stack through HBM; see
``factor_graph._edge_system_fused``). Replaces the per-pixel work of the
reference CUDA kernels gn_kernels.cu:813-1138 (``ray_align_kernel``) and
:1231-1545 (``calib_proj_kernel``) with identical residual/weight semantics.

Layout: each ``(E, N)`` measured channel is viewed as ``(E, 8, N/8)`` so a
``(8, TNL)`` tile fills all VPU sublanes (a ``(1, TN)`` row layout measured
8x lower VPU utilization). Pixel order within the Gram sum is irrelevant.
The per-tile Gram runs as one sublane-batched MXU contraction
``(8, R, TNL) x (8, R, TNL) -> (8, R, R)`` in bf16 with f32 accumulation,
matching the XLA path's precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane tile of the split-pixel dim: a (8, TNL) f32 tile per channel.
# 2048 lanes -> 64 KB blocks / ~1500 grid programs at production scale
# (512-lane blocks measured 11 ms/iter of per-program overhead; VMEM use at
# 2048 is ~3 MB including the bf16 row stack).
_TNL = 2048
_HUBER_K = 1.345


def _huber_w(w_abs, k):
    return jnp.where(w_abs < k, 1.0, k / jnp.maximum(w_abs, 1e-30))


def _jrow_entries(m1, m2, m3, px, py, pz):
    """Closed-form local Sim3 J-row ``[m | X'xm | m.X']`` (7 channels)."""
    return [
        m1, m2, m3,
        py * m3 - pz * m2,
        pz * m1 - px * m3,
        px * m2 - py * m1,
        px * m1 + py * m2 + pz * m3,
    ]


def _accumulate(g_ref, rows, compute_dtype):
    """Stack weighted rows sublane-batched, Gram on MXU, accumulate output."""
    S = jnp.stack([r.astype(compute_dtype) for r in rows], axis=1)
    G = jax.lax.dot_general(
        S, S, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                             # (8, R, R)
    Gs = jnp.sum(G, axis=0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        g_ref[0] = Gs

    @pl.when(pl.program_id(1) != 0)
    def _():
        g_ref[0] += Gs


def _gram_rays_kernel(rts_ref, mx_ref, my_ref, mz_ref, di_ref, cf_ref,
                      xj_ref, yj_ref, zj_ref, g_ref, *,
                      sigma_ray, sigma_dist, compute_dtype):
    e = pl.program_id(0)
    sR = [rts_ref[e, i] for i in range(9)]
    tx, ty, tz = rts_ref[e, 9], rts_ref[e, 10], rts_ref[e, 11]
    mask = rts_ref[e, 12]

    # channels may be stored bf16 (meas_dtype) — widen once at load, all
    # residual math in f32 (the Gram itself re-narrows to compute_dtype)
    f32 = jnp.float32
    xj, yj, zj = (xj_ref[0].astype(f32), yj_ref[0].astype(f32),
                  zj_ref[0].astype(f32))           # (s, TNL)
    px = sR[0] * xj + sR[1] * yj + sR[2] * zj + tx
    py = sR[3] * xj + sR[4] * yj + sR[5] * zj + ty
    pz = sR[6] * xj + sR[7] * yj + sR[8] * zj + tz

    d = jnp.maximum(jnp.sqrt(px * px + py * py + pz * pz), 1e-12)
    dinv = 1.0 / d
    rx, ry, rz = px * dinv, py * dinv, pz * dinv

    rho = [rx - mx_ref[0].astype(f32), ry - my_ref[0].astype(f32),
           rz - mz_ref[0].astype(f32), d - di_ref[0].astype(f32)]
    conf = cf_ref[0].astype(f32) * mask
    sqc = jnp.sqrt(conf)

    d_res = [
        [dinv * (1.0 - rx * rx), -dinv * rx * ry, -dinv * rx * rz],
        [-dinv * ry * rx, dinv * (1.0 - ry * ry), -dinv * ry * rz],
        [-dinv * rz * rx, -dinv * rz * ry, dinv * (1.0 - rz * rz)],
        [rx, ry, rz],
    ]
    sigmas = (sigma_ray, sigma_ray, sigma_ray, sigma_dist)
    rows = []
    for dd in range(4):
        hub = _huber_w(sqc * jnp.abs(rho[dd]) / sigmas[dd], _HUBER_K)
        sq = sqc / sigmas[dd] * jnp.sqrt(hub)
        for ch in _jrow_entries(*d_res[dd], px, py, pz) + [rho[dd]]:
            rows.append(sq * ch)
    _accumulate(g_ref, rows, compute_dtype)


def _gram_calib_kernel(rts_ref, ui_ref, vi_ref, lz_ref, cf_ref,
                       xj_ref, yj_ref, zj_ref, g_ref, *,
                       img_size, pixel_border, z_eps,
                       sigma_pixel, sigma_depth, compute_dtype):
    e = pl.program_id(0)
    sR = [rts_ref[e, i] for i in range(9)]
    tx, ty, tz = rts_ref[e, 9], rts_ref[e, 10], rts_ref[e, 11]
    mask = rts_ref[e, 12]
    fx, fy = rts_ref[e, 13], rts_ref[e, 14]
    cx, cy = rts_ref[e, 15], rts_ref[e, 16]
    H_img, W_img = img_size

    f32 = jnp.float32
    xj, yj, zj = (xj_ref[0].astype(f32), yj_ref[0].astype(f32),
                  zj_ref[0].astype(f32))
    px = sR[0] * xj + sR[1] * yj + sR[2] * zj + tx
    py = sR[3] * xj + sR[4] * yj + sR[5] * zj + ty
    pz = sR[6] * xj + sR[7] * yj + sR[8] * zj + tz

    valid_z = pz > z_eps
    z_safe = jnp.where(valid_z, pz, 1.0)
    z_inv = 1.0 / z_safe
    u = fx * px * z_inv + cx
    v = fy * py * z_inv + cy
    valid = (
        valid_z
        & (u > pixel_border) & (u < W_img - 1 - pixel_border)
        & (v > pixel_border) & (v < H_img - 1 - pixel_border)
    )
    rho = [u - ui_ref[0].astype(f32), v - vi_ref[0].astype(f32),
           jnp.where(valid_z, jnp.log(z_safe), 0.0) - lz_ref[0].astype(f32)]
    conf = jnp.where(valid, cf_ref[0].astype(f32), 0.0) * mask
    sqc = jnp.sqrt(conf)

    zero = jnp.zeros_like(z_inv)
    d_res = [
        [fx * z_inv, zero, -fx * px * z_inv * z_inv],
        [zero, fy * z_inv, -fy * py * z_inv * z_inv],
        [zero, zero, z_inv],
    ]
    sigmas = (sigma_pixel, sigma_pixel, sigma_depth)
    rows = []
    for dd in range(3):
        hub = _huber_w(sqc * jnp.abs(rho[dd]) / sigmas[dd], _HUBER_K)
        sq = sqc / sigmas[dd] * jnp.sqrt(hub)
        for ch in _jrow_entries(*d_res[dd], px, py, pz) + [rho[dd]]:
            rows.append(sq * ch)
    # pad the Gram to 32 rows: the 24-row (8, 24, TNL) contraction hits a
    # catastrophic Mosaic lowering (a 10-iteration solve measured 18.7 s vs
    # parity with the 32-row rays kernel once padded); zeros cost nothing
    # on the MXU
    rows += [zero] * 8
    _accumulate(g_ref, rows, compute_dtype)


def sublane_count(dtype) -> int:
    """Native sublane tiling of the channel dtype: f32 tiles are (8, 128),
    bf16 tiles (16, 128) — the split layout must match or every kernel load
    pays a relayout."""
    return 16 if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16) else 8


def view_sublane_split(meas):
    """``(E, N)`` channels → the kernel's ``(E, s, N/s)`` layout (s = native
    sublane count of the dtype: 8 for f32, 16 for bf16). A REAL relayout
    copy on TPU (tile assignment changes) — callers with a GN loop must
    apply it ONCE outside the loop, not per iteration (the in-loop reshape
    measured 8 x 4 ms copies per iteration)."""
    s = sublane_count(meas[0].dtype)
    return tuple(ch.reshape(ch.shape[0], s, ch.shape[1] // s) for ch in meas)


def _run_gram(kernel, rts, meas, n_rows, interpret):
    if meas[0].ndim == 2:
        meas = view_sublane_split(meas)
    E, s, M = meas[0].shape
    # Production pixel counts divide the 2048-lane tile; small test shapes
    # (and interpret-mode CPU runs) fall back to one whole-row tile.
    tnl = _TNL if M % _TNL == 0 else M
    n_tiles = M // tnl
    meas_v = meas
    grid = (E, n_tiles)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((E, n_rows, n_rows), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                # whole (E, cols) table in SMEM (a few KB); SMEM blocks must
                # cover full dims, so the kernel indexes it by program id
                pl.BlockSpec(rts.shape, lambda e, n: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + [
                pl.BlockSpec((1, s, tnl), lambda e, n: (e, 0, n),
                             memory_space=pltpu.VMEM)
                for _ in meas_v
            ],
            out_specs=pl.BlockSpec((1, n_rows, n_rows), lambda e, n: (e, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(rts, *meas_v)


def gram_rays(rts, meas, sigma_ray, sigma_dist,
              compute_dtype=jnp.bfloat16, interpret=False):
    """Per-edge Gram of the weighted ray-residual system.

    ``rts (E, 13)``: ``[s*R (row-major 9) | t (3) | edge_mask]`` of the
    relative pose ``T_i^{-1} T_j``; ``meas``: the 8 ray channels from
    ``factor_graph._premeas_rays``. Returns ``G (E, 32, 32)`` f32 whose
    diagonal 8x8 blocks hold ``[J_d ; rho_d]`` Gram products per residual
    channel d (H = top-left 7x7 of their sum, g = its last column).
    """
    kern = functools.partial(
        _gram_rays_kernel, sigma_ray=sigma_ray, sigma_dist=sigma_dist,
        compute_dtype=compute_dtype)
    return _run_gram(kern, rts, meas, 32, interpret)


def gram_calib(rts, meas, img_size, pixel_border, z_eps,
               sigma_pixel, sigma_depth,
               compute_dtype=jnp.bfloat16, interpret=False):
    """Per-edge Gram of the weighted calibrated-residual system.

    ``rts (E, 17)``: ``[s*R | t | edge_mask | fx fy cx cy]``; ``meas``: the
    7 calib channels from ``factor_graph._premeas_calib``. Returns
    ``G (E, 32, 32)`` f32 (rows 24+ are the zero padding block).
    """
    kern = functools.partial(
        _gram_calib_kernel, img_size=img_size, pixel_border=pixel_border,
        z_eps=z_eps, sigma_pixel=sigma_pixel, sigma_depth=sigma_depth,
        compute_dtype=compute_dtype)
    return _run_gram(kern, rts, meas, 32, interpret)


def supports_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
