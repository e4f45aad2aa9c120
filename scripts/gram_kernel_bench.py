"""Isolate where the BA Gram kernel's time goes on the real chip.

Variants at production shape (E=128 edges, N=98304 decimated pixels, bf16
measured channels, sublane-split layout):
  v0 full     — the production gram_rays kernel
  v1 load     — same grid/blocks, body just sums the 8 channels (HBM floor)
  v2 rows     — full row construction, Gram replaced by a cheap row-sum
                (VPU floor: elementwise residual/weight/J-row math)
  v3 diag     — full rows, but 4 per-channel (s,8,TNL)x(s,8,TNL)->(s,8,8)
                Grams instead of the one 32x32 (computes ONLY what
                _edge_blocks_from_gram consumes; 4x fewer MXU FLOPs)

All amortized with an in-program K-rep scan (tunnel dispatch can be ~26 ms).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mast3r_slam_tpu.ops import ba_kernels as BK
from mast3r_slam_tpu.slam import factor_graph as FG
from mast3r_slam_tpu.ops import lie

KREP = 16


def amortized(fn, *args, reps=6):
    def scan_n(n):
        @jax.jit
        def run(*a):
            def body(carry, r):
                out = fn(r, *a)
                return carry + out, None
            c, _ = lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(n, dtype=jnp.float32))
            return c
        return run

    run_k, run_1 = scan_n(KREP), scan_n(1)

    def t(run):
        jax.block_until_ready(run(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    return (t(run_k) - t(run_1)) / (KREP - 1) * 1e3


def _load_kernel(rts_ref, *refs):
    g_ref = refs[-1]
    acc = refs[0][0].astype(jnp.float32)
    for r in refs[1:-1]:
        acc += r[0].astype(jnp.float32)
    s = jnp.sum(acc)

    @pl.when(pl.program_id(1) == 0)
    def _():
        g_ref[0] = jnp.zeros_like(g_ref[0])
    g_ref[0] += s


def _rows_kernel(rts_ref, mx_ref, my_ref, mz_ref, di_ref, cf_ref,
                 xj_ref, yj_ref, zj_ref, g_ref, *, sigma_ray, sigma_dist):
    e = pl.program_id(0)
    sR = [rts_ref[e, i] for i in range(9)]
    tx, ty, tz = rts_ref[e, 9], rts_ref[e, 10], rts_ref[e, 11]
    mask = rts_ref[e, 12]
    f32 = jnp.float32
    xj, yj, zj = (xj_ref[0].astype(f32), yj_ref[0].astype(f32),
                  zj_ref[0].astype(f32))
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
    acc = jnp.zeros_like(px)
    for dd in range(4):
        hub = BK._huber_w(sqc * jnp.abs(rho[dd]) / sigmas[dd], BK._HUBER_K)
        sq = sqc / sigmas[dd] * jnp.sqrt(hub)
        for ch in BK._jrow_entries(*d_res[dd], px, py, pz) + [rho[dd]]:
            acc += sq * ch
    s = jnp.sum(acc)

    @pl.when(pl.program_id(1) == 0)
    def _():
        g_ref[0] = jnp.zeros_like(g_ref[0])
    g_ref[0] += s


def _diag_kernel(rts_ref, mx_ref, my_ref, mz_ref, di_ref, cf_ref,
                 xj_ref, yj_ref, zj_ref, g_ref, *, sigma_ray, sigma_dist,
                 compute_dtype):
    e = pl.program_id(0)
    sR = [rts_ref[e, i] for i in range(9)]
    tx, ty, tz = rts_ref[e, 9], rts_ref[e, 10], rts_ref[e, 11]
    mask = rts_ref[e, 12]
    f32 = jnp.float32
    xj, yj, zj = (xj_ref[0].astype(f32), yj_ref[0].astype(f32),
                  zj_ref[0].astype(f32))
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
    Gs = None
    for dd in range(4):
        hub = BK._huber_w(sqc * jnp.abs(rho[dd]) / sigmas[dd], BK._HUBER_K)
        sq = sqc / sigmas[dd] * jnp.sqrt(hub)
        rows = [(sq * ch).astype(compute_dtype)
                for ch in BK._jrow_entries(*d_res[dd], px, py, pz)
                + [rho[dd]]]
        S = jnp.stack(rows, axis=1)                    # (s, 8, TNL)
        G = jax.lax.dot_general(
            S, S, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (s, 8, 8)
        Gd = jnp.sum(G, axis=0)
        Gs = Gd if Gs is None else Gs + Gd

    @pl.when(pl.program_id(1) == 0)
    def _():
        g_ref[0] = Gs

    @pl.when(pl.program_id(1) != 0)
    def _():
        g_ref[0] += Gs


def run_variant(kernel, rts, meas, out_rows, scalar_out=False):
    E, s, M = meas[0].shape
    tnl = BK._TNL
    n_tiles = M // tnl
    if scalar_out:
        out_shape = jax.ShapeDtypeStruct((E, 1, 1), jnp.float32)
        out_spec = pl.BlockSpec((1, 1, 1), lambda e, n: (e, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((E, out_rows, out_rows), jnp.float32)
        out_spec = pl.BlockSpec((1, out_rows, out_rows),
                                lambda e, n: (e, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pl.GridSpec(
            grid=(E, n_tiles),
            in_specs=[
                pl.BlockSpec(rts.shape, lambda e, n: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + [
                pl.BlockSpec((1, s, tnl), lambda e, n: (e, 0, n),
                             memory_space=pltpu.VMEM)
                for _ in meas
            ],
            out_specs=out_spec,
        ),
    )(rts, *meas)


def main():
    E, N = 128, 98304
    rng = np.random.default_rng(0)
    meas = tuple(
        jnp.abs(jnp.asarray(
            rng.normal(size=(E, N)).astype(np.float32) * 0.3 + 1.0)
        ).astype(jnp.bfloat16)
        for _ in range(8))
    meas = BK.view_sublane_split(meas)
    T = jax.vmap(lie.exp)(jnp.asarray(
        rng.normal(size=(110, 7)).astype(np.float32) * 0.02))
    ii = jnp.asarray(rng.integers(0, 110, E).astype(np.int32))
    jj = jnp.asarray((np.asarray(ii) + 1) % 110)
    mask = jnp.ones(E, jnp.float32)
    _, rts = FG._rel_pose_rows(T, ii, jj, mask)
    rts = jax.block_until_ready(rts)

    def v0(r, rts, *meas):
        G = BK.gram_rays(rts + r * 1e-9, meas, 0.0003, 0.1)
        return jnp.sum(G[:, :7, :7])

    def v1(r, rts, *meas):
        o = run_variant(_load_kernel, rts + r * 1e-9, meas, 1,
                        scalar_out=True)
        return jnp.sum(o)

    def v2(r, rts, *meas):
        k = functools.partial(_rows_kernel, sigma_ray=0.0003, sigma_dist=0.1)
        o = run_variant(k, rts + r * 1e-9, meas, 1, scalar_out=True)
        return jnp.sum(o)

    def v3(r, rts, *meas):
        k = functools.partial(_diag_kernel, sigma_ray=0.0003, sigma_dist=0.1,
                              compute_dtype=jnp.bfloat16)
        o = run_variant(k, rts + r * 1e-9, meas, 8)
        return jnp.sum(o[:, :7, :7])

    print(f"v1 load floor   : {amortized(v1, rts, *meas):8.3f} ms")
    print(f"v2 rows (VPU)   : {amortized(v2, rts, *meas):8.3f} ms")
    print(f"v3 diag 4x8x8   : {amortized(v3, rts, *meas):8.3f} ms")
    print(f"v0 full 32x32   : {amortized(v0, rts, *meas):8.3f} ms")

    # v3 vs v0 numeric agreement on the consumed blocks
    G0 = BK.gram_rays(rts, meas, 0.0003, 0.1)
    H0 = sum(G0[:, d * 8:d * 8 + 8, d * 8:d * 8 + 8] for d in range(4))
    k = functools.partial(_diag_kernel, sigma_ray=0.0003, sigma_dist=0.1,
                          compute_dtype=jnp.bfloat16)
    H3 = run_variant(k, rts, meas, 8)
    print("max |diag-block diff| v3 vs v0:",
          float(jnp.max(jnp.abs(H0 - H3))),
          " scale:", float(jnp.max(jnp.abs(H0))))


if __name__ == "__main__":
    import sys as _sys_entry
    if "--r2" not in _sys_entry.argv:
        main()


# ---- round-2 variants: lane-tile sweep + 2-contracting-dim dot -------------
def _gram32_kernel_2c(rts_ref, mx_ref, my_ref, mz_ref, di_ref, cf_ref,
                      xj_ref, yj_ref, zj_ref, g_ref, *, sigma_ray,
                      sigma_dist, compute_dtype):
    """Same rows as production, Gram as ONE dot contracting (sublane, lane)."""
    e = pl.program_id(0)
    sR = [rts_ref[e, i] for i in range(9)]
    tx, ty, tz = rts_ref[e, 9], rts_ref[e, 10], rts_ref[e, 11]
    mask = rts_ref[e, 12]
    f32 = jnp.float32
    xj, yj, zj = (xj_ref[0].astype(f32), yj_ref[0].astype(f32),
                  zj_ref[0].astype(f32))
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
        hub = BK._huber_w(sqc * jnp.abs(rho[dd]) / sigmas[dd], BK._HUBER_K)
        sq = sqc / sigmas[dd] * jnp.sqrt(hub)
        for ch in BK._jrow_entries(*d_res[dd], px, py, pz) + [rho[dd]]:
            rows.append(sq * ch)
    S = jnp.stack([r.astype(compute_dtype) for r in rows], axis=1)  # (s,32,L)
    G = jax.lax.dot_general(
        S, S, (((0, 2), (0, 2)), ((), ())),
        preferred_element_type=jnp.float32)            # (32, 32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        g_ref[0] = G

    @pl.when(pl.program_id(1) != 0)
    def _():
        g_ref[0] += G


def main2():
    E, N = 128, 98304
    rng = np.random.default_rng(0)
    meas = tuple(
        jnp.abs(jnp.asarray(
            rng.normal(size=(E, N)).astype(np.float32) * 0.3 + 1.0)
        ).astype(jnp.bfloat16)
        for _ in range(8))
    meas = BK.view_sublane_split(meas)
    T = jax.vmap(lie.exp)(jnp.asarray(
        rng.normal(size=(110, 7)).astype(np.float32) * 0.02))
    ii = jnp.asarray(rng.integers(0, 110, E).astype(np.int32))
    jj = jnp.asarray((np.asarray(ii) + 1) % 110)
    mask = jnp.ones(E, jnp.float32)
    _, rts = FG._rel_pose_rows(T, ii, jj, mask)
    rts = jax.block_until_ready(rts)

    def v2c(r, rts, *meas):
        k = functools.partial(_gram32_kernel_2c, sigma_ray=0.0003,
                              sigma_dist=0.1, compute_dtype=jnp.bfloat16)
        o = run_variant(k, rts + r * 1e-9, meas, 32)
        return jnp.sum(o[:, :7, :7])

    def v0_tnl(r, tnl, rts, *meas):
        # NOTE: mutates the module global BK._TNL inside a jitted trace.
        # Correct here only because each scan_n(n) closure below retraces
        # exactly once per tnl value; a cached trace would silently time
        # the wrong tile size if amortized()/jit caching ever changes.
        old = BK._TNL
        BK._TNL = tnl
        try:
            G = BK.gram_rays(rts + r * 1e-9, meas, 0.0003, 0.1)
        finally:
            BK._TNL = old
        return jnp.sum(G[:, :7, :7])

    for tnl in (1024, 2048, 3072, 6144):
        def vv(r, rts, *meas, _t=tnl):
            return v0_tnl(r, _t, rts, *meas)
        print(f"v0 tnl={_fmt(tnl)}: {amortized(vv, rts, *meas):8.3f} ms")
    print(f"v2c 2-contract  : {amortized(v2c, rts, *meas):8.3f} ms")

    # agreement
    G0 = BK.gram_rays(rts, meas, 0.0003, 0.1)
    k = functools.partial(_gram32_kernel_2c, sigma_ray=0.0003,
                          sigma_dist=0.1, compute_dtype=jnp.bfloat16)
    G2 = run_variant(k, rts, meas, 32)
    print("max |G diff| v2c vs v0:", float(jnp.max(jnp.abs(G0 - G2))),
          " scale:", float(jnp.max(jnp.abs(G0))))


def _fmt(t):
    return f"{t:5d}"


if __name__ == "__main__":
    import sys as _s
    if "--r2" in _s.argv:
        main2()
