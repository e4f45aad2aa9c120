"""Microbench the non-Gram pieces of a BA LM iteration on the real chip.

The round-4 driver bench showed the 10-iteration BA solve stage is now
dominated by non-Gram costs (docs/PERFORMANCE.md): per-edge block scatter,
the dense Cholesky, retraction. Tunnel dispatch latency can be ~26 ms on a
bad day, so every op here is amortized with a K-rep lax.scan INSIDE one
program (input perturbed per rep to defeat CSE), and the per-rep time is
(t_scan(K) - t_scan(1)) / (K - 1).

This script also A/Bs the scatter-add block assembly against an
incidence-matmul formulation (H = Pᵀ·He·P with P the signed edge-incidence
one-hot matrix), which keeps the MXU busy instead of serializing scatter
updates.

Run: python scripts/ba_solve_microbench.py   (needs the TPU; one process!)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mast3r_slam_tpu.slam import factor_graph as FG

K = 32


def amortized(make_step, *args, reps=8):
    """Per-rep ms of make_step's body via K-rep in-program scan."""
    def scan_n(n):
        @jax.jit
        def run(*a):
            def body(carry, r):
                return make_step(carry, r, *a[1:]), None
            out, _ = lax.scan(body, a[0],
                              jnp.arange(n, dtype=jnp.float32))
            return out
        return run

    run_k, run_1 = scan_n(K), scan_n(1)

    def t(run):
        out = jax.block_until_ready(run(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(*args))
            ts.append(time.perf_counter() - t0)
        del out
        return sorted(ts)[len(ts) // 2]

    return (t(run_k) - t(run_1)) / (K - 1) * 1e3


def main():
    cap, E = 110, 128
    rng = np.random.default_rng(0)
    He = jnp.asarray(rng.normal(size=(E, 7, 7)).astype(np.float32))
    He = He @ jnp.swapaxes(He, -1, -2)
    ge = jnp.asarray(rng.normal(size=(E, 7)).astype(np.float32))
    ii = jnp.asarray(rng.integers(0, cap, E).astype(np.int32))
    jj = jnp.asarray((np.asarray(ii) + 1) % cap)
    free = jnp.asarray(np.arange(cap) > 0)

    def scatter_step(carry, r, He, ge):
        H0 = jnp.zeros((cap + 1, 7, cap + 1, 7), jnp.float32)
        g0 = jnp.zeros((cap + 1, 7), jnp.float32)
        H, g = FG._scatter_blocks(H0, g0, He + r * 1e-6, ge, ii, jj,
                                  free, cap)
        return carry + H[0, 0, 0, 0] + g[0, 0], None

    def incidence_step(carry, r, He, ge):
        slot_i = jnp.where(free[ii], ii, cap)
        slot_j = jnp.where(free[jj], jj, cap)
        P = (jax.nn.one_hot(slot_i, cap + 1, dtype=He.dtype)
             - jax.nn.one_hot(slot_j, cap + 1, dtype=He.dtype))
        Hp = He + r * 1e-6
        Hs = 0.5 * (Hp + jnp.swapaxes(Hp, -1, -2))
        Kk = Hs[:, :, None, :] * P[:, None, :, None]
        H = jnp.einsum("ea,efbg->afbg", P, Kk,
                       precision=lax.Precision.HIGHEST)
        g = P.T @ ge
        return carry + H[0, 0, 0, 0] + g[0, 0], None

    def run2(step):
        def s(carry, r, He, ge):
            out, _ = step(carry, r, He, ge)
            return out
        return amortized(s, jnp.zeros(()), He, ge)

    print(f"scatter assembly : {run2(scatter_step):8.3f} ms/rep")
    print(f"incidence matmul : {run2(incidence_step):8.3f} ms/rep")

    # numeric agreement (post-symmetrization, as _solve_system does)
    @jax.jit
    def once(step, He, ge):
        return step(jnp.zeros(()), jnp.zeros(()), He, ge)
    H0 = jnp.zeros((cap + 1, 7, cap + 1, 7), jnp.float32)
    g0 = jnp.zeros((cap + 1, 7), jnp.float32)
    Hs, gs = FG._scatter_blocks(H0, g0, He, ge, ii, jj, free, cap)
    slot_i = jnp.where(free[ii], ii, cap)
    slot_j = jnp.where(free[jj], jj, cap)
    P = (jax.nn.one_hot(slot_i, cap + 1, dtype=He.dtype)
         - jax.nn.one_hot(slot_j, cap + 1, dtype=He.dtype))
    Hsym = 0.5 * (He + jnp.swapaxes(He, -1, -2))
    Kk = Hsym[:, :, None, :] * P[:, None, :, None]
    Hm = jnp.einsum("ea,efbg->afbg", P, Kk,
                    precision=lax.Precision.HIGHEST)
    gm = P.T @ ge
    a = 0.5 * (Hs.reshape((cap + 1) * 7, -1)
               + Hs.reshape((cap + 1) * 7, -1).T)
    b = 0.5 * (Hm.reshape((cap + 1) * 7, -1)
               + Hm.reshape((cap + 1) * 7, -1).T)
    print("max |H diff| (post-sym, HIGHEST):",
          float(jnp.max(jnp.abs(a - b))))
    print("max |g diff|:", float(jnp.max(jnp.abs(gs - gm))))

    # dense solve at production size
    def solve_step(carry, r, H, g):
        dx, ok = FG._solve_system(H + r * 1e-9, g, free, cap, 1e-4)
        return carry + dx[0, 0] + jnp.float32(ok), None

    def run_solve(H, g):
        def s(carry, r, H, g):
            out, _ = solve_step(carry, r, H, g)
            return out
        return amortized(s, jnp.zeros(()), H, g)

    # make it solidly PD: add 10·I on the block diagonal
    eye_blocks = jnp.einsum("ab,fg->afbg", jnp.eye(cap + 1), jnp.eye(7))
    Hpd = Hs + 10.0 * eye_blocks
    print(f"_solve_system    : {run_solve(Hpd, gs):8.3f} ms/rep")

    # cholesky alone at 770
    Hd = jnp.eye(cap * 7) * 10.0 + 0.01 * jnp.asarray(
        rng.normal(size=(cap * 7, cap * 7)).astype(np.float32))
    Hd = 0.5 * (Hd + Hd.T)

    def chol_step(carry, r, Hd):
        L = jnp.linalg.cholesky(Hd + r * 1e-9)
        return carry + L[0, 0], None

    def run_chol(Hd):
        def s(carry, r, Hd):
            out, _ = chol_step(carry, r, Hd)
            return out
        return amortized(s, jnp.zeros(()), Hd)

    print(f"cholesky 770     : {run_chol(Hd):8.3f} ms/rep")

    gd = jnp.asarray(rng.normal(size=(cap * 7,)).astype(np.float32))

    def chosolve_step(carry, r, Hd, gd):
        L = jnp.linalg.cholesky(Hd + r * 1e-9)
        x = jax.scipy.linalg.cho_solve((L, True), gd)
        return carry + x[0], None

    def run_chosolve(Hd, gd):
        def s(carry, r, Hd, gd):
            out, _ = chosolve_step(carry, r, Hd, gd)
            return out
        return amortized(s, jnp.zeros(()), Hd, gd)

    print(f"chol + cho_solve : {run_chosolve(Hd, gd):8.3f} ms/rep")

    from mast3r_slam_tpu.ops import lie
    T = jax.vmap(lie.exp)(jnp.asarray(
        rng.normal(size=(cap, 7)).astype(np.float32) * 0.02))
    dx = jnp.asarray(rng.normal(size=(cap, 7)).astype(np.float32) * 1e-3)

    def retr_step(carry, r, T, dx):
        Tn = jax.vmap(lie.retr)(T, dx * (1.0 + r * 1e-6))
        return carry + Tn[0, 0], None

    def run_retr(T, dx):
        def s(carry, r, T, dx):
            out, _ = retr_step(carry, r, T, dx)
            return out
        return amortized(s, jnp.zeros(()), T, dx)

    print(f"vmap(lie.retr)   : {run_retr(T, dx):8.3f} ms/rep")


if __name__ == "__main__":
    main()
