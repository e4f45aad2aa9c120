"""Replay the oracle harness until the first tracking failure, then re-run
that exact solve eagerly with per-iteration LM prints. Debug tool."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.utils.oracle_scene import OracleScene, make_trajectory
from mast3r_slam_tpu.ops import matching, lie, geometry
from mast3r_slam_tpu.slam.tracker import (_normal_7x7, _solve_damped_7x7,
                                          _ray_dist_channels,
                                          opt_pose_ray_dist_sim3)

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 96
H, W = 64, 96
n = H * W
scene = OracleScene(seed=0)
poses = make_trajectory(N_FRAMES)
K = scene.intrinsics((H, W))
rng = np.random.default_rng(0)
Xs, Ds, hits_all = [], [], []
for T in poses:
    X, hits = scene.raycast(T, K, (H, W))
    Xs.append(X + (0.003 * X[:, 2:3]
                   * rng.standard_normal(X.shape)).astype(np.float32))
    D = scene.descriptors(hits)
    D = D + 0.02 * rng.standard_normal(D.shape).astype(np.float32)
    Ds.append((D / (np.linalg.norm(D, axis=-1, keepdims=True) + 1e-12)
               ).astype(np.float32))
    hits_all.append(hits)


def cross(k, f):
    X = scene.world_to_cam(hits_all[k], poses[f]).astype(np.float32)
    return X + (0.003 * X[:, 2:3]
                * rng.standard_normal(X.shape)).astype(np.float32)


T_prev = jnp.asarray(poses[0])
k = 0
T_k = jnp.asarray(poses[0])
idx_warm = jnp.arange(n, dtype=jnp.int32)
mode = dict(radius=3, dilation_max=5, refine_mode="joint", level_step=1,
            plateau_frac=0.0)
for f in range(1, N_FRAMES):
    Xkf = cross(k, f)
    idx, valid = matching.match(
        jnp.asarray(Xs[f]).reshape(1, H, W, 3),
        jnp.asarray(Xkf).reshape(1, H, W, 3),
        jnp.asarray(Ds[f]).reshape(1, H, W, -1),
        jnp.asarray(Ds[k]).reshape(1, H, W, -1),
        idx_1_to_2_init=idx_warm[None], **mode)
    Xf = jnp.asarray(Xs[f])[idx[0]]
    T_new, _, ok = opt_pose_ray_dist_sim3(
        Xf, jnp.asarray(Xs[k]), T_prev, T_k, jnp.full((n, 1), 2.0),
        valid[0].astype(jnp.float32), 0.003, 10.0, 1.345, 50, 1e-3, 1e-3)
    if not bool(ok):
        print(f"first failure: frame {f} vs kf {k}", flush=True)
        print("T_prev", np.asarray(T_prev))
        print("T_k", np.asarray(T_k))
        print("Xf nan", int(jnp.isnan(Xf).sum()),
              "Xk nan", int(jnp.isnan(jnp.asarray(Xs[k])).sum()),
              "valid frac", float(valid.mean()),
              "idx min/max", int(idx.min()), int(idx.max()))
        # eager LM replay
        Xk = jnp.asarray(Xs[k])
        sq = (valid[0].astype(jnp.float32)
              * jnp.sqrt(jnp.full((n, 1), 2.0)))[:, 0]
        sqrt_info = [(1 / 0.003) * sq] * 3 + [(1 / 10.0) * sq]
        rd_k, _ = _ray_dist_channels(Xk)

        def system(T):
            Xf_Ck = lie.act(T, Xf)
            rd_f, drd = _ray_dist_channels(Xf_Ck)
            r = [rd_k[i] - rd_f[i] for i in range(4)]
            J = geometry.compose_jac_channels(
                drd, geometry.point_jac_channels(Xf_Ck), negate=True)
            return _normal_7x7(sqrt_info, r, J, 1.345)

        T = lie.compose(lie.inv(T_k), T_prev)
        Hm, g, c = system(T)
        print("init cost", float(c), "H finite", bool(jnp.all(jnp.isfinite(Hm))))
        lam = 1e-8
        for it in range(25):
            tau, chol_ok = _solve_damped_7x7(Hm, g, lam)
            T_cand = lie.retr(T, tau)
            H2, g2, c2 = system(T_cand)
            acc = bool(chol_ok) and float(c2) <= float(c) * (1 + 1e-6)
            print(f"it {it:2d} lam {lam:9.1e} chol {bool(chol_ok)} "
                  f"cost {float(c):.2f} -> {float(c2):.2f} acc {acc} "
                  f"taunorm {float(jnp.linalg.norm(tau)):.5f}", flush=True)
            if acc:
                T, Hm, g, c = T_cand, H2, g2, c2
                lam = max(1e-8, lam * 0.25)
            else:
                lam *= 10
        break
    T_prev = T_new
    idx_warm = idx[0]
    if f % 4 == 0:
        k = f
        T_k = T_new
        idx_warm = jnp.arange(n, dtype=jnp.int32)
