"""Frontend stage splits, measured the only trustworthy way on the tunnel:
ONE program variant per dedicated process, in-window medians over reps,
checksum-synced, input varied inside the program.

Usage: python scripts/stage_split3.py <mode> [reps]
  mode in: encode, decode, model, match, full

Each mode is a strict prefix of the production track_core stage list, so
deltas between modes are stage costs measured under identical dispatch
behavior (docs/PERFORMANCE.md: stage probes inside a multi-program process
read 3-20x inflated; these are dedicated-process windows).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ""))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mast3r_slam_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.ops import lie, matching
from mast3r_slam_tpu.slam.tracker import opt_pose_ray_dist_sim3


def main():
    from bench import wait_for_device
    wait_for_device()
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    H, W = 384, 512
    n_pix = H * W
    cfg = M.MASt3RConfig(head_dtype="bfloat16")
    raw = M.init_params(jax.random.PRNGKey(0), cfg)
    if os.environ.get("MAST3R_TPU_STACK_DEC", "0") == "1":
        params = jax.device_put(M.prepare_params(raw, cfg))
    else:
        params = jax.device_put(M.cast_params_for_compute(raw, cfg))
    img_f = jax.random.uniform(jax.random.PRNGKey(42), (1, H, W, 3),
                               jnp.float32, -1.0, 1.0)

    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    z = 2.0 + 0.3 * jnp.sin(u / 23.0) + 0.2 * jnp.cos(v / 17.0)
    X_scene = jnp.stack([(u - W / 2) / 300.0 * z, (v - H / 2) / 300.0 * z, z],
                        axis=-1)[None]
    X_shift = jnp.roll(X_scene, -3, axis=2)
    dk = jax.random.uniform(jax.random.PRNGKey(7), (24, 4), minval=0.02,
                            maxval=0.3)
    D_scene = jnp.stack(
        [jnp.sin(u * dk[i, 0] + dk[i, 2] * 37) *
         jnp.cos(v * dk[i, 1] + dk[i, 3] * 57) for i in range(24)],
        axis=-1)[None]
    D_shift = jnp.roll(D_scene, -3, axis=2)

    def _norm(d):
        return d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)

    from mast3r_slam_tpu.slam.tracker import (fuse_pointmap,
                                              kf_selection_stats,
                                              quality_job_tensors)

    @jax.jit
    def step(params, img_f, feat_k, pos_k, T_WCk, X_k, C_k, N_k, r):
        feat_f, pos_f = M.encode_image(params, cfg, img_f + 1e-6 * (r + 1.0))
        if mode == "encode":
            return (feat_f,)
        d1, d2 = M.decode_pair(params, cfg, feat_f, pos_f, feat_k, pos_k)
        if mode == "decode":
            return (d1[-1], d2[-1])
        res_ff, res_kf = M.downstream_heads(params, cfg, d1, d2, (H, W))
        if mode == "model":
            return (res_ff["pts3d"], res_kf["desc"])
        Xff = X_scene + 1e-4 * jnp.tanh(res_ff["pts3d"])
        Xkf = X_shift + 1e-4 * jnp.tanh(res_kf["pts3d"])
        Dff = _norm(D_scene + 0.05 * res_ff["desc"])
        Dkf = _norm(D_shift + 0.05 * res_kf["desc"])
        idx_f2k, valid = matching.match(
            Xff, Xkf, Dff, Dkf, radius=2, level_step=2,
            proj_step=int(os.environ.get("MAST3R_TPU_PROJ_STEP", "2")),
            dilation_max=int(os.environ.get("MAST3R_TPU_DMAX", "1")))
        if mode == "match":
            return (idx_f2k, valid)
        idx0 = idx_f2k[0]
        vmatch = valid[0]
        Xk = Xkf.reshape(n_pix, 3)
        Cff = res_ff["conf"].reshape(n_pix, 1)
        Ckf = res_kf["conf"].reshape(n_pix, 1)
        fch = jnp.concatenate(
            [Xff.reshape(n_pix, 3), Cff,
             res_ff["desc_conf"].reshape(n_pix, 1)], axis=-1)[idx0]
        Xf, Cf, Qf = fch[:, 0:3], fch[:, 3:4], fch[:, 4:5]
        Qk = jnp.sqrt(Qf * res_kf["desc_conf"].reshape(n_pix, 1))
        Ck_avg = C_k / jnp.maximum(N_k, 1.0)
        valid_opt = vmatch & (Cf > 0.0) & (Ck_avg > 0.0) & (Qk > 1.5)
        valid_kf = vmatch & (Qk > 1.5)
        match_frac = jnp.mean(valid_opt.astype(jnp.float32))
        T_WCf, T_CkCf, ok = opt_pose_ray_dist_sim3(
            Xf, Xk, T_WCk, T_WCk, Qk, valid_opt.astype(jnp.float32),
            0.003, 10.0, 1.345, 50, 1e-3, 1e-3)
        Xkk = lie.act(T_CkCf[None], Xkf.reshape(n_pix, 3))
        X_k_new, C_k_new, N_k_new = fuse_pointmap(
            "weighted_pointmap", "median", X_k, C_k, N_k, Xkk, Ckf)
        match_frac_k, unique_frac_f = kf_selection_stats(
            vmatch, idx0, valid_kf, n_pix)
        r_pix, valid_submit, t_norm, theta = quality_job_tensors(
            False, T_CkCf, Xf, Xk, valid_kf, None, None, jnp.eye(3),
            (H, W), 1.0, 10.0)
        return (T_WCf, idx_f2k, ok, X_k_new, C_k_new, N_k_new, match_frac,
                match_frac_k, unique_frac_f, r_pix, valid_submit, Qk,
                Ck_avg, t_norm, theta)

    ek = jax.jit(lambda p, i: M.encode_image(p, cfg, i))
    feat_k, pos_k = ek(params, img_f)
    jax.block_until_ready(feat_k)
    T_WCk = lie.identity()
    X_kf = X_shift.reshape(n_pix, 3)
    C_kf = jnp.ones((n_pix, 1), jnp.float32)
    N_kf = jnp.asarray(1.0)

    def run(r):
        return step(params, img_f, feat_k, pos_k, T_WCk, X_kf, C_kf, N_kf,
                    jnp.asarray(float(r), jnp.float32))

    t0 = time.perf_counter()
    out = run(0)
    # true sync: value readback (block_until_ready is NOT a sync on the tunnel)
    _ = float(jnp.sum(out[0].astype(jnp.float32)))
    print(f"[{mode}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)

    times = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        out = run(r)
        _ = float(jnp.sum(out[0].astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(f"[{mode}] median {med * 1e3:.2f} ms over {reps} reps "
          f"(p10 {times[len(times) // 10] * 1e3:.2f}, "
          f"p90 {times[(9 * len(times)) // 10] * 1e3:.2f})", flush=True)

    trace_dir = os.environ.get("MAST3R_TPU_TRACE", "")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        for r in range(reps + 1, reps + 4):
            out = run(r)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        print(f"[{mode}] trace (3 reps) → {trace_dir}", flush=True)


if __name__ == "__main__":
    main()
