"""End-to-end tracking-step benchmark on real hardware.

Measures the frontend hot path at full flagship size — ViT-L encode of the new
frame, dual cross-decoder + DPT/MLP heads for the (frame, keyframe) pair,
iterative-projection matching with descriptor refinement, and the Sim(3)
Gauss-Newton pose solve — i.e. everything the reference does per frame on its
GPU (reference call stack: SURVEY.md §3.2), minus host-side dataset IO.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 8.5 FPS end-to-end on TUM fr1 on an RTX 4090 (BASELINE.md,
reference CHANGELOG.md:557).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

BASELINE_FPS = 8.5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.ops import lie, matching
    from mast3r_slam_tpu.slam.tracker import opt_pose_ray_dist_sim3

    H, W = 384, 512
    cfg = M.MASt3RConfig()
    log(f"devices: {jax.devices()}")
    log("initializing ViT-L params...")
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)

    key = jax.random.PRNGKey(42)
    img_f = jax.random.uniform(key, (1, H, W, 3), jnp.float32, -1.0, 1.0)

    n_pix = H * W

    # Production-shaped geometry: with random weights the heads emit noise
    # pointmaps, which makes the matcher's correspondences RANDOM — and TPU
    # gathers with random indices are ~100x slower than with the near-
    # diagonal indices real tracking produces (converged LM + warm starts).
    # Blending a smooth synthetic scene (tiny epsilon of model output keeps
    # every model FLOP in the graph) makes the benchmark measure the
    # workload the system actually runs on real sequences.
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    z = 2.0 + 0.3 * jnp.sin(u / 23.0) + 0.2 * jnp.cos(v / 17.0)
    X_scene = jnp.stack([(u - W / 2) / 300.0 * z, (v - H / 2) / 300.0 * z, z],
                        axis=-1)[None]
    X_shift = jnp.roll(X_scene, -3, axis=2)  # keyframe sees a 3 px pan
    # Informative descriptors (as trained descriptors are): a smooth
    # position-coded field so the window argmax lands near the true match —
    # random descriptors make refinement drift ±radius*dilation per level,
    # which is a correspondence-index distribution real tracking never has.
    dk = jax.random.uniform(jax.random.PRNGKey(7), (24, 4), minval=0.02,
                            maxval=0.3)
    D_scene = jnp.stack(
        [jnp.sin(u * dk[i, 0] + dk[i, 2] * 37) *
         jnp.cos(v * dk[i, 1] + dk[i, 3] * 57) for i in range(24)],
        axis=-1,
    )[None]
    D_shift = jnp.roll(D_scene, -3, axis=2)

    def _norm(d):
        return d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)

    @jax.jit
    def track_step(params, img_f, feat_k, pos_k, T_WCk):
        # One XLA program per frame: program switches cost ~20 ms each on a
        # tunneled chip, and the matcher is formulated so XLA schedules it
        # well inside a large program (see ops/matching.py docstring).
        feat_f, pos_f = M.encode_image(params, cfg, img_f)
        d1, d2 = M.decode_pair(params, cfg, feat_f, pos_f, feat_k, pos_k)
        res_ff = M.downstream_head(params["head1"], cfg, d1, (H, W))
        res_kf = M.downstream_head(params["head2"], cfg, d2, (H, W))
        Xff = X_scene + 1e-4 * jnp.tanh(res_ff["pts3d"])
        Xkf = X_shift + 1e-4 * jnp.tanh(res_kf["pts3d"])
        Dff = _norm(D_scene + 0.05 * res_ff["desc"])
        Dkf = _norm(D_shift + 0.05 * res_kf["desc"])
        idx_f2k, valid = matching.match(Xff, Xkf, Dff, Dkf)
        Xf = Xff.reshape(n_pix, 3)[idx_f2k[0]]
        Xk = Xkf.reshape(n_pix, 3)
        Qk = res_kf["desc_conf"].reshape(n_pix, 1)
        T_WCf, T_CkCf, ok = opt_pose_ray_dist_sim3(
            Xf, Xk, T_WCk, T_WCk, Qk, valid[0].astype(jnp.float32),
            # production solver parameters (config/base.yaml tracking.*)
            0.003, 10.0, 1.345, 50, 1e-3, 1e-3,
        )
        return T_WCf, idx_f2k, ok

    log("encoding keyframe...")
    ek = jax.jit(lambda p, i: M.encode_image(p, cfg, i))
    feat_k, pos_k = ek(params, img_f)
    T_WCk = lie.identity()
    jax.block_until_ready(feat_k)

    log("compiling track_step (first call)...")
    t0 = time.perf_counter()
    out = track_step(params, img_f, feat_k, pos_k, T_WCk)
    jax.block_until_ready(out)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    # steady state
    n_warm, n_iter = 3, 20
    for _ in range(n_warm):
        out = track_step(params, img_f, feat_k, pos_k, T_WCk)
    jax.block_until_ready(out)

    if "--trace" in sys.argv:
        jax.profiler.start_trace("/tmp/bench_trace")
        for _ in range(3):
            out = track_step(params, img_f, feat_k, pos_k, T_WCk)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        log("trace → /tmp/bench_trace")
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = track_step(params, img_f, feat_k, pos_k, T_WCk)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    fps = 1.0 / dt
    log(f"track_step: {dt * 1e3:.1f} ms/frame → {fps:.2f} FPS")

    print(json.dumps({
        "metric": "tracking_fps_512",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
