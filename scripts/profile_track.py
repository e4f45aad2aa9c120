"""Per-stage timing of the tracking hot path on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.ops import lie, matching
from mast3r_slam_tpu.slam.tracker import opt_pose_ray_dist_sim3

H, W = 384, 512
N = H * W
cfg = M.MASt3RConfig()
params = M.init_params(jax.random.PRNGKey(0), cfg)
params = jax.device_put(params)
key = jax.random.PRNGKey(1)
img = jax.random.uniform(key, (1, H, W, 3), jnp.float32, -1, 1)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1e3:8.2f} ms")
    return out


enc = jax.jit(lambda p, i: M.encode_image(p, cfg, i))
feat, pos = timeit("encode (ViT-L, 768 tok)", enc, params, img)

dec = jax.jit(lambda p, f1, p1, f2, p2: M.decode_pair(p, cfg, f1, p1, f2, p2))
d1, d2 = timeit("decode_pair (2x12 blocks)", dec, params, feat, pos, feat, pos)

head = jax.jit(lambda p, d: M.downstream_head(p["head1"], cfg, d, (H, W)))
res = timeit("downstream_head (DPT+MLP)", head, params, list(d1))

X = res["pts3d"]
D = res["desc"]
Q = res["desc_conf"]

rays9, pts_norm, p_init = jax.jit(
    lambda x1, x2: matching.prep_for_iter_proj(x1, x2, None)
)(X, X)
jax.block_until_ready(rays9)
print("--- matcher ---")

ip = jax.jit(lambda r, p, pi: matching.iter_proj(r, p, pi, 10, 1e-8, 1e-6))
p1, conv = timeit("iter_proj (10 LM iters)", ip, rays9, pts_norm, p_init)

p1i = jnp.floor(p1).astype(jnp.int32)
rm = jax.jit(lambda d1, d2, p: matching.refine_matches(d1, d2, p, 3, 5))
p2 = timeit("refine_matches (5 levels)", rm, D, D.reshape(1, N, -1), p1i)

full_match = jax.jit(lambda x1, x2, d1, d2: matching.match(x1, x2, d1, d2))
idx, valid = timeit("match (full)", full_match, X, X, D, D)

Xf = X.reshape(N, 3)
Qk = Q.reshape(N, 1)
vv = valid[0].astype(jnp.float32)
gn = jax.jit(lambda xf, xk, q, v: opt_pose_ray_dist_sim3(
    xf, xk, lie.identity(), lie.identity(), q, v,
    0.003, 0.003, 1.345, 50, 1e-7, 1e-7))
timeit("pose GN (<=50 iters)", gn, Xf, Xf, Qk, vv)
