import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
from jax import lax
from mast3r_slam_tpu.ops import conv3x3 as C

print("devices:", jax.devices(), flush=True)
t0 = time.time()
a = jnp.ones((1024, 1024), jnp.bfloat16)
r = (a @ a).block_until_ready()
print(f"warm matmul compile+run {time.time()-t0:.1f}s", flush=True)

shapes = [
    # (name, B, H, W, cin, cout)  — DPT 3x3 shapes at 384x512 input
    ("rcu@12x16x256", 1, 12, 16, 256, 256),
    ("rcu@24x32x256", 1, 24, 32, 256, 256),
    ("rcu@48x64x256", 1, 48, 64, 256, 256),
    ("rcu@96x128x256", 1, 96, 128, 256, 256),
    ("rn2 384->256", 1, 24, 32, 384, 256),
    ("rn3 768->256", 1, 12, 16, 768, 256),
    ("head_c1@192x256 256->128", 1, 192, 256, 256, 128),
    ("head_c2@384x512 128->128", 1, 384, 512, 128, 128),
]
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)

def timeit(fn, *args, reps=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(*args).block_until_ready()
    # in-window timing: run reps, sync once at end, report per-rep
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    out.block_until_ready()
    return (time.time() - t0) / reps * 1e3

tot_xla = tot_pal = 0.0
for name, B, H, W, cin, cout in shapes:
    k1, k2, k3, key = jax.random.split(key, 4)
    x = jax.random.normal(k1, (B, H, W, cin), dt)
    w = (jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.05).astype(dt)
    b = jax.random.normal(k3, (cout,), dt)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    xla = jax.jit(lambda x, w, b: lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn) + b)
    pal = jax.jit(lambda x, w, b: C.conv3x3(x, w, b))
    t_x = timeit(xla, x, w, b)
    t_p = timeit(pal, x, w, b)
    err = float(jnp.max(jnp.abs(xla(x, w, b).astype(jnp.float32) - pal(x, w, b).astype(jnp.float32))))
    gf = B * H * W * 9 * cin * cout * 2 / 1e9
    print(f"{name:28s} xla {t_x:7.3f} ms  pallas {t_p:7.3f} ms  ({gf:5.1f} GF -> "
          f"xla {gf/t_x:6.1f} / pal {gf/t_p:6.1f} TF/s)  maxerr {err:.4f}", flush=True)
    tot_xla += t_x; tot_pal += t_p
print(f"TOTAL one head's qualifying convs: xla {tot_xla:.2f} ms  pallas {tot_pal:.2f} ms", flush=True)
# rcu convs appear 4x per refinenet per head; the loop above times each ONCE.
