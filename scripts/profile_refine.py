"""Layout experiments for the refine_matches gather on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

H, W, F = 384, 512, 24
N = H * W
R, DIL = 3, 5
K = (2 * R + 1) ** 2

key = jax.random.PRNGKey(0)
D11 = jax.random.normal(key, (1, H, W, F), jnp.float32)
D21 = jax.random.normal(jax.random.fold_in(key, 1), (1, N, F), jnp.float32)
p1 = jnp.stack([jax.random.randint(key, (1, N), 1, W - 1),
                jax.random.randint(key, (1, N), 1, H - 1)], -1)


def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out


def offsets(radius, dilation):
    rng = np.arange(-radius, radius + 1) * dilation
    du, dv = np.meshgrid(rng, rng, indexing="xy")
    return np.stack([du.ravel(), dv.ravel()], -1)


# variant A: (H, W, K, F) stack (current impl), bf16
@partial(jax.jit, static_argnames=("dil",))
def level_A(Dimg, pq, q, dil):
    offs = offsets(R, dil)
    Dh = Dimg.astype(jnp.bfloat16)
    qh = q.astype(jnp.bfloat16)

    def one(Di, pqi, qi):
        rolled = jnp.stack([jnp.roll(Di, (-int(dv), -int(du)), (0, 1))
                            for du, dv in offs], 2).reshape(N, K, F)
        pu = jnp.clip(pqi[:, 0], 0, W - 1)
        pv = jnp.clip(pqi[:, 1], 0, H - 1)
        cand = rolled[pv * W + pu]
        sc = jnp.einsum("nkf,nf->nk", cand, qi,
                        preferred_element_type=jnp.float32)
        return pqi + jnp.asarray(offs)[jnp.argmax(sc, -1)]

    return jax.vmap(one)(Dh, pq, qh)


# variant B: flat (N, K*F) stack via minor-dim concat, bf16
@partial(jax.jit, static_argnames=("dil",))
def level_B(Dimg, pq, q, dil):
    offs = offsets(R, dil)
    Dh = Dimg.astype(jnp.bfloat16)
    qh = q.astype(jnp.bfloat16)

    def one(Di, pqi, qi):
        rolled = jnp.concatenate([jnp.roll(Di, (-int(dv), -int(du)), (0, 1))
                                  for du, dv in offs], axis=-1).reshape(N, K * F)
        pu = jnp.clip(pqi[:, 0], 0, W - 1)
        pv = jnp.clip(pqi[:, 1], 0, H - 1)
        cand = rolled[pv * W + pu].reshape(N, K, F)
        sc = jnp.einsum("nkf,nf->nk", cand, qi,
                        preferred_element_type=jnp.float32)
        return pqi + jnp.asarray(offs)[jnp.argmax(sc, -1)]

    return jax.vmap(one)(Dh, pq, qh)


# variant C: precompute scores densely per offset (no gather at all):
# score_k as an IMAGE: S_k[p] = dot(D21_img[p], rolled_k[p1[p]])… not dense.
# Instead: C = per-offset dense dot of D21-as-image with rolled D11 — only
# valid when p1 ≈ identity; NOT equivalent. Skipped.

# variant D: one-hot matmul over K (scores via batched small matmul), bf16:
# gather rows of D11 flat once per offset with SAME indices
@partial(jax.jit, static_argnames=("dil",))
def level_D(Dimg, pq, q, dil):
    offs = offsets(R, dil)
    Dh = Dimg.astype(jnp.bfloat16)
    qh = q.astype(jnp.bfloat16)

    def one(Di, pqi, qi):
        pu = jnp.clip(pqi[:, 0], 0, W - 1)
        pv = jnp.clip(pqi[:, 1], 0, H - 1)
        lin = pv * W + pu
        scs = []
        for du, dv in offs:
            rolled = jnp.roll(Di, (-int(dv), -int(du)), (0, 1)).reshape(N, F)
            g = rolled[lin]
            scs.append(jnp.sum(g * qi, -1, dtype=jnp.float32))
        sc = jnp.stack(scs, -1)
        return pqi + jnp.asarray(offs)[jnp.argmax(sc, -1)]

    return jax.vmap(one)(Dh, pq, qh)


p = p1
for name, fn in [("A (H,W,K,F) stack", level_A), ("B flat (N,K*F) stack", level_B),
                 ("D per-offset gather", level_D)]:
    timeit(f"{name} dil=5", fn, D11, p, D21, 5)

# full 5-level for best variant
@jax.jit
def full_B(Dimg, pq, q):
    for d in range(DIL, 0, -1):
        pq = level_B(Dimg, pq, q, d)
    return pq

timeit("B full 5 levels", full_B, D11, p1, D21)
