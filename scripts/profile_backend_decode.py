"""Stage profile of the backend keyframe-event decode+match (TPU).

The e2e bench shows decode+match ≈ 200 ms per keyframe event — the largest
single stage. This splits it: dual cross-decoder (batch 2), DPT+MLP heads,
and the B=2 symmetric matcher, each timed with varied inputs + checksum
syncs (the tunnel dedupes identical dispatches and `block_until_ready`
alone under-reports — see docs/PERFORMANCE.md tunnel notes).

Run on the TPU: ``python scripts/profile_backend_decode.py``
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from mast3r_slam_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.ops import matching


def timed(label, fn, reps=3):
    fn(0)  # compile
    best = 1e9
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(r)
        s = float(jnp.sum(jax.tree.leaves(out)[0]))  # true sync
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best * 1e3:8.1f} ms   (sum {s:.3g})", flush=True)
    return best


def main():
    H, W = 384, 512
    cfg = M.MASt3RConfig()
    params = jax.device_put(M.init_params(jax.random.PRNGKey(0), cfg))
    n_tok = (H // 16) * (W // 16)
    key = jax.random.PRNGKey(1)
    feat = jax.random.normal(key, (2, n_tok, cfg.enc_embed_dim), jnp.float32)
    pos = M.patch_positions(H // 16, W // 16, 2)
    n_pix = H * W

    dec = jax.jit(lambda p, f1, f2, r: M.decode_pair(
        p, cfg, f1 + 1e-6 * r, pos, f2, pos))
    timed("decode_pair (batch 2)",
          lambda r: dec(params, feat, feat[::-1], r))

    d1, d2 = dec(params, feat, feat[::-1], 0)

    head = jax.jit(lambda p, d, r: M.downstream_head(
        p["head1"], cfg, [t + 1e-6 * r for t in d], (H, W)))
    timed("downstream_head (batch 2)", lambda r: head(params, d1, r))

    full = jax.jit(lambda p, f1, f2, r: tuple(
        M.downstream_head(p[h], cfg, d, (H, W))["pts3d"]
        for h, d in zip(("head1", "head2"),
                        M.decode_pair(p, cfg, f1 + 1e-6 * r, pos, f2, pos))))
    timed("decode+both heads (fused)",
          lambda r: full(params, feat, feat[::-1], r))

    # B=2 matcher at production shapes, smooth synthetic workload, warm init
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    z = 2.0 + 0.3 * jnp.sin(u / 23.0) + 0.2 * jnp.cos(v / 17.0)
    X1 = jnp.stack([(u - W / 2) / 300.0 * z, (v - H / 2) / 300.0 * z, z],
                   -1)[None]
    X1 = jnp.concatenate([X1, X1], 0)
    X2 = jnp.roll(X1, -3, axis=2)
    dk = jax.random.uniform(jax.random.PRNGKey(7), (24, 4), minval=0.02,
                            maxval=0.3)
    D1 = jnp.stack([jnp.sin(u * dk[i, 0]) * jnp.cos(v * dk[i, 1])
                    for i in range(24)], -1)[None]
    D1 = jnp.concatenate([D1, D1], 0)
    D1 = D1 / jnp.clip(jnp.linalg.norm(D1, axis=-1, keepdims=True), 1e-6)
    D2 = jnp.roll(D1, -3, axis=2)
    init = jnp.broadcast_to(jnp.arange(n_pix, dtype=jnp.int32)[None], (2, n_pix))

    for ls in (1, 2):
        m = jax.jit(lambda X1, r, ls=ls: matching.match(
            X1 + 1e-6 * r, X2, D1, D2, idx_1_to_2_init=init, level_step=ls))
        timed(f"match B=2 (level_step={ls})", lambda r: m(X1, r))

    # B=1 comparison: the matcher is gather-bound; batching has no MXU
    # upside and (measured) a large downside — see match_symmetric
    m1 = jax.jit(lambda X1, r: matching.match(
        X1[:1] + 1e-6 * r, X2[:1], D1[:1], D2[:1],
        idx_1_to_2_init=init[:1], level_step=2))

    def both_rows(r):
        a = m1(X1, r)
        b = m1(X1, r + 0.5)  # second direction, pipelined dispatch
        return (a[0], b[0])

    timed("match 2x B=1 (level_step=2)", both_rows)


if __name__ == "__main__":
    main()
