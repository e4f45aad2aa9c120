"""Disjoint device topology: tracking, backend, and services on separate chips.

On one chip every XLA program serializes, so the backend BA event, the
quality-service batch, and the TSDF refine kernels all stall tracking (the
measured cost: e2e 9.9 FPS vs 16.4 frontend-only on v5e-1 — see
docs/PERFORMANCE.md). The reference hides the same contention by running
three CUDA *processes* on one GPU (reference main.py:292-303); the TPU-native
answer is placement: give the frame-rate-critical tracker a chip of its own
and fan the asynchronous work out over the rest of the slice.

Layout for an ``n``-device slice (v5e-8 = the BASELINE.md north star):

- device 0           → frontend tracking (every per-frame program)
- devices 1..k       → backend sub-mesh (symmetric pair decode + Pallas BA),
                       ``k`` = largest power of two that still leaves the
                       frontend its chip (power of two keeps the edge
                       buckets divisible for ``shard_map``)
- remaining devices  → quality service, local TSDF refinement, global TSDF
                       (round-robin; fall back to the last backend device
                       when the slice is small)

Placement mechanics (single controller, no processes): frontend arrays stay
uncommitted, so per-frame programs run on the default device. Backend inputs
are explicitly placed on the sub-mesh (``NamedSharding``) inside
FactorGraph/MASt3RInference; solved poses are committed back to the frontend
device before they re-enter tracking state. Service inputs are
``device_put`` onto their service chip, which pins those programs there.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh

from mast3r_slam_tpu.parallel.sharding import EDGE_AXIS


@dataclass(frozen=True)
class Topology:
    """Device assignment for one SLAM session."""

    frontend_device: object            # jax.Device for per-frame tracking
    backend_mesh: Mesh | None          # 1-D mesh for decode + BA (disjoint)
    quality_device: object | None      # quality-service programs
    tsdf_local_device: object | None   # local TSDF refine kernels
    tsdf_global_device: object | None  # global TSDF integration

    @property
    def n_backend(self) -> int:
        if self.backend_mesh is None:
            return 0
        return int(np.prod(self.backend_mesh.devices.shape))

    def describe(self) -> str:
        def _n(d):
            return f"{d.platform}:{d.id}" if d is not None else "-"

        back = ("none" if self.backend_mesh is None else
                ",".join(_n(d) for d in self.backend_mesh.devices.flat))
        return (f"frontend={_n(self.frontend_device)} backend=[{back}] "
                f"quality={_n(self.quality_device)} "
                f"tsdf_local={_n(self.tsdf_local_device)} "
                f"tsdf_global={_n(self.tsdf_global_device)}")


def _pow2_floor(n: int) -> int:
    p = 1
    while p * 2 <= n:
        p *= 2
    return p


def plan_topology(devices=None) -> Topology:
    """Assign the visible devices to the SLAM roles (see module docstring)."""
    devs = list(jax.devices() if devices is None else devices)
    n = len(devs)
    if n <= 1:
        d = devs[0] if devs else None
        return Topology(d, None, None, None, None)

    frontend = devs[0]
    rest = devs[1:]
    # Services get dedicated chips only when the backend keeps ≥2 after the
    # split; otherwise they share the backend's chips (still off the
    # frontend's critical path, which is the point).
    n_back = _pow2_floor(len(rest))
    spare = rest[n_back:]
    backend = rest[:n_back]
    if not spare and n_back >= 4:
        # e.g. n=5 (1+4): trade one backend chip for a service chip pool
        n_back //= 2
        backend = rest[:n_back]
        spare = rest[n_back:]
    pool = spare if spare else backend[-1:]
    mesh = Mesh(np.asarray(backend), (EDGE_AXIS,))
    return Topology(
        frontend_device=frontend,
        backend_mesh=mesh,
        quality_device=pool[0 % len(pool)],
        tsdf_local_device=pool[1 % len(pool)],
        tsdf_global_device=pool[2 % len(pool)],
    )
